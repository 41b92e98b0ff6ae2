"""Device-side LD math: haplotype-count matmuls + elementwise epilogues.

The reference computes D, D', r^2 one variant pair at a time from two Python
lists of phased genotypes (reference backend/calc_ld.py:3-99).  Here the same
quantities are computed for whole *blocks* of variant pairs at once:

- ``G`` is a packed haplotype matrix with shape (variants, haplotypes) and
  values in {0, 1} (one column per phased allele copy; 2N columns for N
  diploid samples).
- The haplotype alt+alt co-occurrence count for every pair (i, j) is a single
  matmul ``G_i @ G_j.T`` that runs on the MXU
  (reference calc_ld.py:30-33 counts tuples ``(1, 1)`` per pair instead).
- Allele counts are row sums (reference calc_ld.py:37-44).
- D, D', r^2 are branchless elementwise epilogues that XLA fuses into the
  matmul's output tiles (reference calc_ld.py:50-90 uses per-pair branching
  and try/except ZeroDivisionError).

All counts are exact: genotypes are 0/1, so bf16 MXU products are exact and
f32 accumulation is exact for any haplotype count below 2^24 (1000 Genomes
phase 3 has 5,008 haplotypes).  The fast path finishes in f32 on device; the
bit-exact-vs-reference path exports the integer counts and finishes in f64 on
the host (see ld_tools_tpu/ops/exact.py).

Conditioning caveat for the f32 device values: ``d = p_ab - p1*p2`` is a
cancelling difference and the D' denominator can be as small as 1/n^2, so
while well-conditioned cells see ~1e-7 relative noise, near-monomorphic
variants (alt count within a few of 0 or n) can err up to ~1e-1 ABSOLUTE
in f32 D' (r^2 up to ~1e-3).  Every file-output path therefore finishes
from integer counts in f64, and the streamed scan thresholds on scaled
exact integers (ops/ld_stream._exact_keep_mask) rather than on these f32
values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def haplotype_counts(g1: jax.Array, g2: jax.Array) -> jax.Array:
    """Alt+alt haplotype co-occurrence counts for all pairs of two blocks.

    ``g1``: (V1, H) and ``g2``: (V2, H), values in {0, 1} (any integer or
    float dtype).  Returns (V1, V2) f32 counts — exact integers.

    This is the MXU-resident heart of the engine; it replaces the per-pair
    ``htypes.count((1, 1))`` of reference backend/calc_ld.py:30-33.
    """
    a = g1.astype(jnp.bfloat16)
    b = g2.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def haplotype_counts_int8(g1: jax.Array, g2: jax.Array) -> jax.Array:
    """int8 x int8 -> int32 co-occurrence counts on the MXU.

    Identical exact integers to :func:`haplotype_counts`, but the int8
    MXU path runs at 2x the bf16 rate on v5e+ — this is the production
    engine's count kernel (ops/engine.py).  Inputs must hold {0, 1}.
    """
    return jax.lax.dot_general(
        g1.astype(jnp.int8),
        g2.astype(jnp.int8),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def allele_counts(g: jax.Array) -> jax.Array:
    """Per-variant alt-allele counts (row sums), exact in f32.

    Reference backend/calc_ld.py:37-44 counts 1s and 0s per variant; with
    genotypes restricted to {0, 1} (enforced at ingest) the ref count is
    ``n - alt_count``.
    """
    return jnp.sum(g.astype(jnp.float32), axis=-1)


def ld_from_counts(
    c_ab: jax.Array,
    c1: jax.Array,
    c2: jax.Array,
    n_haplotypes,
):
    """Fast-path (f32) LD epilogue from exact counts.

    ``c_ab``: (V1, V2) alt+alt co-occurrence counts; ``c1``: (V1,) alt counts
    of the row variants; ``c2``: (V2,) alt counts of the column variants;
    ``n_haplotypes``: the true (unpadded) number of haplotypes.

    Returns a dict of (V1, V2) f32 arrays ``r_square``, ``d_prime`` and the
    (V1,)/(V2,) f32 alt frequencies ``p1``, ``p2``.

    Mirrors reference backend/calc_ld.py:50-90 branch-for-branch, but
    branchlessly:
      d      = p_ab - p1*p2                              (calc_ld.py:50)
      d >= 0: den = min(p1*q2, q1*p2)                    (calc_ld.py:63-65)
      d <  0: den = max(-p1*p2, -q1*q2)                  (calc_ld.py:70-72)
      den == 0 (monomorphic) -> d' = 0                   (calc_ld.py:66-76)
      d' == 0 -> r^2 = 0, else d^2/(p1*q1*p2*q2)         (calc_ld.py:86-90)
    """
    n = jnp.float32(n_haplotypes)
    p_ab = c_ab / n
    c1 = c1.astype(jnp.float32)
    c2 = c2.astype(jnp.float32)
    p1 = (c1 / n)[:, None]
    q1 = ((n - c1) / n)[:, None]
    p2 = (c2 / n)[None, :]
    q2 = ((n - c2) / n)[None, :]

    d = p_ab - p1 * p2
    den_pos = jnp.minimum(p1 * q2, q1 * p2)
    den_neg = jnp.maximum(-(p1 * p2), -(q1 * q2))
    den = jnp.where(d >= 0, den_pos, den_neg)
    den_is_zero = den == 0
    d_prime = jnp.where(den_is_zero, 0.0, d / jnp.where(den_is_zero, 1.0, den))

    r2_den = p1 * q1 * p2 * q2
    dp_zero = d_prime == 0
    r_square = jnp.where(
        dp_zero, 0.0, (d * d) / jnp.where(dp_zero, 1.0, r2_den)
    )
    return {
        "r_square": r_square,
        "d_prime": d_prime,
        "p1": (c1 / n),
        "p2": (c2 / n),
    }


def ld_block(g1: jax.Array, g2: jax.Array, n_haplotypes=None):
    """Counts + fast-path epilogue for a block pair.

    ``n_haplotypes`` defaults to the trailing dim; pass the true count when
    the arrays are zero-padded along the haplotype axis (zero padding leaves
    every count unchanged).
    """
    if n_haplotypes is None:
        n_haplotypes = g1.shape[-1]
    c_ab = haplotype_counts(g1, g2)
    c1 = allele_counts(g1)
    c2 = allele_counts(g2)
    return ld_from_counts(c_ab, c1, c2, n_haplotypes)


def round4_f32(x: jax.Array) -> jax.Array:
    """4-decimal rounding for the f32 fast path.

    The reference rounds every emitted value to 4 decimals
    (backend/calc_ld.py:94-97) and applies LD thresholds to the *rounded*
    values (ld_area.py:248).  The fast path mirrors that approximately in
    f32; the exact path (ops/exact.py) reproduces Python's round() bit-for-bit.
    """
    return jnp.round(x * 1e4) / 1e4
