"""Device engine used by the workload tools.

Wraps the count matmuls with shape padding (stable jit cache keys) and
host-blocked streaming so tool code never hands XLA a ragged shape.
Counts come back to the host as exact integers and are finished bit-exactly
in f64 (ops/exact.py); the all-device fused path lives in ops/ld_pallas.py
and ops/ld_math.py and is used by the benchmarks and the array API.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ld_tools_tpu.ops.exact import ExactLD, exact_ld_from_counts
from ld_tools_tpu.ops.ld_math import allele_counts, haplotype_counts_int8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _downcast_counts(c_ab, hap_axis: int):
    """Counts are bounded by the haplotype axis; int16 halves the
    device->host transfer, which dominates tool wall time through an
    RPC-relayed device (1000G scale: counts <= 5,008).  ONE rule shared
    by every count kernel so their transfer dtypes can never drift."""
    return c_ab.astype(jnp.int16) if hap_axis < 32768 else c_ab


@functools.partial(jax.jit, donate_argnums=())
def _counts_kernel(a, b):
    # int8 x int8 -> int32 runs the MXU at 2x the bf16 rate on v5e+ and
    # the {0,1} counts stay exact integers — the same dot the flagship
    # Pallas kernels use (ops/ld_pallas.py), so tool runs see the full
    # int8 MXU rate, not half of it.
    c_ab = _downcast_counts(haplotype_counts_int8(a, b), a.shape[1])
    return c_ab, allele_counts(a), allele_counts(b)


def _pad_rows(x: np.ndarray, rows: int) -> np.ndarray:
    if x.shape[0] == rows:
        return x
    out = np.zeros((rows, x.shape[1]), dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


def _pad_cols(x: np.ndarray, cols: int) -> np.ndarray:
    if x.shape[1] == cols:
        return x
    out = np.zeros((x.shape[0], cols), dtype=x.dtype)
    out[:, : x.shape[1]] = x
    return out


# Below this many MACs the counts run on the HOST (f32 BLAS — exact for
# {0,1} sums under 2^24): a single ld_lite pair or a handful of ld_area
# query rows costs microseconds in numpy but would pay device dispatch
# latency (and, through a remote-compile relay, a minutes-scale one-time
# program compile) on the accelerator.
_HOST_COUNTS_MACS = 1 << 26


def _pair_counts_host(a: np.ndarray, b: np.ndarray):
    af = np.ascontiguousarray(a, dtype=np.float32)
    bf = np.ascontiguousarray(b, dtype=np.float32)
    c_ab = (af @ bf.T).astype(np.int32)
    return c_ab, af.sum(axis=1), bf.sum(axis=1)


def pair_counts(a: np.ndarray, b: np.ndarray, row_pad: int = 128, hap_pad: int = 512):
    """Exact co-occurrence + allele counts for two {0,1} blocks.

    Pads the variant axes to multiples of ``row_pad`` and the haplotype axis
    to ``hap_pad`` (zero padding is count-neutral; the true haplotype count
    travels separately) so repeated tool calls with nearby shapes reuse one
    compiled executable.  Returns numpy (c_ab, c1, c2) trimmed to true shape.

    Tiny jobs (under ``_HOST_COUNTS_MACS`` multiply-accumulates) skip the
    device entirely and run in host BLAS — exact either way.
    """
    return pair_counts_async(a, b, row_pad, hap_pad)()


def pair_counts_async(a: np.ndarray, b: np.ndarray, row_pad: int = 128,
                      hap_pad: int = 512):
    """Issue the device count job for (a, b) WITHOUT blocking.

    Returns a zero-arg ``finalize() -> (c_ab, c1, c2)`` (numpy, trimmed).
    jax dispatch is asynchronous, so a caller can stage block k+1's
    counts before finalizing block k — overlapping the device compute +
    device->host transfer of the next block with host-side work
    (exact f64 finish, cell formatting, file writes) on the current one.
    The streamed 10k-variant triangle TSV path (BASELINE metric #2) is
    the intended user.  Tiny jobs run eagerly on the host like
    ``pair_counts``.
    """
    n_hap = a.shape[1]
    if b.shape[1] != n_hap:
        raise ValueError(
            f"haplotype axes differ: {a.shape[1]} vs {b.shape[1]} — "
            "zero-padding the narrower side would silently corrupt "
            "the counts"
        )
    va, vb = a.shape[0], b.shape[0]
    # host path: f32 BLAS partial sums are exact only below 2^24 — far
    # past any real cohort, but the guard keeps the 'exact either way'
    # contract honest for absurd inputs
    if (va * vb * max(n_hap, 1) < _HOST_COUNTS_MACS
            and n_hap < (1 << 24)):
        out = _pair_counts_host(a, b)
        return lambda: out
    h = _round_up(max(n_hap, 1), hap_pad)
    ap = _pad_cols(_pad_rows(a, _round_up(max(va, 1), row_pad)), h)
    bp = _pad_cols(_pad_rows(b, _round_up(max(vb, 1), row_pad)), h)
    c_ab, c1, c2 = _counts_kernel(jnp.asarray(ap), jnp.asarray(bp))

    def finalize():
        return (
            np.asarray(c_ab)[:va, :vb],
            np.asarray(c1)[:va],
            np.asarray(c2)[:vb],
        )

    return finalize


def exact_pair_ld(a: np.ndarray, b: np.ndarray, n_haplotypes=None) -> ExactLD:
    """Counts on device, bit-exact finish on host."""
    if n_haplotypes is None:
        n_haplotypes = a.shape[1]
    c_ab, c1, c2 = pair_counts(a, b)
    return exact_ld_from_counts(c_ab, c1, c2, n_haplotypes)


def exact_all_pairs(G: np.ndarray, block: int = 4096) -> ExactLD:
    """All-pairs LD for one chromosome set, streamed in device blocks.

    For V <= block this is a single device call; larger V streams block
    pairs (only the lower triangle's blocks are computed; the symmetric
    upper half is mirrored on the host).
    """
    v, h = G.shape
    if v <= block:
        return exact_pair_ld(G, G)
    # Larger V: upload G once (ResidentCounts) and stream row-band x
    # column-prefix blocks with a two-slot pipeline — block k+1's device
    # counts are in flight while block k's result lands in the output
    # matrix.  int32 accumulation: counts are exact and the integer
    # dtype routes the finish through the native one-pass path
    # (ops/exact.py).
    resident = ResidentCounts(G, block_pad=block)
    c_ab = np.empty((v, v), dtype=np.int32)
    starts = list(range(0, v, block))
    pending = None
    for bi, i in enumerate(starts + [None]):
        fin_prev = pending
        if i is not None:
            r1 = min(i + block, v)
            pending = (i, r1, resident.block_async(i, r1, r1))
        if fin_prev is not None:
            p0, p1, fin = fin_prev
            cb, _, _ = fin()
            c_ab[p0:p1, :p1] = cb
            c_ab[:p1, p0:p1] = cb.T  # mirror (diagonal block overlaps)
    c1_full = resident.row_counts[:v].astype(np.float64)
    return exact_ld_from_counts(c_ab, c1_full, c1_full, h)


@dataclasses.dataclass
class MixedExactLD:
    """Exact LD for row sets spanning ploidy groups (chrX/chrY).

    Unlike ExactLD, the alt-allele frequencies are PAIR-dependent
    matrices: the reference divides each variant's alt count by the pair
    walk length ``htypes_quan = min(len1, len2)`` (calc_ld.py:37-44), so
    a PAR variant's reported frequency changes with the opponent's
    region.  ``own_freq1``/``own_freq2`` are the pair-independent
    own-list frequencies (alt count / own list length) the reference
    uses for the ld_area query-annotation row (ld_area.py:188-189).
    """

    r_square: np.ndarray          # (V1, V2) f64
    d_prime: np.ndarray
    p1: np.ndarray                # (V1, V2) pair-dependent alt freqs
    p2: np.ndarray                # (V1, V2)
    d_prime_is_int_zero: np.ndarray
    r_square_is_int_zero: np.ndarray
    own_freq1: np.ndarray         # (V1,)
    own_freq2: np.ndarray         # (V2,)
    _r2_rounded_cache: object = dataclasses.field(
        default=None, init=False, repr=False, compare=False
    )
    _dp_rounded_cache: object = dataclasses.field(
        default=None, init=False, repr=False, compare=False
    )

    def r_square_rounded(self):
        from ld_tools_tpu.ops.exact import _rounded_object_array

        if self._r2_rounded_cache is None:
            self._r2_rounded_cache = _rounded_object_array(
                self.r_square, self.r_square_is_int_zero
            )
        return self._r2_rounded_cache

    def d_prime_rounded(self):
        from ld_tools_tpu.ops.exact import _rounded_object_array

        if self._dp_rounded_cache is None:
            self._dp_rounded_cache = _rounded_object_array(
                self.d_prime, self.d_prime_is_int_zero
            )
        return self._dp_rounded_cache

    def pair(self, i: int, j: int) -> dict:
        """Reference calc_ld dict for pair (i, j), values AND types."""
        from ld_tools_tpu.ops.exact import _rounded_scalar

        return {
            "r_square": _rounded_scalar(
                self.r_square[i, j], self.r_square_is_int_zero[i, j]
            ),
            "d_prime": _rounded_scalar(
                self.d_prime[i, j], self.d_prime_is_int_zero[i, j]
            ),
            "var_1_alt_freq": round(float(self.p1[i, j]), 4),
            "var_2_alt_freq": round(float(self.p2[i, j]), 4),
        }


def mixed_pair_ld_async(chrom_data, cohort_ploidy, rows1, rows2):
    """Dispatch LD for two variant-row sets that may span ploidy groups.

    Rows are partitioned by ploidy-profile id; each (group, group) block
    is one device count matmul over the two profiles' cohort layouts
    truncated to the shorter one (the reference's zip semantics,
    calc_ld.py:30-33), finished bit-exactly with per-side list lengths.
    Returns ``finalize() -> MixedExactLD``; all blocks are dispatched
    before any is awaited, so device compute overlaps host assembly.

    Known cost bound: each call re-extracts and re-uploads its row
    sets, so a streamed caller passing a growing prefix (the mixed
    triangle writers) pays ~n^2/2 bytes cumulative — acceptable at the
    sizes chrX PAR-straddling sets reach in practice; a device-resident
    mixed engine (per-profile ResidentCounts) is the upgrade path if
    that ever changes.
    """
    rows1 = np.asarray(rows1, dtype=np.int64)
    rows2 = np.asarray(rows2, dtype=np.int64)
    g1 = cohort_ploidy.groups_of(rows1)
    g2 = cohort_ploidy.groups_of(rows2)

    def side(rows, groups):
        out = []
        for gid in np.unique(groups):
            idx = np.flatnonzero(groups == gid)
            C = chrom_data.genotype_rows(rows[idx])[
                :, cohort_ploidy.cols_for(gid)
            ]
            out.append((int(gid), idx, C, C.sum(axis=1, dtype=np.int64)))
        return out

    side1 = side(rows1, g1)
    side2 = side(rows2, g2)

    jobs = []
    for gid1, idx1, c_1, full1 in side1:
        n1 = cohort_ploidy.n_alleles(gid1)
        for gid2, idx2, c_2, full2 in side2:
            n2 = cohort_ploidy.n_alleles(gid2)
            m = min(n1, n2)
            fin = pair_counts_async(c_1[:, :m], c_2[:, :m])
            jobs.append((idx1, idx2, full1, full2, n1, n2, m, fin))

    def finalize() -> MixedExactLD:
        from ld_tools_tpu.ops.exact import exact_ld_from_counts

        v1, v2 = rows1.shape[0], rows2.shape[0]
        shape = (v1, v2)
        r2 = np.zeros(shape)
        dp = np.zeros(shape)
        p1 = np.zeros(shape)
        p2 = np.zeros(shape)
        r2_iz = np.zeros(shape, dtype=bool)
        dp_iz = np.zeros(shape, dtype=bool)
        own1 = np.zeros(v1)
        own2 = np.zeros(v2)
        for idx1, idx2, full1, full2, n1, n2, m, fin in jobs:
            c_ab, _, _ = fin()
            ex = exact_ld_from_counts(
                c_ab, full1, full2, m, len1=n1, len2=n2
            )
            at = np.ix_(idx1, idx2)
            r2[at] = ex.r_square
            dp[at] = ex.d_prime
            r2_iz[at] = ex.r_square_is_int_zero
            dp_iz[at] = ex.d_prime_is_int_zero
            p1[at] = np.broadcast_to(ex.p1[:, None], c_ab.shape)
            p2[at] = np.broadcast_to(ex.p2[None, :], c_ab.shape)
            own1[idx1] = full1 / float(n1)
            own2[idx2] = full2 / float(n2)
        return MixedExactLD(
            r_square=r2, d_prime=dp, p1=p1, p2=p2,
            d_prime_is_int_zero=dp_iz, r_square_is_int_zero=r2_iz,
            own_freq1=own1, own_freq2=own2,
        )

    return finalize


def mixed_pair_ld(chrom_data, cohort_ploidy, rows1, rows2) -> MixedExactLD:
    return mixed_pair_ld_async(chrom_data, cohort_ploidy, rows1, rows2)()


@functools.partial(jax.jit, static_argnames=("rows_pad", "cols_pad"))
def _resident_counts_kernel(g, r0, *, rows_pad, cols_pad):
    a = jax.lax.dynamic_slice(g, (r0, 0), (rows_pad, g.shape[1]))
    b = jax.lax.dynamic_slice(g, (0, 0), (cols_pad, g.shape[1]))
    # allele counts are sliced from a host-precomputed vector by the
    # caller — only the count tile crosses the wire
    return _downcast_counts(haplotype_counts_int8(a, b), g.shape[1])


class ResidentCounts:
    """Device-resident G for repeated (row block) x (column prefix) counts.

    The streamed triangle writers used to call
    ``pair_counts_async(G[r0:r1], G[:r1])`` per block — re-uploading the
    ever-growing column prefix every call, ~n^2/2 bytes total through a
    slow host<->device link (166 MB for a 10k matrix).  Here G uploads
    ONCE (padded); each block is two on-device dynamic slices feeding
    the same int8 count kernel.  Block shapes round up to ``block_pad``
    so the handful of (rows_pad, cols_pad) combinations reuse a few
    compiled programs.
    """

    def __init__(self, G: np.ndarray, block_pad: int = 2048,
                 hap_pad: int = 512):
        G = np.ascontiguousarray(G, dtype=np.int8)
        v, h = G.shape
        self._v, self._h = v, h
        self._block_pad = block_pad
        h_p = _round_up(max(h, 1), hap_pad)
        v_p = _round_up(max(v, 1), block_pad)
        gp = np.zeros((v_p, h_p), dtype=np.int8)
        gp[:v, :h] = G
        self._g = jnp.asarray(gp)
        # allele counts once on the host: per-block device reductions
        # (and their D2H transfers) buy nothing over slicing this
        self._c1 = G.astype(np.float32).sum(axis=1)

    @property
    def row_counts(self) -> np.ndarray:
        """(V,) f32 per-variant alt-allele counts."""
        return self._c1

    def block_async(self, r0: int, r1: int, c_hi: int):
        """Dispatch counts for rows [r0, r1) x cols [0, c_hi); returns
        ``finalize() -> (c_ab, c1_rows, c1_cols)`` trimmed numpy.

        ``r0 + rows_pad`` must stay inside the padded matrix (true for
        block_pad-aligned r0): jax's dynamic_slice CLAMPS out-of-range
        starts, which would silently return counts for the wrong rows.
        """
        rows_pad = _round_up(max(r1 - r0, 1), self._block_pad)
        cols_pad = _round_up(max(c_hi, 1), self._block_pad)
        if r0 + rows_pad > self._g.shape[0] or r0 < 0:
            raise ValueError(
                f"rows [{r0}, {r0 + rows_pad}) exceed the padded matrix "
                f"({self._g.shape[0]} rows); r0 must be "
                f"block_pad-aligned ({self._block_pad})"
            )
        if c_hi > self._g.shape[0]:
            raise ValueError("c_hi exceeds the matrix")
        out = _resident_counts_kernel(
            self._g, r0, rows_pad=rows_pad, cols_pad=cols_pad
        )

        def finalize():
            return (
                np.asarray(out)[: r1 - r0, :c_hi],
                self._c1[r0:r1],
                self._c1[:c_hi],
            )

        return finalize
