"""SPMD all-pairs LD sweeps over jax.sharding meshes.

The reference's entire parallelism story is a process pool over source
files (ld_area.py:336-339 — embarrassingly parallel, no communication).
The TPU-native replacement shards the *variant axis* of one chromosome's
haplotype matrix across a device mesh (SURVEY.md §2b):

- ``all_pairs_replicated``: G replicated on every device; each device
  computes an equal contiguous band of variant rows against all columns.
  Zero communication during compute (the all-gather happens once on
  input); the right default whenever G fits in every chip's HBM
  (chr-scale: 100k x 5008 int8 = 0.5 GB, far under a v5e's HBM).

- ``all_pairs_ring``: G sharded by row-bands; column blocks rotate
  around the ring via ``lax.ppermute`` so no device ever holds more than
  2 bands.  D-1 rotations of (V/D x H) int8 ride the ICI links while the
  current block's matmul runs — the memory-scalable path for
  whole-genome variant sets.

All three return the full (V, V) r^2 / D' matrices laid out row-sharded
across the mesh; callers needing exact file output pull the count
epilogue through ops/exact.py instead (same decomposition, counts out).

The compiled programs are cached per (mesh, geometry, n_haplotypes):
repeated sweeps — chromosome batches, scaling benchmarks — retrace
nothing after the first call.

Multi-host: build the mesh over ``jax.devices()`` after
``jax.distributed.initialize()``; bands then span hosts and the ring
rides ICI within a slice and DCN across slices, with no code changes
here (utils.distributed wraps the initialization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ld_tools_tpu.ops.ld_math import haplotype_counts_int8, ld_from_counts


def make_mesh(n_devices=None, axis_name: str = "d") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # silently truncating would record "N-device" results that
            # actually ran on fewer devices
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} "
                "available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_rows_np(G: np.ndarray, v_pad: int) -> np.ndarray:
    if G.shape[0] == v_pad:
        return np.ascontiguousarray(G)
    out = np.zeros((v_pad, G.shape[1]), dtype=G.dtype)
    out[: G.shape[0]] = G
    return out


def _band_ld(g_rows, g_cols, c1_rows, c1_cols, n_hap):
    """Dense band x block fused counts + epilogue (f32 fast path).

    The count dot is ops/ld_math.haplotype_counts_int8 — ONE kernel
    shared with the production engine, so the sweeps can never drift
    from it.
    """
    c_ab = haplotype_counts_int8(
        g_rows.astype(jnp.int8), g_cols.astype(jnp.int8)
    ).astype(jnp.float32)
    out = ld_from_counts(c_ab, c1_rows, c1_cols, n_hap)
    return out["r_square"], out["d_prime"]


def _prep(G, mesh: Mesh, band_mult: int):
    """Shared sweep prologue: mesh validation + padding + row sums.

    Returns (mesh, axis, d, v, n_hap_default, v_pad, Gp, c1).  Meshes
    must be 1-D: the sweeps shard and ppermute over a single axis, and
    ``mesh.devices.size`` of a multi-axis mesh would silently disagree
    with the sharded axis length.
    """
    if mesh is None:
        mesh = make_mesh()
    if len(mesh.axis_names) != 1:
        raise ValueError(
            f"sweeps need a 1-D mesh; got axes {mesh.axis_names}"
        )
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    G = np.asarray(G, dtype=np.int8)
    v, h = G.shape
    v_pad = _round_up(v, band_mult * d * 8)
    Gp = _pad_rows_np(G, v_pad)
    c1 = Gp.astype(np.int64).sum(axis=1).astype(np.float32)
    return mesh, axis, d, v, h, v_pad, Gp, c1


@functools.lru_cache(maxsize=None)
def _replicated_fn(mesh: Mesh, axis: str, n_hap: int):
    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None), P(None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    def band_step(g_band, c1_band, g_all, c1_all):
        return _band_ld(g_band, g_all, c1_band, c1_all, n_hap)

    return band_step


def all_pairs_replicated(G, n_haplotypes=None, mesh: Mesh = None):
    """Row-band data-parallel all-pairs sweep with replicated G.

    Returns (r2, d_prime) as (V, V) f32 arrays sharded by rows over the
    mesh.  Each band's work is identical (dense bands), so scaling is
    communication-free after the initial broadcast.
    """
    mesh, axis, d, v, h, v_pad, Gp, c1 = _prep(G, mesh, 1)
    if n_haplotypes is None:
        n_haplotypes = h
    r2, dp = _replicated_fn(mesh, axis, int(n_haplotypes))(Gp, c1, Gp, c1)
    return r2[:v, :v], dp[:v, :v]


@functools.lru_cache(maxsize=None)
def _ring_fn(mesh: Mesh, axis: str, d: int, vb: int, v_pad: int,
             n_hap: int):
    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    def ring_sweep(g_band, c1_band):
        my = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % d) for i in range(d)]

        def step(s, carry):
            buf, c1_buf, r2_acc, dp_acc = carry
            src = (my - s) % d
            r2_blk, dp_blk = _band_ld(
                g_band, buf, c1_band, c1_buf, n_hap
            )
            r2_acc = jax.lax.dynamic_update_slice(
                r2_acc, r2_blk, (0, src * vb)
            )
            dp_acc = jax.lax.dynamic_update_slice(
                dp_acc, dp_blk, (0, src * vb)
            )
            buf = jax.lax.ppermute(buf, axis, perm)
            c1_buf = jax.lax.ppermute(c1_buf, axis, perm)
            return buf, c1_buf, r2_acc, dp_acc

        # accumulators are device-varying (each device fills its own band)
        zeros = jax.lax.pcast(
            jnp.zeros((vb, v_pad), dtype=jnp.float32), (axis,), to="varying"
        )
        init = (g_band, c1_band, zeros, zeros)
        _, _, r2_band, dp_band = jax.lax.fori_loop(0, d, step, init)
        return r2_band, dp_band

    return ring_sweep


def all_pairs_ring(G, n_haplotypes=None, mesh: Mesh = None):
    """Ring all-pairs sweep: G sharded by row-bands, column blocks rotate.

    Device k starts holding band k.  At step s it multiplies its own band
    against the block that originated on device (k - s) mod D, then passes
    the block to device k+1 (lax.ppermute).  After D steps every device
    has its full (V/D, V) row-band of the result — the moral analogue of
    ring attention for the O(V^2) pair space (SURVEY.md §2b).
    """
    mesh, axis, d, v, h, v_pad, Gp, c1 = _prep(G, mesh, 1)
    if n_haplotypes is None:
        n_haplotypes = h
    vb = v_pad // d
    r2, dp = _ring_fn(mesh, axis, d, vb, v_pad, int(n_haplotypes))(Gp, c1)
    return r2[:v, :v], dp[:v, :v]


@functools.lru_cache(maxsize=None)
def _trapezoid_fn(mesh: Mesh, axis: str, d: int, vb: int, v_pad: int,
                  n_hap: int):
    def band_block(g_rows, c1_rows, blk, c1_blk, r_band, c_band, acc_r2,
                   acc_dp):
        """Masked band x block product accumulated into the output band."""
        r2_blk, dp_blk = _band_ld(g_rows, blk, c1_rows, c1_blk, n_hap)
        rows_g = r_band * vb + jax.lax.broadcasted_iota(
            jnp.int32, (vb, vb), 0
        )
        cols_g = c_band * vb + jax.lax.broadcasted_iota(
            jnp.int32, (vb, vb), 1
        )
        keep = (cols_g <= rows_g).astype(jnp.float32)
        start = c_band * vb
        acc_r2 = jax.lax.dynamic_update_slice(
            acc_r2, r2_blk * keep, (0, start)
        )
        acc_dp = jax.lax.dynamic_update_slice(
            acc_dp, dp_blk * keep, (0, start)
        )
        return acc_r2, acc_dp

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    def trapezoid_sweep(g_two, c1_two):
        k = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % d) for i in range(d)]
        g_low, g_high = g_two[:vb], g_two[vb:]
        c1_low, c1_high = c1_two[:vb], c1_two[vb:]

        zeros = jax.lax.pcast(
            jnp.zeros((vb, v_pad), dtype=jnp.float32), (axis,), to="varying"
        )

        def step(s, carry):
            buf_a, c1_a, buf_b, c1_b, lo_r2, lo_dp, hi_r2, hi_dp = carry
            src = (k - s) % d          # low-family band index in buf_a
            src_hi = 2 * d - 1 - src   # high-family band index in buf_b

            # low band (index k) needs low blocks with src <= k
            def low_low(args):
                lo_r2, lo_dp = args
                return band_block(
                    g_low, c1_low, buf_a, c1_a, k, src, lo_r2, lo_dp
                )

            lo_r2, lo_dp = jax.lax.cond(
                src <= k, low_low, lambda args: args, (lo_r2, lo_dp)
            )
            # high band (index 2d-1-k) needs every low block
            hi_r2, hi_dp = band_block(
                g_high, c1_high, buf_a, c1_a, 2 * d - 1 - k, src,
                hi_r2, hi_dp,
            )

            # ...and high blocks with src_hi <= 2d-1-k, i.e. src >= k
            def high_high(args):
                hi_r2, hi_dp = args
                return band_block(
                    g_high, c1_high, buf_b, c1_b, 2 * d - 1 - k, src_hi,
                    hi_r2, hi_dp,
                )

            hi_r2, hi_dp = jax.lax.cond(
                src >= k, high_high, lambda args: args, (hi_r2, hi_dp)
            )

            buf_a = jax.lax.ppermute(buf_a, axis, perm)
            c1_a = jax.lax.ppermute(c1_a, axis, perm)
            buf_b = jax.lax.ppermute(buf_b, axis, perm)
            c1_b = jax.lax.ppermute(c1_b, axis, perm)
            return (buf_a, c1_a, buf_b, c1_b, lo_r2, lo_dp, hi_r2, hi_dp)

        init = (g_low, c1_low, g_high, c1_high, zeros, zeros, zeros, zeros)
        _, _, _, _, lo_r2, lo_dp, hi_r2, hi_dp = jax.lax.fori_loop(
            0, d, step, init
        )
        return (
            jnp.concatenate([lo_r2, hi_r2], axis=0),
            jnp.concatenate([lo_dp, hi_dp], axis=0),
        )

    @jax.jit
    def run(g_sh, c1_sh, inv):
        r2_sh, dp_sh = trapezoid_sweep(g_sh, c1_sh)
        # un-permute rows ON DEVICE (XLA inserts the cross-shard gather):
        # pulling the padded square to the host first cost two full host
        # copies per measure and broke the sharded-output API the other
        # sweeps keep
        return (
            jnp.take(r2_sh, inv, axis=0),
            jnp.take(dp_sh, inv, axis=0),
        )

    return run


def all_pairs_trapezoid(G, n_haplotypes=None, mesh: Mesh = None):
    """Triangle-efficient, perfectly balanced ring sweep.

    The classic trapezoid decomposition: split the variant axis into 2D
    bands; device k owns bands k (the "low" band) and 2D-1-k (the "high"
    band), so every device's share of the lower triangle has equal area.
    Two column-block buffers rotate around the ring — one per band family
    — and each device computes only the sub-blocks its triangle needs:
    exactly 3 band-x-block matmuls at step 0 and 2 at every later step,
    on every device (2D+1 total vs 4D for the dense ring — the single
    -chip kernel's ~2x triangle saving, preserved under sharding).

    Returns the full (V, V) r^2/D' with the strict upper triangle zeroed,
    rows in natural order (device-side un-permute).
    """
    mesh, axis, d, v, h, v_pad, Gp, c1 = _prep(G, mesh, 2)
    if n_haplotypes is None:
        n_haplotypes = h
    vb = v_pad // (2 * d)

    # device k's rows: band k then band 2D-1-k, stacked
    order = np.concatenate(
        [np.r_[k * vb : (k + 1) * vb, (2 * d - 1 - k) * vb : (2 * d - k) * vb]
         for k in range(d)]
    )
    inv = np.empty_like(order)
    inv[order] = np.arange(v_pad)
    fn = _trapezoid_fn(mesh, axis, d, vb, v_pad, int(n_haplotypes))
    r2, dp = fn(Gp[order], c1[order], jnp.asarray(inv))
    return r2[:v, :v], dp[:v, :v]
