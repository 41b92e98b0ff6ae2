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

Both return the full (V, V) r^2 / D' matrices laid out row-sharded
across the mesh; callers needing exact file output pull the count
epilogue through ops/exact.py instead (same decomposition, counts out).

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ld_tools_tpu.ops.ld_math import ld_from_counts


def make_mesh(n_devices=None, axis_name: str = "d") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
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
    """Dense band x block fused counts + epilogue (f32 fast path)."""
    c_ab = jax.lax.dot_general(
        g_rows.astype(jnp.bfloat16),
        g_cols.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = ld_from_counts(c_ab, c1_rows, c1_cols, n_hap)
    return out["r_square"], out["d_prime"]


def all_pairs_replicated(G, n_haplotypes=None, mesh: Mesh = None):
    """Row-band data-parallel all-pairs sweep with replicated G.

    Returns (r2, d_prime) as (V, V) f32 arrays sharded by rows over the
    mesh.  Each band's work is identical (dense bands), so scaling is
    communication-free after the initial broadcast.
    """
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    G = np.asarray(G, dtype=np.int8)
    v, h = G.shape
    if n_haplotypes is None:
        n_haplotypes = h
    v_pad = _round_up(v, d * 8)
    Gp = _pad_rows_np(G, v_pad)
    c1 = Gp.astype(np.int64).sum(axis=1).astype(np.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None), P(None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    def band_step(g_band, c1_band, g_all, c1_all):
        return _band_ld(g_band, g_all, c1_band, c1_all, n_haplotypes)

    r2, dp = jax.jit(band_step)(Gp, c1, Gp, c1)
    return r2[:v, :v], dp[:v, :v]


def all_pairs_ring(G, n_haplotypes=None, mesh: Mesh = None):
    """Ring all-pairs sweep: G sharded by row-bands, column blocks rotate.

    Device k starts holding band k.  At step s it multiplies its own band
    against the block that originated on device (k - s) mod D, then passes
    the block to device k+1 (lax.ppermute).  After D steps every device
    has its full (V/D, V) row-band of the result — the moral analogue of
    ring attention for the O(V^2) pair space (SURVEY.md §2b).
    """
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    G = np.asarray(G, dtype=np.int8)
    v, h = G.shape
    if n_haplotypes is None:
        n_haplotypes = h
    v_pad = _round_up(v, d * 8)
    vb = v_pad // d
    Gp = _pad_rows_np(G, v_pad)
    c1 = Gp.astype(np.int64).sum(axis=1).astype(np.float32)

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
                g_band, buf, c1_band, c1_buf, n_haplotypes
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

    r2, dp = jax.jit(ring_sweep)(Gp, c1)
    return r2[:v, :v], dp[:v, :v]
