#!/usr/bin/env python3
"""Decompose the triangle-kernel time: MXU dots vs epilogue flavors.

Same kernel skeleton at each rung, adding one stage at a time (all timed
with utils/profiling.honest_sweep_seconds, so XLA CSE/hoisting, relay
memoization, and program-load cost cannot corrupt the numbers):

  counts : K-chunked int8 dots + f32 store           (MXU + output cost)
  scale  : counts + one broadcast multiply           (+1 VPU op/elem)
  fast   : divide-free r^2 epilogue                  (headline path)
  exact  : exact-order r^2 epilogue (divide+selects) (parity path)

Every row reports effective TFLOP/s on the same MAC count, so the deltas
between rows are the stage costs.

Usage: python scripts/bench_microkernels.py [--v 10240] [--block 512]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HAP = 5008
N_SETS = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=10240)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ld_tools_tpu.ops.ld_pallas import (
        _int8_k_chunk,
        _ld_epilogue,
        _triangle_coords,
    )
    from ld_tools_tpu.utils.profiling import honest_sweep_seconds

    print(f"backend={jax.default_backend()}", file=sys.stderr)

    v = args.v
    block = args.block
    v_pad = -(-v // block) * block
    ktot = 5120
    pairs = v * (v + 1) / 2
    rng = np.random.default_rng(0)
    datasets = []
    for _ in range(N_SETS):
        G = np.zeros((v_pad, ktot), np.int8)
        G[:v, :N_HAP] = (
            rng.random((v, N_HAP)) < rng.uniform(0.05, 0.95, (v, 1))
        )
        g = jnp.asarray(G)
        c1 = jnp.asarray(G.astype(np.float32).sum(1, keepdims=True))
        g.block_until_ready()
        datasets.append((g, c1))
    bi_np, bj_np = _triangle_coords(v_pad // block)
    bi, bj = jnp.asarray(bi_np), jnp.asarray(bj_np)
    n_blocks = len(bi_np)

    def make_call(stage):
        k_chunk = _int8_k_chunk(block, ktot,
                                heavy_epilogue=stage == "exact")

        def kernel(bi_ref, bj_ref, a_ref, b_ref, c1_ref, c2_ref,
                   ipq1_ref, ipq2_ref, out_ref):
            c_ab = None
            for lo in range(0, ktot, k_chunk):
                sl = slice(lo, min(lo + k_chunk, ktot))
                part = jax.lax.dot_general(
                    a_ref[:, sl], b_ref[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                c_ab = part if c_ab is None else c_ab + part
            cf = c_ab.astype(jnp.float32)
            inv_n = 1.0 / np.float32(N_HAP)
            if stage == "counts":
                out_ref[:] = cf
            elif stage == "scale":
                out_ref[:] = cf * c1_ref[:]
            elif stage == "fast":
                p1 = c1_ref[:] * inv_n
                p2 = c2_ref[:].T * inv_n
                d = cf * inv_n - p1 * p2
                out_ref[:] = (d * d) * (ipq1_ref[:] * ipq2_ref[:].T)
            else:  # exact
                r2, _ = _ld_epilogue(cf, c1_ref[:], c2_ref[:].T, inv_n,
                                     np.float32(N_HAP), want_dprime=False)
                out_ref[:] = r2

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((block, ktot), lambda k, bi, bj: (bi[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, ktot), lambda k, bi, bj: (bj[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda k, bi, bj: (bi[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda k, bi, bj: (bj[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda k, bi, bj: (bi[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda k, bi, bj: (bj[k], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block, block), lambda k, bi, bj: (bi[k], bj[k]),
                memory_space=pltpu.VMEM),
        )

        def call(g, c1, ipq):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((v_pad, v_pad), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024),
            )(bi, bj, g, g, c1, c1, ipq, ipq)

        return call

    for stage in ("counts", "scale", "fast", "exact"):
        if args.only and args.only not in stage:
            continue
        call = make_call(stage)

        def many(n, call=call):
            def fn(datasets, seed):
                acc = jnp.float32(0.0)
                for i in range(n):
                    g, c1 = datasets[i % N_SETS]
                    c1j = c1 * (1.0 + seed * np.float32((i + 1) * 1e-7))
                    nf = np.float32(N_HAP)
                    p = c1j / nf
                    pq = p * (1.0 - p)
                    ipq = jnp.where(pq == 0, 0.0,
                                    1.0 / jnp.where(pq == 0, 1.0, pq))
                    out = call(g, c1j, ipq)
                    acc = acc + out[0, 0]
                return acc
            return fn

        try:
            dt, _ = honest_sweep_seconds(many, datasets)
        except Exception as e:
            print(f"{stage:8s} FAILED {type(e).__name__}: {str(e)[:110]}",
                  flush=True)
            continue
        tf = 2 * pairs * ktot / dt / 1e12
        print(f"{stage:8s} {dt*1e3:7.2f} ms  {pairs/dt/1e9:7.2f} Gpairs/s  "
              f"{tf:6.1f} TF/s  {tf/394*100:5.1f}% int8 peak", flush=True)


if __name__ == "__main__":
    main()
