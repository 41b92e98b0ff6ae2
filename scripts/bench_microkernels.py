#!/usr/bin/env python3
"""Decompose the triangle-kernel time: MXU vs epilogue vs outputs.

Measures, on the real chip, with identical chained-loop timing:
  1. xla_dot_int8   — plain XLA G @ G.T (full square) int8->int32
  2. xla_dot_bf16   — same in bf16->f32
  3. tri_counts_int8 — pallas triangle kernel, NO epilogue (raw counts out)
  4. tri_full_int8   — pallas triangle kernel, r2 epilogue (current path)
  5. tri_counts_packed / tri_full_packed — same for the bitpacked kernel

Each prints effective TFLOP/s computed on the SAME mac count
(2 * blocks * bm * bn * H) so rows are directly comparable.
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=10240)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ld_tools_tpu.ops.ld_pallas import (
        _ld_epilogue,
        _triangle_coords,
        pack_rows,
    )

    print(f"backend={jax.default_backend()}", file=sys.stderr)

    n_hap = 5008
    h_pad = 5120
    v = args.v
    block = args.block
    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.05, 0.95, size=(v, 1))
    G = (rng.random((v, n_hap)) < freqs).astype(np.int8)
    Gf = np.zeros((v, h_pad), np.int8)
    Gf[:, :n_hap] = G
    g_int8 = jnp.asarray(Gf)
    g_packed = jnp.asarray(pack_rows(Gf.astype(np.uint8)))
    c1 = jnp.asarray(G.astype(np.float32).sum(1, keepdims=True))
    bi_np, bj_np = _triangle_coords(v // block)
    bi, bj = jnp.asarray(bi_np), jnp.asarray(bj_np)
    n_blocks = len(bi_np)
    tri_macs = n_blocks * block * block * h_pad
    sq_macs = v * v * h_pad

    def timed(name, fn, *inputs, macs):
        if args.only and args.only not in name:
            return
        @functools.partial(jax.jit, static_argnames=("reps",))
        def loop(seed, reps, *ins):
            def body(i, acc):
                out = fn(acc, *ins)
                return acc + out
            return jax.lax.fori_loop(0, reps, body, seed * 0.0)

        try:
            t0 = time.perf_counter()
            loop(jnp.float32(0.0), args.reps, *inputs).block_until_ready()
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            return
        dt = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            loop(jnp.float32(trial + 1.0), args.reps, *inputs).block_until_ready()
            dt = min(dt, (time.perf_counter() - t0) / args.reps)
        print(f"{name:24s} {dt*1e3:7.2f} ms  {2*macs/dt/1e12:6.1f} TF/s"
              f"  (compile {compile_s:.0f}s)", flush=True)

    # --- 1/2: plain XLA dots (full square; c_ab only) ---
    def xla_dot(acc, g):
        gg = g + acc.astype(g.dtype) * 0
        c = jax.lax.dot_general(
            gg, gg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if g.dtype == jnp.int8
            else jnp.float32)
        return c[0, 0].astype(jnp.float32)

    timed("xla_dot_int8", xla_dot, g_int8, macs=sq_macs)
    timed("xla_dot_bf16", xla_dot,
          jnp.asarray(Gf, jnp.bfloat16), macs=sq_macs)

    # --- pallas triangle kernels with switchable epilogue ---
    def make_tri(mode, epi):
        packed = mode == "packed"
        hp = g_packed.shape[1] if packed else h_pad

        def kernel(bi_ref, bj_ref, a_ref, b_ref, c1_ref, c2_ref, out_ref,
                   *scratch):
            if packed:
                (planes,) = scratch
                k = pl.program_id(0)
                prev = jnp.maximum(k - 1, 0)
                stale = jnp.logical_or(k == 0, bi_ref[k] != bi_ref[prev])

                @pl.when(stale)
                def _():
                    a = a_ref[:].astype(jnp.int32)
                    for s in range(8):
                        planes[:, s * hp:(s + 1) * hp] = (
                            (a >> s) & 1).astype(jnp.int8)

                b = b_ref[:].astype(jnp.int32)
                c_ab = None
                for s in range(8):
                    bb = ((b >> s) & 1).astype(jnp.int8)
                    part = jax.lax.dot_general(
                        planes[:, s * hp:(s + 1) * hp], bb,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    c_ab = part if c_ab is None else c_ab + part
            else:
                c_ab = jax.lax.dot_general(
                    a_ref[:], b_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
            if epi:
                r2, _ = _ld_epilogue(
                    c_ab.astype(jnp.float32), c1_ref[:], c2_ref[:].T,
                    1.0 / np.float32(n_hap), np.float32(n_hap),
                    want_dprime=False)
                out_ref[:] = r2
            else:
                out_ref[:] = c_ab.astype(jnp.float32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            scratch_shapes=(
                [pltpu.VMEM((block, 8 * hp), jnp.int8)] if packed else []),
            in_specs=[
                pl.BlockSpec((block, hp), lambda k, bi, bj: (bi[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, hp), lambda k, bi, bj: (bj[k], 0),
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

        def call(acc, g, c1v):
            c1c = c1v + acc * 0.0
            out = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((v, v), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(bi, bj, g, g, c1c, c1c)
            return out[0, 0]

        return call

    timed("tri_counts_int8", make_tri("int8", False), g_int8, c1,
          macs=tri_macs)
    timed("tri_full_int8", make_tri("int8", True), g_int8, c1,
          macs=tri_macs)
    timed("tri_counts_packed", make_tri("packed", False), g_packed, c1,
          macs=tri_macs)
    timed("tri_full_packed", make_tri("packed", True), g_packed, c1,
          macs=tri_macs)


if __name__ == "__main__":
    main()
