#!/usr/bin/env python3
"""Kernel-variant sweep for the all-pairs triangle kernel on real TPU.

Explores {packed bit-plane, unpacked int8, bf16} x block sizes x
{r2-only, r2+D'} to find the fastest configuration for the headline
benchmark (bench.py).  Each variant is timed with data-dependent
chaining inside one jitted fori_loop (same honesty rules as bench.py).

Usage: python scripts/bench_kernels.py [--v 10240] [--reps 30]
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
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ld_tools_tpu.ops.ld_pallas import (
        _ld_triangle_call,
        _triangle_coords,
        pack_rows,
    )
    from ld_tools_tpu.utils.profiling import CHIP_PEAKS

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    n_hap = 5008
    v = args.v
    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.05, 0.95, size=(v, 1))
    G = (rng.random((v, n_hap)) < freqs).astype(np.int8)
    pairs = v * (v + 1) / 2
    peak_bf16, _ = CHIP_PEAKS["v5e"]
    peak_int8 = peak_bf16 * 2

    def time_variant(name, mxu_dtype, block, want_dprime):
        if args.only and args.only not in name:
            return
        h_unpacked_pad = -(-n_hap // 1024) * 1024  # 5120
        v_pad = -(-v // block) * block
        if mxu_dtype == "packed":
            Gp = np.zeros((v_pad, h_unpacked_pad), dtype=np.uint8)
            Gp[:v, :n_hap] = G
            g_pad = jnp.asarray(pack_rows(Gp))
        else:
            Gp = np.zeros((v_pad, h_unpacked_pad), dtype=np.int8)
            Gp[:v, :n_hap] = G
            g_pad = jnp.asarray(Gp)
        c1 = jnp.zeros((v_pad, 1), jnp.float32).at[:v].set(
            jnp.asarray(G.astype(np.float32).sum(1, keepdims=True)))
        bi, bj = _triangle_coords(v_pad // block)
        bi, bj = jnp.asarray(bi), jnp.asarray(bj)
        n_arr = jnp.asarray([n_hap], dtype=np.int32)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def tri_loop(g, c1, seed, reps):
            def body(i, acc):
                c1c = c1 + acc * 0.0
                r2, _ = _ld_triangle_call(
                    g, c1c, bi, bj, n_arr,
                    block_m=block, block_n=block, interpret=False,
                    want_dprime=want_dprime, mxu_dtype=mxu_dtype)
                return acc + r2[0, 0]
            return jax.lax.fori_loop(0, reps, body, seed * 0.0)

        reps = args.reps
        try:
            t0 = time.perf_counter()
            tri_loop(g_pad, c1, jnp.float32(0.0), reps).block_until_ready()
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return
        dt = float("inf")
        for trial in range(3):
            seed = jnp.float32(trial + 1.0)
            t0 = time.perf_counter()
            tri_loop(g_pad, c1, seed, reps).block_until_ready()
            dt = min(dt, (time.perf_counter() - t0) / reps)
        tflops = 2 * pairs * h_unpacked_pad / dt / 1e12
        peak = peak_bf16 if mxu_dtype == jnp.bfloat16 else peak_int8
        print(
            f"{name:44s} {dt*1e3:7.2f} ms  {pairs/dt/1e9:7.2f} Gpairs/s  "
            f"{tflops:6.1f} TF/s  {tflops/peak*100:5.1f}% peak  "
            f"(compile {compile_s:.0f}s)",
            flush=True)

    import jax.numpy as jnp  # noqa: F811

    time_variant("packed/1024/r2only", "packed", 1024, False)
    time_variant("packed/512/r2only", "packed", 512, False)
    time_variant("packed/2048/r2only", "packed", 2048, False)
    time_variant("int8/1024/r2only", jnp.int8, 1024, False)
    time_variant("int8/512/r2only", jnp.int8, 512, False)
    time_variant("int8/2048/r2only", jnp.int8, 2048, False)
    time_variant("bf16/1024/r2only", jnp.bfloat16, 1024, False)
    time_variant("packed/1024/r2+dp", "packed", 1024, True)
    time_variant("int8/1024/r2+dp", jnp.int8, 1024, True)


if __name__ == "__main__":
    main()
