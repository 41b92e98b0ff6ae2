#!/usr/bin/env python3
"""Kernel-variant sweep for the all-pairs triangle kernel on real TPU.

Explores {dense int8, bit-plane packed, bf16} x block sizes x
{fast, exact-order epilogue} x {r2-only, r2+D'} using the honest timing
harness (utils/profiling.honest_sweep_seconds): distinct datasets per
sweep + seed jitter defeat XLA CSE/hoisting and relay memoization; an
untimed first execution absorbs program load; differenced timings cancel
dispatch overhead.

Usage: python scripts/bench_kernels.py [--v 10240] [--only substr]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HAP = 5008
N_SETS = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=10240)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ld_tools_tpu.ops.ld_pallas import (
        _ld_triangle_call,
        _triangle_coords,
        pack_rows,
        unpack_rows_device,
    )
    from ld_tools_tpu.utils.profiling import (
        CHIP_PEAKS,
        honest_sweep_seconds,
    )

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    v = args.v
    pairs = v * (v + 1) / 2
    peak_bf16, _, int8_speedup = CHIP_PEAKS["v5e"]
    peak_int8 = peak_bf16 * int8_speedup
    hp8_pad = 640  # 5,008 haplotypes -> 626 bytes -> 640
    rng = np.random.default_rng(0)

    # one shared pool of packed datasets; per-variant-count padding and
    # dense inflation happen per block size below
    raw = []
    for _ in range(N_SETS):
        freqs = rng.uniform(0.05, 0.95, size=(v, 1))
        raw.append((rng.random((v, N_HAP)) < freqs).astype(np.uint8))

    def datasets_for(block, form):
        v_pad = -(-v // block) * block
        out = []
        for G in raw:
            Gw = np.zeros((v_pad, hp8_pad * 8), dtype=np.uint8)
            Gw[:v, :N_HAP] = G
            gp = jnp.asarray(pack_rows(Gw))
            c1 = jnp.asarray(Gw.astype(np.float32).sum(1, keepdims=True))
            if form == "packed":
                g = gp
            elif form == "dense":
                g = unpack_rows_device(gp)
            else:  # bf16
                g = unpack_rows_device(gp).astype(jnp.bfloat16)
            g.block_until_ready()
            out.append((g, c1))
        return out, v_pad

    def time_variant(name, form, block, epilogue, want_dprime):
        if args.only and args.only not in name:
            return
        datasets, v_pad = datasets_for(block, form)
        bi_np, bj_np = _triangle_coords(v_pad // block)
        bi, bj = jnp.asarray(bi_np), jnp.asarray(bj_np)
        n_arr = jnp.asarray([N_HAP], dtype=np.int32)
        mxu = {"packed": "packed", "dense": jnp.int8,
               "bf16": jnp.bfloat16}[form]

        def many(n):
            def fn(datasets, seed):
                acc = jnp.float32(0.0)
                for i in range(n):
                    g, c1 = datasets[i % N_SETS]
                    c1j = c1 * (1.0 + seed * np.float32((i + 1) * 1e-7))
                    r2, _ = _ld_triangle_call(
                        g, c1j, bi, bj, n_arr,
                        block_m=block, block_n=block, interpret=False,
                        want_dprime=want_dprime, mxu_dtype=mxu,
                        epilogue=epilogue,
                    )
                    acc = acc + r2[0, 0]
                return acc
            return fn

        try:
            t0 = time.perf_counter()
            dt, times = honest_sweep_seconds(many, datasets)
            wall = time.perf_counter() - t0
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:110]}",
                  flush=True)
            return
        tflops = 2 * pairs * (hp8_pad * 8) / dt / 1e12
        peak = peak_bf16 if form == "bf16" else peak_int8
        print(
            f"{name:34s} {dt*1e3:7.2f} ms  {pairs/dt/1e9:7.2f} Gpairs/s  "
            f"{tflops:6.1f} TF/s  {tflops/peak*100:5.1f}% peak  "
            f"(total {wall:.0f}s)",
            flush=True)

    time_variant("dense/512/fast/r2only", "dense", 512, "fast", False)
    time_variant("dense/1024/fast/r2only", "dense", 1024, "fast", False)
    time_variant("dense/512/exact/r2only", "dense", 512, "exact", False)
    time_variant("dense/512/exact/r2+dp", "dense", 512, "exact", True)
    time_variant("packed/1024/exact/r2only", "packed", 1024, "exact", False)
    time_variant("packed/1024/fast/r2only", "packed", 1024, "fast", False)
    time_variant("bf16/512/exact/r2only", "bf16", 512, "exact", False)


if __name__ == "__main__":
    main()
