#!/usr/bin/env python3
"""Headline benchmark: all-pairs r^2 variant-pairs/sec/chip.

BASELINE.md primary metric: variant-pairs/sec/chip on the ld_triangle
all-pairs r^2 sweep (10k-variant matrix).  The device path is the fused
Pallas lower-triangle kernel (ops/ld_pallas.py); the baseline is the
measured throughput of the reference's pure-Python per-pair kernel
(backend/calc_ld.py semantics, reimplemented in tests/oracle.py) on the
same 5,008-haplotype vectors — conservative, since the real reference
also re-fetches genotypes from VCF per pair (ld_triangle.py:158-186).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_baseline_pairs_per_sec(n_hap: int = 5008) -> float:
    """Reference per-pair Python kernel rate on 1000G-scale vectors."""
    sys.path.insert(0, ".")
    from tests.oracle import oracle_ld

    rng = np.random.default_rng(7)
    g1 = list(map(int, (rng.random(n_hap) < 0.4).astype(int)))
    g2 = list(map(int, (rng.random(n_hap) < 0.6).astype(int)))
    n_pairs = 30
    t0 = time.perf_counter()
    for _ in range(n_pairs):
        oracle_ld(g1, g2)
    dt = time.perf_counter() - t0
    return n_pairs / dt


def _run(on_tpu_requested):
    import jax

    backend = jax.default_backend()
    on_tpu = on_tpu_requested and backend not in ("cpu",)
    _log(f"backend: {backend} devices: {jax.devices()}")

    n_hap = 5008
    v = 10240 if on_tpu else 1024
    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.05, 0.95, size=(v, 1))
    G = (rng.random((v, n_hap)) < freqs).astype(np.int8)
    pairs = v * (v + 1) / 2

    if on_tpu:
        import functools

        import jax.numpy as jnp

        from ld_tools_tpu.ops.ld_pallas import (
            _ld_triangle_call,
            _triangle_coords,
            pack_rows,
        )
        from ld_tools_tpu.utils.profiling import Roofline

        # bitpacked inputs (8 haplotypes/byte, the store's disk format)
        # feed int8 bit-plane MXU matmuls: 8x less HBM input traffic and
        # 2x the bf16 MXU rate; block 1024 amortizes the per-step VPU
        # bit-plane unpack of the moving block best on v5e
        block = 1024
        h_pad_b = -(-n_hap // 1024) * 1024  # byte width x8 stays 128-align
        v_pad = -(-v // block) * block
        Gp = np.zeros((v_pad, h_pad_b), dtype=np.uint8)
        Gp[:v, :n_hap] = G
        g_pad = jnp.asarray(pack_rows(Gp))
        c1 = jnp.zeros((v_pad, 1), jnp.float32).at[:v].set(
            jnp.asarray(G.astype(np.float32).sum(1, keepdims=True))
        )
        bi, bj = _triangle_coords(v_pad // block)
        bi, bj = jnp.asarray(bi), jnp.asarray(bj)
        n_arr = jnp.asarray([n_hap], dtype=np.int32)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def tri_loop(g, c1, seed, reps):
            # data-dependent chaining defeats in-program CSE (acc * 0.0
            # is not foldable under float semantics), and the distinct
            # ``seed`` input per timed call defeats whole-execution
            # memoization by any upstream relay: every timed run has
            # fresh input values but identical per-sweep work
            def body(i, acc):
                c1c = c1 + acc * 0.0
                # the headline metric is all-pairs r^2, so D' output
                # (and its HBM writes) is elided
                r2, _ = _ld_triangle_call(
                    g, c1c, bi, bj, n_arr,
                    block_m=block, block_n=block, interpret=False,
                    want_dprime=False, mxu_dtype="packed",
                )
                return acc + r2[0, 0]
            return jax.lax.fori_loop(0, reps, body, seed * 0.0)

        reps = 60
        t0 = time.perf_counter()
        tri_loop(g_pad, c1, jnp.float32(0.0), reps).block_until_ready()
        _log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

        # honest wall clock: time whole fresh-input executions and take
        # the best of 3; at 60 chained sweeps per call the per-call
        # dispatch/RPC overhead is < 1% of the measured device time
        dt = float("inf")
        for trial in range(3):
            seed = jnp.float32(trial + 1.0)
            t0 = time.perf_counter()
            tri_loop(g_pad, c1, seed, reps).block_until_ready()
            dt = min(dt, (time.perf_counter() - t0) / reps)
        n_blocks = len(bi)
        roof = Roofline(
            n_pairs=pairs,
            n_haplotypes_padded=h_pad_b,
            bytes_moved=n_blocks * 2 * block * (h_pad_b // 8)
            + n_blocks * block * block * 4,
            int8_mxu=True,
        )
        _log(f"roofline: {roof.achieved(dt)}")
    else:
        import jax.numpy as jnp

        from ld_tools_tpu.ops.ld_math import ld_block

        fn = jax.jit(lambda g: ld_block(g, g)["r_square"])
        Gj = jnp.asarray(G)
        fn(Gj).block_until_ready()
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(Gj)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps

    pairs_per_sec = pairs / dt
    h_pad = -(-n_hap // 128) * 128
    tflops = 2 * pairs * h_pad / dt / 1e12
    _log(
        f"{v} variants x {n_hap} haplotypes: {dt * 1e3:.1f} ms/sweep, "
        f"{pairs_per_sec / 1e9:.2f} Gpairs/s, ~{tflops:.1f} TFLOP/s effective"
    )

    baseline = measure_baseline_pairs_per_sec(n_hap)
    _log(f"reference python kernel: {baseline:.0f} pairs/s")

    print(
        json.dumps(
            {
                "metric": "ld_triangle_allpairs_r2_variant_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / baseline, 1),
            }
        )
    )


def main():
    # A wedged/restarting TPU worker must not leave the driver without a
    # metric line.  Device-side failures through the RPC relay HANG in
    # native code (uninterruptible by signals), so the TPU attempt runs
    # in a SUBPROCESS under a host-side deadline; on timeout or failure
    # the parent falls back to the CPU backend in-process.
    import os
    import subprocess

    mode = os.environ.get("TPU_LD_BENCH_MODE", "")
    if mode == "tpu-child":
        _run(on_tpu_requested=True)
        return
    if mode == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        _run(on_tpu_requested=False)
        return

    deadline = int(os.environ.get("TPU_LD_BENCH_DEADLINE_S", "1800"))
    env = dict(os.environ, TPU_LD_BENCH_MODE="tpu-child")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, timeout=deadline, capture_output=True, text=True,
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode == 0 and proc.stdout.strip():
            sys.stdout.write(proc.stdout)
            return
        reason = f"exit code {proc.returncode}"
    except subprocess.TimeoutExpired:
        reason = f"deadline {deadline}s exceeded"
    _log(f"TPU bench child failed ({reason}); re-running on CPU backend")
    import jax

    jax.config.update("jax_platforms", "cpu")
    _run(on_tpu_requested=False)


if __name__ == "__main__":
    main()
