#!/usr/bin/env python3
"""Headline benchmark: all-pairs r^2 variant-pairs/sec/chip.

BASELINE.md primary metric: variant-pairs/sec/chip on the ld_triangle
all-pairs r^2 sweep (10k-variant matrix).  The device path is the dense
int8-MXU lower-triangle Pallas kernel with the divide-free r^2 epilogue
(ops/ld_pallas.py), fed from the store's bitpacked matrix via one device
unpack.  This is the same configuration the shipping tools run: ld_scan's
count pass defaults to the dense int8 band kernel with the same fast-r^2
epilogue on TPU (ops/ld_stream.py `resident="auto"`, tools/scan.py
`engine=auto`), and ld_triangle/ld_area produce counts with the identical
int8 MXU dot (ops/engine.py) before the bit-exact host finish.  The
baseline is
the measured throughput of the reference's pure-Python per-pair kernel
(backend/calc_ld.py semantics, reimplemented in tests/oracle.py) on the
same 5,008-haplotype vectors — conservative, since the real reference
also re-fetches genotypes from VCF per pair (ld_triangle.py:158-186).

Timing methodology (the RPC-relayed device memoizes whole executions
with repeated inputs, XLA hoists loop-invariant calls, and first
executions pay a program-load cost proportional to program size — all
three must be defeated):
  - one jitted program runs n sweeps over 4 genuinely-different datasets
    (cycling), with a per-sweep, per-execution input jitter derived from
    a seed argument -> no CSE between sweeps, no relay memoization
    between runs;
  - each compiled program is executed once untimed (program load), then
    timed over 3 executions with distinct seeds (min);
  - per-sweep device time = (T(12 sweeps) - T(4 sweeps)) / 8: dispatch
    and result-transfer overheads cancel in the difference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

N_HAP = 5008
N_SETS = 4
# wide sweep spread: the per-sweep time comes from (T_hi - T_lo) /
# (N_HI - N_LO), and with only 8 sweeps of spread the min-of-trials
# difference under-resolves (~30% error observed through the relay);
# 16 sweeps of spread keeps the noise below the plausibility gate
N_LO, N_HI = 4, 20


def _int8_peak_tflops() -> float:
    from ld_tools_tpu.utils.profiling import CHIP_PEAKS, detect_chip

    bf16_tflops, _, int8_speedup = CHIP_PEAKS[detect_chip()]
    return bf16_tflops * int8_speedup


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_baseline_pairs_per_sec(n_hap: int = N_HAP) -> float:
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


def _time_tpu_sweep(v: int, block: int):
    import jax
    import jax.numpy as jnp

    from ld_tools_tpu.ops.ld_pallas import (
        _ld_triangle_call,
        _triangle_coords,
        pack_rows,
        unpack_rows_device,
    )

    v_pad = -(-v // block) * block
    hp8_pad = 640  # 5,008 haplotypes -> 626 bytes -> 16-aligned 640
    rng = np.random.default_rng(0)
    datasets = []
    for _ in range(N_SETS):
        freqs = rng.uniform(0.05, 0.95, size=(v_pad, 1))
        G = (rng.random((v_pad, N_HAP)) < freqs).astype(np.uint8)
        Gw = np.zeros((v_pad, hp8_pad * 8), dtype=np.uint8)
        Gw[:, :N_HAP] = G
        gp = jnp.asarray(pack_rows(Gw))
        g_dense = unpack_rows_device(gp)  # the production unpack-once path
        c1 = jnp.asarray(Gw.astype(np.float32).sum(1, keepdims=True))
        g_dense.block_until_ready()
        datasets.append((g_dense, c1))
    bi_np, bj_np = _triangle_coords(v_pad // block)
    bi = jnp.asarray(bi_np)
    bj = jnp.asarray(bj_np)
    n_arr = jnp.asarray([N_HAP], dtype=np.int32)
    n_blocks = len(bi_np)

    from ld_tools_tpu.utils.profiling import honest_sweep_seconds

    def many(n):
        def fn(datasets, seed):
            acc = jnp.float32(0.0)
            for i in range(n):
                g, c1 = datasets[i % N_SETS]
                c1j = c1 * (1.0 + seed * np.float32((i + 1) * 1e-7))
                r2, _ = _ld_triangle_call(
                    g, c1j, bi, bj, n_arr,
                    block_m=block, block_n=block, interpret=False,
                    want_dprime=False, mxu_dtype=jnp.int8, epilogue="fast",
                )
                acc = acc + r2[0, 0]
            return acc
        return fn

    # the kernel computes n_blocks full block_x_block tiles; a sweep can
    # never beat this chip's int8 MXU speed of light on that FLOP count
    sweep_flops = 2.0 * n_blocks * block * block * (hp8_pad * 8)
    sol_s = sweep_flops / (_int8_peak_tflops() * 1e12)

    t0 = time.perf_counter()
    n_attempts = 9
    n_samples = 5  # report median + min/max over independent samples
    trials = 3
    dts = []
    for attempt in range(n_attempts):
        # distinct seeds per attempt: a retry must never replay input
        # values the relay may have memoized from the failed measurement
        dt, times = honest_sweep_seconds(
            many, datasets, n_lo=N_LO, n_hi=N_HI, trials=trials,
            seed_base=attempt * trials,
        )
        _log(f"compile+warm+measure: {time.perf_counter() - t0:.1f}s "
             f"[T{N_LO}={times[N_LO]*1e3:.1f}ms "
             f"T{N_HI}={times[N_HI]*1e3:.1f}ms]")
        # a relay hiccup can return a nonsense pair (T_hi < T_lo, or a
        # per-sweep time faster than the MXU's speed of light);
        # remeasure rather than report an impossible rate
        if (dt > 0.95 * sol_s and times[N_HI] > times[N_LO] * 1.05):
            dts.append(dt)
            if len(dts) >= n_samples:
                return dts, n_blocks
        else:
            _log(f"implausible timing (dt={dt*1e3:.2f}ms vs speed-of-light "
                 f"{sol_s*1e3:.2f}ms); remeasuring")
    if dts:  # relay turbulence: report the spread we have, honestly sized
        _log(f"only {len(dts)}/{n_samples} plausible samples")
        return dts, n_blocks
    # never report a rate derived from garbage timings: failing here makes
    # the parent fall back to the (honestly labelled) CPU measurement
    raise RuntimeError(
        f"all {n_attempts} TPU timing attempts implausible (last dt={dt})"
    )


def _run(on_tpu_requested):
    import jax

    backend = jax.default_backend()
    on_tpu = on_tpu_requested and backend not in ("cpu",)
    _log(f"backend: {backend} devices: {jax.devices()}")

    v = 10240 if on_tpu else 1024
    pairs = v * (v + 1) / 2
    h_pad = 5120

    if on_tpu:
        from ld_tools_tpu.utils.profiling import Roofline

        # 640 measured fastest on v5e (34.8 Gpairs/s, ~90% of the int8
        # MXU peak) across the 256/512/640/768/1024 sweep; 576/704 fail
        # Mosaic compilation
        block = int(os.environ.get("TPU_LD_BENCH_BLOCK", "640"))
        dts, n_blocks = _time_tpu_sweep(v, block)
        dts = sorted(dts)
        dt = dts[len(dts) // 2]  # median sample
        # HBM bytes: the stationary a-block is DMA'd once per row run
        # (v/block times — the pipeline skips reloading an unchanged
        # block), the b-block once per grid step, plus one f32 r^2 output
        # tile per step.  Modeling the a-block per-step double-counts
        # ~40% of the traffic and reports >100% of roofline.
        nb = v // block
        bytes_moved = (
            nb * block * h_pad          # a-blocks, int8
            + n_blocks * block * h_pad  # b-blocks, int8
            + n_blocks * block * block * 4  # r^2 output tiles
        )
        from ld_tools_tpu.utils.profiling import detect_chip

        roof = Roofline(
            n_pairs=pairs,
            n_haplotypes_padded=h_pad,
            bytes_moved=bytes_moved,
            chip=detect_chip(),
            int8_mxu=True,
        )
        _log(f"roofline: {roof.achieved(dt)}")
    else:
        import jax.numpy as jnp

        from ld_tools_tpu.ops.ld_math import ld_block

        rng = np.random.default_rng(0)
        freqs = rng.uniform(0.05, 0.95, size=(v, 1))
        G = (rng.random((v, N_HAP)) < freqs).astype(np.int8)
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
    tflops = 2 * pairs * h_pad / dt / 1e12
    _log(
        f"{v} variants x {N_HAP} haplotypes: {dt * 1e3:.2f} ms/sweep, "
        f"{pairs_per_sec / 1e9:.2f} Gpairs/s, ~{tflops:.1f} TFLOP/s effective"
    )

    baseline = measure_baseline_pairs_per_sec(N_HAP)
    _log(f"reference python kernel: {baseline:.0f} pairs/s")

    rec = {
        "metric": "ld_triangle_allpairs_r2_variant_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / baseline, 1),
    }
    if on_tpu and len(dts) > 1:
        # spread over independent plausible samples: value is the MEDIAN
        # rate; min/max bound the relay/thermal run-to-run variance
        # (VERDICT r3: a single best-of measurement quoted a lucky run)
        rec["spread"] = {
            "n_samples": len(dts),
            "gpairs_per_s_median": round(pairs / dt / 1e9, 2),
            "gpairs_per_s_min": round(pairs / max(dts) / 1e9, 2),
            "gpairs_per_s_max": round(pairs / min(dts) / 1e9, 2),
        }
    print(json.dumps(rec))


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
