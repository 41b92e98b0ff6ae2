"""Profiling + roofline reporting.

The reference's only instrumentation is a wall-clock print around its
process pool (ld_area.py:337-342).  BASELINE.md asks for measured
%-of-roofline on the haplotype-count matmul, so this module provides:

- ``trace(path)``: context manager around ``jax.profiler`` traces;
- ``Roofline``: analytic model of the sweep (FLOPs, bytes) against peak
  chip numbers, reporting achieved fraction of the compute roofline;
- ``device_seconds``: loop-timing helper that amortizes dispatch/RPC
  overhead by differencing 1-rep and N-rep jitted loops (single wall
  timings through an RPC relay are unreliable — repeated identical
  executions can be memoized upstream).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


# Peak numbers per chip generation: (dense bf16 matmul TFLOP/s, HBM
# GB/s, int8 speedup over bf16).  v5e/v5p/v6e run int8 matmuls at 2x
# the bf16 MXU rate; v4 has NO int8 doubling — a flat 2x would halve
# every v4 roofline fraction and make the bench's speed-of-light
# plausibility gate reject valid measurements.
CHIP_PEAKS = {
    "v5e": (197.0, 819.0, 2.0),
    "v5p": (459.0, 2765.0, 2.0),
    "v4": (275.0, 1228.0, 1.0),
    "v6e": (918.0, 1640.0, 2.0),
}
DEFAULT_CHIP = "v5e"



def detect_chip() -> str:
    """CHIP_PEAKS key for the attached device (DEFAULT_CHIP fallback)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return DEFAULT_CHIP
    if "v6" in kind:
        return "v6e"
    if "v5p" in kind:
        return "v5p"
    if "v5" in kind:  # "TPU v5 lite" == v5e
        return "v5e"
    if "v4" in kind:
        return "v4"
    return DEFAULT_CHIP


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def maybe_trace():
    """Trace to $TPU_LD_PROFILE_DIR when set; no-op otherwise.

    Every tool entry wraps its compute loop in this, giving the
    profiler-hook capability the reference lacks (its instrumentation is
    one wall-clock print, ld_area.py:337-342).
    """
    import os

    log_dir = os.environ.get("TPU_LD_PROFILE_DIR")
    if not log_dir:
        yield
        return
    with trace(log_dir):
        yield


@dataclasses.dataclass
class Roofline:
    """Analytic roofline for an all-pairs LD sweep."""

    n_pairs: float
    n_haplotypes_padded: int
    bytes_moved: float
    chip: str = DEFAULT_CHIP
    int8_mxu: bool = False

    @property
    def flops(self) -> float:
        return 2.0 * self.n_pairs * self.n_haplotypes_padded

    def achieved(self, seconds: float) -> dict:
        peak_tflops, peak_gbps, int8_speedup = CHIP_PEAKS.get(
            self.chip, CHIP_PEAKS[DEFAULT_CHIP]
        )
        if self.int8_mxu:
            peak_tflops *= int8_speedup
        tflops = self.flops / seconds / 1e12
        gbps = self.bytes_moved / seconds / 1e9
        compute_bound_s = self.flops / (peak_tflops * 1e12)
        memory_bound_s = self.bytes_moved / (peak_gbps * 1e9)
        bound = "compute" if compute_bound_s >= memory_bound_s else "memory"
        light = max(compute_bound_s, memory_bound_s)
        return {
            "tflops": tflops,
            "gbps": gbps,
            "fraction_of_compute_peak": tflops / peak_tflops,
            "fraction_of_roofline": light / seconds,
            "bound": bound,
            "speed_of_light_s": light,
        }


def honest_sweep_seconds(make_many, datasets, *, n_lo: int = 4,
                         n_hi: int = 12, trials: int = 3,
                         seed_base: float = 0.0):
    """Per-sweep device time, robust against every relay/XLA shortcut.

    Three effects corrupt naive timings through the RPC-relayed device:
    the relay memoizes whole executions with repeated input values; XLA
    hoists/CSEs loop-invariant or identical calls (it folds float
    ``x * 0.0`` chains, so "data-dependent chaining" via ``acc * 0.0`` is
    NOT safe); and the first execution of a program pays a load cost
    proportional to program size.

    ``make_many(n)`` must return a jittable ``fn(datasets, seed)`` that
    runs n sweeps, cycling over genuinely-different datasets and deriving
    a per-sweep input jitter from ``seed`` (so different seeds give
    different executions and different sweeps never share inputs).  Each
    program is compiled, executed once untimed (program load), then timed
    ``trials`` times with distinct seeds; per-sweep time is
    ``(T(n_hi) - T(n_lo)) / (n_hi - n_lo)`` — constant overheads cancel.
    ``seed_base`` offsets the trial seeds so REPEATED measurements (e.g.
    bench retries) never reuse seed values the relay may have memoized.

    Returns (per_sweep_seconds, {n: best_wall_seconds}).
    """
    import jax.numpy as jnp

    times = {}
    for n in (n_lo, n_hi):
        fn = jax.jit(make_many(n))
        compiled = fn.lower(datasets, jnp.float32(0.0)).compile()
        compiled(datasets, jnp.float32(0.0)).block_until_ready()
        best = float("inf")
        for trial in range(trials):
            seed = jnp.float32(seed_base + trial + 1.0)
            t0 = time.perf_counter()
            compiled(datasets, seed).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    dt = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    if dt <= 0:
        # relay-bandwidth swings or memoized seeds can make the small
        # program time above the big one; a negative per-sweep time must
        # never masquerade as a measurement (callers would print
        # impossible rates) — NaN is unambiguous and fails any
        # plausibility gate
        import warnings

        warnings.warn(
            f"non-positive differenced sweep time ({dt:.3g}s); "
            "measurement rejected — rerun with a fresh seed_base",
            stacklevel=2,
        )
        return float("nan"), times
    return dt, times
