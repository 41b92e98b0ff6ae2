"""Roofline math + chip detection (utils/profiling.py).

The bench plausibility gates (`bench.py` speed-of-light rejection,
`scripts/tpu_smoke.py`) lean on these numbers; a wrong int8 speedup or
a broken fraction formula silently distorts every reported roofline.
"""

import numpy as np

from ld_tools_tpu.utils.profiling import (
    CHIP_PEAKS,
    DEFAULT_CHIP,
    Roofline,
    detect_chip,
)


def test_detect_chip_falls_back_on_cpu():
    # tests run on the CPU backend: device_kind is not a TPU name
    assert detect_chip() in CHIP_PEAKS
    assert DEFAULT_CHIP in CHIP_PEAKS


def test_roofline_compute_bound_fractions():
    # 1e12 FLOPs, tiny byte traffic -> compute bound on every chip
    r = Roofline(n_pairs=1e9, n_haplotypes_padded=500, bytes_moved=1e6,
                 chip="v5e", int8_mxu=True)
    peak_tflops = CHIP_PEAKS["v5e"][0] * CHIP_PEAKS["v5e"][2]
    sol = r.flops / (peak_tflops * 1e12)
    out = r.achieved(seconds=2 * sol)  # running at exactly half of peak
    assert out["bound"] == "compute"
    assert abs(out["fraction_of_roofline"] - 0.5) < 1e-9
    assert abs(out["fraction_of_compute_peak"] - 0.5) < 1e-9
    assert abs(out["speed_of_light_s"] - sol) < 1e-12


def test_roofline_memory_bound():
    # huge byte traffic, tiny FLOPs -> memory bound; fraction uses the
    # memory light cone
    r = Roofline(n_pairs=1.0, n_haplotypes_padded=2, bytes_moved=819e9,
                 chip="v5e")
    out = r.achieved(seconds=2.0)  # light cone = 1.0 s at 819 GB/s
    assert out["bound"] == "memory"
    assert abs(out["speed_of_light_s"] - 1.0) < 1e-9
    assert abs(out["fraction_of_roofline"] - 0.5) < 1e-9


def test_v4_has_no_int8_speedup():
    # a flat 2x here would halve v4 roofline fractions and make the
    # bench's speed-of-light gate reject valid measurements
    assert CHIP_PEAKS["v4"][2] == 1.0
    r8 = Roofline(n_pairs=1e9, n_haplotypes_padded=500, bytes_moved=1.0,
                  chip="v4", int8_mxu=True)
    r16 = Roofline(n_pairs=1e9, n_haplotypes_padded=500, bytes_moved=1.0,
                   chip="v4", int8_mxu=False)
    assert np.isclose(r8.achieved(1.0)["speed_of_light_s"],
                      r16.achieved(1.0)["speed_of_light_s"])
