"""Pallas fused kernel parity (interpret mode on the CPU backend)."""

import numpy as np
import pytest

from ld_tools_tpu.ops.ld_pallas import ld_triangle_matrix

from .conftest import random_haplotypes
from .oracle import oracle_ld


@pytest.mark.parametrize("v,h", [(20, 100), (130, 150)])
def test_triangle_kernel_matches_oracle(rng, v, h):
    G = random_haplotypes(rng, v, h, maf_low=0.05, maf_high=0.95)
    r2, dp = ld_triangle_matrix(G, interpret=True, block_m=128, block_n=128)
    r2 = np.asarray(r2)
    dp = np.asarray(dp)
    idx = rng.choice(v, size=min(12, v), replace=False)
    for i in idx:
        for j in idx:
            if j > i:
                continue
            want = oracle_ld(list(G[i]), list(G[j]))
            assert abs(round(float(r2[i, j]), 4) - want["r_square"]) <= 1e-4
            assert abs(round(float(dp[i, j]), 4) - want["d_prime"]) <= 1e-4


def test_triangle_kernel_monomorphic_padding(rng):
    # padding rows are all-zero (monomorphic) and must not poison real cells
    G = random_haplotypes(rng, 5, 64, maf_low=0.2, maf_high=0.8)
    r2, dp = ld_triangle_matrix(G, interpret=True, block_m=128, block_n=128)
    assert np.all(np.isfinite(np.asarray(r2)))
    assert np.all(np.isfinite(np.asarray(dp)))
    assert round(float(np.asarray(r2)[3, 1]), 4) == oracle_ld(
        list(G[3]), list(G[1])
    )["r_square"] or abs(
        round(float(np.asarray(r2)[3, 1]), 4)
        - oracle_ld(list(G[3]), list(G[1]))["r_square"]
    ) <= 1e-4
