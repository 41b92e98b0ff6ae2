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


@pytest.mark.parametrize("kernel", ["dense", "bitplane"])
def test_triangle_kernel_bitpacked_mode(rng, kernel):
    """Both bitpacked entries (dense: device-unpack + int8 MXU; bitplane:
    in-kernel bit-plane matmuls) must match the unpacked kernel
    elementwise, including monomorphic sentinel rows and the r2-only
    epilogue specialization."""
    from ld_tools_tpu.ops.ld_pallas import ld_triangle_matrix_packed, pack_rows

    # 150 haplotypes: not a multiple of 8, exercises partial-byte padding
    G = random_haplotypes(rng, 70, 150, maf_low=0.02, maf_high=0.98)
    G[4] = 0
    G[9] = 1
    r2_ref, dp_ref = ld_triangle_matrix(
        G, interpret=True, block_m=128, block_n=128
    )
    gp = pack_rows(G)
    assert gp.shape == (70, (150 + 7) // 8)
    r2_p, dp_p = ld_triangle_matrix_packed(
        gp, 150, interpret=True, block_m=128, block_n=128, kernel=kernel
    )
    r2_only, none_dp = ld_triangle_matrix_packed(
        gp, 150, interpret=True, block_m=128, block_n=128,
        want_dprime=False, kernel=kernel
    )
    assert none_dp is None
    tri = np.tril_indices(70, 0)
    np.testing.assert_array_equal(np.asarray(r2_ref)[tri], np.asarray(r2_p)[tri])
    np.testing.assert_array_equal(np.asarray(dp_ref)[tri], np.asarray(dp_p)[tri])
    np.testing.assert_array_equal(
        np.asarray(r2_ref)[tri], np.asarray(r2_only)[tri]
    )


def test_triangle_kernel_bitpacked_scratch_reuse(rng):
    """Multi-row-block grids revisit the a-block scratch across bi changes;
    a 3x3-block triangle exercises stale/fresh transitions."""
    from ld_tools_tpu.ops.ld_pallas import ld_triangle_matrix_packed, pack_rows

    v, h = 3 * 128, 96
    G = random_haplotypes(rng, v, h, maf_low=0.05, maf_high=0.95)
    r2_ref, _ = ld_triangle_matrix(G, interpret=True, block_m=128, block_n=128)
    r2_p, _ = ld_triangle_matrix_packed(
        pack_rows(G), h, interpret=True, block_m=128, block_n=128,
        kernel="bitplane"
    )
    tri = np.tril_indices(v, 0)
    np.testing.assert_array_equal(np.asarray(r2_ref)[tri], np.asarray(r2_p)[tri])


def test_unpack_rows_device_matches_packbits(rng):
    from ld_tools_tpu.ops.ld_pallas import pack_rows, unpack_rows_device

    G = random_haplotypes(rng, 9, 67, maf_low=0.05, maf_high=0.95)
    gp = pack_rows(G)
    up = np.asarray(unpack_rows_device(gp))
    assert up.shape == (9, ((67 + 7) // 8) * 8)
    np.testing.assert_array_equal(up[:, :67], G)
    assert not up[:, 67:].any()  # padding bits are zero


def test_triangle_kernel_fast_epilogue(rng):
    """The divide-free r^2 epilogue: ~ulp-level agreement with the
    exact-order epilogue, exact zeros for monomorphic rows, and rejection
    of the (unsupported) D' combination."""
    G = random_haplotypes(rng, 60, 140, maf_low=0.02, maf_high=0.98)
    G[7] = 0   # monomorphic ref
    G[11] = 1  # monomorphic alt
    r2_exact, _ = ld_triangle_matrix(
        G, interpret=True, block_m=128, block_n=128, want_dprime=False
    )
    r2_fast, none_dp = ld_triangle_matrix(
        G, interpret=True, block_m=128, block_n=128, want_dprime=False,
        epilogue="fast"
    )
    assert none_dp is None
    tri = np.tril_indices(60, 0)
    a = np.asarray(r2_fast)[tri]
    b = np.asarray(r2_exact)[tri]
    assert np.max(np.abs(a - b)) <= 2e-5
    fast = np.asarray(r2_fast)
    assert not fast[7, :7].any() and not fast[11, :11].any()
    with pytest.raises(ValueError):
        ld_triangle_matrix(G, interpret=True, block_m=128, block_n=128,
                           want_dprime=True, epilogue="fast")


@pytest.mark.parametrize("kernel", ["dense", "bitplane"])
def test_triangle_kernel_packed_fast_epilogue(rng, kernel):
    """The fast epilogue through BOTH bitpacked entries (the bench times
    packed/fast; this pins its numerics): within 2e-5 of the exact-order
    epilogue and exact monomorphic zeros."""
    from ld_tools_tpu.ops.ld_pallas import ld_triangle_matrix_packed, pack_rows

    G = random_haplotypes(rng, 70, 150, maf_low=0.02, maf_high=0.98)
    G[5] = 0
    G[13] = 1
    gp = pack_rows(G)
    r2_exact, _ = ld_triangle_matrix_packed(
        gp, 150, interpret=True, block_m=128, block_n=128,
        want_dprime=False, kernel=kernel,
    )
    r2_fast, none_dp = ld_triangle_matrix_packed(
        gp, 150, interpret=True, block_m=128, block_n=128,
        want_dprime=False, kernel=kernel, epilogue="fast",
    )
    assert none_dp is None
    tri = np.tril_indices(70, 0)
    a = np.asarray(r2_fast)[tri]
    b = np.asarray(r2_exact)[tri]
    assert np.max(np.abs(a - b)) <= 2e-5
    fast = np.asarray(r2_fast)
    assert not fast[5, :5].any() and not fast[13, :13].any()


def test_band_kernel_rejects_non_int8(rng):
    import jax.numpy as jnp

    from ld_tools_tpu.ops.ld_pallas import ld_band_pallas

    G = jnp.asarray(
        random_haplotypes(rng, 256, 128, maf_low=0.2, maf_high=0.8),
        dtype=jnp.float32,
    )
    c1 = G.sum(axis=1, keepdims=True)
    with pytest.raises(TypeError):
        ld_band_pallas(G, G, c1, c1, 128, interpret=True)


def test_triangle_kernel_int8_mode(rng):
    import jax.numpy as jnp

    G = random_haplotypes(rng, 40, 120, maf_low=0.05, maf_high=0.95)
    r2_bf, dp_bf = ld_triangle_matrix(
        G, interpret=True, block_m=128, block_n=128
    )
    r2_i8, dp_i8 = ld_triangle_matrix(
        G, interpret=True, block_m=128, block_n=128, mxu_dtype=jnp.int8
    )
    tri = np.tril_indices(40, 0)
    np.testing.assert_array_equal(
        np.asarray(r2_bf)[tri], np.asarray(r2_i8)[tri]
    )
    np.testing.assert_array_equal(
        np.asarray(dp_bf)[tri], np.asarray(dp_i8)[tri]
    )
