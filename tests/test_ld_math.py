"""Parity of the device LD math against the pure-Python oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from ld_tools_tpu.ops import (
    ld_block,
    haplotype_counts,
    allele_counts,
    exact_ld_from_counts,
)
from ld_tools_tpu.ops.ld_math import round4_f32

from .conftest import random_haplotypes
from .oracle import oracle_ld


def _oracle_matrix(G1, G2):
    r2 = np.zeros((G1.shape[0], G2.shape[0]))
    dp = np.zeros_like(r2)
    for i in range(G1.shape[0]):
        for j in range(G2.shape[0]):
            res = oracle_ld(list(G1[i]), list(G2[j]))
            r2[i, j] = res["r_square"]
            dp[i, j] = res["d_prime"]
    return r2, dp


def test_counts_exact(rng):
    G = random_haplotypes(rng, 40, 101)
    c = np.asarray(haplotype_counts(jnp.array(G), jnp.array(G)))
    expected = (G.astype(np.int64) @ G.T.astype(np.int64)).astype(np.float64)
    np.testing.assert_array_equal(c, expected)
    c1 = np.asarray(allele_counts(jnp.array(G)))
    np.testing.assert_array_equal(c1, G.sum(axis=1))


def test_counts_exact_large_haplotype_axis(rng):
    # 5008 haplotypes (1000G scale): accumulation must stay exact.
    G = random_haplotypes(rng, 8, 5008, maf_low=0.3, maf_high=0.9)
    c = np.asarray(haplotype_counts(jnp.array(G), jnp.array(G)))
    expected = (G.astype(np.int64) @ G.T.astype(np.int64)).astype(np.float64)
    np.testing.assert_array_equal(c, expected)


def test_fast_path_matches_oracle_within_tolerance(rng):
    G = random_haplotypes(rng, 30, 200, maf_low=0.05, maf_high=0.95)
    out = ld_block(jnp.array(G), jnp.array(G))
    r2 = np.asarray(round4_f32(out["r_square"]))
    dp = np.asarray(round4_f32(out["d_prime"]))
    oracle_r2, oracle_dp = _oracle_matrix(G, G)
    np.testing.assert_allclose(r2, oracle_r2, atol=2e-4)
    np.testing.assert_allclose(dp, oracle_dp, atol=2e-4)


def test_exact_path_bit_matches_oracle(rng):
    G = random_haplotypes(rng, 50, 214, maf_low=0.0, maf_high=1.0)
    c_ab = G.astype(np.int64) @ G.T.astype(np.int64)
    c1 = G.sum(axis=1)
    exact = exact_ld_from_counts(c_ab, c1, c1, G.shape[1])
    r2 = exact.r_square_rounded()
    dp = exact.d_prime_rounded()
    for i in range(G.shape[0]):
        for j in range(G.shape[0]):
            res = oracle_ld(list(G[i]), list(G[j]))
            assert r2[i, j] == res["r_square"], (i, j)
            assert type(r2[i, j]) is type(res["r_square"]), (i, j)
            assert dp[i, j] == res["d_prime"], (i, j)
            assert type(dp[i, j]) is type(res["d_prime"]), (i, j)
            pair = exact.pair(i, j)
            assert pair == res
            assert type(pair["r_square"]) is type(res["r_square"])
            assert type(pair["d_prime"]) is type(res["d_prime"])


def test_monomorphic_conventions():
    # all-ref and all-alt variants: D' and r^2 are the int 0 sentinel.
    n = 64
    mono_ref = np.zeros((1, n), dtype=np.int8)
    mono_alt = np.ones((1, n), dtype=np.int8)
    poly = np.array([[1, 0] * (n // 2)], dtype=np.int8)
    for mono in (mono_ref, mono_alt):
        res = oracle_ld(list(mono[0]), list(poly[0]))
        assert res["r_square"] == 0 and type(res["r_square"]) is int
        assert res["d_prime"] == 0 and type(res["d_prime"]) is int
        c_ab = mono.astype(np.int64) @ poly.T.astype(np.int64)
        exact = exact_ld_from_counts(
            c_ab, mono.sum(axis=1), poly.sum(axis=1), n
        )
        assert exact.pair(0, 0) == res


def test_self_pair_is_perfect_ld(rng):
    G = random_haplotypes(rng, 10, 128, maf_low=0.2, maf_high=0.8)
    c_ab = G.astype(np.int64) @ G.T.astype(np.int64)
    c1 = G.sum(axis=1)
    exact = exact_ld_from_counts(c_ab, c1, c1, G.shape[1])
    for i in range(G.shape[0]):
        pair = exact.pair(i, i)
        assert pair["r_square"] == 1.0
        assert pair["d_prime"] == 1.0


def test_symmetry(rng):
    G = random_haplotypes(rng, 20, 150)
    c_ab = G.astype(np.int64) @ G.T.astype(np.int64)
    c1 = G.sum(axis=1)
    exact = exact_ld_from_counts(c_ab, c1, c1, G.shape[1])
    r2 = exact.r_square_rounded()
    dp = exact.d_prime_rounded()
    np.testing.assert_array_equal(r2, r2.T)
    np.testing.assert_array_equal(dp, dp.T)


def test_zero_padding_haplotype_axis_is_neutral(rng):
    G = random_haplotypes(rng, 12, 100)
    pad = np.zeros((12, 28), dtype=np.int8)
    Gp = np.concatenate([G, pad], axis=1)
    out = ld_block(jnp.array(G), jnp.array(G))
    out_p = ld_block(jnp.array(Gp), jnp.array(Gp), n_haplotypes=100)
    np.testing.assert_array_equal(
        np.asarray(out["r_square"]), np.asarray(out_p["r_square"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["d_prime"]), np.asarray(out_p["d_prime"])
    )


def test_dprime_range(rng):
    G = random_haplotypes(rng, 40, 128)
    c_ab = G.astype(np.int64) @ G.T.astype(np.int64)
    c1 = G.sum(axis=1)
    exact = exact_ld_from_counts(c_ab, c1, c1, G.shape[1])
    assert np.all(exact.d_prime <= 1.0 + 1e-12)
    assert np.all(exact.d_prime >= -1.0 - 1e-12)
    assert np.all(exact.r_square <= 1.0 + 1e-12)
    assert np.all(exact.r_square >= 0.0)


def test_round4_matches_python_round(rng):
    vals = rng.random(20000) * 2 - 0.5
    # Include exact decimal ties and tricky binary representations.
    tricky = np.array(
        [0.00005, 0.00015, 2.675, 0.123450000001, 0.12345, 1.0, 0.0,
         0.99995, -0.00005, 0.82365, 0.5, 1e-9]
    )
    from ld_tools_tpu.ops import round4

    for arr in (vals, tricky):
        got = round4(arr)
        want = np.array([round(float(v), 4) for v in arr])
        np.testing.assert_array_equal(got, want)


def test_exact_all_pairs_blocked_path(rng):
    from ld_tools_tpu.ops.engine import exact_all_pairs

    G = random_haplotypes(rng, 70, 64, maf_low=0.1, maf_high=0.9)
    whole = exact_all_pairs(G)  # single-call path
    blocked = exact_all_pairs(G, block=32)  # host-blocked streaming path
    np.testing.assert_array_equal(whole.r_square, blocked.r_square)
    np.testing.assert_array_equal(whole.d_prime, blocked.d_prime)
    np.testing.assert_array_equal(
        whole.d_prime_is_int_zero, blocked.d_prime_is_int_zero
    )


def test_exact_fuzz_many_configs(rng):
    """Randomized sweep: exact path vs oracle across shapes, frequencies,
    and odd haplotype counts (including monomorphic-heavy regimes)."""
    from ld_tools_tpu.ops import exact_ld_from_counts

    for _ in range(25):
        v = int(rng.integers(2, 12))
        h = int(rng.integers(2, 400))
        lo = float(rng.uniform(0, 0.5))
        hi = float(rng.uniform(lo, 1.0))
        G = random_haplotypes(rng, v, h, maf_low=lo, maf_high=hi)
        c_ab = G.astype(np.int64) @ G.T.astype(np.int64)
        c1 = G.sum(axis=1)
        exact = exact_ld_from_counts(c_ab, c1, c1, h)
        i = int(rng.integers(v))
        j = int(rng.integers(v))
        assert exact.pair(i, j) == oracle_ld(list(G[i]), list(G[j])), (
            v, h, i, j,
        )


def test_exact_mixed_length_lists_match_oracle(rng):
    """Mixed-ploidy cross-group semantics: the two genotype lists differ
    in length (chrX PAR x non-PAR in the reference, ld_area.py:230-235);
    the pair walk truncates to the shorter list while each side's ref
    counts run over its own full list (calc_ld.py:30-44)."""
    for _ in range(20):
        len1 = int(rng.integers(3, 120))
        len2 = int(rng.integers(3, 120))
        m = min(len1, len2)
        g1 = random_haplotypes(rng, 4, len1, maf_low=0.0, maf_high=1.0)
        g2 = random_haplotypes(rng, 5, len2, maf_low=0.0, maf_high=1.0)
        c_ab = g1[:, :m].astype(np.int64) @ g2[:, :m].T.astype(np.int64)
        exact = exact_ld_from_counts(
            c_ab, g1.sum(axis=1), g2.sum(axis=1), m, len1=len1, len2=len2
        )
        for i in range(4):
            for j in range(5):
                res = oracle_ld(list(g1[i]), list(g2[j]))
                pair = exact.pair(i, j)
                assert pair == res, (len1, len2, i, j)
                assert type(pair["r_square"]) is type(res["r_square"])
                assert type(pair["d_prime"]) is type(res["d_prime"])


def test_exact_mixed_length_elementwise_matches_oracle(rng):
    from ld_tools_tpu.ops.exact import exact_ld_elementwise

    len1, len2 = 90, 61
    m = min(len1, len2)
    g1 = random_haplotypes(rng, 16, len1, maf_low=0.0, maf_high=1.0)
    g2 = random_haplotypes(rng, 16, len2, maf_low=0.0, maf_high=1.0)
    c_ab = (g1[:, :m] * g2[:, :m]).sum(axis=1)
    exact = exact_ld_elementwise(
        c_ab, g1.sum(axis=1), g2.sum(axis=1), m, len1=len1, len2=len2
    )
    r2 = exact.r_square_rounded()
    dp = exact.d_prime_rounded()
    for k in range(16):
        res = oracle_ld(list(g1[k]), list(g2[k]))
        assert r2[k] == res["r_square"]
        assert dp[k] == res["d_prime"]


def test_resident_counts_matches_pair_counts(rng):
    """Device-resident block counts (upload-once, slice-on-device) must
    equal pair_counts on the same slices."""
    from ld_tools_tpu.ops.engine import ResidentCounts, pair_counts

    G = random_haplotypes(rng, 300, 130, maf_low=0.0, maf_high=1.0)
    res = ResidentCounts(G, block_pad=128)
    for r0, r1 in ((0, 128), (128, 256), (256, 300)):
        c_ab, c1r, c1c = res.block_async(r0, r1, r1)()
        ref_ab, ref1, ref2 = pair_counts(G[r0:r1], G[:r1])
        np.testing.assert_array_equal(
            c_ab.astype(np.int64), ref_ab.astype(np.int64)
        )
        np.testing.assert_array_equal(c1r, ref1)
        np.testing.assert_array_equal(c1c, ref2)


@pytest.mark.parametrize("measure", ["r_square", "d_prime"])
def test_measure_rounded_block_parity(rng, measure):
    """The one-pass measure-only finish (native ef_finish_block_measure or
    numpy fallback) must be bit-identical to the full finish + round4,
    including int-0 sentinels and near-decimal-tie cells."""
    from ld_tools_tpu.ops.exact import (
        exact_ld_from_counts,
        measure_rounded_block,
        round4,
    )

    h = 200
    G = random_haplotypes(rng, 90, h, maf_low=0.0, maf_high=1.0)
    G[0] = 0
    G[1] = 1
    c_ab = (G.astype(np.int64) @ G.T.astype(np.int64)).astype(np.int32)
    c1 = G.sum(axis=1).astype(np.float64)
    # small counts with h=200 produce plenty of 4-dp-tie-adjacent values
    ex = exact_ld_from_counts(c_ab, c1, c1, h)
    vals = ex.r_square if measure == "r_square" else ex.d_prime
    iz = (
        ex.r_square_is_int_zero
        if measure == "r_square"
        else ex.d_prime_is_int_zero
    )
    want = round4(vals)
    want[iz] = 0.0
    got, got_iz = measure_rounded_block(c_ab, c1, c1, h, measure)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_iz, np.asarray(iz))


def test_measure_rounded_block_fallback_matches_native(rng, monkeypatch):
    from ld_tools_tpu.ops import exact as mod

    h = 128
    G = random_haplotypes(rng, 80, h, maf_low=0.0, maf_high=1.0)
    c_ab = (G.astype(np.int64) @ G.T.astype(np.int64)).astype(np.int32)
    c1 = G.sum(axis=1).astype(np.float64)
    native = mod.measure_rounded_block(c_ab, c1, c1, h, "r_square")
    monkeypatch.setattr(mod, "_native_ok", False)
    fallback = mod.measure_rounded_block(c_ab, c1, c1, h, "r_square")
    np.testing.assert_array_equal(native[0], fallback[0])
    np.testing.assert_array_equal(native[1], fallback[1])


def test_measures_rounded_block_both_parity(rng):
    """The fused both-measures native pass must bit-match two
    single-measure passes (sentinel-heavy fixture: monomorphic rows +
    correlated blocks exercise int-0 and tie paths)."""
    from ld_tools_tpu.ops.exact import (
        measure_rounded_block,
        measures_rounded_block_both,
    )

    v, h = 96, 64
    G = (rng.random((v, h)) < rng.uniform(0.02, 0.98, (v, 1))).astype(
        np.int8
    )
    G[3] = 0
    G[7] = 1
    c_ab = (G.astype(np.int64) @ G.T).astype(np.int32)
    c1 = G.sum(axis=1).astype(np.float64)
    r2r, r2iz, dpr, dpiz = measures_rounded_block_both(c_ab, c1, c1, h)
    for measure, got, got_iz in (("r_square", r2r, r2iz),
                                 ("d_prime", dpr, dpiz)):
        want, want_iz = measure_rounded_block(c_ab, c1, c1, h, measure)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got_iz, want_iz)


def test_measures_rounded_block_both_fallback(rng, monkeypatch):
    """numpy fallback path must match the native fused pass."""
    from ld_tools_tpu.ops import exact as mod

    v, h = 80, 64
    G = (rng.random((v, h)) < 0.4).astype(np.int8)
    c_ab = (G.astype(np.int64) @ G.T).astype(np.int32)
    c1 = G.sum(axis=1).astype(np.float64)
    native = mod.measures_rounded_block_both(c_ab, c1, c1, h)
    monkeypatch.setattr(mod, "_native_finish_available", lambda: False)
    fallback = mod.measures_rounded_block_both(c_ab, c1, c1, h)
    for a, b in zip(native, fallback):
        np.testing.assert_array_equal(a, b)


def test_exact_all_pairs_blocked_matches_single_call(rng):
    """The streamed (resident, two-slot) blocked path must equal the
    single-call path bit-for-bit, including the mirrored upper half."""
    from ld_tools_tpu.ops.engine import exact_all_pairs

    G = (rng.random((70, 48)) < rng.uniform(0.1, 0.9, (70, 1))).astype(
        np.int8
    )
    G[9] = 0
    one = exact_all_pairs(G)
    blocked = exact_all_pairs(G, block=32)
    np.testing.assert_array_equal(blocked.r_square, one.r_square)
    np.testing.assert_array_equal(blocked.d_prime, one.d_prime)
    np.testing.assert_array_equal(
        blocked.r_square_is_int_zero, one.r_square_is_int_zero
    )
    np.testing.assert_array_equal(blocked.p1, one.p1)


def test_resident_counts_misaligned_tail_raises(rng):
    """dynamic_slice clamps out-of-range starts; the guard must turn the
    silent wrong-rows case into an error."""
    from ld_tools_tpu.ops.engine import ResidentCounts

    G = (rng.random((300, 32)) < 0.4).astype(np.int8)
    rc = ResidentCounts(G, block_pad=128)
    rc.block_async(256, 300, 300)()  # aligned tail: fine
    with pytest.raises(ValueError, match="aligned"):
        rc.block_async(257, 300, 300)


def test_format_rounded_half_tie_matches_python_round():
    """Raw values near decimal half-ties must print exactly like
    str(round(v, 4)) — the r5 review caught 0.00005 printing '0.0'."""
    from ld_tools_tpu.ops.exact import format_rounded

    vals = np.array([0.00005, 0.12345, -0.00005, 0.99995, 0.12344999,
                     5e-05, 1.0, 0.0, -0.00001])
    got = format_rounded(vals)
    want = [str(round(float(v), 4)) for v in vals]
    assert list(got) == want
