"""Streamed threshold scan vs brute-force oracle filtering."""

import numpy as np
import pytest

from ld_tools_tpu.ops.exact import format_rounded
from ld_tools_tpu.ops.ld_stream import stream_threshold_scan

from .conftest import random_haplotypes
from .oracle import oracle_ld


def _expected_hits(G, pos, measure, thres, max_dist=None):
    out = set()
    vals = {}
    v = G.shape[0]
    for i in range(v):
        for j in range(i):
            if max_dist is not None and abs(int(pos[i]) - int(pos[j])) > max_dist:
                continue
            res = oracle_ld(list(G[i]), list(G[j]))
            if res[measure] >= thres:
                out.add((i, j))
                vals[(i, j)] = res
    return out, vals


@pytest.mark.parametrize("measure", ["r_square", "d_prime"])
def test_scan_matches_bruteforce(rng, measure):
    G = random_haplotypes(rng, 60, 90, maf_low=0.05, maf_high=0.95)
    pos = np.sort(rng.choice(10**6, size=60, replace=False)).astype(np.int64)
    thres = 0.6
    hits = stream_threshold_scan(
        G, pos=pos, measure=measure, thres=thres,
        band=16, chunk=24, use_pallas=False, exact=True,
    )
    got = set(zip(hits.i.tolist(), hits.j.tolist()))
    expected, vals = _expected_hits(G, pos, measure, thres)
    assert got == expected
    # exact values must reproduce the oracle after rounding
    r2_s = format_rounded(hits.r_square, hits.r_square_is_int_zero)
    dp_s = format_rounded(hits.d_prime, hits.d_prime_is_int_zero)
    for k in range(len(hits.i)):
        res = vals[(int(hits.i[k]), int(hits.j[k]))]
        assert r2_s[k] == str(res["r_square"])
        assert dp_s[k] == str(res["d_prime"])


def test_scan_with_distance_window(rng):
    G = random_haplotypes(rng, 40, 64, maf_low=0.1, maf_high=0.9)
    pos = (np.arange(40, dtype=np.int64) + 1) * 500
    max_dist = 3000
    hits = stream_threshold_scan(
        G, pos=pos, measure="r_square", thres=0.3, max_dist=max_dist,
        band=16, chunk=16, use_pallas=False, exact=True,
    )
    expected, _ = _expected_hits(G, pos, "r_square", 0.3, max_dist)
    assert set(zip(hits.i.tolist(), hits.j.tolist())) == expected
    assert np.all(np.abs(pos[hits.i] - pos[hits.j]) <= max_dist)


def test_scan_many_batches_compact_fetch(rng):
    """Multiple count/fetch batches through the single-dispatch compacted
    fetch (`_fetch_compact_body`): tiny tiles + max_tiles_per_call=4 force
    several dispatches, each with padded dummy tiles and tile_cap !=
    total_cap, so the flat-buffer split boundaries are exercised hard."""
    G = random_haplotypes(rng, 72, 64, maf_low=0.05, maf_high=0.95)
    pos = np.sort(rng.choice(10**6, size=72, replace=False)).astype(np.int64)
    thres = 0.4
    hits = stream_threshold_scan(
        G, pos=pos, measure="r_square", thres=thres,
        band=16, chunk=16, max_tiles_per_call=4,
        use_pallas=False, exact=True,
    )
    expected, vals = _expected_hits(G, pos, "r_square", thres)
    assert set(zip(hits.i.tolist(), hits.j.tolist())) == expected
    r2_s = format_rounded(hits.r_square, hits.r_square_is_int_zero)
    for k in range(len(hits.i)):
        res = vals[(int(hits.i[k]), int(hits.j[k]))]
        assert r2_s[k] == str(res["r_square"])


@pytest.mark.parametrize("n", [96, 5008, 46340])
def test_exact_mask_grid_vs_oracle(n):
    """_exact_keep_mask must keep a SUPERSET of the exactly-kept pairs
    and stay within the margin band, for every (c1, c2, cab) regime —
    including the near-fixed combos where the f32 epilogue mask loses
    pairs outright (e.g. counts (5003, 5007, 5002) at n=5008: true
    D' == 1.0, f32 exact-order D' == 0.897 — a thres-0.95 scan would
    drop it).  n=46340 is the int32-exactness boundary
    (_EXACT_MASK_MAX_HAP)."""
    import jax.numpy as jnp

    from ld_tools_tpu.ops.ld_stream import _exact_keep_mask

    cs = sorted({0, 1, 2, 5, min(47, n), n // 2, max(n - 15, 0),
                 max(n - 5, 0), max(n - 2, 0), max(n - 1, 0), n})
    combos = []
    for c1 in cs:
        for c2 in cs:
            lo, hi = max(0, c1 + c2 - n), min(c1, c2)
            special = n - 6 if lo <= n - 6 <= hi else lo
            for cab in {lo, hi, (lo + hi) // 2, special}:
                combos.append((c1, c2, cab))
    c1v = np.array([c[0] for c in combos], dtype=np.float64)
    c2v = np.array([c[1] for c in combos], dtype=np.float64)
    cabv = np.array([c[2] for c in combos], dtype=np.int32)
    # f64 oracle from counts (reference op order)
    p1, p2, pab = c1v / n, c2v / n, cabv / n
    d = pab - p1 * p2
    q1, q2 = 1 - p1, 1 - p2
    den_r2 = (p1 * q1) * (p2 * q2)
    with np.errstate(divide="ignore", invalid="ignore"):
        r2 = np.where(den_r2 == 0, 0.0,
                      d * d / np.where(den_r2 == 0, 1, den_r2))
        den_dp = np.where(d >= 0, np.minimum(p1 * q2, q1 * p2),
                          np.maximum(-p1 * p2, -q1 * q2))
        dp = np.where(den_dp == 0, 0.0,
                      d / np.where(den_dp == 0, 1, den_dp))
    margin = 5e-4
    for sel, exact_vals in ((0, r2), (1, dp)):
        for thres in (0.2, 0.8, 0.95, 1.0):
            keep = np.asarray(_exact_keep_mask(
                jnp.asarray(cabv)[None, :],
                jnp.asarray(c1v, dtype=jnp.float32)[None, :],
                jnp.asarray(c2v, dtype=jnp.float32)[None, :],
                jnp.int32(n), jnp.float32(thres - margin), sel,
            ))[0]
            # superset: every pair whose ROUNDED exact value passes the
            # threshold must be kept (round-up can reach thres - 5e-5)
            must_keep = np.round(exact_vals, 4) >= thres
            assert np.all(keep[must_keep]), (
                sel, thres, np.asarray(combos)[must_keep & ~keep][:5])
            # bounded overkeep: nothing below the margin band survives
            may_keep = exact_vals >= thres - margin - 1e-6
            assert np.all(may_keep[keep]), (
                sel, thres, np.asarray(combos)[keep & ~may_keep][:5])


def test_scan_f32_fallback_mask(rng, monkeypatch):
    """Cohorts beyond _EXACT_MASK_MAX_HAP fall back to the f32 epilogue
    mask; force that path and check it still matches the oracle away
    from the ill-conditioned regimes (moderate MAFs)."""
    from ld_tools_tpu.ops import ld_stream

    monkeypatch.setattr(ld_stream, "_EXACT_MASK_MAX_HAP", 0)
    G = random_haplotypes(rng, 48, 96, maf_low=0.1, maf_high=0.9)
    pos = (np.arange(48, dtype=np.int64) + 1) * 700
    hits = stream_threshold_scan(
        G, pos=pos, measure="r_square", thres=0.5,
        band=16, chunk=16, use_pallas=False, exact=True,
    )
    expected, _ = _expected_hits(G, pos, "r_square", 0.5)
    assert set(zip(hits.i.tolist(), hits.j.tolist())) == expected


def test_scan_near_fixed_variants_not_dropped(rng):
    """End-to-end: near-fixed variant pairs (alt freq ~ 1) whose exact
    D' is 1.0 must survive a high-threshold scan.  The pre-integer-mask
    code lost them (f32 cancellation, ~0.1 absolute D' error)."""
    n = 5008
    G = (rng.random((40, n)) < 0.5).astype(np.int8)
    G[10] = 1
    G[10, 5003:] = 0          # c1 = 5003
    G[20] = 1
    G[20, 5002] = 0           # c2 = 5007, overlap with row 10 = 5002
    pos = (np.arange(40, dtype=np.int64) + 1) * 1000
    hits = stream_threshold_scan(
        G, pos=pos, measure="d_prime", thres=0.95,
        band=16, chunk=16, use_pallas=False, exact=True,
    )
    got = set(zip(hits.i.tolist(), hits.j.tolist()))
    assert (20, 10) in got
    res = oracle_ld(list(G[20]), list(G[10]))
    assert res["d_prime"] == 1.0
    expected, _ = _expected_hits(G, pos, "d_prime", 0.95)
    assert got == expected


def test_scan_empty_result(rng):
    G = random_haplotypes(rng, 20, 64, maf_low=0.3, maf_high=0.7)
    hits = stream_threshold_scan(
        G, measure="r_square", thres=1.1, band=16, chunk=16,
        use_pallas=False, exact=True,
    )
    assert len(hits.i) == 0


def test_format_rounded():
    vals = np.array([0.8237, 0.5, 1.0, 0.0, 0.0001, 0.9999])
    int_zero = np.array([False, False, False, False, False, False])
    assert list(format_rounded(vals, int_zero)) == [
        "0.8237", "0.5", "1.0", "0.0", "0.0001", "0.9999",
    ]
    int_zero = np.array([True, False, False, True, False, False])
    got = format_rounded(vals, int_zero)
    assert got[0] == "0" and got[3] == "0"
    # parity with str(round(x, 4)) on random values
    rng = np.random.default_rng(4)
    xs = np.round(rng.random(500), 4)
    assert list(format_rounded(xs)) == [str(round(float(x), 4)) for x in xs]
    # negative D' values and negative-zero must match Python str() too
    neg = np.array([-0.25, -1.0, -0.0001, -0.00001, -0.99995])
    assert list(format_rounded(neg)) == [str(round(float(x), 4)) for x in neg]
    # full 4-dp grid parity in [-1, 1]
    grid = np.arange(-10000, 10001) / 1e4
    assert list(format_rounded(grid)) == [
        str(round(float(x), 4)) for x in grid
    ]


def test_scan_checkpoint_resume(rng, tmp_path):
    G = random_haplotypes(rng, 50, 80, maf_low=0.05, maf_high=0.95)
    pos = (np.arange(50, dtype=np.int64) + 1) * 100
    kw = dict(measure="r_square", thres=0.4, band=16, chunk=16,
              max_tiles_per_call=2, use_pallas=False, exact=True,
              checkpoint_dir=str(tmp_path))
    first = stream_threshold_scan(G, pos=pos, **kw)
    assert len(list(tmp_path.glob("scan_*_batch*.npz"))) > 0
    # resumed run must reproduce the identical result from checkpoints
    second = stream_threshold_scan(G, pos=pos, **kw)
    np.testing.assert_array_equal(first.i, second.i)
    np.testing.assert_array_equal(first.j, second.j)
    np.testing.assert_array_equal(first.r_square, second.r_square)
    # and must match a clean no-checkpoint run
    clean = stream_threshold_scan(
        G, pos=pos, measure="r_square", thres=0.4, band=16, chunk=16,
        use_pallas=False, exact=True,
    )
    np.testing.assert_array_equal(first.i, clean.i)
    np.testing.assert_array_equal(first.r_square, clean.r_square)


def test_scan_pallas_tiles_interpret(rng):
    """The Pallas tile path (use_pallas=True, interpret) must agree with
    the XLA tile path."""
    G = random_haplotypes(rng, 48, 80, maf_low=0.1, maf_high=0.9)
    a = stream_threshold_scan(
        G, measure="r_square", thres=0.4, band=16, chunk=16,
        use_pallas=False, exact=False,
    )
    b = stream_threshold_scan(
        G, measure="r_square", thres=0.4, band=16, chunk=16,
        use_pallas=True, interpret=True, exact=False,
    )
    np.testing.assert_array_equal(a.i, b.i)
    np.testing.assert_array_equal(a.j, b.j)
    np.testing.assert_allclose(a.r_square, b.r_square, atol=1e-6)


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("resident", ["dense", "packed"])
def test_scan_packed_input_matches_unpacked(rng, use_pallas, resident):
    """G_packed (store bytes) must produce identical hits and values to
    the unpacked path, on both the XLA and the Pallas tile kernels and
    under both HBM residencies (device-unpacked dense / bit-plane
    packed)."""
    G = random_haplotypes(rng, 50, 77, maf_low=0.05, maf_high=0.95)
    G[7] = 0
    G[13] = 1
    pos = np.sort(rng.choice(10**6, size=50, replace=False)).astype(np.int64)
    kw = dict(pos=pos, measure="r_square", thres=0.4, band=16, chunk=16,
              use_pallas=use_pallas, interpret=use_pallas, exact=True)
    ref = stream_threshold_scan(G, **kw)
    gp = np.packbits(G.astype(np.uint8), axis=1)
    got = stream_threshold_scan(
        G_packed=gp, n_haplotypes=77, resident=resident, **kw
    )
    assert set(zip(got.i.tolist(), got.j.tolist())) == set(
        zip(ref.i.tolist(), ref.j.tolist())
    )
    np.testing.assert_array_equal(got.r_square, ref.r_square)
    np.testing.assert_array_equal(got.d_prime, ref.d_prime)
    np.testing.assert_array_equal(
        got.r_square_is_int_zero, ref.r_square_is_int_zero
    )


def test_pack_column_subsets_and_popcounts(rng):
    """Cohort bit-column repack + popcount helpers match the unpacked ops."""
    from ld_tools_tpu.ingest.pack import pack_columns, popcounts, unpack_rows

    G = random_haplotypes(rng, 30, 53, maf_low=0.05, maf_high=0.95)
    packed = np.packbits(G.astype(np.uint8), axis=1)
    np.testing.assert_array_equal(
        popcounts(packed), G.astype(np.int64).sum(axis=1)
    )
    cols = np.sort(rng.choice(53, size=20, replace=False))
    sub = pack_columns(packed, cols, 53, chunk_rows=7)
    np.testing.assert_array_equal(
        np.unpackbits(sub, axis=1, count=20), G[:, cols]
    )
    rows = np.asarray([3, 0, 29, 3])
    np.testing.assert_array_equal(unpack_rows(packed, rows, 53), G[rows])


@pytest.mark.parametrize("n_devices", [2, 8])
def test_scan_sharded_mesh_matches_single_device(rng, n_devices):
    """Tile-sharded scan over a device mesh must reproduce the
    single-device scan exactly (hits, values, and ordering)."""
    from ld_tools_tpu.ops.ld_stream import scan_mesh

    G = random_haplotypes(rng, 70, 64, maf_low=0.05, maf_high=0.95)
    G[3] = 0
    pos = np.sort(rng.choice(10**6, size=70, replace=False)).astype(np.int64)
    kw = dict(pos=pos, measure="r_square", thres=0.3, band=16, chunk=16,
              use_pallas=False, exact=True, max_dist=600_000)
    ref = stream_threshold_scan(G, **kw)
    got = stream_threshold_scan(G, mesh=scan_mesh(n_devices), **kw)
    np.testing.assert_array_equal(got.i, ref.i)
    np.testing.assert_array_equal(got.j, ref.j)
    np.testing.assert_array_equal(got.r_square, ref.r_square)
    np.testing.assert_array_equal(got.d_prime, ref.d_prime)


def test_scan_sharded_packed_input(rng):
    """Mesh sharding composes with the bitpacked input path."""
    from ld_tools_tpu.ops.ld_stream import scan_mesh

    G = random_haplotypes(rng, 40, 53, maf_low=0.05, maf_high=0.95)
    pos = np.sort(rng.choice(10**6, size=40, replace=False)).astype(np.int64)
    kw = dict(pos=pos, measure="d_prime", thres=0.5, band=16, chunk=16,
              use_pallas=False, exact=True)
    ref = stream_threshold_scan(G, **kw)
    gp = np.packbits(G.astype(np.uint8), axis=1)
    got = stream_threshold_scan(
        G_packed=gp, n_haplotypes=53, mesh=scan_mesh(8), **kw
    )
    np.testing.assert_array_equal(got.i, ref.i)
    np.testing.assert_array_equal(got.j, ref.j)
    np.testing.assert_array_equal(got.r_square, ref.r_square)
    np.testing.assert_array_equal(got.d_prime, ref.d_prime)


@pytest.mark.parametrize("max_dist", [None, 11])
def test_scan_fused_block_count_interpret(rng, max_dist):
    """The fused Pallas count kernel (per-block SMEM-accumulated tile
    counts, ld_pallas.ld_band_count) must produce the exact hit set of
    the XLA tile path — counts size the fetch buffers, so any mismatch
    corrupts the hit split."""
    G = random_haplotypes(rng, 60, 96, maf_low=0.0, maf_high=1.0)
    G[5] = 0
    G[9] = 1
    kw = dict(measure="r_square", thres=0.3, exact=True,
              max_dist=max_dist)
    a = stream_threshold_scan(
        G, band=16, chunk=16, use_pallas=False, **kw
    )
    b = stream_threshold_scan(
        G, band=16, chunk=16, count_block=8, use_pallas=True,
        interpret=True, **kw
    )
    np.testing.assert_array_equal(a.i, b.i)
    np.testing.assert_array_equal(a.j, b.j)
    np.testing.assert_array_equal(a.r_square, b.r_square)
    np.testing.assert_array_equal(a.d_prime, b.d_prime)


def test_scan_fused_block_count_f32_fallback(rng, monkeypatch):
    """Fallback f32 mask through the fused count kernel (cohorts past the
    int32-exact bound) still matches the XLA path."""
    from ld_tools_tpu.ops import ld_stream as mod

    monkeypatch.setattr(mod, "_EXACT_MASK_MAX_HAP", 8)
    G = random_haplotypes(rng, 40, 64, maf_low=0.1, maf_high=0.9)
    a = stream_threshold_scan(
        G, measure="d_prime", thres=0.5, band=16, chunk=16,
        use_pallas=False, exact=True,
    )
    b = stream_threshold_scan(
        G, measure="d_prime", thres=0.5, band=16, chunk=16,
        count_block=8, use_pallas=True, interpret=True, exact=True,
    )
    np.testing.assert_array_equal(a.i, b.i)
    np.testing.assert_array_equal(a.j, b.j)
    np.testing.assert_array_equal(a.d_prime, b.d_prime)


@pytest.mark.parametrize("n_devices", [2, 4])
def test_scan_sharded_mesh_fused_block_count_interpret(rng, n_devices):
    """Mesh + fused Pallas count kernel (ld_band_count_sharded) + block-
    granular fetch must reproduce the single-device XLA scan exactly."""
    from ld_tools_tpu.ops.ld_stream import scan_mesh

    G = random_haplotypes(rng, 60, 64, maf_low=0.05, maf_high=0.95)
    G[3] = 0
    pos = np.sort(rng.choice(10**6, size=60, replace=False)).astype(np.int64)
    kw = dict(pos=pos, measure="r_square", thres=0.3, band=16, chunk=16,
              exact=True, max_dist=600_000)
    ref = stream_threshold_scan(G, use_pallas=False, **kw)
    got = stream_threshold_scan(
        G, mesh=scan_mesh(n_devices), use_pallas=True, interpret=True,
        count_block=8, **kw,
    )
    np.testing.assert_array_equal(got.i, ref.i)
    np.testing.assert_array_equal(got.j, ref.j)
    np.testing.assert_array_equal(got.r_square, ref.r_square)
    np.testing.assert_array_equal(got.d_prime, ref.d_prime)


def test_scan_fused_count_chunked_calls(rng, monkeypatch):
    """Count batches past the SMEM block cap split into sub-calls; the
    hit set must be unchanged (exercised with a tiny patched cap)."""
    from ld_tools_tpu.ops import ld_stream as mod

    monkeypatch.setattr(mod, "_MAX_COUNT_BLOCKS_PER_CALL", 7)
    G = random_haplotypes(rng, 60, 64, maf_low=0.1, maf_high=0.9)
    a = stream_threshold_scan(
        G, measure="r_square", thres=0.3, band=16, chunk=16,
        use_pallas=False, exact=True,
    )
    b = stream_threshold_scan(
        G, measure="r_square", thres=0.3, band=16, chunk=16,
        count_block=8, use_pallas=True, interpret=True, exact=True,
    )
    np.testing.assert_array_equal(a.i, b.i)
    np.testing.assert_array_equal(a.j, b.j)
    np.testing.assert_array_equal(a.r_square, b.r_square)


def test_scan_checkpoint_resume_fused_path(rng, tmp_path):
    """Resume through the fused Pallas count + block fetch path (interpret
    mode): checkpoints written by one engine must satisfy a resumed run,
    and the result must match the XLA engine bit-for-bit."""
    G = random_haplotypes(rng, 50, 80, maf_low=0.05, maf_high=0.95)
    pos = (np.arange(50, dtype=np.int64) + 1) * 100
    kw = dict(measure="r_square", thres=0.4, band=16, chunk=16,
              count_block=8, max_tiles_per_call=2, use_pallas=True,
              interpret=True, exact=True, checkpoint_dir=str(tmp_path))
    first = stream_threshold_scan(G, pos=pos, **kw)
    assert len(list(tmp_path.glob("scan_*_batch*.npz"))) > 0
    second = stream_threshold_scan(G, pos=pos, **kw)
    np.testing.assert_array_equal(first.i, second.i)
    np.testing.assert_array_equal(first.r_square, second.r_square)
    clean = stream_threshold_scan(
        G, pos=pos, measure="r_square", thres=0.4, band=16, chunk=16,
        use_pallas=False, exact=True,
    )
    np.testing.assert_array_equal(first.i, clean.i)
    np.testing.assert_array_equal(first.j, clean.j)
    np.testing.assert_array_equal(first.r_square, clean.r_square)


def test_scan_resident_cache_reuse(rng):
    """A repeat scan under the same resident_key must skip host prep +
    upload (stats.resident_hit) and return the identical hit set; a
    DIFFERENT threshold still reuses the resident arrays (they are
    threshold-independent — thres rides in as a runtime scalar)."""
    from ld_tools_tpu.ops import ld_stream as mod

    mod.clear_resident_cache()
    G = random_haplotypes(rng, 50, 64, maf_low=0.05, maf_high=0.95)
    pos = np.sort(rng.choice(10**6, size=50, replace=False)).astype(np.int64)
    kw = dict(pos=pos, measure="r_square", band=16, chunk=16,
              use_pallas=False, exact=True, resident_key=("t", "chrT"))
    cold = stream_threshold_scan(G, thres=0.3, **kw)
    assert cold.stats["resident_hit"] == 0.0
    warm = stream_threshold_scan(G, thres=0.3, **kw)
    assert warm.stats["resident_hit"] == 1.0
    np.testing.assert_array_equal(cold.i, warm.i)
    np.testing.assert_array_equal(cold.j, warm.j)
    np.testing.assert_array_equal(cold.r_square, warm.r_square)
    np.testing.assert_array_equal(cold.d_prime, warm.d_prime)
    # different threshold, same resident arrays
    other = stream_threshold_scan(G, thres=0.7, **kw)
    assert other.stats["resident_hit"] == 1.0
    ref = stream_threshold_scan(
        G, pos=pos, measure="r_square", thres=0.7, band=16, chunk=16,
        use_pallas=False, exact=True,
    )
    np.testing.assert_array_equal(other.i, ref.i)
    np.testing.assert_array_equal(other.r_square, ref.r_square)
    mod.clear_resident_cache()


def test_scan_resident_cache_key_discriminates(rng):
    """Different keys, layouts, or pos content must NOT share entries."""
    from ld_tools_tpu.ops import ld_stream as mod

    mod.clear_resident_cache()
    G = random_haplotypes(rng, 30, 64, maf_low=0.1, maf_high=0.9)
    pos_a = (np.arange(30, dtype=np.int64) + 1) * 100
    pos_b = (np.arange(30, dtype=np.int64) + 1) * 200
    kw = dict(measure="r_square", thres=0.3, band=16, chunk=16,
              use_pallas=False, exact=True)
    a = stream_threshold_scan(G, pos=pos_a, resident_key=("k",), **kw)
    assert a.stats["resident_hit"] == 0.0
    # same key but different pos bytes -> miss (content hash differs)
    b = stream_threshold_scan(G, pos=pos_b, resident_key=("k",), **kw)
    assert b.stats["resident_hit"] == 0.0
    # no key -> never cached
    c = stream_threshold_scan(G, pos=pos_a, **kw)
    assert c.stats["resident_hit"] == 0.0
    mod.clear_resident_cache()


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_scan_cap_overflow_splits_not_raises(rng, engine):
    """A tile whose hit count exceeds cap_per_tile must split into
    sub-tiles and complete (VERDICT r4 weak #6) with the identical hit
    set — exercised with thres=0.0 (every pair is a hit) and a tiny cap."""
    G = random_haplotypes(rng, 48, 64, maf_low=0.2, maf_high=0.8)
    pos = (np.arange(48, dtype=np.int64) + 1) * 100
    kw = dict(pos=pos, measure="r_square", thres=0.0, band=16, chunk=16,
              exact=True)
    eng = (dict(use_pallas=True, interpret=True, count_block=8)
           if engine == "pallas" else dict(use_pallas=False))
    ref = stream_threshold_scan(G, cap_per_tile=1 << 22, use_pallas=False,
                                **kw)
    assert len(ref.i) == 48 * 47 // 2
    got = stream_threshold_scan(G, cap_per_tile=24, **eng, **kw)
    np.testing.assert_array_equal(got.i, ref.i)
    np.testing.assert_array_equal(got.j, ref.j)
    np.testing.assert_array_equal(got.r_square, ref.r_square)
    np.testing.assert_array_equal(got.d_prime, ref.d_prime)


def test_scan_cap_overflow_mesh(rng):
    """The overflow sub-tile path composes with a sharded tile mesh."""
    from ld_tools_tpu.ops.ld_stream import scan_mesh

    G = random_haplotypes(rng, 40, 64, maf_low=0.2, maf_high=0.8)
    kw = dict(measure="r_square", thres=0.0, band=16, chunk=16, exact=True)
    ref = stream_threshold_scan(G, use_pallas=False, **kw)
    got = stream_threshold_scan(
        G, cap_per_tile=32, mesh=scan_mesh(4), use_pallas=False, **kw
    )
    np.testing.assert_array_equal(got.i, ref.i)
    np.testing.assert_array_equal(got.j, ref.j)
    np.testing.assert_array_equal(got.r_square, ref.r_square)


def test_scan_cap_overflow_unsplittable_raises(rng):
    """A cap below any reachable sub-tile area still fails fast with an
    actionable message rather than looping."""
    G = random_haplotypes(rng, 32, 64, maf_low=0.3, maf_high=0.7)
    with pytest.raises(RuntimeError, match="cap_per_tile"):
        stream_threshold_scan(
            G, measure="r_square", thres=0.0, band=16, chunk=16,
            cap_per_tile=0, use_pallas=False, exact=True,
        )


def test_scan_resident_cache_with_mesh(rng):
    """The resident cache composes with a sharded tile mesh (replicated
    device arrays cached per mesh identity) and never leaks entries
    across different meshes."""
    from ld_tools_tpu.ops import ld_stream as mod
    from ld_tools_tpu.ops.ld_stream import scan_mesh

    mod.clear_resident_cache()
    G = random_haplotypes(rng, 50, 64, maf_low=0.05, maf_high=0.95)
    kw = dict(measure="r_square", thres=0.3, band=16, chunk=16,
              use_pallas=False, exact=True)
    ref = stream_threshold_scan(G, **kw)
    mesh = scan_mesh(4)
    a = stream_threshold_scan(G, mesh=mesh, resident_key=("m",), **kw)
    assert a.stats["resident_hit"] == 0.0
    b = stream_threshold_scan(G, mesh=mesh, resident_key=("m",), **kw)
    assert b.stats["resident_hit"] == 1.0
    for got in (a, b):
        np.testing.assert_array_equal(got.i, ref.i)
        np.testing.assert_array_equal(got.j, ref.j)
        np.testing.assert_array_equal(got.r_square, ref.r_square)
    # a different mesh (different device set) must not reuse the entry
    c = stream_threshold_scan(
        G, mesh=scan_mesh(2), resident_key=("m",), **kw
    )
    assert c.stats["resident_hit"] == 0.0
    np.testing.assert_array_equal(c.i, ref.i)
    mod.clear_resident_cache()


def test_count_chunk_padding_never_exceeds_cap():
    """r5 review: the PADDED fused-count call size must never round past
    the probed SMEM cap (the probe validates exactly that boundary)."""
    from ld_tools_tpu.ops.ld_stream import _chunk_step, _pad_blocks

    for cap in (98304, 49152, 24576, 12288, 6144, 3072, 1024, 7, 1):
        step = _chunk_step(cap)
        assert 1 <= step <= cap
        for n in (1, 2, step // 2 + 1, step - 1, step):
            if n < 1 or n > step:  # chunks are never longer than step
                continue
            assert n <= _pad_blocks(n) <= step, (cap, step, n)


def test_scan_cap_overflow_with_distance_window(rng):
    """Overflow sub-tiling composes with the max_dist window (sub-tiles
    skip host-side distance pruning; the traced mask must still apply
    it)."""
    G = random_haplotypes(rng, 44, 64, maf_low=0.2, maf_high=0.8)
    pos = (np.arange(44, dtype=np.int64) + 1) * 250
    kw = dict(pos=pos, measure="r_square", thres=0.0, max_dist=2000,
              band=16, chunk=16, exact=True)
    ref = stream_threshold_scan(G, use_pallas=False, **kw)
    got = stream_threshold_scan(G, cap_per_tile=24, use_pallas=False, **kw)
    np.testing.assert_array_equal(got.i, ref.i)
    np.testing.assert_array_equal(got.j, ref.j)
    np.testing.assert_array_equal(got.r_square, ref.r_square)
    assert np.all(np.abs(pos[got.i] - pos[got.j]) <= 2000)


def test_scan_resident_cache_capacity_env(rng, monkeypatch):
    """TPU_LD_RESIDENT_CACHE_ENTRIES sizes the LRU; 0 disables caching."""
    from ld_tools_tpu.ops import ld_stream as mod

    mod.clear_resident_cache()
    monkeypatch.setenv("TPU_LD_RESIDENT_CACHE_ENTRIES", "0")
    G = random_haplotypes(rng, 30, 64, maf_low=0.1, maf_high=0.9)
    kw = dict(measure="r_square", thres=0.3, band=16, chunk=16,
              use_pallas=False, exact=True, resident_key=("cap0",))
    a = stream_threshold_scan(G, **kw)
    b = stream_threshold_scan(G, **kw)
    assert a.stats["resident_hit"] == 0.0
    assert b.stats["resident_hit"] == 0.0
    monkeypatch.setenv("TPU_LD_RESIDENT_CACHE_ENTRIES", "2")
    G2 = random_haplotypes(rng, 32, 64, maf_low=0.1, maf_high=0.9)
    kw.pop("resident_key")
    c1 = stream_threshold_scan(G, resident_key=("k1",), **kw)
    c2 = stream_threshold_scan(G2, resident_key=("k2",), **kw)
    d1 = stream_threshold_scan(G, resident_key=("k1",), **kw)
    d2 = stream_threshold_scan(G2, resident_key=("k2",), **kw)
    assert d1.stats["resident_hit"] == 1.0  # both fit at capacity 2
    assert d2.stats["resident_hit"] == 1.0
    mod.clear_resident_cache()


def test_scan_input_validation(rng):
    """Misuse fails fast: bad measure, unsorted/oversized positions
    under max_dist, Pallas-indivisible band, empty input."""
    G = random_haplotypes(rng, 20, 32, maf_low=0.2, maf_high=0.8)
    with pytest.raises(ValueError, match="measure"):
        stream_threshold_scan(G, measure="r2", thres=0.5,
                              use_pallas=False, band=16, chunk=16)
    bad_pos = np.array([100, 50] + list(range(200, 2000, 100)),
                       dtype=np.int64)
    with pytest.raises(ValueError, match="ascending"):
        stream_threshold_scan(
            G, pos=bad_pos, measure="r_square", thres=0.5,
            max_dist=500, use_pallas=False, band=16, chunk=16,
        )
    big_pos = (np.arange(20, dtype=np.int64) + 1) * (2**26)
    with pytest.raises(ValueError, match="2\\^30"):
        stream_threshold_scan(
            G, pos=big_pos, measure="r_square", thres=0.5,
            max_dist=500, use_pallas=False, band=16, chunk=16,
        )
    with pytest.raises(ValueError, match="divisible"):
        stream_threshold_scan(
            np.zeros((500, 64), np.int8), measure="r_square", thres=0.5,
            band=384, chunk=512, use_pallas=True, interpret=True,
        )
    empty = stream_threshold_scan(
        np.zeros((0, 64), np.int8), measure="r_square", thres=0.5,
        use_pallas=False,
    )
    assert len(empty.i) == 0 and empty.stats is not None


def test_scan_checkpoint_fingerprint_covers_pos(rng, tmp_path):
    """Changing interior positions (same length, same final coordinate)
    must NOT resume from the old checkpoints (r5 review)."""
    G = random_haplotypes(rng, 40, 64, maf_low=0.1, maf_high=0.9)
    pos_a = (np.arange(40, dtype=np.int64) + 1) * 100
    pos_b = pos_a.copy()
    pos_b[10:20] += 37  # interior change only; pos_b[-1] == pos_a[-1]
    kw = dict(measure="r_square", thres=0.3, max_dist=900, band=16,
              chunk=16, use_pallas=False, exact=True,
              checkpoint_dir=str(tmp_path))
    a = stream_threshold_scan(G, pos=pos_a, **kw)
    b = stream_threshold_scan(G, pos=pos_b, **kw)
    ref_b = stream_threshold_scan(
        G, pos=pos_b, measure="r_square", thres=0.3, max_dist=900,
        band=16, chunk=16, use_pallas=False, exact=True,
    )
    np.testing.assert_array_equal(b.i, ref_b.i)
    np.testing.assert_array_equal(b.j, ref_b.j)
    # and the two runs' checkpoints did not collide
    fps = {p.name.split("_")[1] for p in tmp_path.glob("scan_*_batch*.npz")}
    assert len(fps) == 2
