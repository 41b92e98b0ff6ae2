"""Native C++ scanner parity with the pure-Python VCF parser."""

import os

import numpy as np
import pytest

from ld_tools_tpu.ingest import synth
from ld_tools_tpu.ingest.vcf import iter_records, read_sample_names

native = pytest.importorskip("ld_tools_tpu.ingest._vcfpack_ctypes")


@pytest.fixture(scope="module")
def built():
    try:
        native._load()
    except native.NativeUnavailable as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


def test_native_matches_python_parser(tmp_path, built):
    d = str(tmp_path)
    synth.generate_dataset(
        d, n_samples=17, chrom_variant_counts={"8": 23}, seed=6,
        with_filtered_records=True,
    )
    path = os.path.join(d, "8.vcf.gz")
    g, pos, rsid, ref, alt, vt, samples = native.scan(path)

    recs = list(iter_records(path))
    assert samples == read_sample_names(path)
    assert len(rsid) == len(recs)
    assert rsid == [r.rsid for r in recs]
    assert list(pos) == [r.pos for r in recs]
    assert ref == [r.ref for r in recs]
    assert alt == [",".join(r.alts) for r in recs]
    assert vt == [",".join(r.vt) for r in recs]
    np.testing.assert_array_equal(g, np.vstack([r.genotypes for r in recs]))


def test_native_uncompressed_vcf(tmp_path, built):
    rng = np.random.default_rng(2)
    G = synth.correlated_haplotypes(rng, 9, 12)
    panel = synth.make_panel(6, rng)
    path = str(tmp_path / "4.vcf")
    synth.write_vcf(path, "4", [r[0] for r in panel], G)
    g, pos, rsid, *_ = native.scan(path)
    np.testing.assert_array_equal(g, G)
    assert len(rsid) == 9


def test_native_error_on_missing_file(built):
    with pytest.raises((native.NativeScanError,)):
        native.scan("/nonexistent/file.vcf.gz")


def test_bgzf_parallel_scan_matches_python(tmp_path, built):
    """Block-parallel BGZF path: tiny blocks force every record to span
    block (and batch) boundaries, and a duplicate-triple run plus
    filtered records land across seams."""
    rng = np.random.default_rng(11)
    G = synth.correlated_haplotypes(rng, 120, 2 * 31)
    panel = synth.make_panel(31, rng)
    names = [r[0] for r in panel]
    extra = [
        (5000, synth.raw_record("9", 5000, "notrs5000", G[3])),
        (7000, synth.raw_record(
            "9", 7000, "rs7000x1", G[4], info="MULTI_ALLELIC;VT=SNP")),
        (9000, synth.raw_record("9", 9000, "rs9000", G[8])),
        (9000, synth.raw_record("9", 9000, "rs9000", G[8])),
    ]
    path = str(tmp_path / "9.vcf.gz")
    synth.write_vcf(path, "9", names, G, extra_records=extra,
                    bgzf=True, bgzf_block=256)
    recs = list(iter_records(path))
    assert "rs9000" not in [r.rsid for r in recs]  # dup run dropped
    for n_threads in (2, 4):
        g, pos, rsid, ref, alt, vt, samples = native.scan(
            path, n_threads=n_threads)
        assert samples == names
        assert rsid == [r.rsid for r in recs]
        assert list(pos) == [r.pos for r in recs]
        assert ref == [r.ref for r in recs]
        assert alt == [",".join(r.alts) for r in recs]
        assert vt == [",".join(r.vt) for r in recs]
        np.testing.assert_array_equal(
            g, np.vstack([r.genotypes for r in recs]))


def test_mt_entry_falls_back_on_plain_gzip(tmp_path, built):
    rng = np.random.default_rng(12)
    G = synth.correlated_haplotypes(rng, 15, 2 * 9)
    panel = synth.make_panel(9, rng)
    path = str(tmp_path / "3.vcf.gz")
    synth.write_vcf(path, "3", [r[0] for r in panel], G, bgzf=False)
    g, pos, rsid, *_ = native.scan(path, n_threads=4)
    np.testing.assert_array_equal(g, G)
    assert len(rsid) == 15


def test_mt_error_reporting(tmp_path, built):
    """A malformed genotype char mid-file must fail the parallel scan
    (not silently drop data)."""
    rng = np.random.default_rng(13)
    G = synth.correlated_haplotypes(rng, 40, 2 * 8)
    panel = synth.make_panel(8, rng)
    extra = [(2500, synth.raw_record("5", 2500, "rs250099", G[0])
              .replace("|", "?", 1))]
    path = str(tmp_path / "5.vcf.gz")
    synth.write_vcf(path, "5", [r[0] for r in panel], G,
                    extra_records=extra, bgzf=True, bgzf_block=256)
    with pytest.raises(native.NativeScanError):
        native.scan(path, n_threads=4)


# ---------------------------------------------------------------------------
# Native exact finisher (native/exactfinish.cpp)

exactfinish = pytest.importorskip("ld_tools_tpu.ops._exactfinish_ctypes")


@pytest.fixture(scope="module")
def finisher_built():
    try:
        exactfinish._load()
    except exactfinish.NativeUnavailable as exc:
        pytest.skip(f"native finisher unavailable: {exc}")


def _numpy_reference_finish(c_ab, c1, c2, n_hap):
    """The numpy reference path, bypassing the native gate (f64 input)."""
    from ld_tools_tpu.ops.exact import exact_ld_from_counts

    return exact_ld_from_counts(np.asarray(c_ab, np.float64), c1, c2, n_hap)


def test_native_finish_block_bit_matches_numpy(finisher_built):
    """Block finisher must be BIT-identical to the numpy op order on
    random counts including monomorphic rows/cols and zero counts."""
    rng = np.random.default_rng(3)
    n_hap = 5008
    nr, nc = 160, 130
    c1r = rng.integers(0, n_hap + 1, nr).astype(np.float64)
    c1c = rng.integers(0, n_hap + 1, nc).astype(np.float64)
    c1r[0] = 0
    c1r[1] = n_hap
    c1c[2] = 0
    c1c[3] = n_hap
    cab = np.floor(
        np.minimum.outer(c1r, c1c) * rng.random((nr, nc))
    ).astype(np.int32)
    cab[0, :] = 0
    cab[1, :] = c1c.astype(np.int32)
    r2, dp, r2z, dpz = exactfinish.finish_block(cab, c1r, c1c, float(n_hap))
    ref = _numpy_reference_finish(cab, c1r, c1c, n_hap)
    np.testing.assert_array_equal(r2, ref.r_square)
    np.testing.assert_array_equal(dp, ref.d_prime)
    np.testing.assert_array_equal(r2z, ref.r_square_is_int_zero)
    np.testing.assert_array_equal(dpz, ref.d_prime_is_int_zero)


def test_native_finish_threaded_matches_single(finisher_built):
    rng = np.random.default_rng(5)
    n_hap = 64
    nr, nc = 700, 900  # above the internal threading threshold
    c1r = rng.integers(0, n_hap + 1, nr).astype(np.float64)
    c1c = rng.integers(0, n_hap + 1, nc).astype(np.float64)
    cab = np.floor(
        np.minimum.outer(c1r, c1c) * rng.random((nr, nc))
    ).astype(np.int32)
    a = exactfinish.finish_block(cab, c1r, c1c, float(n_hap), n_threads=1)
    b = exactfinish.finish_block(cab, c1r, c1c, float(n_hap), n_threads=4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_native_finish_pairs_bit_matches_numpy(finisher_built):
    from ld_tools_tpu.ops.exact import ExactLD  # noqa: F401

    rng = np.random.default_rng(8)
    n_hap = 5008
    k = 5000
    c1a = rng.integers(0, n_hap + 1, k).astype(np.float64)
    c1b = rng.integers(0, n_hap + 1, k).astype(np.float64)
    c1a[0] = 0
    c1b[1] = n_hap
    cab = np.floor(np.minimum(c1a, c1b) * rng.random(k))
    r2, dp, r2z, dpz = exactfinish.finish_pairs(cab, c1a, c1b, float(n_hap))
    # elementwise numpy order (exact_ld_elementwise below its native gate)
    from ld_tools_tpu.ops.exact import exact_ld_elementwise

    ref = exact_ld_elementwise(cab, c1a, c1b, n_hap)
    np.testing.assert_array_equal(r2, ref.r_square)
    np.testing.assert_array_equal(dp, ref.d_prime)
    np.testing.assert_array_equal(r2z, ref.r_square_is_int_zero)
    np.testing.assert_array_equal(dpz, ref.d_prime_is_int_zero)


def test_exact_ld_from_counts_routes_native(finisher_built):
    """The public entry must give identical ExactLD through both engines
    (int32 input -> native; f64 input -> numpy)."""
    rng = np.random.default_rng(9)
    n_hap = 300
    nr = nc = 80  # 6400 cells >= 4096 gate
    from ld_tools_tpu.ops.exact import exact_ld_from_counts

    c1r = rng.integers(0, n_hap + 1, nr).astype(np.float64)
    c1c = rng.integers(0, n_hap + 1, nc).astype(np.float64)
    cab = np.floor(
        np.minimum.outer(c1r, c1c) * rng.random((nr, nc))
    ).astype(np.int32)
    via_native = exact_ld_from_counts(cab, c1r, c1c, n_hap)
    via_numpy = exact_ld_from_counts(
        cab.astype(np.float64), c1r, c1c, n_hap
    )
    np.testing.assert_array_equal(via_native.r_square, via_numpy.r_square)
    np.testing.assert_array_equal(via_native.d_prime, via_numpy.d_prime)
    np.testing.assert_array_equal(
        via_native.r_square_is_int_zero, via_numpy.r_square_is_int_zero
    )


def test_native_round4_matches_python_round(finisher_built):
    from ld_tools_tpu.ops.exact import round4

    rng = np.random.default_rng(12)
    # force the native gate (>= 65536 elements) and include decimal ties
    xs = rng.random(70000)
    xs[:10] = [0.00005, 0.00015, 0.5, 0.12345, 0.99995, -0.25,
               0.54321, 0.00004999999, 1.0, 0.0]
    got = round4(xs)
    want = np.array([round(float(v), 4) for v in xs])
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Adversarial-input fuzz seams (CRLF, FORMAT extras, truncation, ragged rows)

def _write_gz_text(path, lines, crlf=False):
    import gzip

    nl = "\r\n" if crlf else "\n"
    with gzip.open(path, "wt") as fh:
        fh.write(nl.join(lines) + nl)


_HDR = [
    "##fileformat=VCFv4.1",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2",
]


def _rec(pos, rsid, gt1, gt2, fmt="GT", info="VT=SNP"):
    return f"1\t{pos}\t{rsid}\tA\tG\t.\tPASS\t{info}\t{fmt}\t{gt1}\t{gt2}"


def test_native_crlf_lines_match_python(tmp_path, built):
    path = str(tmp_path / "crlf.vcf.gz")
    _write_gz_text(
        path, _HDR + [_rec(100, "rs1", "0|1", "1|1"),
                      _rec(200, "rs2", "1|0", "0|0")], crlf=True,
    )
    g, pos, rsid, *_ = native.scan(path)
    recs = list(iter_records(path))
    assert rsid == [r.rsid for r in recs] == ["rs1", "rs2"]
    np.testing.assert_array_equal(g, np.vstack([r.genotypes for r in recs]))


def test_native_format_extras_match_python(tmp_path, built):
    """FORMAT columns beyond GT (GT:DP:...) must parse the leading GT."""
    path = str(tmp_path / "fmt.vcf.gz")
    _write_gz_text(
        path, _HDR + [_rec(100, "rs1", "0|1:35", "1|1:7", fmt="GT:DP"),
                      _rec(300, "rs3", "1|1:2:x", "0|1:9:y", fmt="GT:DP:Z")],
    )
    g, pos, rsid, *_ = native.scan(path)
    recs = list(iter_records(path))
    assert rsid == [r.rsid for r in recs]
    np.testing.assert_array_equal(g, np.vstack([r.genotypes for r in recs]))


def test_native_truncated_bgzf_errors(tmp_path, built):
    """A truncated compressed stream must ERROR, never silently read as a
    shorter file — on both the single-threaded and block-parallel paths."""
    rng = np.random.default_rng(21)
    G = synth.correlated_haplotypes(rng, 60, 2 * 7)
    panel = synth.make_panel(7, rng)
    full = str(tmp_path / "full.vcf.gz")
    synth.write_vcf(full, "2", [r[0] for r in panel], G,
                    bgzf=True, bgzf_block=512)
    data = open(full, "rb").read()
    trunc = str(tmp_path / "trunc.vcf.gz")
    open(trunc, "wb").write(data[: len(data) // 2])
    for n_threads in (1, 4):
        with pytest.raises(native.NativeScanError):
            native.scan(trunc, n_threads=n_threads)


def test_native_ragged_genotype_row_errors(tmp_path, built):
    path = str(tmp_path / "rag.vcf.gz")
    _write_gz_text(
        path, _HDR + ["1\t100\trs1\tA\tG\t.\tPASS\tVT=SNP\tGT\t0|1"],
    )
    with pytest.raises(native.NativeScanError):
        native.scan(path)


def test_native_missing_and_bad_allele_codes_error(tmp_path, built):
    for name, gts in (("miss", (".|1", "1|1")), ("code", ("0|2", "1|1")),
                      ("empty", ("", "1|1")), ("tri", ("0|1|1", "1|1"))):
        path = str(tmp_path / f"{name}.vcf.gz")
        _write_gz_text(path, _HDR + [_rec(100, "rs1", *gts)])
        with pytest.raises(native.NativeScanError):
            native.scan(path)


def test_native_haploid_cells_parse_with_ploidy_profiles(tmp_path, built):
    """chrX/chrY-style mixed ploidy: haploid cells pack at column 2*s with
    column 2*s+1 zeroed, and per-variant ploidy profiles are interned
    (the reference ingests these via pysam's ploidy-agnostic GT tuples,
    ld_area.py:230-235)."""
    from ld_tools_tpu.ingest import _vcfpack_ctypes as ctbind

    path = str(tmp_path / "mix.vcf.gz")
    _write_gz_text(
        path,
        _HDR + [
            _rec(100, "rs1", "0|1", "1|1"),   # all diploid -> profile 0
            _rec(200, "rs2", "1", "0|1"),     # sample 0 haploid
            _rec(300, "rs3", "1", "0|1"),     # same profile as rs2
            _rec(400, "rs4", "0", "1"),       # both haploid
        ],
    )
    for n_threads in (1, 4):
        (packed, h, pos, rsid, ref, alt, vt, samples, pgroup,
         profiles) = ctbind.scan_packed(path, n_threads=n_threads)
        g = np.unpackbits(packed, axis=1, count=h).astype(np.int8)
        np.testing.assert_array_equal(
            g, [[0, 1, 1, 1], [1, 0, 0, 1], [1, 0, 0, 1], [0, 0, 1, 0]]
        )
        assert profiles.tolist() == [[2, 2], [1, 2], [1, 1]]
        assert pgroup.tolist() == [0, 1, 1, 2]


def test_native_mixed_ploidy_fuzz_bgzf_seams(tmp_path, built):
    """Random per-cell ploidy patterns across tiny BGZF blocks: the
    multithreaded scanner's seam-line parsing and profile interning must
    match the pure-Python parser exactly."""
    from ld_tools_tpu.ingest import _vcfpack_ctypes as ctbind
    from ld_tools_tpu.ingest import synth, vcf as vcf_mod

    rng = np.random.default_rng(13)
    n_samples, n_var = 17, 120
    names = [f"S{i:03d}" for i in range(n_samples)]
    G = (rng.random((n_var, 2 * n_samples)) < 0.4).astype(np.int8)
    hap = rng.random((n_var, n_samples)) < 0.3
    G[np.repeat(hap, 2, axis=1) & (np.arange(2 * n_samples) % 2 == 1)] = 0
    path = str(tmp_path / "fuzz.vcf.gz")
    synth.write_vcf(path, "7", names, G, haploid_masks=hap,
                    bgzf=True, bgzf_block=256)

    recs = list(vcf_mod.iter_records(path))
    Gp = np.stack([r.genotypes for r in recs])
    for n_threads in (1, 4):
        (packed, h, pos, rsid, ref, alt, vt, samples, pgroup,
         profiles) = ctbind.scan_packed(path, n_threads=n_threads)
        Gn = np.unpackbits(packed, axis=1, count=h).astype(np.int8)
        np.testing.assert_array_equal(Gn, Gp)
        for rec, gid in zip(recs, pgroup):
            prof = profiles[gid]
            if rec.ploidy is None:
                assert (prof == 2).all()
            else:
                np.testing.assert_array_equal(prof, rec.ploidy)


def test_record_after_duplicate_run_is_kept(tmp_path, built):
    """Regression (r5 review): the single-threaded scanner's parse
    double-buffer must not recycle the buffer the pending view aliases
    after a duplicate-triple run — the first DISTINCT record following
    the run was silently dropped."""
    rng = np.random.default_rng(3)
    G = synth.correlated_haplotypes(rng, 6, 12)
    panel = synth.make_panel(6, rng)
    names = [r[0] for r in panel]
    # rs5001/rs5001 at pos 5000 is a dup run (dropped entirely);
    # rs5002 at the SAME pos must survive, as must rs5003 after it
    extra = [
        (5000, synth.raw_record("4", 5000, "rs5001", G[0])),
        (5000, synth.raw_record("4", 5000, "rs5001", G[0])),
        (5000, synth.raw_record("4", 5000, "rs5002", G[1])),
        (5001, synth.raw_record("4", 5001, "rs5003", G[2])),
    ]
    for bgzf, n_threads in ((False, 1), (True, 2)):
        path = str(tmp_path / f"4_{int(bgzf)}.vcf.gz")
        synth.write_vcf(path, "4", names, G, extra_records=extra,
                        bgzf=bgzf, bgzf_block=256 if bgzf else None)
        _, _, rsid, *_ = native.scan(path, n_threads=n_threads)
        assert "rs5001" not in rsid
        assert "rs5002" in rsid, (bgzf, n_threads)
        assert "rs5003" in rsid, (bgzf, n_threads)
        # python parser agreement
        py_rsids = [r.rsid for r in iter_records(path)]
        assert sorted(r for r in rsid) == sorted(py_rsids)


def _bgzf_members(data: bytes):
    """Offsets + sizes of BGZF members by walking the BC subfields."""
    out = []
    off = 0
    while off < len(data):
        assert data[off] == 0x1F and data[off + 1] == 0x8B
        xlen = int.from_bytes(data[off + 10:off + 12], "little")
        extra = data[off + 12:off + 12 + xlen]
        i = 0
        bsize = None
        while i + 4 <= len(extra):
            si1, si2 = extra[i], extra[i + 1]
            slen = int.from_bytes(extra[i + 2:i + 4], "little")
            if si1 == ord("B") and si2 == ord("C") and slen == 2:
                bsize = int.from_bytes(extra[i + 4:i + 6], "little") + 1
                bc_off = off + 12 + i + 4
                break
            i += 4 + slen
        assert bsize is not None
        out.append((off, bsize, bc_off))
        off += bsize
    return out


def test_native_headerless_file_errors(tmp_path, built):
    """A file with no #CHROM line at all must error (contract parser
    raises), not return a silent (0, 0) result — both modes."""
    import gzip

    plain = tmp_path / "h.vcf"
    plain.write_text("##fileformat=VCFv4.1\n")
    with pytest.raises(native.NativeScanError, match="CHROM"):
        native.scan(str(plain), n_threads=1)
    gz = tmp_path / "h.vcf.gz"
    gz.write_bytes(gzip.compress(b"##fileformat=VCFv4.1\n"))
    with pytest.raises(native.NativeScanError, match="CHROM"):
        native.scan(str(gz), n_threads=2)


def test_native_truncated_record_errors(tmp_path, built):
    """An rs data line cut short of its genotype section must error
    (the contract parser's fields[9] access raises), not be skipped."""
    p = tmp_path / "t.vcf"
    p.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\n"
        "1\t100\trs1\tA\tG\t.\tPASS\tVT=SNP\tGT\n"  # 9 fields, no GT cell
    )
    with pytest.raises(native.NativeScanError, match="truncated|genotype"):
        native.scan(str(p), n_threads=1)


def test_native_bad_pos_errors(tmp_path, built):
    p = tmp_path / "p.vcf"
    p.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\n"
        "1\t\trs1\tA\tG\t.\tPASS\tVT=SNP\tGT\t0|1\n"
    )
    with pytest.raises(native.NativeScanError, match="POS"):
        native.scan(str(p), n_threads=1)


def test_native_corrupt_bgzf_bc_field(tmp_path, built):
    """A mid-stream member whose BC size field is below its own header
    size must error cleanly (it used to underflow size_t and write out
    of bounds)."""
    rng = np.random.default_rng(5)
    G = synth.correlated_haplotypes(rng, 40, 12)
    panel = synth.make_panel(6, rng)
    path = str(tmp_path / "c.vcf.gz")
    synth.write_vcf(path, "7", [r[0] for r in panel], G, bgzf=True,
                    bgzf_block=256)
    data = bytearray(open(path, "rb").read())
    members = _bgzf_members(bytes(data))
    assert len(members) > 3
    _, _, bc_off = members[2]
    data[bc_off:bc_off + 2] = (4).to_bytes(2, "little")  # member_size=5
    open(path, "wb").write(bytes(data))
    with pytest.raises(native.NativeScanError):
        native.scan(path, n_threads=2)


def test_native_corrupt_bgzf_isize(tmp_path, built):
    """A member whose ISIZE trailer claims gigabytes must error instead
    of pre-allocating attacker-controlled memory."""
    rng = np.random.default_rng(6)
    G = synth.correlated_haplotypes(rng, 40, 12)
    panel = synth.make_panel(6, rng)
    path = str(tmp_path / "i.vcf.gz")
    synth.write_vcf(path, "7", [r[0] for r in panel], G, bgzf=True,
                    bgzf_block=256)
    data = bytearray(open(path, "rb").read())
    members = _bgzf_members(bytes(data))
    off, bsize, _ = members[2]
    data[off + bsize - 4:off + bsize] = (0xFFFFFFF0).to_bytes(4, "little")
    open(path, "wb").write(bytes(data))
    with pytest.raises(native.NativeScanError):
        native.scan(path, n_threads=2)


def test_build_failure_leaves_no_temp_and_raises(tmp_path, monkeypatch):
    """A failed compile must raise NativeUnavailable and clean up the
    per-process temp object (builds go to a temp path + atomic rename so
    concurrent pool workers never dlopen a half-written .so)."""
    import importlib

    import ld_tools_tpu.ingest._vcfpack_ctypes as vp

    bad_src = tmp_path / "broken.cpp"
    bad_src.write_text("this is not C++\n")
    monkeypatch.setenv("TPU_LD_NATIVE_SRC", str(bad_src))
    mod = importlib.reload(vp)
    try:
        assert mod._SRC == str(bad_src)
        with pytest.raises(mod.NativeUnavailable):
            mod._build()
        leftovers = [p for p in os.listdir(os.path.dirname(mod._LIB))
                     if p.startswith(os.path.basename(mod._LIB) + ".tmp.")]
        assert leftovers == []
    finally:
        monkeypatch.delenv("TPU_LD_NATIVE_SRC")
        importlib.reload(vp)
