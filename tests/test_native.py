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
