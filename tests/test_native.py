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
