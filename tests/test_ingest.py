"""Ingest pipeline: synthetic VCF -> packed store -> conversion.db."""

import os
import sqlite3

import numpy as np
import pytest

from ld_tools_tpu.ingest import (
    HaplotypeStore,
    create_src_dict,
    get_sample_names,
    prep_intgen_data,
)
from ld_tools_tpu.ingest import synth
from ld_tools_tpu.ingest.vcf import iter_records, read_sample_names


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("intgen"))
    rs_by_chrom = synth.generate_dataset(
        d,
        n_samples=30,
        chrom_variant_counts={"1": 25, "2": 12},
        seed=3,
        with_filtered_records=True,
    )
    db = prep_intgen_data(d)
    return d, db, rs_by_chrom


def test_vcf_parser_filters(tmp_path):
    d = str(tmp_path)
    synth.generate_dataset(
        d, n_samples=10, chrom_variant_counts={"9": 5}, seed=1,
        with_filtered_records=True,
    )
    recs = list(iter_records(os.path.join(d, "9.vcf.gz")))
    ids = [r.rsid for r in recs]
    assert len(recs) == 5
    assert "esv990381" not in ids  # non-rs
    assert "rs77777777" not in ids  # MULTI_ALLELIC
    assert "rs88888888" not in ids  # duplicate-triple run dropped entirely
    assert all(r.genotypes.shape == (20,) for r in recs)
    assert read_sample_names(os.path.join(d, "9.vcf.gz")) == [
        f"SYN{i:05d}" for i in range(10)
    ]


def test_parser_roundtrips_genotypes(tmp_path):
    rng = np.random.default_rng(5)
    G = synth.correlated_haplotypes(rng, 7, 16)
    panel = synth.make_panel(8, rng)
    path = str(tmp_path / "3.vcf.gz")
    synth.write_vcf(path, "3", [r[0] for r in panel], G)
    recs = list(iter_records(path))
    got = np.vstack([r.genotypes for r in recs])
    np.testing.assert_array_equal(got, G)


def test_prep_builds_store_and_db(dataset):
    d, db, rs_by_chrom = dataset
    store = HaplotypeStore(d)
    assert store.chroms() == ["1", "2"]
    c1 = store.chrom("1")
    assert c1.n_variants == 25
    assert c1.n_haplotypes == 60
    assert c1.genotypes.shape == (25, 60)
    assert set(np.unique(c1.genotypes)) <= {0, 1}
    # positions ascending, rsids resolvable
    assert np.all(np.diff(c1.pos) > 0)
    for rsid, pos in rs_by_chrom["1"].items():
        row = c1.row_of(rsid)
        assert row is not None and c1.pos[row] == pos

    with sqlite3.connect(db) as conn:
        n = conn.execute("SELECT COUNT(*) FROM variants").fetchone()[0]
        assert n == 25 + 12
        bad = conn.execute(
            "SELECT COUNT(*) FROM variants WHERE ID IN (?, ?, ?)",
            ("esv990381", "rs77777777", "rs88888888"),
        ).fetchone()[0]
        assert bad == 0


def test_prep_is_idempotent(dataset):
    d, db, _ = dataset
    db2 = prep_intgen_data(d)
    assert db2 == db
    with sqlite3.connect(db) as conn:
        n = conn.execute("SELECT COUNT(*) FROM variants").fetchone()[0]
        assert n == 37
        s = conn.execute("SELECT COUNT(*) FROM samples").fetchone()[0]
        assert s == 30


def test_window_semantics(dataset):
    d, _, _ = dataset
    c1 = HaplotypeStore(d).chrom("1")
    # tabix fetch(chrom, low, high): 1-based pos in (low, high]
    start, stop = c1.window(1000, 3000)
    assert list(c1.pos[start:stop]) == [2000, 3000]
    start, stop = c1.window(999, 1000)
    assert list(c1.pos[start:stop]) == [1000]
    start, stop = c1.window(0, 10**9)
    assert stop - start == 25


def test_cohort_selection(dataset):
    d, db, _ = dataset
    all_samples = get_sample_names(("male", "female"), ("ALL",), db)
    assert len(all_samples) == 30
    males = get_sample_names(("male",), ("ALL",), db)
    females = get_sample_names(("female",), ("ALL",), db)
    assert sorted(males + females) == sorted(all_samples)
    eur = get_sample_names(("male", "female"), ("EUR",), db)
    gbr = get_sample_names(("male", "female"), ("GBR",), db)
    assert set(gbr) <= set(eur)
    # super-pop + sub-pop overlap dedups (the double-OR semantics)
    both = get_sample_names(("male", "female"), ("EUR", "GBR"), db)
    assert sorted(both) == sorted(eur)

    c1 = HaplotypeStore(d).chrom("1")
    cols = c1.haplotype_columns(eur)
    assert len(cols) == 2 * len(eur)
    sub = c1.cohort_genotypes(eur)
    assert sub.shape == (25, 2 * len(eur))
    # absent samples silently skipped
    cols2 = c1.haplotype_columns(eur + ["NOT_A_SAMPLE"])
    np.testing.assert_array_equal(cols, cols2)


def test_create_src_dict(dataset, tmp_path):
    d, db, rs_by_chrom = dataset
    src_dir = str(tmp_path)
    rs1 = list(rs_by_chrom["1"])[:3]
    rs2 = list(rs_by_chrom["2"])[:2]
    with open(os.path.join(src_dir, "query.tsv"), "w") as fh:
        fh.write("# header line\n")
        fh.write("id_col\tother\n")
        for r in rs1 + rs2:
            fh.write(f"{r}\tannotation rs99999999\n")  # leftmost rs wins
        fh.write("no_variant_here\n")
        fh.write("rs4040404040\tunknown id drops silently\n")
    got = create_src_dict(src_dir, "query.tsv", 2, db)
    assert set(got) == {"1", "2"}
    assert sorted(r for _, r in got["1"]) == sorted(rs1)
    assert sorted(r for _, r in got["2"]) == sorted(rs2)
    for pos, rsid in got["1"]:
        assert rs_by_chrom["1"][rsid] == pos
    # empty source -> {}
    with open(os.path.join(src_dir, "empty.tsv"), "w") as fh:
        fh.write("nothing\n")
    assert create_src_dict(src_dir, "empty.tsv", 0, db) == {}


def test_genotype_rows_selective_unpack(dataset):
    d, _, _ = dataset
    from ld_tools_tpu.ingest import HaplotypeStore

    # fresh store instance: no cached full matrix
    cd = HaplotypeStore(d).chrom("1")
    sel = cd.genotype_rows([3, 0, 7])
    assert cd._G is None  # full matrix never unpacked
    full = cd.genotypes
    np.testing.assert_array_equal(sel, full[[3, 0, 7]])


def test_create_src_dict_chunks_large_rsid_sets(tmp_path):
    """IN-queries chunk below SQLite's bound-parameter cap: a GWAS-scale
    source table (hundreds of thousands of rsIDs) must resolve instead
    of raising 'too many SQL variables' (the reference's interpolated
    SQL had no cap)."""
    import sqlite3

    from ld_tools_tpu.ingest import create_src_dict

    db = tmp_path / "conv.db"
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE variants (CHROM TEXT, POS INT, ID TEXT)")
        conn.executemany(
            "INSERT INTO variants VALUES (?, ?, ?)",
            (("7", 100 + k, f"rs{k}") for k in range(0, 4000, 2)),
        )
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "big.txt", "w") as fh:
        for k in range(4000):  # half resolve, half are unknown
            fh.write(f"rs{k}\n")
    out = create_src_dict(str(src), "big.txt", 0, str(db))
    assert len(out["7"]) == 2000
    assert sorted(r for _, r in out["7"]) == sorted(
        f"rs{k}" for k in range(0, 4000, 2)
    )


def test_cohort_rejects_bare_strings(tmp_path):
    import pytest as _pytest

    from ld_tools_tpu.ingest import get_sample_names

    with _pytest.raises(TypeError, match="bare string"):
        get_sample_names("male", ("ALL",), str(tmp_path / "x.db"))


def test_empty_chromosome_cohort_raises(tmp_path):
    """A cohort matching the samples table but absent from one
    chromosome's store must fail actionably, not emit NaN tables."""
    import pytest as _pytest

    from ld_tools_tpu.ingest import HaplotypeStore, synth
    from ld_tools_tpu.ingest.prep import prep_intgen_data

    d = str(tmp_path / "data")
    import os as _os

    _os.makedirs(d)
    synth.generate_dataset(
        d, n_samples=6, chrom_variant_counts={"9": 5}, seed=3
    )
    prep_intgen_data(d)
    cd = HaplotypeStore(d).chrom("9")
    with _pytest.raises(ValueError, match="none of the"):
        cd.cohort_ploidy(["NOT_A_SAMPLE_1", "NOT_A_SAMPLE_2"])


def test_pack_rejects_unsorted_positions(tmp_path):
    from ld_tools_tpu.ingest import pack

    G = np.zeros((3, 8), dtype=np.int8)
    with pytest.raises(ValueError, match="ascending"):
        pack.write_chrom(
            str(tmp_path), "3", genotypes=G, pos=[100, 50, 200],
            rsid=["rs1", "rs2", "rs3"], ref=["A"] * 3, alt=["G"] * 3,
            vt=["SNP"] * 3, samples=["S0", "S1", "S2", "S3"],
        )


def test_repack_clears_stale_meta_and_pgroup(tmp_path):
    """Re-packing must drop the old completion marker first and never
    leave a stale mixed-ploidy sidecar behind an all-diploid re-pack."""
    import os

    from ld_tools_tpu.ingest import pack

    kw = dict(rsid=["rs1", "rs2"], ref=["A"] * 2, alt=["G"] * 2,
              vt=["SNP"] * 2, samples=["S0", "S1"])
    G = np.zeros((2, 4), dtype=np.int8)
    prof = np.array([[2, 1], [2, 2]], dtype=np.uint8)
    pack.write_chrom(str(tmp_path), "8", genotypes=G, pos=[10, 20],
                     pgroup=np.array([0, 1], np.int16),
                     ploidy_profiles=prof, **kw)
    d = pack.chrom_dir(str(tmp_path), "8")
    assert os.path.exists(os.path.join(d, "pgroup.npy"))
    pack.write_chrom(str(tmp_path), "8", genotypes=G, pos=[10, 20], **kw)
    assert not os.path.exists(os.path.join(d, "pgroup.npy"))
    assert pack.read_meta(str(tmp_path), "8").get("ploidy_profiles") is None
