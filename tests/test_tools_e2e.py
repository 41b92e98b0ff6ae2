"""End-to-end tool tests: synthetic store -> tool runs -> file parity."""

import json
import os
import types

import numpy as np
import pytest

from ld_tools_tpu.ingest import (
    HaplotypeStore,
    get_sample_names,
    prep_intgen_data,
    synth,
)
from ld_tools_tpu.tools import area, lite, triangle
from ld_tools_tpu.tools.common import (
    DifChrsError,
    NotInIntgenConvDbError,
    NotRsIdError,
)

from .oracle import oracle_ld


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("intgen"))
    rs_by_chrom = synth.generate_dataset(
        d, n_samples=25, chrom_variant_counts={"5": 18, "11": 7}, seed=42
    )
    db = prep_intgen_data(d)
    src = str(tmp_path_factory.mktemp("src"))
    all_rs = list(rs_by_chrom["5"]) + list(rs_by_chrom["11"])
    with open(os.path.join(src, "query.txt"), "w") as fh:
        fh.write("\n".join(all_rs) + "\n")
    return types.SimpleNamespace(
        intgen=d, db=db, rs_by_chrom=rs_by_chrom, src=src
    )


def _cohort_lists(env, chrom, rsids):
    """Genotype lists per rsID the way the reference gathers them."""
    store = HaplotypeStore(env.intgen)
    cd = store.chrom(chrom)
    samples = get_sample_names(("male", "female"), ("ALL",), env.db)
    cols = cd.haplotype_columns(samples)
    return {r: list(map(int, cd.genotypes[cd.row_of(r)][cols])) for r in rsids}


def _lite_args(env, rs1, rs2, **kw):
    return types.SimpleNamespace(
        rs_id_1=rs1,
        rs_id_2=rs2,
        intgen_dir_path=env.intgen,
        skip_intgen_data_ver=True,
        gend_names=kw.get("gend_names", "both"),
        pop_names=kw.get("pop_names", "all"),
    )


def test_lite_table(env):
    rs = list(env.rs_by_chrom["5"])
    table = lite.run(_lite_args(env, rs[0], rs[3]))
    gl = _cohort_lists(env, "5", [rs[0], rs[3]])
    expected = oracle_ld(gl[rs[0]], gl[rs[3]])
    assert str(expected["r_square"]) in table
    assert str(expected["d_prime"]) in table
    assert rs[0] in table and rs[3] in table
    pos_diff = abs(env.rs_by_chrom["5"][rs[0]] - env.rs_by_chrom["5"][rs[3]])
    assert str(pos_diff) in table


def test_lite_errors(env):
    with pytest.raises(NotRsIdError):
        lite.run(_lite_args(env, "notanid", "rs10001"))
    with pytest.raises(NotInIntgenConvDbError):
        lite.run(_lite_args(env, "rs999999999", "rs10001"))
    rs5 = list(env.rs_by_chrom["5"])[0]
    rs11 = list(env.rs_by_chrom["11"])[0]
    with pytest.raises(DifChrsError):
        lite.run(_lite_args(env, rs5, rs11))


def _area_args(env, trg, **kw):
    return types.SimpleNamespace(
        src_dir_path=env.src,
        intgen_dir_path=env.intgen,
        trg_top_dir_path=trg,
        meta_lines_quan=0,
        skip_intgen_data_ver=True,
        gend_names="both",
        pop_names="all",
        flank_size=kw.get("flank_size", 10**6),
        ld_thres_measure=kw.get("measure", "r_square"),
        ld_low_thres=kw.get("thres", 0.5),
        trg_file_type=kw.get("file_type", "tsv"),
        max_proc_quan=4,
    )


def test_area_tsv_matches_oracle(env, tmp_path):
    trg = str(tmp_path)
    area.run(_area_args(env, trg, thres=0.5))
    rs5 = list(env.rs_by_chrom["5"])
    gl = _cohort_lists(env, "5", rs5)
    chr_dir = os.path.join(trg, "query_in_LD", "5")
    assert os.path.isdir(chr_dir)

    found_any = False
    for q in rs5:
        path = os.path.join(chr_dir, f"{q}_chr5_r_0.5.tsv")
        # expected opponents per the oracle
        expected = {}
        for o in rs5:
            if o == q:
                continue
            res = oracle_ld(gl[q], gl[o])
            if res["r_square"] >= 0.5:
                expected[o] = res
        if not expected:
            assert not os.path.exists(path)
            continue
        found_any = True
        with open(path) as fh:
            lines = fh.read().splitlines()
        assert lines[0].startswith('##chr="5" gends="male","female" pops="ALL"')
        assert "each_flank=1000000" in lines[0]
        assert "r_square_thres=0.5" in lines[0]
        assert lines[1] == "#hg38_pos\trsID\tref\talt\ttype\talt_freq\tr2\tD'\tdist"
        query_row = lines[2].split("\t")
        assert query_row[1] == q
        assert query_row[6:9] == ["quer", "quer", "quer"]
        got = {}
        for line in lines[3:]:
            f = line.split("\t")
            got[f[1]] = f
            # dist column is signed opponent_pos - query_pos
            assert int(f[8]) == int(f[0]) - env.rs_by_chrom["5"][q]
        assert set(got) == set(expected)
        for o, res in expected.items():
            assert got[o][6] == str(res["r_square"])
            assert got[o][7] == str(res["d_prime"])
            assert got[o][5] == str(res["var_2_alt_freq"])
    assert found_any, "no query produced hits; fixture too weak"


def test_area_json_and_rsids(env, tmp_path):
    trg_json = str(tmp_path / "j")
    area.run(_area_args(env, trg_json, thres=0.5, file_type="json"))
    chr_dir = os.path.join(trg_json, "query_in_LD", "5")
    files = os.listdir(chr_dir)
    assert files and all(f.endswith(".json") for f in files)
    with open(os.path.join(chr_dir, files[0])) as fh:
        obj = json.load(fh)
    assert obj[0]["chr"] == "5"
    assert obj[0]["gends"] == ["male", "female"]
    assert obj[1]["r2"] == "quer"
    assert len(obj) >= 3
    for entry in obj[2:]:
        assert set(entry) == {
            "hg38_pos", "rsID", "ref", "alt", "type", "alt_freq",
            "r2", "D'", "dist",
        }

    trg_rs = str(tmp_path / "r")
    area.run(_area_args(env, trg_rs, thres=0.5, file_type="rsids"))
    chr_dir = os.path.join(trg_rs, "query_in_LD", "5")
    files = os.listdir(chr_dir)
    assert files and all(f.endswith(".txt") for f in files)
    with open(os.path.join(chr_dir, files[0])) as fh:
        lines = fh.read().splitlines()
    assert lines[0].startswith("##")
    assert lines[1] == "#rsID"
    assert all(r.startswith("rs") for r in lines[2:])


def test_area_grouping_invariant(env, tmp_path, monkeypatch):
    """The window-true greedy grouping must be a pure batching detail:
    forcing one-query groups (tiny cell budget) and a small flank produces
    byte-identical result trees to the default wide grouping."""

    def run_tree(trg, limit):
        monkeypatch.setattr(area, "_DENSE_CELL_LIMIT", limit)
        area.run(_area_args(env, trg, thres=0.2, flank_size=40_000))
        tree = {}
        for dirpath, _, files in os.walk(trg):
            for name in files:
                p = os.path.join(dirpath, name)
                with open(p) as fh:
                    tree[os.path.relpath(p, trg)] = fh.read()
        return tree

    wide = run_tree(str(tmp_path / "wide"), 16_000_000)
    narrow = run_tree(str(tmp_path / "narrow"), 1)
    assert wide and wide == narrow


def test_area_high_threshold_writes_nothing(env, tmp_path):
    trg = str(tmp_path)
    written = area.run(_area_args(env, trg, thres=1.1))
    assert written == 0
    chr_dir = os.path.join(trg, "query_in_LD", "5")
    # chromosome dirs are created (reference behavior) but stay empty
    assert os.path.isdir(chr_dir) and os.listdir(chr_dir) == []


def _triangle_args(env, trg, **kw):
    return types.SimpleNamespace(
        src_dir_path=env.src,
        intgen_dir_path=env.intgen,
        trg_top_dir_path=trg,
        meta_lines_quan=0,
        skip_intgen_data_ver=True,
        gend_names="both",
        pop_names="all",
        ld_measure=kw.get("measure", "r_square"),
        ld_low_thres=kw.get("thres", None),
        matrix_type=kw.get("matrix_type", "both"),
        heatmap_json=kw.get("heatmap_json", True),
        disp_letters=kw.get("disp_letters", False),
        color_pal=kw.get("color_pal", "greens"),
        font_size=None,
        square_shape=False,
        dont_disp_footer=False,
        max_proc_quan=4,
    )


def test_triangle_tsv_matches_oracle(env, tmp_path):
    trg = str(tmp_path)
    n = triangle.run(_triangle_args(env, trg))
    assert n == 2  # one matrix per chromosome
    matr_dir = os.path.join(trg, "query_LD_matr")
    tsv_path = os.path.join(matr_dir, "query_chr5_r.tsv")
    with open(tsv_path) as fh:
        lines = fh.read().splitlines()
    assert lines[0].startswith("##General\tinfo:\tr_square\tchr5\tALL")
    assert lines[1] == ""
    rsids = lines[2].split("\t")[2:]
    poss = list(map(int, lines[3].split("\t")[2:]))
    assert poss == sorted(poss)
    gl = _cohort_lists(env, "5", rsids)
    matrix = [line.split("\t") for line in lines[4:]]
    assert len(matrix) == len(rsids)
    for i, row in enumerate(matrix):
        assert row[0] == rsids[i]
        assert int(row[1]) == poss[i]
        vals = row[2:]
        for j in range(len(rsids)):
            if i <= j:
                assert vals[j] == "0"
            else:
                expected = oracle_ld(gl[rsids[i]], gl[rsids[j]])
                assert vals[j] == str(expected["r_square"]), (i, j)


def test_triangle_threshold_zeroes_cells(env, tmp_path):
    trg = str(tmp_path)
    triangle.run(_triangle_args(env, trg, thres=0.9, matrix_type="table"))
    tsv_path = os.path.join(trg, "query_LD_matr", "query_chr5_r.tsv")
    with open(tsv_path) as fh:
        lines = fh.read().splitlines()
    rsids = lines[2].split("\t")[2:]
    gl = _cohort_lists(env, "5", rsids)
    matrix = [line.split("\t") for line in lines[4:]]
    for i, row in enumerate(matrix):
        for j in range(i):
            expected = oracle_ld(gl[rsids[i]], gl[rsids[j]])
            want = (
                str(expected["r_square"])
                if expected["r_square"] >= 0.9
                else "0"
            )
            assert row[2 + j] == want


def test_triangle_heatmap_outputs(env, tmp_path):
    trg = str(tmp_path)
    triangle.run(_triangle_args(env, trg, disp_letters=True))
    matr_dir = os.path.join(trg, "query_LD_matr")
    html_path = os.path.join(matr_dir, "query_chr5_r.html")
    json_path = os.path.join(matr_dir, "query_chr5_r.json")
    assert os.path.exists(html_path)
    with open(json_path) as fh:
        fig = json.load(fh)
    trace = fig["data"][0]
    assert trace["type"] == "heatmap"
    n = len(trace["z"])
    assert n == 18
    assert trace["x"] == trace["y"] and len(trace["x"]) == n
    assert trace["hoverinfo"] == "text"
    # hovertext exists pre-threshold for lower-triangle cells
    assert "r2:" in trace["hovertext"][2][1]
    assert fig["layout"]["yaxis"]["autorange"] == "reversed"
    assert len(fig["layout"]["annotations"]) == n * n
    with open(html_path) as fh:
        html = fh.read()
    assert "canvas" in html and "hovertext" in html


def test_triangle_single_variant_chrom_skipped(env, tmp_path):
    src = str(tmp_path / "src1")
    os.makedirs(src)
    one = list(env.rs_by_chrom["11"])[0]
    with open(os.path.join(src, "one.txt"), "w") as fh:
        fh.write(one + "\n")
    args = _triangle_args(env, str(tmp_path / "t"))
    args.src_dir_path = src
    n = triangle.run(args)
    assert n == 0
    assert not os.path.exists(os.path.join(str(tmp_path / "t"), "one_LD_matr"))


def test_triangle_fast_table_matches_object_path(env, tmp_path):
    """The vectorized table writer must be byte-identical to the
    object-array path (exercised via matrix_type='both')."""
    trg_a = str(tmp_path / "a")
    trg_b = str(tmp_path / "b")
    triangle.run(_triangle_args(env, trg_a, matrix_type="table", thres=0.4))
    triangle.run(_triangle_args(env, trg_b, matrix_type="both", thres=0.4))
    for chrom in ("5", "11"):
        pa = os.path.join(trg_a, "query_LD_matr", f"query_chr{chrom}_r.tsv")
        pb = os.path.join(trg_b, "query_LD_matr", f"query_chr{chrom}_r.tsv")
        assert open(pa).read() == open(pb).read()
    # and for d_prime
    trg_c = str(tmp_path / "c")
    trg_d = str(tmp_path / "d")
    triangle.run(_triangle_args(env, trg_c, matrix_type="table",
                                measure="d_prime"))
    triangle.run(_triangle_args(env, trg_d, matrix_type="both",
                                measure="d_prime"))
    pa = os.path.join(trg_c, "query_LD_matr", "query_chr5_d.tsv")
    pb = os.path.join(trg_d, "query_LD_matr", "query_chr5_d.tsv")
    assert open(pa).read() == open(pb).read()


def test_triangle_streamed_table_multiblock_pipeline(env, tmp_path,
                                                     monkeypatch):
    """Force tiny row blocks so the streamed writer's two-slot async
    pipeline (pair_counts_async: block k+1 in flight while block k
    formats) runs several stages; output must stay byte-identical to the
    object-array path."""
    from ld_tools_tpu.tools.triangle import TriangleRunner

    orig = TriangleRunner._write_table_streamed

    def tiny_blocks(self, *a, **kw):
        kw["row_block"] = 4
        return orig(self, *a, **kw)

    monkeypatch.setattr(TriangleRunner, "_write_table_streamed", tiny_blocks)
    trg_a = str(tmp_path / "a")
    triangle.run(_triangle_args(env, trg_a, matrix_type="table", thres=0.4))
    monkeypatch.setattr(TriangleRunner, "_write_table_streamed", orig)
    trg_b = str(tmp_path / "b")
    triangle.run(_triangle_args(env, trg_b, matrix_type="both", thres=0.4))
    for chrom in ("5", "11"):
        pa = os.path.join(trg_a, "query_LD_matr", f"query_chr{chrom}_r.tsv")
        pb = os.path.join(trg_b, "query_LD_matr", f"query_chr{chrom}_r.tsv")
        assert open(pa).read() == open(pb).read()


def test_triangle_dprime_measure_matches_oracle(env, tmp_path):
    trg = str(tmp_path)
    triangle.run(_triangle_args(env, trg, measure="d_prime",
                                matrix_type="table"))
    tsv_path = os.path.join(trg, "query_LD_matr", "query_chr5_d.tsv")
    with open(tsv_path) as fh:
        lines = fh.read().splitlines()
    assert lines[0].startswith("##General\tinfo:\td_prime\tchr5")
    rsids = lines[2].split("\t")[2:]
    gl = _cohort_lists(env, "5", rsids)
    matrix = [line.split("\t") for line in lines[4:]]
    for i, row in enumerate(matrix):
        for j in range(i):
            expected = oracle_ld(gl[rsids[i]], gl[rsids[j]])
            assert row[2 + j] == str(expected["d_prime"]), (i, j)


def _scan_args(env, trg, **kw):
    return types.SimpleNamespace(
        chroms=kw.get("chroms", "5"),
        trg_dir_path=trg,
        intgen_dir_path=env.intgen,
        skip_intgen_data_ver=True,
        gend_names=kw.get("gend_names", "both"),
        pop_names=kw.get("pop_names", "all"),
        ld_measure=kw.get("ld_measure", "r_square"),
        ld_low_thres=kw.get("ld_low_thres", 0.2),
        max_dist=kw.get("max_dist", None),
        checkpoint_dir=None,
        devices=kw.get("devices", None),
    )


def test_scan_tool_oracle_parity_and_device_sharding(env, tmp_path):
    """ld_scan output rows must match brute-force oracle filtering, and a
    mesh-sharded run (-d all over the 8 virtual devices) must produce a
    byte-identical file."""
    from ld_tools_tpu.tools import scan

    single = str(tmp_path / "single")
    sharded = str(tmp_path / "sharded")
    assert scan.run(_scan_args(env, single)) == 1
    assert scan.run(_scan_args(env, sharded, devices="all")) == 1
    name = "ld_scan_chr5_r_0.2.tsv"
    with open(os.path.join(single, name)) as fh:
        body = fh.read()
    with open(os.path.join(sharded, name)) as fh:
        assert fh.read() == body

    rows = [
        ln.split("\t") for ln in body.splitlines() if not ln.startswith("#")
    ]
    rs5 = list(env.rs_by_chrom["5"])
    gl = _cohort_lists(env, "5", rs5)
    pos_of = env.rs_by_chrom["5"]
    expected = {}
    by_pos = sorted(rs5, key=lambda r: pos_of[r])
    for a_i in range(len(by_pos)):
        for b_i in range(a_i):
            ra, rb = by_pos[a_i], by_pos[b_i]
            out = oracle_ld(gl[ra], gl[rb])
            if out["r_square"] >= 0.2:
                expected[(ra, rb)] = out
    got = {(r[1], r[3]): r for r in rows}
    assert set(got) == set(expected)
    for key, r in got.items():
        out = expected[key]
        assert float(r[5]) == out["r_square"]
        assert float(r[6]) == out["d_prime"]
        assert int(r[4]) == pos_of[key[0]] - pos_of[key[1]]


def test_max_proc_quan_overlap_identical_outputs(env, tmp_path):
    """-p N (reference ld_area.py:324-339 / ld_triangle.py:394-408) fans
    source files over workers; outputs must be byte-identical to the
    sequential run for both tools."""
    src = str(tmp_path / "multi_src")
    os.makedirs(src)
    rs5 = list(env.rs_by_chrom["5"])
    rs11 = list(env.rs_by_chrom["11"])
    for k, sel in enumerate((rs5[:6], rs5[6:14], rs11, rs5[::2])):
        with open(os.path.join(src, f"q{k}.txt"), "w") as fh:
            fh.write("\n".join(sel) + "\n")

    def tree(trg):
        out = {}
        for dirpath, _, files in os.walk(trg):
            for name in files:
                p = os.path.join(dirpath, name)
                with open(p) as fh:
                    out[os.path.relpath(p, trg)] = fh.read()
        return out

    for tool, extra in (
        (area, dict(flank_size=10**6, ld_thres_measure="r_square",
                    ld_low_thres=0.3, trg_file_type="tsv")),
        (triangle, dict(ld_measure="r_square", ld_low_thres=None,
                        matrix_type="table", heatmap_json=False,
                        disp_letters=False, color_pal="greens",
                        font_size=None, square_shape=False,
                        dont_disp_footer=False)),
    ):
        trees = {}
        for p in (1, 4):
            trg = str(tmp_path / f"{tool.__name__.split('.')[-1]}_p{p}")
            args = types.SimpleNamespace(
                src_dir_path=src, intgen_dir_path=env.intgen,
                trg_top_dir_path=trg, meta_lines_quan=0,
                skip_intgen_data_ver=True, gend_names="both",
                pop_names="all", max_proc_quan=p, **extra,
            )
            tool.run(args)
            trees[p] = tree(trg)
        assert trees[1] and trees[1] == trees[4]


def test_empty_cohort_fails_at_selection(env):
    """An empty cohort selection raises an actionable error instead of
    the reference's downstream ZeroDivisionError (calc_ld, n == 0) or
    NaN-filled outputs."""
    rs = list(env.rs_by_chrom["5"])
    with pytest.raises(ValueError, match="no samples match"):
        lite.run(_lite_args(env, rs[0], rs[1], pop_names="ZZZ"))


def test_area_stale_file_removed_on_rerun_without_hits(tmp_path):
    """A pre-existing result file must not survive a rerun in which its
    query has no hits (reference's create-then-delete-if-empty end
    state, ld_area.py:291-292)."""
    from ld_tools_tpu.io.writers import AreaResultWriter

    path = tmp_path / "rsX_chr5_r_0.5.tsv"
    path.write_text("stale from an earlier run\n")
    w = AreaResultWriter(str(path), "tsv", ["chr"], ["5"],
                        [100, "rsX", "A", "G", "SNP", 0.5, "quer", "quer",
                         "quer"])
    assert w.flush() is False
    assert not path.exists()


def test_row_at_disambiguates_duplicate_rsids(env):
    """conversion.db can hold one rsID at two positions; queries must
    resolve by (pos, rsID), not first-match rsID."""
    from ld_tools_tpu.ingest import HaplotypeStore

    cd = HaplotypeStore(env.intgen).chrom("5")
    rs0 = str(cd.rsid[0])
    # same rsid at the recorded position resolves to that row
    assert cd.row_at(rs0, int(cd.pos[0])) == 0
    # wrong position falls back to the first-match row (reference
    # semantics: fetch at the recorded position, match rsID)
    assert cd.row_at(rs0, int(cd.pos[0]) + 10**7) == 0
    assert cd.row_at("rs404e404", int(cd.pos[0])) is None
