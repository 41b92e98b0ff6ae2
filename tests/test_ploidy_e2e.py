"""Mixed-ploidy (chrX/chrY) end-to-end parity with reference semantics.

The reference ingests 1000G chrX/chrY through pysam's ploidy-agnostic GT
tuples: each sample contributes however many alleles it has
(ld_area.py:230-235), and calc_ld zips the two lists down to the shorter
one while counting each side over its own full list (calc_ld.py:30-44).
These tests build a chrX-like fixture (males haploid outside the PAR
bands) and a chrY-like one (male-only, all haploid), run every tool
through the packed store, and compare against the oracle fed the exact
flat lists the reference would gather.
"""

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

from .oracle import oracle_ld


@pytest.fixture(scope="module")
def xenv(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("intgen_x"))
    rng = np.random.default_rng(77)
    panel = synth.make_panel(24, rng)
    # ensure both genders are present
    panel[0] = (panel[0][0], panel[0][1], panel[0][2], "male")
    panel[1] = (panel[1][0], panel[1][1], panel[1][2], "female")
    synth.write_panel(os.path.join(d, "samples.txt"), panel)
    names = [r[0] for r in panel]
    genders = [r[3] for r in panel]

    GX, hapX = synth.make_chrx_layout(rng, 36, genders, par_bounds=(0.25, 0.75))
    rs_x = synth.write_vcf(
        os.path.join(d, "X.vcf.gz"), "X", names, GX, haploid_masks=hapX
    )

    # chrY-like: male-only sample columns, every cell haploid
    male_names = [n for n, g in zip(names, genders) if g == "male"]
    GY = synth.correlated_haplotypes(rng, 12, 2 * len(male_names))
    GY[:, 1::2] = 0
    hapY = np.ones((12, len(male_names)), dtype=bool)
    rs_y = synth.write_vcf(
        os.path.join(d, "Y.vcf.gz"), "Y", male_names, GY,
        haploid_masks=hapY, pos_step=500,
        rsids=[f"rs9{i:04d}" for i in range(12)],
    )

    db = prep_intgen_data(d)
    src = str(tmp_path_factory.mktemp("src_x"))
    with open(os.path.join(src, "query.txt"), "w") as fh:
        fh.write("\n".join(list(rs_x) + list(rs_y)) + "\n")
    return types.SimpleNamespace(
        intgen=d, db=db, src=src, names=names, genders=genders,
        GX=GX, hapX=hapX, rs_x=rs_x, male_names=male_names,
        GY=GY, rs_y=rs_y,
    )


def _flat_lists(xenv, chrom, gends=("male", "female")):
    """{rsid: reference-style flat genotype list} for the ALL cohort."""
    cohort = get_sample_names(gends, ("ALL",), xenv.db)
    if chrom == "X":
        G, hap, rs_map, file_names = (
            xenv.GX, xenv.hapX, xenv.rs_x, xenv.names,
        )
    else:
        G, hap, rs_map, file_names = (
            xenv.GY, np.ones((12, len(xenv.male_names)), dtype=bool),
            xenv.rs_y, xenv.male_names,
        )
    col_of = {n: i for i, n in enumerate(file_names)}
    out = {}
    for vi, rsid in enumerate(rs_map):
        flat = []
        for name in cohort:
            s = col_of.get(name)
            if s is None:
                continue
            if hap[vi, s]:
                flat.append(int(G[vi, 2 * s]))
            else:
                flat += [int(G[vi, 2 * s]), int(G[vi, 2 * s + 1])]
        out[rsid] = flat
    return out


def test_store_has_ploidy_profiles(xenv):
    cd = HaplotypeStore(xenv.intgen).chrom("X")
    assert cd.ploidy_profiles is not None
    assert (cd.ploidy_profiles[0] == 2).all()
    groups = np.unique(cd.pgroup)
    assert groups.size == 2  # all-diploid PAR + male-haploid non-PAR
    cdy = HaplotypeStore(xenv.intgen).chrom("Y")
    assert cdy.ploidy_profiles is not None
    assert np.unique(cdy.pgroup).size == 1  # uniformly haploid


def _lite_args(xenv, rs1, rs2, gends="both"):
    return types.SimpleNamespace(
        rs_id_1=rs1,
        rs_id_2=rs2,
        intgen_dir_path=xenv.intgen,
        skip_intgen_data_ver=True,
        gend_names=gends,
        pop_names="all",
    )


def test_lite_chrx_cross_region_pairs(xenv):
    """PAR x PAR, non-PAR x non-PAR, and PAR x non-PAR (unequal list
    lengths) all match the reference math through the CLI tool."""
    rs = list(xenv.rs_x)
    gl = _flat_lists(xenv, "X")
    par, nonpar = rs[2], rs[18]  # bounds (0.25, 0.75) of 36 -> 9..26
    for a, b in ((rs[0], par), (rs[12], nonpar), (par, nonpar),
                 (nonpar, par)):
        table = lite.run(_lite_args(xenv, a, b))
        expected = oracle_ld(gl[a], gl[b])
        assert str(expected["r_square"]) in table, (a, b)
        assert str(expected["d_prime"]) in table, (a, b)
    assert len(gl[par]) != len(gl[nonpar])  # fixture really is mixed


def test_lite_chry_pair(xenv):
    rs = list(xenv.rs_y)
    gl = _flat_lists(xenv, "Y")
    table = lite.run(_lite_args(xenv, rs[0], rs[5]))
    expected = oracle_ld(gl[rs[0]], gl[rs[5]])
    assert str(expected["r_square"]) in table
    assert str(expected["d_prime"]) in table


def test_area_chrx_matches_reference_semantics(xenv, tmp_path):
    trg = str(tmp_path)
    args = types.SimpleNamespace(
        src_dir_path=xenv.src,
        intgen_dir_path=xenv.intgen,
        trg_top_dir_path=trg,
        meta_lines_quan=0,
        skip_intgen_data_ver=True,
        gend_names="both",
        pop_names="all",
        flank_size=10**6,
        ld_thres_measure="r_square",
        ld_low_thres=0.3,
        trg_file_type="tsv",
        max_proc_quan=1,
    )
    area.run(args)
    rs = list(xenv.rs_x)
    gl = _flat_lists(xenv, "X")
    chr_dir = os.path.join(trg, "query_in_LD", "X")
    assert os.path.isdir(chr_dir)
    checked_cross = 0
    for q in rs:
        path = os.path.join(chr_dir, f"{q}_chrX_r_0.3.tsv")
        expected = {}
        for o in rs:
            if o == q:
                continue
            res = oracle_ld(gl[q], gl[o])
            if res["r_square"] >= 0.3:
                expected[o] = res
        if not expected:
            assert not os.path.exists(path)
            continue
        with open(path) as fh:
            lines = fh.read().splitlines()
        # query annotation row freq divides by the query's OWN list
        # length (reference ld_area.py:188-189)
        query_row = lines[2].split("\t")
        own = round(gl[q].count(1) / len(gl[q]), 4)
        assert query_row[5] == str(own)
        got = {}
        for line in lines[3:]:
            f = line.split("\t")
            got[f[1]] = f
        assert set(got) == set(expected), q
        for o, res in expected.items():
            assert got[o][6] == str(res["r_square"]), (q, o)
            assert got[o][7] == str(res["d_prime"]), (q, o)
            # opponent freq divides by the PAIR's htypes_quan
            assert got[o][5] == str(res["var_2_alt_freq"]), (q, o)
            if len(gl[q]) != len(gl[o]):
                checked_cross += 1
    assert checked_cross > 0, "no cross-region hits; fixture too weak"


def test_triangle_chrx_table_matches_oracle(xenv, tmp_path):
    trg = str(tmp_path)
    args = types.SimpleNamespace(
        src_dir_path=xenv.src,
        intgen_dir_path=xenv.intgen,
        trg_top_dir_path=trg,
        meta_lines_quan=0,
        skip_intgen_data_ver=True,
        gend_names="both",
        pop_names="all",
        ld_measure="r_square",
        ld_low_thres=None,
        matrix_type="table",
        heatmap_json=False,
        disp_letters=False,
        color_pal="greens",
        font_size=None,
        square_shape=False,
        dont_disp_footer=True,
        max_proc_quan=1,
    )
    triangle.run(args)
    rs = list(xenv.rs_x)
    gl = _flat_lists(xenv, "X")
    path = os.path.join(trg, "query_LD_matr", "query_chrX_r.tsv")
    with open(path) as fh:
        lines = fh.read().splitlines()
    order = lines[2].split("\t")[2:]
    body = {ln.split("\t")[0]: ln.split("\t")[2:] for ln in lines[4:]}
    for i, yrs in enumerate(order):
        for j, xrs in enumerate(order[:i]):
            want = oracle_ld(gl[yrs], gl[xrs])["r_square"]
            assert body[yrs][j] == str(want), (yrs, xrs)


def test_triangle_chrx_heatmap_hover_pair_freqs(xenv, tmp_path):
    """Hover freqs on mixed chromosomes are pair-dependent (the
    reference interpolates trg_vals of the PAIR, ld_triangle.py:211-213)."""
    import json

    trg = str(tmp_path)
    args = types.SimpleNamespace(
        src_dir_path=xenv.src,
        intgen_dir_path=xenv.intgen,
        trg_top_dir_path=trg,
        meta_lines_quan=0,
        skip_intgen_data_ver=True,
        gend_names="both",
        pop_names="all",
        ld_measure="r_square",
        ld_low_thres=None,
        matrix_type="heatmap",
        heatmap_json=True,
        disp_letters=False,
        color_pal="greens",
        font_size=None,
        square_shape=False,
        dont_disp_footer=True,
        max_proc_quan=1,
    )
    triangle.run(args)
    rs = list(xenv.rs_x)
    gl = _flat_lists(xenv, "X")
    path = os.path.join(trg, "query_LD_matr", "query_chrX_r.json")
    with open(path) as fh:
        fig = json.load(fh)
    hover = fig["data"][0]["hovertext"]
    order = sorted(rs, key=lambda r: xenv.rs_x[r])
    probes = 0
    for i in range(1, len(order)):
        for j in range(i):
            cell = hover[i][j]
            want = oracle_ld(gl[order[i]], gl[order[j]])
            assert f"\nr2: {want['r_square']}<br>" in cell
            assert (
                f"{order[j]}.alt_freq: {want['var_2_alt_freq']}<br>" in cell
            )
            assert f"{order[i]}.alt_freq: {want['var_1_alt_freq']}\n" in cell
            probes += 1
    assert probes > 100


def test_triangle_chry_table(xenv, tmp_path):
    trg = str(tmp_path)
    args = types.SimpleNamespace(
        src_dir_path=xenv.src,
        intgen_dir_path=xenv.intgen,
        trg_top_dir_path=trg,
        meta_lines_quan=0,
        skip_intgen_data_ver=True,
        gend_names="male",
        pop_names="all",
        ld_measure="d_prime",
        ld_low_thres=None,
        matrix_type="table",
        heatmap_json=False,
        disp_letters=False,
        color_pal="greens",
        font_size=None,
        square_shape=False,
        dont_disp_footer=True,
        max_proc_quan=1,
    )
    triangle.run(args)
    rs = list(xenv.rs_y)
    gl = _flat_lists(xenv, "Y", gends=("male",))
    path = os.path.join(trg, "query_LD_matr", "query_chrY_d.tsv")
    with open(path) as fh:
        lines = fh.read().splitlines()
    order = lines[2].split("\t")[2:]
    body = {ln.split("\t")[0]: ln.split("\t")[2:] for ln in lines[4:]}
    for i, yrs in enumerate(order):
        for j, xrs in enumerate(order[:i]):
            want = oracle_ld(gl[yrs], gl[xrs])["d_prime"]
            assert body[yrs][j] == str(want), (yrs, xrs)


def test_python_and_native_ingest_parity_on_chrx(xenv, tmp_path):
    """Both parsers produce identical packed stores for the mixed file."""
    from ld_tools_tpu.ingest import native, vcf as vcf_mod

    path = os.path.join(xenv.intgen, "X.vcf.gz")
    out = native.scan_vcf_packed(path)
    if out is None:
        pytest.skip("native scanner unavailable")
    packed, h, pos, rsid, ref, alt, vt, samples, pgroup, profiles = out
    Gn = np.unpackbits(packed, axis=1, count=h).astype(np.int8)

    recs = list(vcf_mod.iter_records(path))
    Gp = np.stack([r.genotypes for r in recs])
    np.testing.assert_array_equal(Gn, Gp)
    for rec, gid in zip(recs, pgroup):
        prof = profiles[gid]
        if rec.ploidy is None:
            assert (prof == 2).all()
        else:
            np.testing.assert_array_equal(prof, rec.ploidy)


def _scan_args(xenv, trg, **kw):
    return types.SimpleNamespace(
        chroms=kw.get("chroms", "X"),
        trg_dir_path=trg,
        intgen_dir_path=xenv.intgen,
        skip_intgen_data_ver=True,
        gend_names=kw.get("gend_names", "both"),
        pop_names=kw.get("pop_names", "all"),
        ld_measure=kw.get("ld_measure", "r_square"),
        ld_low_thres=kw.get("ld_low_thres", 0.2),
        max_dist=kw.get("max_dist", None),
        checkpoint_dir=None,
        devices=kw.get("devices", None),
    )


@pytest.mark.parametrize("max_dist", [None, 9000])
def test_scan_chrx_segmented_matches_oracle(xenv, tmp_path, max_dist):
    """ld_scan on a mixed chromosome: per-segment triangular scans plus
    cross-segment rectangles must together reproduce brute-force oracle
    filtering over ALL pairs, including PAR x non-PAR."""
    from ld_tools_tpu.tools import scan

    trg = str(tmp_path / f"scan_{max_dist}")
    assert scan.run(_scan_args(xenv, trg, max_dist=max_dist)) == 1
    path = os.path.join(trg, "ld_scan_chrX_r_0.2.tsv")
    with open(path) as fh:
        rows = [
            ln.split("\t")
            for ln in fh.read().splitlines()
            if not ln.startswith("#")
        ]
    gl = _flat_lists(xenv, "X")
    pos_of = xenv.rs_x
    by_pos = sorted(gl, key=lambda r: pos_of[r])
    expected = {}
    cross = 0
    for a_i in range(len(by_pos)):
        for b_i in range(a_i):
            ra, rb = by_pos[a_i], by_pos[b_i]
            if max_dist is not None and pos_of[ra] - pos_of[rb] > max_dist:
                continue
            out = oracle_ld(gl[ra], gl[rb])
            if out["r_square"] >= 0.2:
                expected[(ra, rb)] = out
                if len(gl[ra]) != len(gl[rb]):
                    cross += 1
    got = {(r[1], r[3]): r for r in rows}
    assert set(got) == set(expected)
    assert cross > 0, "no cross-region hits; fixture too weak"
    for key, r in got.items():
        out = expected[key]
        assert float(r[5]) == out["r_square"], key
        assert float(r[6]) == out["d_prime"], key


def test_scan_chry_uniform_haploid(xenv, tmp_path):
    from ld_tools_tpu.tools import scan

    trg = str(tmp_path / "scany")
    assert scan.run(
        _scan_args(xenv, trg, chroms="Y", gend_names="male")
    ) == 1
    path = os.path.join(trg, "ld_scan_chrY_r_0.2.tsv")
    with open(path) as fh:
        rows = [
            ln.split("\t")
            for ln in fh.read().splitlines()
            if not ln.startswith("#")
        ]
    gl = _flat_lists(xenv, "Y", gends=("male",))
    pos_of = xenv.rs_y
    by_pos = sorted(gl, key=lambda r: pos_of[r])
    expected = {}
    for a_i in range(len(by_pos)):
        for b_i in range(a_i):
            ra, rb = by_pos[a_i], by_pos[b_i]
            out = oracle_ld(gl[ra], gl[rb])
            if out["r_square"] >= 0.2:
                expected[(ra, rb)] = out
    got = {(r[1], r[3]): r for r in rows}
    assert set(got) == set(expected)
    for key, r in got.items():
        assert float(r[5]) == expected[key]["r_square"], key


def test_scan_chrx_mesh_matches_unsharded(xenv, tmp_path):
    """Mixed-chromosome scan with a device mesh (-d all): per-segment
    sharded scans + cross-segment rectangles must produce a byte-identical
    file to the unsharded run."""
    from ld_tools_tpu.tools import scan

    solo = str(tmp_path / "solo")
    mesh = str(tmp_path / "mesh")
    assert scan.run(_scan_args(xenv, solo, max_dist=9000)) == 1
    assert scan.run(
        _scan_args(xenv, mesh, max_dist=9000, devices="all")
    ) == 1
    name = "ld_scan_chrX_r_0.2.tsv"
    with open(os.path.join(solo, name)) as fh:
        body = fh.read()
    with open(os.path.join(mesh, name)) as fh:
        assert fh.read() == body


def test_area_json_chrx_pair_dependent_freqs(xenv, tmp_path):
    """JSON area output on a mixed chromosome carries the pair-dependent
    opponent freqs and own-list query freq."""
    import json as _json

    trg = str(tmp_path)
    args = types.SimpleNamespace(
        src_dir_path=xenv.src,
        intgen_dir_path=xenv.intgen,
        trg_top_dir_path=trg,
        meta_lines_quan=0,
        skip_intgen_data_ver=True,
        gend_names="both",
        pop_names="all",
        flank_size=10**6,
        ld_thres_measure="r_square",
        ld_low_thres=0.3,
        trg_file_type="json",
        max_proc_quan=1,
    )
    area.run(args)
    rs = list(xenv.rs_x)
    gl = _flat_lists(xenv, "X")
    chr_dir = os.path.join(trg, "query_in_LD", "X")
    checked = 0
    for q in rs:
        path = os.path.join(chr_dir, f"{q}_chrX_r_0.3.json")
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            obj = _json.load(fh)
        # obj[1] is the query annotation row (reference ld_area.py:211)
        own = round(gl[q].count(1) / len(gl[q]), 4)
        assert obj[1]["alt_freq"] == own
        for row in obj[2:]:
            res = oracle_ld(gl[q], gl[row["rsID"]])
            assert row["r2"] == res["r_square"], (q, row["rsID"])
            assert row["alt_freq"] == res["var_2_alt_freq"]
            checked += 1
    assert checked > 10
