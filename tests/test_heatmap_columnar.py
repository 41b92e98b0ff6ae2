"""Columnar (O(n)-strings) heatmap payload: client-side hover parity.

Past io/heatmap._HOVER_CELLS_MAX variants the figure ships int16
triangle value buffers + O(n) per-variant arrays instead of per-cell
hover strings; the HTML canvas renderer reassembles each hover string.
These tests force the columnar path on small fixtures (monkeypatched
cap) and verify that a Python port of the client's decode + format +
assembly algorithm reproduces the reference's per-cell hover text and
value semantics byte-for-byte.
"""

import base64
import json
import os
import types

import numpy as np
import pytest

from ld_tools_tpu.ingest import HaplotypeStore, get_sample_names
from ld_tools_tpu.io import heatmap as heatmap_io
from ld_tools_tpu.tools import triangle

from .oracle import oracle_ld
from .test_ploidy_e2e import _flat_lists, xenv  # noqa: F401
from .test_tools_e2e import env  # noqa: F401


def _js_fmt(m: int, qs: int = 20001) -> str:
    """Python port of the client fmt(): str(round(v, 4)) from the
    quantized code, including the int-0 sentinel and negative zero."""
    if m == qs:
        return "0"
    if m == -qs:
        return "-0.0"
    sgn = "-" if m < 0 else ""
    m = abs(int(m))
    whole, frac = divmod(m, 10000)
    f = f"{frac:04d}".rstrip("0")
    return f"{sgn}{whole}." + (f or "0")


def _decode(columnar, key):
    return np.frombuffer(
        base64.b64decode(columnar[key]), dtype=f"<i{columnar['qw']}"
    )


def _client_hover(columnar, i, j):
    """Python port of the columnar renderer's hover assembly."""
    t = i * (i - 1) // 2 + j
    qs = columnar["qs"]
    r2q = _decode(columnar, "r2q")
    dpq = _decode(columnar, "dpq")
    rs, pos = columnar["rsids"], columnar["pos"]
    al, ty = columnar["alleles"], columnar["types"]
    if "f1q" in columnar:
        fx = _js_fmt(_decode(columnar, "f2q")[t], qs)
        fy = _js_fmt(_decode(columnar, "f1q")[t], qs)
    else:
        fx = _js_fmt(columnar["freqq"][j], qs)
        fy = _js_fmt(columnar["freqq"][i], qs)
    return (
        f"\nr2: {_js_fmt(r2q[t], qs)}<br>\nD': {_js_fmt(dpq[t], qs)}<br>\n"
        f"abs_dist: {abs(pos[j] - pos[i])}<br><br>\n"
        f"{rs[j]}.hg38_pos: {pos[j]}<br>\n"
        f"{rs[i]}.hg38_pos: {pos[i]}<br><br>\n"
        f"{rs[j]}.alleles: {al[j]}<br>\n"
        f"{rs[i]}.alleles: {al[i]}<br><br>\n"
        f"{rs[j]}.type: {ty[j]}<br>\n"
        f"{rs[i]}.type: {ty[i]}<br><br>\n"
        f"{rs[j]}.alt_freq: {fx}<br>\n"
        f"{rs[i]}.alt_freq: {fy}\n"
    )


def _triangle_args(e, trg, **kw):
    return types.SimpleNamespace(
        src_dir_path=e.src,
        intgen_dir_path=e.intgen,
        trg_top_dir_path=trg,
        meta_lines_quan=0,
        skip_intgen_data_ver=True,
        gend_names=kw.get("gend_names", "both"),
        pop_names="all",
        ld_measure=kw.get("ld_measure", "r_square"),
        ld_low_thres=kw.get("ld_low_thres", None),
        matrix_type="heatmap",
        heatmap_json=True,
        disp_letters=False,
        color_pal="greens",
        font_size=None,
        square_shape=False,
        dont_disp_footer=True,
        max_proc_quan=1,
    )


def _reference_hover(e, chrom, order, gl, i, j):
    """Expected hover cell from the oracle, reference format
    (ld_triangle.py:200-213)."""
    store = HaplotypeStore(e.intgen)
    cd = store.chrom(chrom)
    from ld_tools_tpu.tools.common import variant_annotations

    res = oracle_ld(gl[order[i]], gl[order[j]])
    ri, rj = cd.row_of(order[i]), cd.row_of(order[j])
    ai, aj = variant_annotations(cd, ri), variant_annotations(cd, rj)
    pi, pj = int(cd.pos[ri]), int(cd.pos[rj])
    return (
        f"\nr2: {res['r_square']}<br>\nD': {res['d_prime']}<br>\n"
        f"abs_dist: {abs(pj - pi)}<br><br>\n"
        f"{order[j]}.hg38_pos: {pj}<br>\n"
        f"{order[i]}.hg38_pos: {pi}<br><br>\n"
        f"{order[j]}.alleles: {aj[0]}<br>\n"
        f"{order[i]}.alleles: {ai[0]}<br><br>\n"
        f"{order[j]}.type: {aj[1]}<br>\n"
        f"{order[i]}.type: {ai[1]}<br><br>\n"
        f"{order[j]}.alt_freq: {res['var_2_alt_freq']}<br>\n"
        f"{order[i]}.alt_freq: {res['var_1_alt_freq']}\n"
    )


def _cohort_lists_uniform(e, chrom, rsids):
    store = HaplotypeStore(e.intgen)
    cd = store.chrom(chrom)
    samples = get_sample_names(("male", "female"), ("ALL",), e.db)
    cols = cd.haplotype_columns(samples)
    return {
        r: list(map(int, cd.genotypes[cd.row_of(r)][cols])) for r in rsids
    }


def test_columnar_hover_matches_reference_format(env, tmp_path, monkeypatch):
    monkeypatch.setattr(heatmap_io, "_HOVER_CELLS_MAX", 4)
    trg = str(tmp_path)
    triangle.run(_triangle_args(env, trg))
    path = os.path.join(trg, "query_LD_matr", "query_chr5_r.json")
    with open(path) as fh:
        fig = json.load(fh)
    col = fig["columnar"]
    n = col["n"]
    assert n > 4
    rs5 = col["rsids"]
    gl = _cohort_lists_uniform(env, "5", rs5)
    for i in range(1, n):
        for j in range(i):
            assert _client_hover(col, i, j) == _reference_hover(
                env, "5", rs5, gl, i, j
            ), (i, j)
    # HTML exists and embeds the columnar renderer
    html = os.path.join(trg, "query_LD_matr", "query_chr5_r.html")
    with open(html) as fh:
        body = fh.read()
    assert "FIG.columnar" in body and "b64q" in body


def test_columnar_z_threshold_derivation(env, tmp_path, monkeypatch):
    """Client-side z (measure + threshold) must equal the <=500-path
    matrix cell semantics: sub-threshold and int-0 cells are 0."""
    monkeypatch.setattr(heatmap_io, "_HOVER_CELLS_MAX", 4)
    trg = str(tmp_path)
    triangle.run(_triangle_args(env, trg, ld_low_thres=0.5))
    path = os.path.join(trg, "query_LD_matr", "query_chr5_r.json")
    with open(path) as fh:
        col = json.load(fh)["columnar"]
    assert col["thres"] == 0.5
    rs5 = col["rsids"]
    gl = _cohort_lists_uniform(env, "5", rs5)
    r2q = _decode(col, "r2q")
    n = col["n"]
    for i in range(1, n):
        for j in range(i):
            m = int(r2q[i * (i - 1) // 2 + j])
            if m == col["qs"]:
                z = 0
            else:
                v = m / 1e4
                z = 0 if v < 0.5 else v
            want = oracle_ld(gl[rs5[i]], gl[rs5[j]])["r_square"]
            expect = 0 if (want == 0 or want < 0.5) else want
            assert z == pytest.approx(expect, abs=1e-12), (i, j)


def test_columnar_mixed_chrx_pair_freqs(xenv, tmp_path, monkeypatch):
    """Mixed chromosomes ship pair-dependent frequency triangles; the
    client hover must match the reference oracle on cross-PAR pairs."""
    monkeypatch.setattr(heatmap_io, "_HOVER_CELLS_MAX", 4)
    trg = str(tmp_path)
    triangle.run(_triangle_args(xenv, trg))
    path = os.path.join(trg, "query_LD_matr", "query_chrX_r.json")
    with open(path) as fh:
        col = json.load(fh)["columnar"]
    assert "f1q" in col and "f2q" in col and "freqq" not in col
    gl = _flat_lists(xenv, "X")
    order = col["rsids"]
    n = col["n"]
    cross = 0
    for i in range(1, n):
        for j in range(i):
            got = _client_hover(col, i, j)
            want = _reference_hover(xenv, "X", order, gl, i, j)
            assert got == want, (i, j)
            if len(gl[order[i]]) != len(gl[order[j]]):
                cross += 1
    assert cross > 0


def test_columnar_resident_blocks_match_default(env, tmp_path, monkeypatch):
    """Tiny row blocks force the device-resident slicing path
    (engine.ResidentCounts); the figure must be byte-identical."""
    from ld_tools_tpu.tools.triangle import TriangleRunner

    monkeypatch.setattr(heatmap_io, "_HOVER_CELLS_MAX", 4)
    orig = TriangleRunner._build_heatmap_columnar

    def tiny_blocks(self, *a, **kw):
        kw["row_block"] = 4
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        TriangleRunner, "_build_heatmap_columnar", tiny_blocks
    )
    trg_a = str(tmp_path / "a")
    triangle.run(_triangle_args(env, trg_a))
    monkeypatch.setattr(TriangleRunner, "_build_heatmap_columnar", orig)
    trg_b = str(tmp_path / "b")
    triangle.run(_triangle_args(env, trg_b))
    for chrom in ("5", "11"):
        pa = os.path.join(trg_a, "query_LD_matr", f"query_chr{chrom}_r.json")
        pb = os.path.join(trg_b, "query_LD_matr", f"query_chr{chrom}_r.json")
        if os.path.exists(pb):
            assert open(pa).read() == open(pb).read()
