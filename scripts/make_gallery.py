#!/usr/bin/env python3
"""Regenerate gallery/ example outputs from synthetic data.

The reference documents its output formats with a gallery of screenshots;
here the gallery holds actual output files (self-contained heatmap HTML,
triangle TSV, area TSV, pair table text) produced from a deterministic
synthetic dataset, so `git diff` shows format changes.
"""

import os
import sys
import tempfile
import types


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ld_tools_tpu.ingest import prep_intgen_data, synth
    from ld_tools_tpu.tools import area, lite, triangle

    gallery = os.path.join(repo, "gallery")
    os.makedirs(gallery, exist_ok=True)
    work = tempfile.mkdtemp(prefix="tpu_ld_gallery_")
    data_dir = os.path.join(work, "data")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    rs = synth.generate_dataset(
        data_dir, n_samples=60, chrom_variant_counts={"14": 24}, seed=14
    )
    prep_intgen_data(data_dir)
    rsids = list(rs["14"])
    with open(os.path.join(src_dir, "example.txt"), "w") as fh:
        fh.write("\n".join(rsids) + "\n")

    common = dict(
        intgen_dir_path=data_dir, skip_intgen_data_ver=True,
        gend_names="both", pop_names="all",
    )
    table = lite.run(types.SimpleNamespace(
        rs_id_1=rsids[0], rs_id_2=rsids[3], **common))
    with open(os.path.join(gallery, "ld_lite_pair_table.txt"), "w") as fh:
        fh.write(table + "\n")

    triangle.run(types.SimpleNamespace(
        src_dir_path=src_dir, trg_top_dir_path=work, meta_lines_quan=0,
        ld_measure="r_square", ld_low_thres=None, matrix_type="both",
        heatmap_json=True, disp_letters=True, color_pal="ylgnbu",
        font_size=None, square_shape=True, dont_disp_footer=False,
        max_proc_quan=4, **common))
    matr = os.path.join(work, "example_LD_matr")
    for name in os.listdir(matr):
        src = os.path.join(matr, name)
        dst = os.path.join(gallery, "ld_triangle_" + name)
        with open(src) as s, open(dst, "w") as d:
            d.write(s.read())

    area.run(types.SimpleNamespace(
        src_dir_path=src_dir, trg_top_dir_path=work, meta_lines_quan=0,
        flank_size=10**6, ld_thres_measure="r_square", ld_low_thres=0.5,
        trg_file_type="tsv", max_proc_quan=4, **common))
    area_dir = os.path.join(work, "example_in_LD", "14")
    picked = sorted(os.listdir(area_dir))[0]
    with open(os.path.join(area_dir, picked)) as s, open(
        os.path.join(gallery, "ld_area_" + picked), "w"
    ) as d:
        d.write(s.read())

    # mixed-ploidy chrX: ld_lite across the PAR boundary (male-haploid
    # non-PAR x diploid PAR — unequal genotype-list lengths, zip
    # semantics of reference calc_ld.py:30-33)
    import numpy as np

    rng = np.random.default_rng(23)
    xdir = os.path.join(work, "xdata")
    os.makedirs(xdir)
    panel = synth.make_panel(40, rng)
    synth.write_panel(os.path.join(xdir, "samples.txt"), panel)
    names = [r[0] for r in panel]
    GX, hapX = synth.make_chrx_layout(
        rng, 30, [r[3] for r in panel], par_bounds=(0.3, 0.7)
    )
    rs_x = synth.write_vcf(
        os.path.join(xdir, "X.vcf.gz"), "X", names, GX, haploid_masks=hapX
    )
    prep_intgen_data(xdir)
    rsx = list(rs_x)
    table_x = lite.run(types.SimpleNamespace(
        rs_id_1=rsx[2], rs_id_2=rsx[15], intgen_dir_path=xdir,
        skip_intgen_data_ver=True, gend_names="both", pop_names="all",
    ))
    with open(os.path.join(gallery, "ld_lite_chrx_par_x_nonpar.txt"),
              "w") as fh:
        fh.write(table_x + "\n")

    # columnar heatmap (>500 variants: O(n) hover strings, client-side
    # assembly — io/heatmap.py)
    bigdir = os.path.join(work, "bigdata")
    os.makedirs(bigdir)
    synth.write_panel(os.path.join(bigdir, "samples.txt"), panel)
    Gb = synth.correlated_haplotypes(rng, 560, 80)
    rs_b = synth.write_vcf(
        os.path.join(bigdir, "9.vcf.gz"), "9", names, Gb,
        rsids=[f"rs77{i:04d}" for i in range(560)],
    )
    prep_intgen_data(bigdir)
    bsrc = os.path.join(work, "bigsrc")
    os.makedirs(bsrc)
    with open(os.path.join(bsrc, "big.txt"), "w") as fh:
        fh.write("\n".join(rs_b) + "\n")
    triangle.run(types.SimpleNamespace(
        src_dir_path=bsrc, trg_top_dir_path=work, meta_lines_quan=0,
        ld_measure="r_square", ld_low_thres=None, matrix_type="heatmap",
        heatmap_json=False, disp_letters=False, color_pal="sunsetdark",
        font_size=None, square_shape=True, dont_disp_footer=False,
        max_proc_quan=1, intgen_dir_path=bigdir,
        skip_intgen_data_ver=True, gend_names="both", pop_names="all",
    ))
    big_html = os.path.join(work, "big_LD_matr", "big_chr9_r.html")
    with open(big_html) as s, open(
        os.path.join(gallery, "ld_triangle_columnar_560_chr9_r.html"), "w"
    ) as d:
        d.write(s.read())

    # pooled OVERVIEW heatmap (>4096 variants in production; pool
    # thresholds shrunk here so the gallery sample stays ~1 MB while
    # exercising the real pooling + representative-pair path)
    from ld_tools_tpu.io import heatmap as heatmap_io

    ov_min, ov_p = heatmap_io._OVERVIEW_MIN, heatmap_io._OVERVIEW_P
    heatmap_io._OVERVIEW_MIN, heatmap_io._OVERVIEW_P = 500, 150
    try:
        ovdir = os.path.join(work, "ovdata")
        os.makedirs(ovdir)
        synth.write_panel(os.path.join(ovdir, "samples.txt"), panel)
        Gv = synth.correlated_haplotypes(rng, 1200, 80)
        rs_v = synth.write_vcf(
            os.path.join(ovdir, "7.vcf.gz"), "7", names, Gv,
            rsids=[f"rs88{i:04d}" for i in range(1200)],
        )
        prep_intgen_data(ovdir)
        vsrc = os.path.join(work, "ovsrc")
        os.makedirs(vsrc)
        with open(os.path.join(vsrc, "ov.txt"), "w") as fh:
            fh.write("\n".join(rs_v) + "\n")
        triangle.run(types.SimpleNamespace(
            src_dir_path=vsrc, trg_top_dir_path=work, meta_lines_quan=0,
            ld_measure="r_square", ld_low_thres=None,
            matrix_type="heatmap", heatmap_json=False, disp_letters=False,
            color_pal="ylgnbu", font_size=None, square_shape=True,
            dont_disp_footer=False, max_proc_quan=1,
            intgen_dir_path=ovdir, skip_intgen_data_ver=True,
            gend_names="both", pop_names="all",
        ))
        ov_html = os.path.join(work, "ov_LD_matr", "ov_chr7_r.html")
        with open(ov_html) as s, open(
            os.path.join(gallery, "ld_triangle_overview_1200_chr7_r.html"),
            "w",
        ) as d:
            d.write(s.read())
    finally:
        heatmap_io._OVERVIEW_MIN, heatmap_io._OVERVIEW_P = ov_min, ov_p

    # ld_scan: windowed whole-chromosome threshold scan (pair-list TSV —
    # the beyond-reference tool; reuses the 560-variant chr9 store above)
    from ld_tools_tpu.tools import scan as scan_tool

    scan_out = os.path.join(work, "scan_out")
    scan_tool.run(types.SimpleNamespace(
        intgen_dir_path=bigdir, skip_intgen_data_ver=True,
        gend_names="both", pop_names="all", chroms="9",
        trg_dir_path=scan_out, ld_measure="r_square", ld_low_thres=0.5,
        max_dist=100_000, checkpoint_dir=None, engine="auto", devices=None,
    ))
    picked_scan = sorted(os.listdir(scan_out))[0]
    with open(os.path.join(scan_out, picked_scan)) as s, open(
        os.path.join(gallery, picked_scan), "w"
    ) as d:
        d.write(s.read())
    print(f"gallery refreshed in {gallery}")


if __name__ == "__main__":
    main()
