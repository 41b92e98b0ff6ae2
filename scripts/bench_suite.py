#!/usr/bin/env python3
"""Full benchmark suite: the five BASELINE.json configs.

Run on real TPU hardware.  Each config prints one labelled line; the
headline driver metric stays in bench.py (one JSON line).

Configs (BASELINE.md):
1. ld_lite pair on a synthetic 100 x 2504-sample phased slab.
2. ld_triangle 500 variants, EUR superpopulation subset.
3. ld_area LD >= 0.8, 50 query rsIDs, 250 kb flanks, one chromosome.
4. chr21-scale: 100k x 5008 all-pairs streamed sweep, one host.
5. multi-chromosome batch: 8 chromosomes data-parallel (simulated on
   one host by round-robin over the local process; multi-host runs use
   jax.distributed + parallel/batch.py unchanged).
"""

import argparse
import os
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _env(n_samples, chrom_variant_counts, seed=0):
    from ld_tools_tpu.ingest import prep_intgen_data, synth

    d = tempfile.mkdtemp(prefix="tpu_ld_bench_")
    rs = synth.generate_dataset(
        d, n_samples=n_samples, chrom_variant_counts=chrom_variant_counts,
        seed=seed,
    )
    db = prep_intgen_data(d)
    return d, db, rs


def config0():
    """Ingest: native BGZF scanner throughput (single vs multi-thread)."""
    import os
    import tempfile

    from ld_tools_tpu.ingest import native, synth

    rng = np.random.default_rng(0)
    n_samples, n_var = 2504, 6000
    G = synth.correlated_haplotypes(rng, n_var, 2 * n_samples)
    names = [f"S{i:05d}" for i in range(n_samples)]
    d = tempfile.mkdtemp(prefix="tpu_ld_ingest_bench_")
    path = os.path.join(d, "1.vcf.gz")
    synth.write_vcf(path, "1", names, G)
    text_bytes = n_var * (2 * n_samples * 2 + 60)
    for n_threads in (1, os.cpu_count() or 1):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = native.scan_vcf_packed(path, n_threads=n_threads)
            best = min(best, time.time() - t0)
        if out is None:
            print("config0 ingest: native scanner unavailable")
            return
        print(
            f"config0 ingest nt={n_threads}: {best:.2f}s, "
            f"{text_bytes / best / 1e6:.0f} MB/s VCF text, "
            f"{n_var / best:.0f} variants/s"
        )


def config1():
    from ld_tools_tpu.tools import lite

    d, db, rs = _env(2504, {"1": 100}, seed=1)
    rsids = list(rs["1"])
    args = types.SimpleNamespace(
        rs_id_1=rsids[10], rs_id_2=rsids[60], intgen_dir_path=d,
        skip_intgen_data_ver=True, gend_names="both", pop_names="all",
    )
    t0 = time.time()
    lite.run(args)
    print(f"config1 ld_lite pair (100x2504 slab): {time.time() - t0:.2f}s")


def config2():
    from ld_tools_tpu.tools import triangle

    d, db, rs = _env(2504, {"2": 500}, seed=2)
    src = tempfile.mkdtemp()
    with open(os.path.join(src, "q.txt"), "w") as fh:
        fh.write("\n".join(rs["2"]) + "\n")
    args = types.SimpleNamespace(
        src_dir_path=src, intgen_dir_path=d, trg_top_dir_path=src,
        meta_lines_quan=0, skip_intgen_data_ver=True, gend_names="both",
        pop_names="EUR", ld_measure="r_square", ld_low_thres=None,
        matrix_type="both", heatmap_json=False, disp_letters=False,
        color_pal="greens", font_size=None, square_shape=False,
        dont_disp_footer=False, max_proc_quan=4,
    )
    t0 = time.time()
    triangle.run(args)
    print(f"config2 ld_triangle 500 vars EUR: {time.time() - t0:.2f}s")


def config3():
    from ld_tools_tpu.tools import area

    d, db, rs = _env(2504, {"3": 5000}, seed=3)
    src = tempfile.mkdtemp()
    with open(os.path.join(src, "q.txt"), "w") as fh:
        fh.write("\n".join(list(rs["3"])[::100][:50]) + "\n")
    args = types.SimpleNamespace(
        src_dir_path=src, intgen_dir_path=d, trg_top_dir_path=src,
        meta_lines_quan=0, skip_intgen_data_ver=True, gend_names="both",
        pop_names="all", flank_size=250000, ld_thres_measure="r_square",
        ld_low_thres=0.8, trg_file_type="tsv", max_proc_quan=4,
    )
    t0 = time.time()
    area.run(args)
    print(f"config3 ld_area 50 queries 250kb: {time.time() - t0:.2f}s")


def config4():
    from ld_tools_tpu.ops.ld_stream import stream_threshold_scan

    rng = np.random.default_rng(4)
    V, H = 102400, 5008
    blk = 64
    base = (
        rng.random((V // blk, H))
        < rng.uniform(0.05, 0.95, size=(V // blk, 1))
    ).astype(np.int8)
    G = np.repeat(base, blk, axis=0)
    G = np.where(rng.random(G.shape) < 0.02, 1 - G, G).astype(np.int8)
    pos = np.sort(rng.choice(46_000_000, size=V, replace=False))
    pairs = V * (V - 1) / 2
    t0 = time.time()
    hits = stream_threshold_scan(
        G, pos=pos.astype(np.int64), measure="r_square", thres=0.8,
        exact=False,
    )
    dt = time.time() - t0
    print(
        f"config4 chr21-scale 100k sweep: {dt:.1f}s, "
        f"{pairs / dt / 1e9:.1f} Gpairs/s, {len(hits.i)} hits"
    )


def config5():
    from ld_tools_tpu.ops.ld_pallas import ld_triangle_matrix
    from ld_tools_tpu.parallel.batch import chromosomes_for_this_process

    rng = np.random.default_rng(5)
    chroms = [str(c) for c in range(1, 9)]
    mine = chromosomes_for_this_process(chroms)
    t0 = time.time()
    total_pairs = 0
    for _ in mine:
        V, H = 8192, 5008
        G = (rng.random((V, H)) < 0.3).astype(np.int8)
        r2, _ = ld_triangle_matrix(G, H, want_dprime=False)
        r2.block_until_ready()
        total_pairs += V * (V + 1) / 2
    dt = time.time() - t0
    print(
        f"config5 8-chromosome batch ({len(mine)} on this host): "
        f"{dt:.1f}s, {total_pairs / dt / 1e9:.1f} Gpairs/s"
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--configs", default="0,1,2,3,4,5",
        help="comma list of config numbers to run",
    )
    args = parser.parse_args()
    table = {"0": config0, "1": config1, "2": config2, "3": config3,
             "4": config4, "5": config5}
    for c in args.configs.split(","):
        table[c.strip()]()


if __name__ == "__main__":
    main()
