"""ld_triangle: all-pairs LD matrices as heatmaps and/or TSV tables.

TPU-native rework of reference ld_triangle.py: the reference runs an
O(n^2) Python pair loop that re-fetches BOTH variants' genotypes from the
VCF for every cell (ld_triangle.py:133-230, the dominant cost).  Here the
whole lower triangle comes from one blocked device count matmul over the
chromosome's cohort matrix, finished bit-exactly on the host; rendering
(heatmap HTML/JSON, double-header TSV) preserves the reference's output
layout (ld_triangle.py:236-360).
"""

from __future__ import annotations

import dataclasses
import os

from ld_tools_tpu.ingest import create_src_dict
from ld_tools_tpu.io import heatmap as heatmap_io
from ld_tools_tpu.io.writers import makedirs, write_triangle_tsv
from ld_tools_tpu.ops.engine import exact_all_pairs
from ld_tools_tpu.tools.common import DataConfig, variant_annotations
from ld_tools_tpu.utils.logging import get_logger
from ld_tools_tpu.utils.profiling import maybe_trace

log = get_logger("tools.triangle")


@dataclasses.dataclass(frozen=True)
class TriangleConfig:
    src_dir_path: str
    trg_top_dir_path: str
    meta_lines_quan: int
    ld_measure: str
    ld_low_thres: object  # float or None (None = no filter)
    matrix_type: str
    heatmap_json: bool
    disp_letters: bool
    color_pal: str
    font_size: object
    square_shape: bool
    dont_disp_footer: bool

    @staticmethod
    def from_args(args):
        src = os.path.normpath(args.src_dir_path)
        trg = (
            src
            if args.trg_top_dir_path is None
            else os.path.normpath(args.trg_top_dir_path)
        )
        return TriangleConfig(
            src_dir_path=src,
            trg_top_dir_path=trg,
            meta_lines_quan=args.meta_lines_quan,
            ld_measure=args.ld_measure,
            ld_low_thres=args.ld_low_thres,
            matrix_type=args.matrix_type,
            heatmap_json=args.heatmap_json,
            disp_letters=args.disp_letters,
            color_pal=args.color_pal,
            font_size=args.font_size,
            square_shape=args.square_shape,
            dont_disp_footer=args.dont_disp_footer,
        )


FOOTER_TEXT = """
made by ld_triangle from tpu-ld (a TPU-native rework of
<a href="https://github.com/PlatonB/ld-tools">ld-tools</a>) ░
see README.md for documentation
"""


class TriangleRunner:
    """Per-source-file matrix builder (the reference's PrepSingleProc
    analogue, ld_triangle.py:3-50)."""

    def __init__(self, data: DataConfig, config: TriangleConfig):
        self.data = data
        self.config = config
        self._store = data.store()

    def process_file(self, src_file_name: str) -> int:
        """Build matrices for one source table; returns matrix count."""
        cfg = self.config
        data_by_chrs = create_src_dict(
            cfg.src_dir_path,
            src_file_name,
            cfg.meta_lines_quan,
            self.data.intgen_convdb_path,
        )
        src_file_base = src_file_name.rsplit(".", maxsplit=1)[0]
        trg_dir_path = os.path.join(
            cfg.trg_top_dir_path, f"{src_file_base}_LD_matr"
        )
        built = 0
        for chrom in data_by_chrs:
            if len(data_by_chrs[chrom]) < 2:
                continue
            makedirs(trg_dir_path)
            self._build_matrix(
                chrom, data_by_chrs[chrom], src_file_base, trg_dir_path
            )
            built += 1
        return built

    def _build_matrix(self, chrom, var_rows, src_file_base, trg_dir_path):
        cfg = self.config
        cd = self._store.chrom(chrom)

        # Sort by position (reference ld_triangle.py:88-92) and resolve
        # store rows; unresolvable rsIDs are skipped with a warning (the
        # reference would crash with UnboundLocalError, ld_triangle.py:165).
        var_rows = sorted(var_rows, key=lambda row: row[0])
        rows, poss_srtd, rs_ids_srtd = [], [], []
        for q_pos, q_rsid in var_rows:
            row = cd.row_of(q_rsid)
            if row is None:
                log.warning("%s not present in packed chr%s; skipped",
                            q_rsid, chrom)
                continue
            rows.append(row)
            poss_srtd.append(q_pos)
            rs_ids_srtd.append(q_rsid)
        vars_quan = len(rows)
        if vars_quan < 2:
            return

        cols = cd.haplotype_columns(self.data.sample_names)
        G = cd.genotype_rows(rows)[:, cols]
        exact = exact_all_pairs(G)

        if cfg.matrix_type == "table":
            # Table-only runs skip the per-cell Python object matrices and
            # format straight from the f64 arrays — the path that scales
            # to 10k+ variant TSVs.
            self._write_table_fast(
                exact, chrom, rs_ids_srtd, poss_srtd, src_file_base,
                trg_dir_path,
            )
            return

        measure_vals = (
            exact.r_square_rounded()
            if cfg.ld_measure == "r_square"
            else exact.d_prime_rounded()
        )
        r2_vals = exact.r_square_rounded()
        dp_vals = exact.d_prime_rounded()

        need_info = cfg.matrix_type in ("heatmap", "both")
        ld_two_dim = [[0 for _ in range(vars_quan)] for _ in range(vars_quan)]
        info_two_dim = (
            [[0 for _ in range(vars_quan)] for _ in range(vars_quan)]
            if need_info
            else None
        )
        ann_cache = [variant_annotations(cd, r) for r in rows]
        freqs = [round(float(v), 4) for v in exact.p1]

        for row_index in range(vars_quan):
            for col_index in range(row_index):
                val = measure_vals[row_index, col_index]
                if need_info:
                    # Hovertext block, reference ld_triangle.py:201-213.
                    x_alleles, x_type = ann_cache[col_index]
                    y_alleles, y_type = ann_cache[row_index]
                    info_two_dim[row_index][col_index] = f"""
r2: {r2_vals[row_index, col_index]}<br>
D': {dp_vals[row_index, col_index]}<br>
abs_dist: {abs(poss_srtd[col_index] - poss_srtd[row_index])}<br><br>
{rs_ids_srtd[col_index]}.hg38_pos: {poss_srtd[col_index]}<br>
{rs_ids_srtd[row_index]}.hg38_pos: {poss_srtd[row_index]}<br><br>
{rs_ids_srtd[col_index]}.alleles: {x_alleles}<br>
{rs_ids_srtd[row_index]}.alleles: {y_alleles}<br><br>
{rs_ids_srtd[col_index]}.type: {x_type}<br>
{rs_ids_srtd[row_index]}.type: {y_type}<br><br>
{rs_ids_srtd[col_index]}.alt_freq: {freqs[col_index]}<br>
{rs_ids_srtd[row_index]}.alt_freq: {freqs[row_index]}
"""
                if cfg.ld_low_thres is not None and val < cfg.ld_low_thres:
                    continue  # sub-threshold cells stay 0 but keep hovertext
                ld_two_dim[row_index][col_index] = val

        trg_file_base = f"{src_file_base}_chr{chrom}_{cfg.ld_measure[0]}"
        if cfg.matrix_type in ("heatmap", "both"):
            # Title block, reference ld_triangle.py:310-316.
            title = f"""
defines color: {cfg.ld_measure} ░
LD threshold: {cfg.ld_low_thres} ░
chromosome: {chrom} ░
genders: {", ".join(self.data.gend_names)} ░
populations: {", ".join(self.data.pop_names)}
"""
            figure = heatmap_io.build_figure(
                ld_two_dim,
                info_two_dim,
                rs_ids_srtd,
                disp_letters=cfg.disp_letters,
                color_pal=cfg.color_pal,
                font_size=cfg.font_size,
                square_shape=cfg.square_shape,
                title_text=title,
                footer_text=None if cfg.dont_disp_footer else FOOTER_TEXT,
            )
            if cfg.heatmap_json:
                heatmap_io.write_json(
                    os.path.join(trg_dir_path, trg_file_base + ".json"), figure
                )
            heatmap_io.write_html(
                os.path.join(trg_dir_path, trg_file_base + ".html"),
                figure,
                cfg.disp_letters,
            )
        if cfg.matrix_type in ("table", "both"):
            write_triangle_tsv(
                os.path.join(trg_dir_path, trg_file_base + ".tsv"),
                cfg.ld_measure,
                chrom,
                self.data.pop_names,
                self.data.gend_names,
                rs_ids_srtd,
                poss_srtd,
                ld_two_dim,
            )


def run(args) -> int:
    """CLI entry: build matrices for every file in the source directory."""
    import datetime

    data = DataConfig.resolve(
        args.intgen_dir_path,
        args.skip_intgen_data_ver,
        args.gend_names,
        args.pop_names,
    )
    config = TriangleConfig.from_args(args)
    runner = TriangleRunner(data, config)
    src_file_names = sorted(os.listdir(config.src_dir_path))

    print("\nLD matrix(-es) creation")
    with maybe_trace():
        t0 = datetime.datetime.now()
        total = 0
        for name in src_file_names:
            if not os.path.isfile(os.path.join(config.src_dir_path, name)):
                continue
            total += runner.process_file(name)
    print(f"\tcomputation time: {datetime.datetime.now() - t0}")
    return total


def _triangle_cells(exact, measure, thres):
    """(numeric_strings, keep_mask) for the TSV fast path.

    Reproduces the reference's cell semantics: cells above/on the
    diagonal, below-threshold cells, and the initial value all print as
    int '0'; monomorphic sentinels print '0'; everything else prints the
    4-dp rounded value (ld_triangle.py:114, :223-230).
    """
    import numpy as np

    from ld_tools_tpu.ops.exact import format_rounded, round4

    vals = exact.r_square if measure == "r_square" else exact.d_prime
    int_zero = (
        exact.r_square_is_int_zero
        if measure == "r_square"
        else exact.d_prime_is_int_zero
    )
    rounded = round4(vals)
    rounded[int_zero] = 0.0
    n = vals.shape[0]
    keep = np.tril(np.ones((n, n), dtype=bool), -1)
    if thres is not None:
        keep &= rounded >= thres
    return rounded, int_zero, keep


def _write_table_fast(
    self, exact, chrom, rs_ids_srtd, poss_srtd, src_file_base, trg_dir_path
):
    import os

    from ld_tools_tpu.ops.exact import format_rounded

    cfg = self.config
    rounded, int_zero, keep = _triangle_cells(
        exact, cfg.ld_measure, cfg.ld_low_thres
    )
    n = len(rs_ids_srtd)
    trg_file_base = f"{src_file_base}_chr{chrom}_{cfg.ld_measure[0]}"
    path = os.path.join(trg_dir_path, trg_file_base + ".tsv")
    tab = "\t"
    poss_str = [str(p) for p in poss_srtd]
    with open(path, "w") as fh:
        fh.write(
            f"##General\tinfo:\t{cfg.ld_measure}\tchr{chrom}\t"
            f"{tab.join(self.data.pop_names)}\t"
            f"{tab.join(self.data.gend_names)}\n\n"
        )
        fh.write("rsIDs\t\t" + "\t".join(rs_ids_srtd) + "\n")
        fh.write("\tPositions\t" + "\t".join(poss_str) + "\n")
        for i in range(n):
            cells = format_rounded(rounded[i], int_zero[i])
            row = [
                cells[j] if keep[i, j] else "0" for j in range(n)
            ]
            fh.write(
                rs_ids_srtd[i] + "\t" + poss_str[i] + "\t"
                + "\t".join(row) + "\n"
            )


TriangleRunner._write_table_fast = _write_table_fast
