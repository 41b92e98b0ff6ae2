"""ld_lite: LD + distance for one variant pair, printed as a nested table.

TPU-native rework of reference ld_lite.py:47-159: instead of two tabix
point-fetches and 2x2,504 per-sample dict lookups, both variants' cohort
haplotype rows come from the packed store and the LD values from a single
device count matmul finished bit-exactly on the host.
"""

from __future__ import annotations

from tabulate import tabulate

from ld_tools_tpu.ops.engine import mixed_pair_ld
from ld_tools_tpu.tools.common import (
    DataConfig,
    NotInIntgenConvDbError,
    lookup_pair,
    variant_annotations,
)


def run(args) -> str:
    """Execute the pair query; returns the rendered table (also printed
    by the CLI entry point)."""
    config = DataConfig.resolve(
        args.intgen_dir_path,
        args.skip_intgen_data_ver,
        args.gend_names,
        args.pop_names,
    )
    (chrom, var_1_pos), (_, var_2_pos) = lookup_pair(
        config.intgen_convdb_path, args.rs_id_1, args.rs_id_2
    )

    chrom_data = config.store().chrom(chrom)
    row_1 = chrom_data.row_of(args.rs_id_1)
    row_2 = chrom_data.row_of(args.rs_id_2)
    if row_1 is None:
        raise NotInIntgenConvDbError(args.rs_id_1)
    if row_2 is None:
        raise NotInIntgenConvDbError(args.rs_id_2)
    var_1_alleles, var_1_type = variant_annotations(chrom_data, row_1)
    var_2_alleles, var_2_type = variant_annotations(chrom_data, row_2)

    # Ploidy-aware pair LD: on autosomes this is the plain cohort-column
    # count matmul; on chrX/chrY the two variants' profiles may differ
    # (PAR vs non-PAR) and the mixed engine truncates to the shorter
    # genotype list exactly like the reference (calc_ld.py:30-33).
    cp = chrom_data.cohort_ploidy(config.sample_names)
    exact = mixed_pair_ld(chrom_data, cp, [row_1], [row_2])
    trg_vals = exact.pair(0, 0)

    # Nested fancy_grid layout of reference ld_lite.py:148-159: the LD
    # values + distance render as a sub-table in the corner header cell.
    table = tabulate(
        [
            ["chrom", chrom, chrom],
            ["hg38_pos", var_1_pos, var_2_pos],
            ["alleles", var_1_alleles, var_2_alleles],
            ["type", var_1_type, var_2_type],
            [
                "alt_freq",
                trg_vals["var_1_alt_freq"],
                trg_vals["var_2_alt_freq"],
            ],
        ],
        headers=[
            tabulate(
                [
                    ["r2", trg_vals["r_square"]],
                    ["D'", trg_vals["d_prime"]],
                    ["abs_dist", abs(var_1_pos - var_2_pos)],
                ],
                tablefmt="fancy_grid",
                disable_numparse=True,
            ),
            f"\n\n\n{args.rs_id_1}",
            f"\n\n\n{args.rs_id_2}",
        ],
        tablefmt="fancy_grid",
    )
    return table
