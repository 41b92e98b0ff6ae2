from ld_tools_tpu.ops.ld_math import (
    haplotype_counts,
    allele_counts,
    ld_from_counts,
    ld_block,
)
from ld_tools_tpu.ops.exact import exact_ld_from_counts, round4, format_ld_value

__all__ = [
    "haplotype_counts",
    "allele_counts",
    "ld_from_counts",
    "ld_block",
    "exact_ld_from_counts",
    "round4",
    "format_ld_value",
]
