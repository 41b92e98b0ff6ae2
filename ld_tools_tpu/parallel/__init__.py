from ld_tools_tpu.parallel.sweep import (
    make_mesh,
    all_pairs_replicated,
    all_pairs_ring,
    all_pairs_trapezoid,
)

__all__ = [
    "make_mesh",
    "all_pairs_replicated",
    "all_pairs_ring",
    "all_pairs_trapezoid",
]
