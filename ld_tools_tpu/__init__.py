"""tpu-ld: a TPU-native linkage-disequilibrium engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of PlatonB/ld-tools
(reference mounted at /root/reference): pairwise LD lookup (ld_lite),
LD-threshold neighborhood search (ld_area), and all-pairs LD matrices
(ld_triangle) over 1000 Genomes phased genotype data.

Architecture (see SURVEY.md for the full map):

- ``ingest``   host-side data plane: VCF -> packed {0,1} haplotype store,
               rsID index, cohort selection (reference: backend/*.py + pysam
               + SQLite).
- ``ops``      device compute: haplotype co-occurrence counts as blocked
               ``G @ G.T`` on the MXU, with D / D' / r^2 as fused elementwise
               epilogues (reference: backend/calc_ld.py's per-pair Python
               counting), plus a bit-exact f64 host finisher.
- ``parallel`` SPMD all-pairs sweeps over jax.sharding meshes: variant-axis
               sharding, lower-triangle block scheduling, ppermute ring for
               stores too large to replicate (reference: multiprocessing.Pool
               over source files).
- ``tools``    the three workload drivers (reference: ld_lite.py, ld_area.py,
               ld_triangle.py).
- ``io``       output writers: UCSC-style headers, TSV/JSON/rsids, triangle
               matrices, heatmap HTML/JSON.
- ``cli``      argparse front-ends, flag-compatible with the reference
               (EN + RU, locale-selected).
"""

__version__ = "0.1.0"
