"""ld_scan: whole-chromosome all-pairs LD threshold scan.

A capability the reference cannot reach (its practical matrix cap is
~500x500, reference README.md:74): stream ALL lower-triangle pairs of a
chromosome (100k+ variants, billions of pairs) through the fused device
kernel, keep only pairs with LD >= threshold (optionally within a
distance window), and write them as a pair-list TSV.  Math and threshold
semantics match backend/calc_ld.py + ld_area.py:248 via the exact
refilter in ops/ld_stream.py.
"""

from __future__ import annotations

import dataclasses
import os

from ld_tools_tpu.io.writers import makedirs, ucsc_header_line
from ld_tools_tpu.ops.exact import format_rounded
from ld_tools_tpu.ops.ld_stream import stream_threshold_scan
from ld_tools_tpu.tools.common import DataConfig
from ld_tools_tpu.utils.logging import get_logger
from ld_tools_tpu.utils.profiling import maybe_trace

log = get_logger("tools.scan")


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    chroms: tuple  # () = all packed chromosomes
    trg_dir_path: str
    ld_measure: str
    ld_low_thres: float
    max_dist: object  # int or None
    checkpoint_dir: object = None
    use_pallas: object = None  # None = auto (Pallas on TPU, XLA on CPU)
    n_devices: object = None  # None = 1; "all" or int = shard tiles

    @staticmethod
    def from_args(args):
        chroms = tuple(
            c for c in args.chroms.split(",") if c and c.lower() != "all"
        )
        engine = getattr(args, "engine", "auto") or "auto"
        return ScanConfig(
            chroms=chroms,
            trg_dir_path=os.path.normpath(args.trg_dir_path),
            ld_measure=args.ld_measure,
            ld_low_thres=args.ld_low_thres,
            max_dist=args.max_dist,
            checkpoint_dir=getattr(args, "checkpoint_dir", None),
            use_pallas={"auto": None, "pallas": True, "xla": False}[engine],
            n_devices=getattr(args, "devices", None),
        )

    def resolve_use_pallas(self) -> bool:
        """auto -> the fused Pallas band kernel on TPU, XLA on CPU
        (Pallas outside interpret mode needs real TPU hardware)."""
        if self.use_pallas is not None:
            return bool(self.use_pallas)
        import jax

        return jax.default_backend() not in ("cpu",)

    def mesh(self):
        """1-D tile mesh when more than one device is requested/present."""
        if self.n_devices is None:
            return None
        from ld_tools_tpu.ops.ld_stream import scan_mesh

        n = None if self.n_devices == "all" else int(self.n_devices)
        mesh = scan_mesh(n)
        return mesh if mesh.size > 1 else None


def scan_chromosome(data: DataConfig, config: ScanConfig, chrom: str) -> str:
    """Scan one chromosome; returns the output file path."""
    import time

    t_start = time.time()
    cd = data.store().chrom(chrom)
    # the scan consumes the store's bitpacked bytes directly (full-cohort
    # runs are zero-copy; sub-cohorts repack their bit columns once) —
    # the unpacked matrix is never materialized
    gp, n_hap = cd.cohort_packed(data.sample_names)
    log.info(
        "scanning chr%s: %d variants x %d haplotypes (bitpacked), %s >= %s%s",
        chrom, gp.shape[0], n_hap, config.ld_measure,
        config.ld_low_thres,
        f", dist <= {config.max_dist}" if config.max_dist else "",
    )
    hits = stream_threshold_scan(
        G_packed=gp,
        n_haplotypes=n_hap,
        pos=cd.pos,
        measure=config.ld_measure,
        thres=config.ld_low_thres,
        max_dist=config.max_dist,
        use_pallas=config.resolve_use_pallas(),
        exact=True,
        checkpoint_dir=config.checkpoint_dir,
        mesh=config.mesh(),
    )
    makedirs(config.trg_dir_path)
    name = (
        f"ld_scan_chr{chrom}_{config.ld_measure[0]}_"
        f"{config.ld_low_thres}.tsv"
    )
    path = os.path.join(config.trg_dir_path, name)
    meta_keys = ["chr", "gends", "pops", f"{config.ld_measure}_thres",
                 "max_dist"]
    meta_vals = [chrom, data.gend_names, data.pop_names,
                 config.ld_low_thres, config.max_dist]
    rsid = cd.rsid
    pos = cd.pos
    r2_s = format_rounded(hits.r_square, hits.r_square_is_int_zero)
    dp_s = format_rounded(hits.d_prime, hits.d_prime_is_int_zero)
    # column-wise assembly (the .tolist() conversions and the joins run
    # at C speed): chr-scale scans emit millions of hit lines, where a
    # per-line f-string loop would dominate the whole tool run
    import numpy as np

    ia = hits.i.astype(np.int64)
    jb = hits.j.astype(np.int64)
    pa = pos[ia].astype(np.int64)
    pb = pos[jb].astype(np.int64)
    rows = zip(
        pa.tolist(), np.asarray(rsid)[ia].tolist(),
        pb.tolist(), np.asarray(rsid)[jb].tolist(),
        (pa - pb).tolist(), r2_s.tolist(), dp_s.tolist(),
    )
    with open(path, "w") as fh:
        fh.write(ucsc_header_line(meta_keys, meta_vals) + "\n")
        fh.write("#hg38_pos_1\trsID_1\thg38_pos_2\trsID_2\tdist\tr2\tD'\n")
        for pa_k, ra, pb_k, rb, d, r2k, dpk in rows:
            fh.write(f"{pa_k}\t{ra}\t{pb_k}\t{rb}\t{d}\t{r2k}\t{dpk}\n")
    n_pairs = cd.n_variants * (cd.n_variants - 1) / 2
    log.info(
        "chr%s: %d/%d pairs above threshold (%.1fs, %.2f Gpairs/s) -> %s",
        chrom, len(hits.i), int(n_pairs), time.time() - t_start,
        n_pairs / max(time.time() - t_start, 1e-9) / 1e9, path,
    )
    return path


def run(args) -> int:
    import datetime

    data = DataConfig.resolve(
        args.intgen_dir_path,
        args.skip_intgen_data_ver,
        args.gend_names,
        args.pop_names,
    )
    config = ScanConfig.from_args(args)
    chroms = list(config.chroms) or data.store().chroms()

    from ld_tools_tpu.parallel.batch import chromosomes_for_this_process

    chroms = chromosomes_for_this_process(chroms)
    print("\nWhole-chromosome LD scan")
    with maybe_trace():
        t0 = datetime.datetime.now()
        n = 0
        for chrom in chroms:
            scan_chromosome(data, config, chrom)
            n += 1
    print(f"\tcomputation time: {datetime.datetime.now() - t0}")
    return n
