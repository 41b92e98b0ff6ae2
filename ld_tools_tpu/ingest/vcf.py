"""Streaming VCF parser for phased biallelic genotype tables.

Replaces the role pysam/htslib plays in the reference (random access +
record parsing, e.g. reference ld_lite.py:109-137).  The TPU-native design
does NOT need tabix random access at runtime: each chromosome's VCF is
scanned ONCE at ingest into a packed {0,1} haplotype matrix
(ld_tools_tpu/ingest/pack.py); all later queries hit the packed store.

Filtering semantics match reference backend/prep_intgen_data.py:163-176:

- only IDs matching ``^rs\\d+$`` are kept;
- records flagged ``MULTI_ALLELIC`` in INFO are dropped;
- consecutive runs of records with an identical (CHROM, POS, ID) triple
  (1000 Genomes encodes repeat-length variants as such sets) are dropped
  entirely.

A fast C++ scanner with the same contract lives in native/vcfpack.cpp
(bindings: ld_tools_tpu/ingest/native.py); this module is the portable
fallback and the semantics reference.
"""

from __future__ import annotations

import dataclasses
import gzip
import io
import re

import numpy as np

_RS_RE = re.compile(r"rs\d+$")


@dataclasses.dataclass
class VcfRecord:
    chrom: str
    pos: int
    rsid: str
    ref: str
    alts: tuple
    vt: tuple
    multiallelic: bool
    genotypes: np.ndarray  # (2 * n_samples,) int8, values {0, 1}


def open_vcf(path: str):
    """Open a .vcf or .vcf.gz as a text stream (multi-member/bgzf-safe)."""
    if str(path).endswith(".gz"):
        return io.TextIOWrapper(
            io.BufferedReader(gzip.open(path, "rb"), buffer_size=1 << 20),
            encoding="utf-8",
        )
    return open(path, "rt", encoding="utf-8")


def read_sample_names(path: str) -> list:
    """Sample names from the #CHROM header line, in column order."""
    with open_vcf(path) as fh:
        for line in fh:
            if line.startswith("#CHROM"):
                return line.rstrip("\n").split("\t")[9:]
            if not line.startswith("#"):
                break
    raise ValueError(f"{path}: no #CHROM header line")


def _parse_info(info_field: str):
    multiallelic = False
    vt = ()
    for item in info_field.split(";"):
        if item == "MULTI_ALLELIC":
            multiallelic = True
        elif item.startswith("VT="):
            vt = tuple(item[3:].split(","))
    return vt, multiallelic


_GT_DROP = frozenset((ord("|"), ord("/"), ord("\t"), ord("\n"), ord("\r")))


def _parse_genotypes(gt_section: str, n_samples: int) -> np.ndarray:
    """Vectorized parse of a biallelic GT-only genotype section.

    The section is ``a|b<TAB>c|d...`` (phased) — every byte is either a
    separator or a single-digit allele.  Returns (2 * n_samples,) int8.
    """
    raw = np.frombuffer(gt_section.encode("ascii"), dtype=np.uint8)
    keep = (
        (raw != ord("|"))
        & (raw != ord("/"))
        & (raw != ord("\t"))
        & (raw != ord("\n"))
        & (raw != ord("\r"))
    )
    alleles = raw[keep]
    if alleles.shape[0] != 2 * n_samples:
        raise ValueError(
            f"expected {2 * n_samples} alleles, parsed {alleles.shape[0]} "
            "(missing or non-diploid genotypes are not supported)"
        )
    out = (alleles - ord("0")).astype(np.int8)
    if out.min(initial=0) < 0 or out.max(initial=0) > 1:
        bad = set(int(v) for v in np.unique(out) if v < 0 or v > 1)
        raise ValueError(
            f"non-biallelic or missing allele codes in GT section: {bad}"
        )
    return out


def iter_records(path: str, with_genotypes: bool = True):
    """Yield filtered VcfRecords; handles the duplicate-triple run rule.

    Records are yielded with one-record delay so that a consecutive run of
    identical (CHROM, POS, ID) triples can be suppressed entirely
    (reference backend/prep_intgen_data.py:163-176).
    """
    sample_names = read_sample_names(path)
    n_samples = len(sample_names)
    pending = None  # last accepted-but-unemitted record
    pending_dup = False
    with open_vcf(path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t", 9)
            chrom, pos_s, rsid, ref, alt = fields[:5]
            if _RS_RE.match(rsid) is None:
                continue
            vt, multiallelic = _parse_info(fields[7])
            if multiallelic:
                continue
            pos = int(pos_s)
            key = (chrom, pos, rsid)
            if pending is not None and key == (
                pending.chrom,
                pending.pos,
                pending.rsid,
            ):
                pending_dup = True
                continue
            if pending is not None and not pending_dup:
                yield pending
            gts = None
            if with_genotypes:
                fmt = fields[8]
                if fmt.split(":", 1)[0] != "GT":
                    raise ValueError(f"{path}: FORMAT must lead with GT, got {fmt}")
                if fmt == "GT":
                    gts = _parse_genotypes(fields[9], n_samples)
                else:
                    # rare general case: per-sample fields carry extras
                    gt_first = "\t".join(
                        f.split(":", 1)[0] for f in fields[9].split("\t")
                    )
                    gts = _parse_genotypes(gt_first, n_samples)
            pending = VcfRecord(
                chrom=chrom,
                pos=pos,
                rsid=rsid,
                ref=ref,
                alts=tuple(alt.split(",")),
                vt=vt,
                multiallelic=multiallelic,
                genotypes=gts,
            )
            pending_dup = False
    if pending is not None and not pending_dup:
        yield pending
