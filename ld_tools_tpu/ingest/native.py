"""Bindings to the native C++ VCF scanner (native/vcfpack.cpp).

The reference gets its parsing performance from pysam/htslib (C); here the
equivalent native component is a small zlib-based scanner that applies the
same filters as ingest/vcf.py and emits packed arrays.  The shared library
is built on demand with g++; if the toolchain or zlib is unavailable the
caller falls back to the pure-Python parser.
"""

from __future__ import annotations


def scan_vcf(path: str):
    """Scan a VCF with the native parser.

    Returns (genotypes int8 (V, H), pos, rsid, ref, alt, vt, samples) or
    None if the native library is unavailable.
    """
    try:
        from ld_tools_tpu.ingest import _vcfpack_ctypes
    except Exception:
        return None
    try:
        return _vcfpack_ctypes.scan(path)
    except _vcfpack_ctypes.NativeUnavailable:
        return None


def scan_vcf_packed(path: str):
    """Scan a VCF natively into the bitpacked form (chromosome-scale
    safe: no unpacked matrix).  Returns (packed, n_haplotypes, pos, rsid,
    ref, alt, vt, samples) or None when the native library is missing.
    """
    try:
        from ld_tools_tpu.ingest import _vcfpack_ctypes
    except Exception:
        return None
    try:
        return _vcfpack_ctypes.scan_packed(path)
    except _vcfpack_ctypes.NativeUnavailable:
        return None
