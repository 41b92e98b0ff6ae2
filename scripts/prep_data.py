#!/usr/bin/env python3
"""Standalone data bootstrap: pack 1000G VCFs into the haplotype store.

The reference runs its bootstrap implicitly from every tool
(prep_intgen_data — backend/prep_intgen_data.py); tpu-ld tools do the
same, but this script lets you run (or re-run) the prep stage explicitly,
e.g. on a data-staging host without accelerators.
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(
        description="Pack per-chromosome VCFs + samples.txt into the "
        "tpu-ld haplotype store (idempotent, resumable)."
    )
    parser.add_argument(
        "-D", "--intgen-dir-path", required=True, dest="intgen_dir_path",
        help="Folder with {N}.vcf.gz files and samples.txt",
    )
    args = parser.parse_args()
    from ld_tools_tpu.ingest import prep_intgen_data

    db = prep_intgen_data(args.intgen_dir_path)
    print(f"ready: {db}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
