#!/usr/bin/env python3
"""Unified CLI: ``tpu_ld.py <command> [args]``.

The reference ships three separate scripts; those remain
invocation-compatible (ld_lite.py, ld_area.py, ld_triangle.py, plus the
new ld_scan.py), and this multiplexer fronts them all, together with the
explicit data-prep stage.
"""

import sys

COMMANDS = {
    "lite": ("ld_lite", "pair LD to the terminal"),
    "area": ("ld_area", "LD-threshold neighborhood search"),
    "triangle": ("ld_triangle", "all-pairs LD matrices"),
    "scan": ("ld_scan", "whole-chromosome threshold scan"),
    "prep": (None, "pack 1000G VCFs into the haplotype store"),
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: tpu_ld.py <command> [args]\n\ncommands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:<9} {desc}")
        print("\nrun 'tpu_ld.py <command> --help' for command flags")
        return 0
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; try --help", file=sys.stderr)
        return 2
    sys.argv = [f"tpu_ld.py {cmd}"] + sys.argv[2:]
    if cmd == "prep":
        from scripts.prep_data import main as prep_main

        return prep_main()
    module_name, _ = COMMANDS[cmd]
    module = __import__(module_name)
    module.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
