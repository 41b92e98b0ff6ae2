#!/usr/bin/env python3
"""Flatten a results tree into a single folder.

Equivalent of reference scripts/merge_to_folder.py:20-31: walk a results
directory recursively and copy every file into one flat target directory.
Invocation-compatible with the reference's two positionals
(``merge_to_folder.py SRC TRG``); the -S/-T options remain as aliases.
"""

import argparse
import os
import shutil


def main():
    parser = argparse.ArgumentParser(
        description="Copy all files of a directory tree into one flat folder."
    )
    parser.add_argument(
        "src_top_dir_path", nargs="?", default=None,
        help="Path to the tree with result files",
    )
    parser.add_argument(
        "trg_dir_path", nargs="?", default=None,
        help="Path to the flat target folder",
    )
    parser.add_argument(
        "-S", "--src-top-dir-path", dest="src_opt", default=None,
        help="Path to the tree with result files (alias of positional 1)",
    )
    parser.add_argument(
        "-T", "--trg-dir-path", dest="trg_opt", default=None,
        help="Path to the flat target folder (alias of positional 2)",
    )
    args = parser.parse_args()
    src = args.src_opt or args.src_top_dir_path
    trg = args.trg_opt or args.trg_dir_path
    if not src or not trg:
        parser.error("source and target paths are required "
                     "(two positionals, or -S/-T)")
    os.makedirs(trg, exist_ok=True)
    for dirpath, _, filenames in os.walk(src):
        for name in filenames:
            shutil.copy2(os.path.join(dirpath, name), trg)


if __name__ == "__main__":
    main()
