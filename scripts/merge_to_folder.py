#!/usr/bin/env python3
"""Flatten a results tree into a single folder.

Equivalent of reference scripts/merge_to_folder.py:25-31: walk a results
directory recursively and copy every file into one flat target directory.
"""

import argparse
import os
import shutil


def main():
    parser = argparse.ArgumentParser(
        description="Copy all files of a directory tree into one flat folder."
    )
    parser.add_argument(
        "-S", "--src-top-dir-path", required=True, dest="src_top_dir_path",
        help="Path to the tree with result files",
    )
    parser.add_argument(
        "-T", "--trg-dir-path", required=True, dest="trg_dir_path",
        help="Path to the flat target folder",
    )
    args = parser.parse_args()
    os.makedirs(args.trg_dir_path, exist_ok=True)
    for dirpath, _, filenames in os.walk(args.src_top_dir_path):
        for name in filenames:
            shutil.copy2(os.path.join(dirpath, name), args.trg_dir_path)


if __name__ == "__main__":
    main()
