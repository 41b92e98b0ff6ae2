#!/usr/bin/env python3
"""ld_scan entry point: whole-chromosome all-pairs LD threshold scan."""

__version__ = "V1.0-tpu"

import sys

sys.dont_write_bytecode = True


def main():
    from ld_tools_tpu.cli.ld_scan_cli import add_args_en, add_args_ru
    from ld_tools_tpu.utils.locale_detect import ui_language

    add_args = add_args_ru if ui_language() == "ru" else add_args_en
    args = add_args(__version__)
    from ld_tools_tpu.tools.scan import run

    run(args)


if __name__ == "__main__":
    main()
