#!/usr/bin/env python3
"""ld_area entry point: LD-threshold neighborhood search.

Invocation-compatible with reference ld_area.py; locale selects RU/EN
help like the reference (ld_area.py:316-319).
"""

__version__ = "V1.0-tpu"

import locale
import sys

sys.dont_write_bytecode = True


def main():
    loc = locale.getdefaultlocale()[0]
    if loc is not None and loc[:2] == "ru":
        from ld_tools_tpu.cli.ld_area_cli_ru import add_args_ru as add_args
    else:
        from ld_tools_tpu.cli.ld_area_cli_en import add_args_en as add_args
    args = add_args(__version__)
    from ld_tools_tpu.tools.area import run

    run(args)


if __name__ == "__main__":
    main()
