#!/usr/bin/env python3
"""ld_area entry point: LD-threshold neighborhood search.

Invocation-compatible with reference ld_area.py; locale selects RU/EN
help like the reference (ld_area.py:316-319).
"""

__version__ = "V1.0-tpu"

import sys

sys.dont_write_bytecode = True


def main():
    from ld_tools_tpu.utils.locale_detect import ui_language

    if ui_language() == "ru":
        from ld_tools_tpu.cli.ld_area_cli_ru import add_args_ru as add_args
    else:
        from ld_tools_tpu.cli.ld_area_cli_en import add_args_en as add_args
    args = add_args(__version__)
    from ld_tools_tpu.tools.area import run

    run(args)


if __name__ == "__main__":
    main()
