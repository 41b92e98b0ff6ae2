"""CLI surface: RU/EN parity and reference flag-compatibility."""

import os

from ld_tools_tpu.cli import _shared
from ld_tools_tpu.cli.ld_area_cli_en import TEXT as AREA_EN
from ld_tools_tpu.cli.ld_area_cli_ru import TEXT as AREA_RU
from ld_tools_tpu.cli.ld_lite_cli_en import TEXT as LITE_EN
from ld_tools_tpu.cli.ld_lite_cli_ru import TEXT as LITE_RU
from ld_tools_tpu.cli.ld_triangle_cli_en import TEXT as TRI_EN
from ld_tools_tpu.cli.ld_triangle_cli_ru import TEXT as TRI_RU


def _signature(parser):
    """(option_strings, dest, default, choices, type) per action."""
    return [
        (
            tuple(a.option_strings),
            a.dest,
            a.default,
            tuple(a.choices) if a.choices else None,
            a.type,
        )
        for a in parser._actions
        if a.dest != "help"
    ]


def test_ru_en_parsers_identical():
    """RU/EN pairs must have identical argument sets (the reference's
    verified property, SURVEY.md §1 L5) — here true by construction, but
    locked in."""
    for build, en, ru in [
        (_shared.build_lite_parser, LITE_EN, LITE_RU),
        (_shared.build_area_parser, AREA_EN, AREA_RU),
        (_shared.build_triangle_parser, TRI_EN, TRI_RU),
    ]:
        assert _signature(build("V", en)) == _signature(build("V", ru))


def test_reference_flag_surface():
    """Flag names/defaults/choices from reference cli/*.py (SURVEY §2a)."""
    area = {
        opts: (dest, default, choices)
        for opts, dest, default, choices, _ in _signature(
            _shared.build_area_parser("V", AREA_EN)
        )
    }
    assert area[("-w", "--flank-size")] == ("flank_size", 100000, None)
    assert area[("-z", "--ld-low-thres")] == ("ld_low_thres", 0.8, None)
    assert area[("-l", "--ld-thres-measure")] == (
        "ld_thres_measure", "r_square", ("r_square", "d_prime"),
    )
    assert area[("-o", "--trg-file-type")] == (
        "trg_file_type", "tsv", ("tsv", "json", "rsids"),
    )
    assert area[("-p", "--max-proc-quan")] == ("max_proc_quan", 4, None)
    assert area[("-g", "--gend-names")] == (
        "gend_names", "both", ("male", "female", "both"),
    )
    assert area[("-e", "--pop-names")] == ("pop_names", "all", None)
    assert area[("-m", "--meta-lines-quan")] == ("meta_lines_quan", 0, None)

    tri = {
        opts: (dest, default, choices)
        for opts, dest, default, choices, _ in _signature(
            _shared.build_triangle_parser("V", TRI_EN)
        )
    }
    assert tri[("-l", "--ld-measure")] == (
        "ld_measure", "r_square", ("r_square", "d_prime"),
    )
    assert tri[("-z", "--ld-low-thres")] == ("ld_low_thres", None, None)
    assert tri[("-o", "--matrix-type")] == (
        "matrix_type", "heatmap", ("heatmap", "table", "both"),
    )
    assert tri[("-c", "--color-pal")] == ("color_pal", "greens", None)
    for flag in ("-j", "-i", "-q", "-s"):
        assert any(flag in opts for opts in tri), flag

    lite = _signature(_shared.build_lite_parser("V", LITE_EN))
    positionals = [sig for sig in lite if not sig[0]]
    assert [p[1] for p in positionals] == ["rs_id_1", "rs_id_2"]


def test_parse_args_roundtrip():
    parser = _shared.build_area_parser("V", AREA_EN)
    args = parser.parse_args(
        ["-S", "/src", "-D", "/data", "-f", "-w", "50000", "-z", "0.9",
         "-o", "json", "-e", "eur,gbr"]
    )
    assert args.src_dir_path == "/src"
    assert args.skip_intgen_data_ver is True
    assert args.flank_size == 50000
    assert args.ld_low_thres == 0.9
    assert args.trg_file_type == "json"
    assert args.pop_names == "eur,gbr"


def test_ui_language_detection(monkeypatch):
    from ld_tools_tpu.utils.locale_detect import ui_language

    for var in ("LANGUAGE", "LC_ALL", "LC_MESSAGES", "LANG"):
        monkeypatch.delenv(var, raising=False)
    assert ui_language() == "en"
    monkeypatch.setenv("LANG", "ru_RU.UTF-8")
    assert ui_language() == "ru"
    monkeypatch.setenv("LC_ALL", "en_US.UTF-8")  # higher priority wins
    assert ui_language() == "en"
    monkeypatch.setenv("LANGUAGE", "ru")
    assert ui_language() == "ru"


def test_merge_to_folder_invocations(tmp_path):
    """Reference invocation is two positionals
    (/root/reference/scripts/merge_to_folder.py:20-24); -S/-T stay as
    aliases."""
    import subprocess
    import sys

    src = tmp_path / "tree" / "deep"
    src.mkdir(parents=True)
    (src / "x.tsv").write_text("data\n")
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "merge_to_folder.py",
    )
    for argv in (
        [str(tmp_path / "tree"), str(tmp_path / "flat1")],
        ["-S", str(tmp_path / "tree"), "-T", str(tmp_path / "flat2")],
    ):
        r = subprocess.run([sys.executable, script] + argv,
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
    assert (tmp_path / "flat1" / "x.tsv").read_text() == "data\n"
    assert (tmp_path / "flat2" / "x.tsv").read_text() == "data\n"


def test_heatmap_palettes_cover_reference_list():
    """All 45 palette names the reference README documents must resolve
    to distinct colorscales (reference README.md:97)."""
    from ld_tools_tpu.io.heatmap import PALETTES, colorscale_stops

    names = (
        "algae amp blues blugrn bluyl brwnyl bugn bupu burg burgyl "
        "darkmint deep dense emrld gnbu greens greys magenta matter mint "
        "oranges orrd oryel peach pinkyl pubu pubugn purd purp purples "
        "purpor rdpu redor reds speed sunset sunsetdark teal tealgrn "
        "tempo turbid ylgn ylgnbu ylorbr ylorrd"
    ).split()
    assert len(names) == 45
    assert set(PALETTES) == set(names)
    for n in names:
        stops = colorscale_stops(n)
        assert len(stops) >= 2
