"""Heatmap rendering: plotly-figure-schema JSON + self-contained HTML.

The reference renders with the plotly library (ld_triangle.py:239-340).
This environment has no plotly package, and the output contract is (a) an
interactive HTML heatmap with per-cell hover annotations and (b) an
optional JSON dump of the figure object (`-j` flag, ld_triangle.py:333-336).
Both are produced here without plotly: the JSON follows plotly's figure
schema (data/layout) so existing downstream tooling can parse it, and the
HTML embeds a small canvas renderer (no external assets — works offline,
matching the reference's fully-offline operation after prep).

All 45 palette names the reference accepts (its README palette list) are
recognized; colors follow the standard sequential colormaps of the same
names.
"""

from __future__ import annotations

import json

# name -> gradient stops (position in [0,1], "#rrggbb").  ColorBrewer
# families use their published 3-stop skeletons; cmocean/carto families use
# representative endpoints of the public colormaps of the same name.
PALETTES = {
    "algae": ["#d7f9d0", "#4cab68", "#0a2b16"],
    "amp": ["#f1ecec", "#d65f5f", "#3c0911"],
    "blues": ["#f7fbff", "#6baed6", "#08306b"],
    "blugrn": ["#d5efdb", "#63a97f", "#1d4f60"],
    "bluyl": ["#f7feae", "#46aea0", "#045275"],
    "brwnyl": ["#ede5cf", "#c1766f", "#541f3f"],
    "bugn": ["#f7fcfd", "#66c2a4", "#00441b"],
    "bupu": ["#f7fcfd", "#8c96c6", "#4d004b"],
    "burg": ["#ffc6c4", "#cc607d", "#672044"],
    "burgyl": ["#fbe6c5", "#dc7176", "#70284a"],
    "darkmint": ["#d2fbd4", "#559c9e", "#123f5a"],
    "deep": ["#fdfecc", "#4e7cad", "#271a2c"],
    "dense": ["#e6f1f1", "#7c6bb0", "#360e24"],
    "emrld": ["#d3f2a3", "#4c9b82", "#074050"],
    "gnbu": ["#f7fcf0", "#7bccc4", "#084081"],
    "greens": ["#f7fcf5", "#74c476", "#00441b"],
    "greys": ["#ffffff", "#969696", "#000000"],
    "magenta": ["#f3cbd3", "#ca699d", "#6c2167"],
    "matter": ["#feedb0", "#c4594e", "#2f0f3e"],
    "mint": ["#e4f1e1", "#63a6a0", "#0d585f"],
    "oranges": ["#fff5eb", "#fd8d3c", "#7f2704"],
    "orrd": ["#fff7ec", "#fc8d59", "#7f0000"],
    "oryel": ["#ecda9a", "#f66356", "#ee4d5a"],
    "peach": ["#fde0c5", "#f59e72", "#eb4a40"],
    "pinkyl": ["#fef6b5", "#f3809c", "#e15383"],
    "pubu": ["#fff7fb", "#74a9cf", "#023858"],
    "pubugn": ["#fff7fb", "#67a9cf", "#014636"],
    "purd": ["#f7f4f9", "#df65b0", "#67001f"],
    "purp": ["#f3e0f7", "#9f82ce", "#63589f"],
    "purples": ["#fcfbfd", "#9e9ac8", "#3f007d"],
    "purpor": ["#f9ddda", "#c76a9e", "#573b88"],
    "rdpu": ["#fff7f3", "#f768a1", "#49006a"],
    "redor": ["#f6d2a9", "#ea8171", "#b13f64"],
    "reds": ["#fff5f0", "#fb6a4a", "#67000d"],
    "speed": ["#fffdcd", "#7a9b26", "#172313"],
    "sunset": ["#f3e79b", "#eb7f86", "#5c53a5"],
    "sunsetdark": ["#fcde9c", "#e34f6f", "#7c1d6f"],
    "teal": ["#d1eeea", "#568f8b", "#2a5674"],
    "tealgrn": ["#b0f2bc", "#4cc8a3", "#257d98"],
    "tempo": ["#fff6f4", "#4f9e81", "#141d43"],
    "turbid": ["#e9f6ab", "#a57b4f", "#221f1b"],
    "ylgn": ["#ffffe5", "#78c679", "#004529"],
    "ylgnbu": ["#ffffd9", "#41b6c4", "#081d58"],
    "ylorbr": ["#ffffe5", "#fe9929", "#662506"],
    "ylorrd": ["#ffffcc", "#fd8d3c", "#800026"],
}


def colorscale_stops(name: str):
    stops = PALETTES.get(str(name).lower(), PALETTES["greens"])
    n = len(stops)
    return [[i / (n - 1), c] for i, c in enumerate(stops)]


def build_figure(
    ld_two_dim,
    info_two_dim,
    rs_ids,
    *,
    disp_letters: bool,
    color_pal: str,
    font_size,
    square_shape: bool,
    title_text: str,
    footer_text,
) -> dict:
    """Plotly-figure-schema dict for a lower-triangle LD heatmap.

    Mirrors the reference's figure structure: annotated heatmap with rsID
    axis labels when ``disp_letters`` (ld_triangle.py:246-269), bare
    heatmap with hidden tick labels otherwise (:279-290), reversed y axis
    (:317-319), footer smuggled in as the x-axis title (:320-329).
    """
    trace = {
        "type": "heatmap",
        "z": [list(row) for row in ld_two_dim],
        "hovertext": [list(row) for row in info_two_dim],
        "hoverinfo": "text",
        "xgap": 1,
        "ygap": 1,
        "colorscale": colorscale_stops(color_pal),
        "showscale": False,
    }
    layout = {
        "title": {"text": title_text},
        "xaxis": {"side": "bottom"},
        "yaxis": {"autorange": "reversed"},
    }
    if disp_letters:
        trace["x"] = list(rs_ids)
        trace["y"] = list(rs_ids)
        annotations = []
        n = len(ld_two_dim)
        for i in range(n):
            for j in range(n):
                ann = {
                    "text": str(ld_two_dim[i][j]),
                    "x": rs_ids[j],
                    "y": rs_ids[i],
                    "xref": "x",
                    "yref": "y",
                    "showarrow": False,
                }
                if font_size is not None:
                    ann["font"] = {"size": font_size}
                annotations.append(ann)
        layout["annotations"] = annotations
        if font_size is not None:
            layout["xaxis"]["tickfont"] = {"size": font_size}
            layout["yaxis"]["tickfont"] = {"size": font_size}
    else:
        layout["xaxis"]["showticklabels"] = False
        layout["yaxis"]["showticklabels"] = False
    if square_shape:
        layout["xaxis"]["constraintoward"] = "left"
        layout["yaxis"]["scaleanchor"] = "x"
        layout["yaxis"]["scaleratio"] = 1
        layout["plot_bgcolor"] = "rgba(0,0,0,0)"
    if footer_text is not None:
        layout["xaxis"]["title"] = {"text": footer_text, "font": {"size": 10}}
    return {"data": [trace], "layout": layout}


def write_json(path: str, figure: dict) -> None:
    with open(path, "w") as fh:
        json.dump(figure, fh, indent=2)


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>LD heatmap</title>
<style>
 body {{ font-family: sans-serif; margin: 12px; }}
 #title {{ white-space: pre-line; font-size: 14px; }}
 #footer {{ white-space: pre-line; font-size: 10px; color: #444; }}
 #wrap {{ position: relative; display: inline-block; }}
 #tip {{ position: absolute; display: none; background: #fff; border: 1px solid #888;
        padding: 6px 8px; font-size: 11px; pointer-events: none; z-index: 9;
        box-shadow: 0 1px 4px rgba(0,0,0,.3); max-width: 360px; }}
 canvas {{ image-rendering: pixelated; }}
</style></head><body>
<div id="title"></div>
<div id="wrap"><canvas id="hm"></canvas><div id="tip"></div></div>
<div id="footer"></div>
<script>
const FIG = {figure_json};
const trace = FIG.data[0];
const z = trace.z, info = trace.hovertext, n = z.length;
const stops = trace.colorscale;
const labels = trace.x || null;
const fontSize = (FIG.layout.xaxis.tickfont||{{}}).size || 11;
function hex2rgb(h) {{ return [parseInt(h.slice(1,3),16), parseInt(h.slice(3,5),16), parseInt(h.slice(5,7),16)]; }}
function colorAt(t) {{
  for (let k = 1; k < stops.length; k++) {{
    if (t <= stops[k][0]) {{
      const a = hex2rgb(stops[k-1][1]), b = hex2rgb(stops[k][1]);
      const u = (t - stops[k-1][0]) / (stops[k][0] - stops[k-1][0] || 1);
      return [0,1,2].map(i => Math.round(a[i] + (b[i]-a[i]) * u));
    }}
  }}
  return hex2rgb(stops[stops.length-1][1]);
}}
let zmin = Infinity, zmax = -Infinity;
for (const row of z) for (const v of row) {{ if (v < zmin) zmin = v; if (v > zmax) zmax = v; }}
if (zmax === zmin) zmax = zmin + 1;
const margin = labels ? 90 : 10;
const cell = Math.max(3, Math.min(28, Math.floor(900 / n)));
const gap = trace.xgap || 0;
const size = n * cell;
const canvas = document.getElementById('hm');
canvas.width = size + margin; canvas.height = size + margin;
const ctx = canvas.getContext('2d');
ctx.fillStyle = '#ffffff'; ctx.fillRect(0, 0, canvas.width, canvas.height);
// y autorange is reversed in the figure: row 0 renders at the top.
for (let i = 0; i < n; i++) for (let j = 0; j < n; j++) {{
  const c = colorAt((z[i][j] - zmin) / (zmax - zmin));
  ctx.fillStyle = `rgb(${{c[0]}},${{c[1]}},${{c[2]}})`;
  ctx.fillRect(margin + j*cell, i*cell, cell - gap, cell - gap);
}}
const showNums = {show_numbers};
if (labels) {{
  ctx.fillStyle = '#000'; ctx.font = fontSize + 'px sans-serif';
  for (let j = 0; j < n; j++) {{
    ctx.save();
    ctx.translate(margin + j*cell + cell/2, size + 4);
    ctx.rotate(Math.PI/2); ctx.textBaseline = 'middle';
    ctx.fillText(labels[j], 0, 0); ctx.restore();
  }}
  ctx.textAlign = 'right'; ctx.textBaseline = 'middle';
  for (let i = 0; i < n; i++) ctx.fillText(labels[i], margin - 4, i*cell + cell/2);
  if (showNums && cell >= 14) {{
    ctx.textAlign = 'center';
    for (let i = 0; i < n; i++) for (let j = 0; j < n; j++) {{
      const t = (z[i][j] - zmin) / (zmax - zmin);
      ctx.fillStyle = t > 0.55 ? '#fff' : '#000';
      ctx.fillText(String(z[i][j]).slice(0, 6), margin + j*cell + cell/2, i*cell + cell/2);
    }}
  }}
}}
const tip = document.getElementById('tip');
canvas.addEventListener('mousemove', ev => {{
  const r = canvas.getBoundingClientRect();
  const x = ev.clientX - r.left - margin, y = ev.clientY - r.top;
  const j = Math.floor(x / cell), i = Math.floor(y / cell);
  if (i >= 0 && i < n && j >= 0 && j < n && info[i][j]) {{
    tip.innerHTML = info[i][j];
    tip.style.display = 'block';
    tip.style.left = (ev.clientX - r.left + 14) + 'px';
    tip.style.top = (ev.clientY - r.top + 14) + 'px';
  }} else tip.style.display = 'none';
}});
canvas.addEventListener('mouseleave', () => tip.style.display = 'none');
document.getElementById('title').textContent = (FIG.layout.title||{{}}).text || '';
const xt = ((FIG.layout.xaxis||{{}}).title||{{}}).text || '';
document.getElementById('footer').innerHTML = xt;
</script></body></html>
"""


def write_html(path: str, figure: dict, disp_letters: bool) -> None:
    html = _HTML_TEMPLATE.format(
        figure_json=json.dumps(figure),
        show_numbers="true" if disp_letters else "false",
    )
    with open(path, "w") as fh:
        fh.write(html)
