"""Driver-side report adapters (K7/K8).

These operate on ``toPandas()`` of SMALL aggregated results — the
report layer, not the engine. Heavy deps (matplotlib, python-docx) are
optional: when importable they render; when absent the adapters still
produce REAL artifacts with the stdlib — .docx is a zip of OOXML parts
(``zipfile`` + XML strings, opens in Word/LibreOffice) and plots
render to SVG (XML all the way down) — so K7/K8 are full sinks in any
environment, not placeholders (the reference's degrade-don't-die
pattern, ``plot_helpers.py``, upgraded from degrade to re-render).

Plot spec grammar (the reference's ``plotting_impl.py:182-229``):
    {"title": ..., "xlabel": ..., "ylabel": ...,
     "series": [{"x": col, "y": col, "label": ..., "style": ...}, ...],
     "grid": [rows, cols], "out": "plot.png"}
"""

from __future__ import annotations

import os
from typing import Any, Mapping

from pyspark.sql import DataFrame

MAX_REPORT_ROWS = 100_000


def _small_pandas(df: DataFrame):
    pdf = df.limit(MAX_REPORT_ROWS + 1).toPandas()
    if len(pdf) > MAX_REPORT_ROWS:
        raise ValueError(
            f"report adapters take aggregated results (<= {MAX_REPORT_ROWS} rows); "
            "aggregate before plotting"
        )
    return pdf


def validate_plot_spec(spec: Mapping[str, Any]) -> None:
    if "series" not in spec or not spec["series"]:
        raise ValueError("plot spec needs a non-empty 'series' list")
    grid = spec.get("grid")
    n_axes = 1
    if grid is not None:
        if (
            not isinstance(grid, (list, tuple))
            or len(grid) != 2
            or not all(isinstance(g, int) and g > 0 for g in grid)
        ):
            raise ValueError(f"grid must be [rows, cols] of positive ints: {grid!r}")
        n_axes = grid[0] * grid[1]
    for s in spec["series"]:
        if "y" not in s:
            raise ValueError(f"series missing 'y': {s}")
        ax = s.get("ax", 0)
        if not isinstance(ax, int) or not 0 <= ax < n_axes:
            raise ValueError(f"series ax={ax!r} outside grid of {n_axes} axes")


# --- per-series style cyclers -----------------------------------------
#
# Mirrors the reference's plot styling (utils/adapters/plot_helpers.py:
# 131-233): qualitative tab10/tab20 colors for small series counts,
# golden-ratio-spaced HSV past 20; linestyle cycle of the 4 named
# styles plus 8 custom dash patterns; marker cycle o s ^ D v P * X h
# + x. Expressed engine-side as plain data (hex colors, SVG dasharray
# strings, marker tags) so BOTH renderers — matplotlib when importable
# and the stdlib SVG fallback — draw visually distinguishable series.
_TAB10 = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
]
_TAB20 = [
    "#1f77b4", "#aec7e8", "#ff7f0e", "#ffbb78", "#2ca02c", "#98df8a",
    "#d62728", "#ff9896", "#9467bd", "#c5b0d5", "#8c564b", "#c49c94",
    "#e377c2", "#f7b6d2", "#7f7f7f", "#c7c7c7", "#bcbd22", "#dbdb8d",
    "#17becf", "#9edae5",
]
#: (name, SVG stroke-dasharray or None) — order mirrors the reference's
#: base_styles + custom_patterns list.
_LINESTYLES = [
    ("solid", None), ("dashed", "6,3"), ("dotted", "1.5,2.5"), ("dashdot", "6,3,1.5,3"),
    ("longdash", "5,5"), ("dashdotdot", "3,1,1,1"), ("densedot", "1,1"),
    ("longdash-shortgap", "5,1"), ("dash-gap-dot-gap", "3,5,1,5"),
    ("sparsedot", "1,3"), ("dash-gap-dot", "4,2,1,2"), ("even", "2,2,2,2"),
]
_MARKERS = ["o", "s", "^", "D", "v", "P", "*", "X", "h", "+", "x"]


def n_colors(n: int) -> list[str]:
    """n visually separated hex colors: tab10 (n<=10), tab20 (n<=20),
    then golden-ratio-conjugate hue spacing with varied s/v."""
    if n <= 0:
        return []
    if n <= 10:
        return [_TAB10[i % 10] for i in range(n)]
    if n <= 20:
        return [_TAB20[i % 20] for i in range(n)]
    import colorsys

    golden = 0.618033988749895
    out = []
    for i in range(n):
        h = (i * golden) % 1.0
        s = 0.65 + 0.20 * ((i % 3) / 2)
        v = 0.9 - 0.15 * ((i % 4) / 3)
        r, g, b = colorsys.hsv_to_rgb(h, s, v)
        out.append(f"#{int(r * 255):02x}{int(g * 255):02x}{int(b * 255):02x}")
    return out


def series_styles(n: int) -> list[dict]:
    """Per-series style dicts: {color, linestyle, dash, marker} — the
    three cycles advance together, so any two of the first 10+ series
    differ in color AND dash AND marker."""
    colors = n_colors(n)
    return [
        {
            "color": colors[i],
            "linestyle": _LINESTYLES[i % len(_LINESTYLES)][0],
            "dash": _LINESTYLES[i % len(_LINESTYLES)][1],
            "marker": _MARKERS[i % len(_MARKERS)],
        }
        for i in range(n)
    ]


def _marker_svg(marker: str, x: float, y: float, color: str) -> str:
    """One SVG glyph for a matplotlib-style marker tag at (x, y)."""
    r = 3.0
    if marker == "o":
        return f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{r}" fill="{color}"/>'
    if marker == "s":
        return f'<rect x="{x - r:.1f}" y="{y - r:.1f}" width="{2 * r}" height="{2 * r}" fill="{color}"/>'
    if marker == "D":
        pts = f"{x:.1f},{y - r:.1f} {x + r:.1f},{y:.1f} {x:.1f},{y + r:.1f} {x - r:.1f},{y:.1f}"
        return f'<polygon points="{pts}" fill="{color}"/>'
    if marker == "^":
        pts = f"{x:.1f},{y - r:.1f} {x + r:.1f},{y + r:.1f} {x - r:.1f},{y + r:.1f}"
        return f'<polygon points="{pts}" fill="{color}"/>'
    if marker == "v":
        pts = f"{x:.1f},{y + r:.1f} {x + r:.1f},{y - r:.1f} {x - r:.1f},{y - r:.1f}"
        return f'<polygon points="{pts}" fill="{color}"/>'
    if marker == "h":  # hexagon
        rr = r * 0.87
        pts = " ".join(
            f"{x + rr * dx:.1f},{y + r * dy:.1f}"
            for dx, dy in ((0, -1), (1, -0.5), (1, 0.5), (0, 1), (-1, 0.5), (-1, -0.5))
        )
        return f'<polygon points="{pts}" fill="{color}"/>'
    if marker in ("+", "P"):
        w = 1.2 if marker == "+" else 2.2
        return (
            f'<path d="M{x - r:.1f},{y:.1f} H{x + r:.1f} M{x:.1f},{y - r:.1f} V{y + r:.1f}" '
            f'stroke="{color}" stroke-width="{w}" fill="none"/>'
        )
    if marker in ("x", "X", "*"):
        w = 1.2 if marker == "x" else 2.2
        d = (
            f"M{x - r:.1f},{y - r:.1f} L{x + r:.1f},{y + r:.1f} "
            f"M{x - r:.1f},{y + r:.1f} L{x + r:.1f},{y - r:.1f}"
        )
        if marker == "*":
            d += f" M{x - r:.1f},{y:.1f} H{x + r:.1f}"
        return f'<path d="{d}" stroke="{color}" stroke-width="{w}" fill="none"/>'
    return f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{r}" fill="{color}"/>'


#: matplotlib-ish format-string fragments a spec's ``style`` may carry;
#: an explicit style wins over the cycled default. Longest match first.
_STYLE_DASHES = [("-.", "6,3,1.5,3"), ("--", "6,3"), (":", "1.5,2.5"), ("-", None)]


def _svg_plot(pdf, spec: Mapping[str, Any], out_path: str) -> str:
    """Real chart rendering with the stdlib: SVG line/bar plots with
    axes, ticks, title, and legend — one cell per grid axis. SVG is
    XML, so no imaging library is needed; any browser/office suite
    renders the artifact."""
    from xml.sax.saxutils import escape

    rows, cols = spec.get("grid", (1, 1))
    CW, CH, M = 320, 220, 42  # cell size + margin
    width, height = cols * CW, rows * CH
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}" font-family="sans-serif" font-size="10">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    if spec.get("title"):
        parts.append(
            f'<text x="{width / 2}" y="14" text-anchor="middle" font-size="13">'
            f"{escape(str(spec['title']))}</text>"
        )
    styles = series_styles(len(spec["series"]))
    by_ax: dict[int, list] = {}
    for idx, s in enumerate(spec["series"]):
        by_ax.setdefault(s.get("ax", 0), []).append((idx, s))
    for ax_i, series in by_ax.items():
        ox, oy = (ax_i % cols) * CW, (ax_i // cols) * CH
        x0, y0 = ox + M, oy + CH - M  # plot origin (bottom-left)
        pw, ph = CW - 2 * M, CH - 2 * M
        # Two passes: decide whether this AXIS is categorical (any
        # series with a non-numeric x column makes it so — mixing raw
        # numeric x values with ordinal positions on one scale would
        # scatter points off-range), then map every series through ONE
        # shared category->position index so different series'
        # categories line up with the same ticks.
        raw_series = []
        axis_categorical = False
        for idx, s in series:
            xs = pdf[s["x"]].tolist() if "x" in s else list(range(len(pdf)))
            ys = pdf[s["y"]].tolist()
            try:
                [float(x) for x in xs if x is not None]
            except (TypeError, ValueError):
                axis_categorical = True
            raw_series.append((idx, s, xs, ys))
        cat_index: dict[str, int] = {}

        def fnum(v):
            """float or None; NaN (Spark NULL via toPandas) -> None."""
            if v is None:
                return None
            f = float(v)
            return None if f != f else f

        pts_per_series = []
        for idx, s, xs, ys in raw_series:
            if axis_categorical:
                xnum = [
                    None if x is None else cat_index.setdefault(str(x), len(cat_index))
                    for x in xs
                ]
            else:
                xnum = [fnum(x) for x in xs]
            pairs = [
                (x, y)
                for x, y in ((x, None if y is None else fnum(y)) for x, y in zip(xnum, ys))
                if x is not None and y is not None
            ]
            pts_per_series.append((idx, s, pairs))
        cat_labels = (
            [lab for lab, _ in sorted(cat_index.items(), key=lambda kv: kv[1])]
            if axis_categorical
            else None
        )
        allpts = [p for _, _, pts in pts_per_series for p in pts]
        if not allpts:
            continue
        xmin, xmax = min(p[0] for p in allpts), max(p[0] for p in allpts)
        ymin, ymax = min(p[1] for p in allpts), max(p[1] for p in allpts)
        ymin = min(ymin, 0.0)  # bars need a zero baseline
        xspan, yspan = (xmax - xmin) or 1.0, (ymax - ymin) or 1.0

        def sx(x):
            return x0 + (x - xmin) / xspan * pw

        def sy(y):
            return y0 - (y - ymin) / yspan * ph

        # axes + 4 ticks each
        parts.append(
            f'<path d="M{x0},{y0 - ph} L{x0},{y0} L{x0 + pw},{y0}" '
            'stroke="#333" fill="none"/>'
        )
        if cat_labels is not None:  # category names as x ticks (<=8)
            step = max(1, len(cat_labels) // 8)
            for i in range(0, len(cat_labels), step):
                parts.append(
                    f'<text x="{sx(float(i)):.1f}" y="{y0 + 12}" '
                    f'text-anchor="middle">{escape(cat_labels[i])}</text>'
                )
        for t in range(5):
            xv, yv = xmin + xspan * t / 4, ymin + yspan * t / 4
            if cat_labels is None:
                parts.append(
                    f'<text x="{sx(xv):.1f}" y="{y0 + 12}" text-anchor="middle">{xv:g}</text>'
                )
            parts.append(
                f'<text x="{x0 - 4}" y="{sy(yv):.1f}" text-anchor="end">{yv:g}</text>'
            )
        for lab, x, y, rot in (
            (spec.get("xlabel"), x0 + pw / 2, y0 + 26, 0),
            (spec.get("ylabel"), ox + 10, y0 - ph / 2, -90),
        ):
            if lab:
                parts.append(
                    f'<text x="{x:.1f}" y="{y:.1f}" text-anchor="middle" '
                    f'transform="rotate({rot} {x:.1f} {y:.1f})">{escape(str(lab))}</text>'
                )
        for ax_pos, (idx, s, pts) in enumerate(pts_per_series):
            cyc = styles[idx]
            color = cyc["color"]
            if not pts:  # an all-NULL series on a non-empty axis
                continue
            style_str = str(s.get("style", ""))
            if "bar" in style_str:
                bw = max(pw / (len(pts) * 1.5), 1.0)
                for x, y in pts:
                    parts.append(
                        f'<rect x="{sx(x) - bw / 2:.1f}" y="{min(sy(y), sy(0)):.1f}" '
                        f'width="{bw:.1f}" height="{abs(sy(y) - sy(0)):.1f}" fill="{color}"/>'
                    )
            else:
                # explicit format-string style wins WHOLE (dash from the
                # string, markers only if the string asks — matching the
                # matplotlib branch, where ax.plot(x, y, '--') draws no
                # markers); otherwise the series' cycled linestyle +
                # marker keep multi-series charts readable
                if style_str:
                    dash = next((d for frag, d in _STYLE_DASHES if frag in style_str), None)
                    marker = next((m for m in _MARKERS if m in style_str), None)
                else:
                    dash = cyc["dash"]
                    marker = cyc["marker"]
                path = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in sorted(pts))
                dash_attr = f' stroke-dasharray="{dash}"' if dash else ""
                parts.append(
                    f'<polyline points="{path}" fill="none" stroke="{color}" '
                    f'stroke-width="1.5"{dash_attr}/>'
                )
                if marker:
                    for x, y in sorted(pts):
                        parts.append(_marker_svg(marker, sx(x), sy(y), color))
            if len(series) > 1:  # legend (stacked per axis, not global)
                ly = oy + 16 + 12 * ax_pos
                parts.append(f'<rect x="{ox + CW - M - 60}" y="{ly - 8}" width="10" height="10" fill="{color}"/>')
                parts.append(
                    f'<text x="{ox + CW - M - 46}" y="{ly}">'
                    f"{escape(str(s.get('label', s['y'])))}</text>"
                )
    parts.append("</svg>")
    if not out_path.endswith(".svg"):
        out_path = os.path.splitext(out_path)[0] + ".svg"
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    return out_path


def plot_from_spec(df: DataFrame, spec: Mapping[str, Any], out_path: str) -> str:
    """Render the spec over the (small) frame: matplotlib when
    importable (PNG etc. per ``out_path``), else a REAL SVG chart via
    the stdlib renderer — never a placeholder."""
    validate_plot_spec(spec)
    pdf = _small_pandas(df)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rows, cols = spec.get("grid", (1, 1))
        fig, axes = plt.subplots(
            rows, cols, figsize=spec.get("figsize", (8 * cols, 5 * rows)), squeeze=False
        )
        flat = axes.ravel()
        styles = series_styles(len(spec["series"]))
        for idx, s in enumerate(spec["series"]):
            ax = flat[s.get("ax", 0)]
            x = pdf[s["x"]] if "x" in s else pdf.index
            style = str(s.get("style", ""))
            # 'bar' is a chart kind, not a matplotlib format string —
            # the SVG renderer and this branch must accept the same spec
            if "bar" in style:
                ax.bar(x, pdf[s["y"]], label=s.get("label", s["y"]))
            elif style:  # explicit format string wins
                ax.plot(x, pdf[s["y"]], style, label=s.get("label", s["y"]))
            else:  # cycled color/linestyle/marker (reference cyclers)
                cyc = styles[idx]
                ls = (
                    cyc["linestyle"]
                    if cyc["linestyle"] in ("solid", "dashed", "dotted", "dashdot")
                    else (0, tuple(float(t) for t in cyc["dash"].split(",")))
                )
                ax.plot(
                    x, pdf[s["y"]], color=cyc["color"], linestyle=ls,
                    marker=cyc["marker"], markersize=4, label=s.get("label", s["y"]),
                )
        for ax in flat:
            if ax.lines or ax.patches:
                ax.set_xlabel(spec.get("xlabel", ""))
                ax.set_ylabel(spec.get("ylabel", ""))
                if len(ax.lines) + len(ax.containers) > 1:
                    ax.legend()
        flat[0].set_title(spec.get("title", ""))
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
    except ImportError:
        return _svg_plot(pdf, spec, out_path)


_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def docx_report(df: DataFrame, title: str, out_path: str) -> str:
    """Word report (K7), simple form: heading + result table — sugar
    over ``docx_report_spec`` (python-docx when importable, stdlib
    OOXML writer otherwise; a real .docx either way)."""
    return docx_report_spec([{"heading": title}, {"table": df}], out_path)


# --- structured docx reports: pictures, captions, merged cells --------
#
# Mirrors the reference's report adapter surface
# (utils/adapters/docx_helpers.py:37-76: docx_insert_table with header +
# "Table: {caption}", docx_insert_picture with width-in-inches +
# "Figure: {caption}", docx_merge_cells) on both render paths:
# python-docx when importable, else the stdlib OOXML writer (real
# embedded image parts + DrawingML inline, not placeholders).

_EMU_PER_INCH = 914_400
_EMU_PER_PX = 9_525  # 96 dpi


def _image_dims_px(path: str) -> tuple[str, int, int]:
    """(ext, width_px, height_px) for png/jpeg/gif/bmp via the engine's
    header parser, or an SVG root's width/height attributes."""
    with open(path, "rb") as f:
        content = f.read(64 * 1024)
    if content.lstrip()[:5] in (b"<svg ", b"<?xml"):
        import re

        def dim(name, default):
            m = re.search((name + r'="(\d+(?:\.\d+)?)(?:px)?"').encode(), content)
            return int(float(m.group(1))) if m else default

        return "svg", dim("width", 640), dim("height", 440)
    from batch_process_spark.operators.multimodal import _parse_image_header

    fmt, w, h = _parse_image_header(content)
    return {"jpeg": "jpeg"}.get(fmt, fmt), w, h


def _drawing_xml(rid: str, cx: int, cy: int, doc_pr_id: int, is_svg: bool) -> str:
    """DrawingML inline-picture XML for one embedded image part. SVG
    rides the 2016 svgBlip extension (Word 2016+/LibreOffice)."""
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    wp = "http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing"
    pic = "http://schemas.openxmlformats.org/drawingml/2006/picture"
    if is_svg:
        blip = (
            f'<a:blip r:embed="{rid}" xmlns:r="{r}"><a:extLst>'
            '<a:ext uri="{96DAC541-7B7A-43D3-8B79-37D633B846F1}">'
            f'<asvg:svgBlip xmlns:asvg="http://schemas.microsoft.com/office/drawing/2016/SVG/main" '
            f'r:embed="{rid}" xmlns:r="{r}"/></a:ext></a:extLst></a:blip>'
        )
    else:
        blip = f'<a:blip r:embed="{rid}" xmlns:r="{r}"/>'
    return (
        f'<w:p><w:r><w:drawing><wp:inline distT="0" distB="0" distL="0" distR="0" xmlns:wp="{wp}">'
        f'<wp:extent cx="{cx}" cy="{cy}"/>'
        f'<wp:docPr id="{doc_pr_id}" name="Picture {doc_pr_id}"/>'
        f'<a:graphic xmlns:a="{a}"><a:graphicData uri="{pic}">'
        f'<pic:pic xmlns:pic="{pic}">'
        f'<pic:nvPicPr><pic:cNvPr id="{doc_pr_id}" name="Picture {doc_pr_id}"/><pic:cNvPicPr/></pic:nvPicPr>'
        f"<pic:blipFill>{blip}<a:stretch><a:fillRect/></a:stretch></pic:blipFill>"
        f'<pic:spPr><a:xfrm><a:off x="0" y="0"/><a:ext cx="{cx}" cy="{cy}"/></a:xfrm>'
        f'<a:prstGeom prst="rect"><a:avLst/></a:prstGeom></pic:spPr>'
        f"</pic:pic></a:graphicData></a:graphic></wp:inline></w:drawing></w:r></w:p>"
    )


def _merge_layout(n_rows: int, n_cols: int, merge_groups):
    """Validate merge groups (0-based (row, col), rectangular and
    contiguous) and return per-cell OOXML merge roles:
    {(r, c): ("span", width) | ("skip",) | ("vrestart", width) |
    ("vcontinue", width)}."""
    roles: dict = {}
    for group in merge_groups or []:
        if not group:
            continue
        rs = sorted({r for r, _ in group})
        cs = sorted({c for _, c in group})
        cells = {(r, c) for r, c in group}
        if not (0 <= rs[0] and rs[-1] < n_rows and 0 <= cs[0] and cs[-1] < n_cols):
            raise ValueError(f"merge group outside the {n_rows}x{n_cols} table: {group}")
        if cells != {(r, c) for r in rs for c in cs}:
            raise ValueError(f"merge group is not rectangular: {group}")
        if rs != list(range(rs[0], rs[-1] + 1)) or cs != list(range(cs[0], cs[-1] + 1)):
            raise ValueError(f"merge group is not contiguous: {group}")
        if any((r, c) in roles for r in rs for c in cs):
            raise ValueError(f"merge group overlaps another: {group}")
        width = len(cs)
        for r in rs:
            vrole = None
            if len(rs) > 1:
                vrole = "vrestart" if r == rs[0] else "vcontinue"
            roles[(r, cs[0])] = (vrole or "span", width)
            for c in cs[1:]:
                roles[(r, c)] = ("skip",)
    return roles


def _docx_stdlib_spec(sections, out_path: str) -> str:
    """Structured stdlib OOXML writer: headings, text, tables with
    captions + merged cells (gridSpan/vMerge), embedded pictures with
    width + figure captions."""
    import zipfile
    from xml.sax.saxutils import escape

    def run(text, bold=False, size=None):
        props = ""
        if bold or size:
            props = (
                "<w:rPr>"
                + ("<w:b/>" if bold else "")
                + (f'<w:sz w:val="{size}"/>' if size else "")
                + "</w:rPr>"
            )
        return f'<w:r>{props}<w:t xml:space="preserve">{escape(str(text))}</w:t></w:r>'

    def para(text, bold=False, size=None):
        return f"<w:p>{run(text, bold, size)}</w:p>"

    borders = (
        "<w:tblBorders>"
        + "".join(
            f'<w:{side} w:val="single" w:sz="4" w:space="0" w:color="auto"/>'
            for side in ("top", "left", "bottom", "right", "insideH", "insideV")
        )
        + "</w:tblBorders>"
    )

    body: list[str] = []
    media: list[tuple[str, bytes, str]] = []  # (zip name, bytes, ext)
    img_rels: list[tuple[str, str]] = []  # (rId, target)
    exts: set[str] = set()
    pic_no = 0

    for sec in sections:
        if "heading" in sec:
            body.append(para(sec["heading"], bold=True, size=28 if sec.get("level", 1) == 1 else 24))
        elif "text" in sec:
            body.append(para(sec["text"]))
        elif "table" in sec:
            pdf = sec["table"]
            header = [str(c) for c in pdf.columns]
            data = [["" if v is None else str(v) for v in row] for _, row in pdf.iterrows()]
            grid = [header] + data
            roles = _merge_layout(len(grid), len(header), sec.get("merge"))

            def cell_xml(r, c, text):
                role = roles.get((r, c))
                if role and role[0] == "skip":
                    return ""
                props = "<w:tcW w:w='0' w:type='auto'/>"
                if role:
                    kind, width = role
                    if width > 1:
                        props += f'<w:gridSpan w:val="{width}"/>'
                    if kind == "vrestart":
                        props += '<w:vMerge w:val="restart"/>'
                    elif kind == "vcontinue":
                        props += "<w:vMerge/>"
                        text = ""
                return f"<w:tc><w:tcPr>{props}</w:tcPr>{para(text)}</w:tc>"

            rows_xml = []
            for r, row in enumerate(grid):
                rows_xml.append(
                    "<w:tr>" + "".join(cell_xml(r, c, v) for c, v in enumerate(row)) + "</w:tr>"
                )
            body.append(f"<w:tbl><w:tblPr>{borders}</w:tblPr>" + "".join(rows_xml) + "</w:tbl>")
            if sec.get("caption"):
                body.append(para(f"Table: {sec['caption']}"))
        elif "picture" in sec:
            pic_no += 1
            src = sec["picture"]
            ext, w_px, h_px = _image_dims_px(src)
            exts.add(ext)
            if sec.get("width_inches"):
                cx = int(sec["width_inches"] * _EMU_PER_INCH)
                cy = int(cx * (h_px / max(w_px, 1)))
            else:
                cx, cy = w_px * _EMU_PER_PX, h_px * _EMU_PER_PX
            rid = f"rIdImg{pic_no}"
            name = f"media/image{pic_no}.{ext}"
            with open(src, "rb") as f:
                media.append((f"word/{name}", f.read(), ext))
            img_rels.append((rid, name))
            body.append(_drawing_xml(rid, cx, cy, pic_no, ext == "svg"))
            if sec.get("caption"):
                body.append(para(f"Figure: {sec['caption']}"))
        else:
            raise ValueError(f"unknown report section: {sorted(sec)}")

    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>'
        + "".join(body)
        + "<w:sectPr/></w:body></w:document>"
    )
    mime = {
        "png": "image/png", "jpeg": "image/jpeg", "gif": "image/gif",
        "bmp": "image/bmp", "svg": "image/svg+xml",
    }
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        + "".join(f'<Default Extension="{e}" ContentType="{mime[e]}"/>' for e in sorted(exts))
        + '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        "</Types>"
    )
    pkg_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument'
        '/2006/relationships/officeDocument" Target="word/document.xml"/>'
        "</Relationships>"
    )
    doc_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="{rid}" Type="http://schemas.openxmlformats.org/officeDocument'
            f'/2006/relationships/image" Target="{target}"/>'
            for rid, target in img_rels
        )
        + "</Relationships>"
    )
    import zipfile

    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", pkg_rels)
        z.writestr("word/document.xml", document)
        if img_rels:
            z.writestr("word/_rels/document.xml.rels", doc_rels)
        for name, blob, _ in media:
            z.writestr(name, blob)
    return out_path


def docx_report_spec(sections, out_path: str) -> str:
    """Structured Word report (K7, full reference surface): a list of
    sections, each one of

    - ``{"heading": str, "level": int}``
    - ``{"text": str}``
    - ``{"table": DataFrame | pandas.DataFrame, "caption": str | None,
         "merge": [[(row, col), ...], ...]}`` — merge groups are
      0-based over the RENDERED grid (row 0 = header), rectangular and
      contiguous; caption renders as a "Table: ..." paragraph
    - ``{"picture": path, "width_inches": float | None,
         "caption": str | None}`` — caption renders as "Figure: ..."

    python-docx when importable, else the stdlib OOXML writer — real
    embedded image parts either way. SVG pictures always route through
    the stdlib writer (which embeds them via the svgBlip extension):
    python-docx has no SVG support and would raise mid-document."""
    sections = list(sections)
    has_svg = False
    for sec in sections:
        if "table" in sec and isinstance(sec["table"], DataFrame):
            sec["table"] = _small_pandas(sec["table"])
        if "picture" in sec and _image_dims_px(sec["picture"])[0] == "svg":
            has_svg = True
    if has_svg:
        return _docx_stdlib_spec(sections, out_path)
    try:
        import docx  # type: ignore
        from docx.shared import Inches  # type: ignore

        doc = docx.Document()
        for sec in sections:
            if "heading" in sec:
                doc.add_heading(sec["heading"], level=sec.get("level", 1))
            elif "text" in sec:
                doc.add_paragraph(sec["text"])
            elif "table" in sec:
                pdf = sec["table"]
                grid = [[str(c) for c in pdf.columns]] + [
                    ["" if v is None else str(v) for v in row] for _, row in pdf.iterrows()
                ]
                roles = _merge_layout(len(grid), len(grid[0]), sec.get("merge"))
                table = doc.add_table(rows=len(grid), cols=len(grid[0]))
                for r, row in enumerate(grid):
                    for c, v in enumerate(row):
                        # non-lead merged cells get NO text: python-docx's
                        # merge CONCATENATES member contents, which would
                        # diverge from the stdlib writer's top-left-only
                        # rendering of the same spec
                        if (r, c) not in roles or roles[(r, c)][0] not in ("skip", "vcontinue"):
                            table.rows[r].cells[c].text = v
                for group in sec.get("merge") or []:
                    first = table.cell(*group[0])
                    for rc in group[1:]:
                        first = first.merge(table.cell(*rc))
                if sec.get("caption"):
                    doc.add_paragraph(f"Table: {sec['caption']}")
            elif "picture" in sec:
                if sec.get("width_inches"):
                    doc.add_picture(sec["picture"], width=Inches(sec["width_inches"]))
                else:
                    doc.add_picture(sec["picture"])
                if sec.get("caption"):
                    doc.add_paragraph(f"Figure: {sec['caption']}")
            else:
                raise ValueError(f"unknown report section: {sorted(sec)}")
        doc.save(out_path)
        return out_path
    except ImportError:
        return _docx_stdlib_spec(sections, out_path)
