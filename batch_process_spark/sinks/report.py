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
    palette = ["#4c78a8", "#f58518", "#54a24b", "#e45756", "#72b7b2", "#b279a2"]
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
            color = palette[idx % len(palette)]
            if not pts:  # an all-NULL series on a non-empty axis
                continue
            if "bar" in str(s.get("style", "")):
                bw = max(pw / (len(pts) * 1.5), 1.0)
                for x, y in pts:
                    parts.append(
                        f'<rect x="{sx(x) - bw / 2:.1f}" y="{min(sy(y), sy(0)):.1f}" '
                        f'width="{bw:.1f}" height="{abs(sy(y) - sy(0)):.1f}" fill="{color}"/>'
                    )
            else:
                path = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in sorted(pts))
                parts.append(
                    f'<polyline points="{path}" fill="none" stroke="{color}" stroke-width="1.5"/>'
                )
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
        for s in spec["series"]:
            ax = flat[s.get("ax", 0)]
            x = pdf[s["x"]] if "x" in s else pdf.index
            style = str(s.get("style", "-"))
            # 'bar' is a chart kind, not a matplotlib format string —
            # the SVG renderer and this branch must accept the same spec
            if "bar" in style:
                ax.bar(x, pdf[s["y"]], label=s.get("label", s["y"]))
            else:
                ax.plot(x, pdf[s["y"]], style, label=s.get("label", s["y"]))
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


def _docx_stdlib(pdf, title: str, out_path: str) -> str:
    """Write a REAL .docx with zipfile alone: OOXML is a zip of XML
    parts, and the minimal package ([Content_Types].xml, _rels/.rels,
    word/document.xml) opens in Word/LibreOffice. Heading as a bold
    28-half-point run (direct formatting — no styles.xml dependency),
    table with single borders."""
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

    def cell(text):
        return f"<w:tc><w:tcPr><w:tcW w:w='0' w:type='auto'/></w:tcPr>{para(text)}</w:tc>"

    borders = (
        "<w:tblBorders>"
        + "".join(
            f'<w:{side} w:val="single" w:sz="4" w:space="0" w:color="auto"/>'
            for side in ("top", "left", "bottom", "right", "insideH", "insideV")
        )
        + "</w:tblBorders>"
    )
    rows_xml = ["<w:tr>" + "".join(cell(c) for c in pdf.columns) + "</w:tr>"]
    for _, row in pdf.iterrows():
        rows_xml.append(
            "<w:tr>"
            + "".join(cell("" if v is None else v) for v in row)
            + "</w:tr>"
        )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>'
        + para(title, bold=True, size=28)
        + f"<w:tbl><w:tblPr>{borders}</w:tblPr>"
        + "".join(rows_xml)
        + "</w:tbl><w:sectPr/></w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument'
        '/2006/relationships/officeDocument" Target="word/document.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", rels)
        z.writestr("word/document.xml", document)
    return out_path


def docx_report(df: DataFrame, title: str, out_path: str) -> str:
    """Word report (K7): heading + result table. python-docx when
    importable; else the stdlib OOXML writer — a real .docx either
    way."""
    pdf = _small_pandas(df)
    try:
        import docx  # type: ignore

        doc = docx.Document()
        doc.add_heading(title, level=1)
        table = doc.add_table(rows=1, cols=len(pdf.columns))
        for i, c in enumerate(pdf.columns):
            table.rows[0].cells[i].text = str(c)
        for _, row in pdf.iterrows():
            cells = table.add_row().cells
            for i, v in enumerate(row):
                cells[i].text = "" if v is None else str(v)
        doc.save(out_path)
        return out_path
    except ImportError:
        return _docx_stdlib(pdf, title, out_path)
