"""Driver-side report adapters (K7/K8).

These operate on ``toPandas()`` of SMALL aggregated results — the
report layer, not the engine. Heavy deps (matplotlib, python-docx) are
absent from this environment, so each adapter degrades explicitly:
the spec is validated and a placeholder artifact is written, keeping
the pipeline runnable end-to-end (the reference's Pillow-fallback
pattern, ``plot_helpers.py``).

Plot spec grammar (the reference's ``plotting_impl.py:182-229``):
    {"title": ..., "xlabel": ..., "ylabel": ...,
     "series": [{"x": col, "y": col, "label": ..., "style": ...}, ...],
     "grid": [rows, cols], "out": "plot.png"}
"""

from __future__ import annotations

import json
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


def plot_from_spec(df: DataFrame, spec: Mapping[str, Any], out_path: str) -> str:
    """Render the spec over the (small) frame. With matplotlib absent,
    writes a JSON sidecar describing exactly what would be drawn (spec
    + data head) so tests and pipelines stay runnable."""
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
            ax.plot(x, pdf[s["y"]], s.get("style", "-"), label=s.get("label", s["y"]))
        for ax in flat:
            if ax.lines:
                ax.set_xlabel(spec.get("xlabel", ""))
                ax.set_ylabel(spec.get("ylabel", ""))
                if len(ax.lines) > 1:
                    ax.legend()
        flat[0].set_title(spec.get("title", ""))
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
    except ImportError:
        side = out_path + ".spec.json"
        with open(side, "w", encoding="utf-8") as f:
            json.dump(
                {"spec": dict(spec), "columns": list(pdf.columns), "n_rows": len(pdf),
                 "head": pdf.head(5).to_dict(orient="records")},
                f, default=str, indent=2,
            )
        return side


def docx_report(df: DataFrame, title: str, out_path: str) -> str:
    """Word report (K7): heading + result table. Without python-docx,
    writes a markdown twin with the same content."""
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
        side = os.path.splitext(out_path)[0] + ".md"
        with open(side, "w", encoding="utf-8") as f:
            f.write(f"# {title}\n\n")
            f.write("| " + " | ".join(map(str, pdf.columns)) + " |\n")
            f.write("|" + "---|" * len(pdf.columns) + "\n")
            for _, row in pdf.iterrows():
                f.write("| " + " | ".join("" if v is None else str(v) for v in row) + " |\n")
        return side
