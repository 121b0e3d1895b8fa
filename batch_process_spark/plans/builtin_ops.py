"""Built-in pipeline operators (the reference's ``processors/`` set,
re-expressed as DataFrame stages and registered on import)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_process_spark.operators.textops import count_code_lines, count_lines, word_char_counts
from batch_process_spark.plans.registry import operator


@operator(name="count_files")
def count_files(df, **cfg):
    return df.agg(F.count(F.lit(1)).alias("n_files"))


@operator(name="select_ext")
def select_ext(df, ext="txt", **cfg):
    return df.filter(F.col("ext") == ext)


@operator(name="line_counts")
def line_counts(df, text_col="text", **cfg):
    return df.withColumn("lines", count_lines(text_col)).withColumn(
        "code_lines", count_code_lines(text_col)
    )


@operator(name="word_char_counts")
def word_char_counts_op(df, text_col="text", **cfg):
    return word_char_counts(df, text_col)


@operator(name="extract_numbers")
def extract_numbers(df, **cfg):
    from batch_process_spark.sources.readers import sniff_numeric_values

    return sniff_numeric_values(df)


@operator(name="dir_rollup", phase="post")
def dir_rollup(df, level=0, **cfg):
    from batch_process_spark.operators.grouping import dir_level_aggregate

    return dir_level_aggregate(df, level)


@operator(name="backup", phase="post")
def backup(df, root=".", backup_dir="backup", **cfg):
    from batch_process_spark.sinks.fileops import backup_files

    return backup_files(df.filter(~F.col("is_dir")), root, backup_dir)


@operator(name="quality_gate", phase="post")
def quality_gate(df, checks=None, fail_on_violation=False, **cfg):
    """Pipeline-stage form of the intake gate (`operators/quality.py`):
    rule dicts come straight from the YAML/JSON pipeline config (the
    reference's plugin-config pattern), the result is the per-check
    report frame, and ``fail_on_violation=True`` turns the stage into a
    hard gate: it raises GateError, which Pipeline.run treats as
    halting — the failing stage records failed and every later stage
    (including sinks) records skipped instead of running. Order the
    gate before sinks via the config rule's priority. FK checks
    are not config-expressible (they need a second DataFrame) — use
    check_constraints directly for those."""
    from batch_process_spark.operators.quality import GateError, check_constraints

    if not checks:
        raise ValueError("quality_gate needs a non-empty 'checks' list in config")
    if any(c.get("type") == "foreign_key" for c in checks):
        raise ValueError(
            "foreign_key checks need a ref DataFrame; call check_constraints directly"
        )
    report = check_constraints(df, checks)
    if fail_on_violation:
        bad = report.filter(~F.col("passed")).collect()
        if bad:
            names = ", ".join(f"{r['check_name']}({r['violations']})" for r in bad)
            raise GateError(f"quality gate failed: {names}")
    return report


@operator(name="docx_report", phase="post")
def docx_report_op(df, out="report.docx", title="Report", caption=None, plot=None, plot_out=None, width_inches=6.0, **cfg):
    """Config-driven Word report (the reference's main-flow report
    step, ``utils/exporters.py`` + ``docx_helpers.py``, as a pipeline
    stage): the incoming frame renders as a captioned table; an
    optional ``plot`` spec (the K8 grammar) is rendered first
    (matplotlib or stdlib SVG) and embedded with a figure caption.
    Returns the frame unchanged so later stages keep flowing.

    Example config::

        post_process:
          - name: docx_report
            config:
              out: out/report.docx
              title: Nightly rollup
              caption: per-group stats
              plot: {series: [{x: g, y: mean}]}
              plot_out: out/means.png
    """
    from batch_process_spark.sinks.report import docx_report_spec, plot_from_spec

    sections: list = [{"heading": title}, {"table": df, "caption": caption}]
    if plot:
        rendered = plot_from_spec(df, plot, plot_out or out.rsplit(".", 1)[0] + ".png")
        sections.append(
            {
                "picture": rendered,
                "width_inches": width_inches,
                "caption": plot.get("title") or caption,
            }
        )
    docx_report_spec(sections, out)
    return df
