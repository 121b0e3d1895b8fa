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


@operator(name="dedup_report", phase="post")
def dedup_report(
    df,
    id_col="path",
    text_col="text",
    method="exact",
    threshold=0.7,
    k=3,
    num_hashes=16,
    bands=4,
    out=None,
    **cfg,
):
    """Config-driven dedup accounting over the pipeline's text frame
    (the q220 report shape as a reference-style post stage): cluster
    duplicates by content — ``method="exact"`` groups on the content
    hash (ONE partial-agg pass: exact duplicates share identical text,
    so per-cluster byte totals derive from the count and one member's
    length), ``method="minhash"`` runs the full MinHash-LSH near-dup
    pipeline (``k``/``num_hashes``/``bands``/``threshold`` all plumbed
    from the config) — and report, per cluster size, the cluster
    count, documents the min-id-survivor policy would remove, and the
    UTF-8 bytes (octet_length) of text that reclaims. ``out=...``
    additionally writes the report as CSV. Returns the report frame
    (small: one row per cluster size).

    Example config::

        post_process:
          - name: dedup_report
            config: {method: exact, out: out/dedup_report.csv}
    """
    from batch_process_spark.operators import dedup as dedup_ops
    from batch_process_spark.operators.graph import cluster_savings_report

    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("node"),
        F.col(text_col).alias("__text"),
    )
    if method == "exact":
        # exact duplicates share IDENTICAL text, so the per-cluster
        # accounting needs only (count, one length) per hash — a single
        # partial-agg exchange carrying (hash, node, length), never the
        # text payload
        per_cluster = (
            base.select(
                F.md5("__text").alias("__h"),
                F.col("node"),
                F.octet_length("__text").alias("__len"),
            )
            .groupBy("__h")
            .agg(
                F.count(F.lit(1)).alias("cluster_size"),
                F.first("__len").alias("__len"),
            )
            .filter(F.col("cluster_size") > 1)
            .select(
                "cluster_size",
                ((F.col("cluster_size") - 1) * F.col("__len")).alias("bytes_removed"),
            )
        )
    elif method == "minhash":
        from batch_process_spark.operators.graph import dedup_clusters

        pairs = dedup_ops.minhash_near_dup_pairs(
            base.withColumnRenamed("__text", "text"), "node", "text",
            k=k, num_hashes=num_hashes, bands=bands, threshold=threshold,
        )
        lens = base.select("node", F.octet_length("__text").alias("n_bytes"))
        per_cluster = (
            dedup_clusters(pairs)
            .join(lens, "node")
            .groupBy("component", "cluster_size")
            .agg(
                F.sum(
                    F.when(F.col("node") != F.col("component"), F.col("n_bytes"))
                    .otherwise(F.lit(0))
                ).alias("bytes_removed")
            )
            .select("cluster_size", "bytes_removed")
        )
    else:
        raise ValueError(f"dedup_report: unknown method {method!r}")
    report = cluster_savings_report(per_cluster)
    if out:
        from batch_process_spark.sinks.writers import write_csv

        write_csv(report, out)
    return report


@operator(name="hubness_report", phase="post")
def hubness_report(
    df,
    index_path=None,
    k=10,
    nprobe="auto",
    max_queries=100_000,
    seed=42,
    out=None,
    **cfg,
):
    """Serving-path hubness audit over a stored float-IVF index (the
    ``dedup_report`` discipline for the embedding side): self-query
    the index through the production searcher and report the
    k-occurrence histogram — how many vectors appear in 0 (antihubs,
    unreachable by kNN), 1, ..., many other vectors' neighbor lists.
    A heavy high-k tail (hubs) degrades retrieval diversity; a fat
    k_occ=0 bucket means dead corpus mass. Cost is |queries| x k, not
    corpus² (``operators.similarity.stored_index_hubness``;
    ``max_queries`` bounds the query side by deterministic sample).

    The pipeline's frame passes through untouched semantics-wise: the
    report is computed from ``index_path`` (required), sorted by
    k_occurrence, optionally written as CSV via ``out=...``.

    Example config::

        post_process:
          - name: hubness_report
            config: {index_path: /data/ivf_index, k: 10,
                     out: out/hubness.csv}
    """
    if not index_path:
        raise ValueError("hubness_report: config needs index_path=<stored "
                         "IVF index dir (ivf_write layout)>")
    from batch_process_spark.operators.similarity import stored_index_hubness

    report = stored_index_hubness(
        df.sparkSession, index_path, k=k, nprobe=nprobe,
        max_queries=max_queries, seed=seed,
    ).orderBy("k_occurrence")
    if out:
        from batch_process_spark.sinks.writers import write_csv

        write_csv(report, out)
    return report
