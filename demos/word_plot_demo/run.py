"""End-to-end demo: the reference's demo3 word-plot pipeline,
Spark-first — scan tree, lenient numeric extraction, label enrichment,
per-directory rollups, report artifacts.

    python demos/word_plot_demo/run.py [tree_dir] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F


def main() -> None:
    tree_dir = sys.argv[1] if len(sys.argv) > 1 else "demos/word_plot_demo/sample_tree"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "demos/word_plot_demo/output")
    out_dir.mkdir(parents=True, exist_ok=True)

    if not Path(tree_dir).exists():
        from make_tree import build

        build(tree_dir)

    from batch_process_spark.operators.grouping import dir_level_aggregate, summary_stats
    from batch_process_spark.session import get_spark
    from batch_process_spark.sinks.report import docx_report_spec, plot_from_spec
    from batch_process_spark.sinks.writers import write_csv
    from batch_process_spark.sources.filetree import attach_labels, label_dimension, read_tree_texts
    from batch_process_spark.sources.readers import sniff_numeric_values

    spark = get_spark("word_plot_demo")
    texts = read_tree_texts(spark, tree_dir)
    vals = sniff_numeric_values(texts)
    labeled = attach_labels(vals, label_dimension(spark, tree_dir))

    per_run = dir_level_aggregate(labeled, 1)
    print("== per-run value buckets ==")
    per_run.select("level0", "level1", "n_files", "all_values").show(truncate=False)

    flat = labeled.select("level0", "ext", F.explode("values").alias("v"))
    stats = summary_stats(flat, ["level0", "ext"], "v").orderBy("level0", "ext")
    print("== per-(group, ext) stats ==")
    stats.show()

    write_csv(stats, str(out_dir / "stats_csv"), single_file=True)
    plot_path = plot_from_spec(
        stats,
        {"title": "mean by ext", "series": [{"x": "ext", "y": "mean", "label": "mean"}]},
        str(out_dir / "means.png"),
    )
    # one structured document, the reference report-adapter shape:
    # heading, captioned table, the rendered chart embedded with a
    # figure caption (docx_helpers.py:37-76 parity)
    report_path = docx_report_spec(
        [
            {"heading": "Demo pipeline results"},
            {"table": stats, "caption": "per-(group, ext) summary stats"},
            {"picture": plot_path, "width_inches": 6.0, "caption": "mean by ext"},
        ],
        str(out_dir / "report.docx"),
    )
    print(f"artifacts: {out_dir}/stats_csv, {plot_path}, {report_path}")
    spark.stop()


if __name__ == "__main__":
    main()
