"""End-to-end pipeline: the reference's demo3 word-plot flow
(``demos/demo3/plugins/word_plot_pipeline.py``) re-expressed — scan a
mixed-format tree, extract numbers leniently, aggregate per directory
on "dir exit" (groupBy levels), render report artifacts.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.grouping import dir_level_aggregate, summary_stats
from batch_process_spark.plans.compiler import Pipeline
from batch_process_spark.plans.registry import Registry
from batch_process_spark.sinks.report import docx_report, plot_from_spec
from batch_process_spark.sources.filetree import attach_labels, label_dimension, read_tree_texts
from batch_process_spark.sources.readers import sniff_numeric_values


@pytest.fixture(scope="module")
def demo_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("demo3")
    for grp, runs in {"group_A": ["run1", "run2"], "group_B": ["run1"]}.items():
        for run in runs:
            d = root / grp / run
            d.mkdir(parents=True)
            (d / "data.txt").write_text("1 2 3\n# skip me\n4.5")
            (d / "data.csv").write_text("v,label\n10,x\n20,y\n")
            (d / "data.json").write_text('{"values": [100, 200]}')
    (root / "group_A" / "_dict.txt").write_text("run1 Baseline\nrun2 Variant\n")
    return root


def test_demo_pipeline_end_to_end(spark, demo_tree, tmp_path):
    # 1. scan + lenient extraction
    texts = read_tree_texts(spark, str(demo_tree))
    vals = sniff_numeric_values(texts)

    # 2. label enrichment (S12/J1)
    labeled = attach_labels(vals, label_dimension(spark, str(demo_tree)))
    lbls = {r["relpath"]: r["label"] for r in labeled.filter(F.col("ext") == "txt").collect()}
    assert lbls["group_A/run1/data.txt"] == "data.txt"  # file-level fallback

    # 3. dir-exit aggregation at two levels (§4a)
    per_run = dir_level_aggregate(vals, 1)
    run_a1 = [r for r in per_run.collect() if (r["level0"], r["level1"]) == ("group_A", "run1")][0]
    assert sorted(run_a1["all_values"]) == [1.0, 2.0, 3.0, 4.5, 10.0, 20.0, 100.0, 200.0]

    per_group = dir_level_aggregate(vals, 0)
    ga = [r for r in per_group.collect() if r["level0"] == "group_A"][0]
    # 6 data files; _dict.txt is invisible to Spark's file index
    # (underscore prefix = metadata convention) and read driver-side
    assert ga["n_files"] == 6

    # 4. summary stats per (group, ext)
    flat = vals.select("level0", "ext", F.explode("values").alias("v"))
    stats = summary_stats(flat, ["level0", "ext"], "v")
    sa = {(r["level0"], r["ext"]): r["mean"] for r in stats.collect()}
    assert sa[("group_A", "json")] == 150.0

    # 5. report artifacts (SVG chart + real .docx via the stdlib writers)
    agg = stats.orderBy("level0", "ext")
    plot = plot_from_spec(
        agg, {"title": "means", "series": [{"x": "ext", "y": "mean"}]},
        str(tmp_path / "means.png"),
    )
    assert os.path.exists(plot)
    report = docx_report(agg, "Demo results", str(tmp_path / "report.docx"))
    assert os.path.exists(report)
    # 6. structured report: the chart EMBEDDED in the document with a
    # figure caption (the demo's run.py shape — reference docx_helpers
    # parity end-to-end)
    from batch_process_spark.sinks.report import docx_report_spec

    spec_report = docx_report_spec(
        [
            {"heading": "Demo results"},
            {"table": agg, "caption": "summary stats"},
            {"picture": plot, "width_inches": 6.0, "caption": "means"},
        ],
        str(tmp_path / "report_spec.docx"),
    )
    import zipfile

    with zipfile.ZipFile(spec_report) as z:
        names = z.namelist()
        assert any(n.startswith("word/media/image1.") for n in names), names
        doc = z.read("word/document.xml").decode()
    assert "<w:drawing>" in doc and "Figure: means" in doc and "Table: summary stats" in doc


def test_demo_via_pipeline_compiler(spark, demo_tree, tmp_path):
    """Same flow driven by the rule-config compiler (§3 lifecycle)."""
    reg = Registry()

    @reg.register(name="extract")
    def extract(df, **cfg):
        return sniff_numeric_values(df)

    @reg.register(name="rollup", phase="post")
    def rollup(df, level=0, **cfg):
        return dir_level_aggregate(sniff_numeric_values(df), level)

    cfg = {
        "rules": {
            "**/*.txt": {"processors": ["extract"], "post_processors": [
                {"name": "rollup", "config": {"level": 0}}]},
        }
    }
    tree = read_tree_texts(spark, str(demo_tree))
    res = Pipeline(cfg, reg).run(tree)
    assert res.results.filter(F.col("status") == "failed").count() == 0
    rollup_out = res.outputs[1]
    vals = {r["level0"]: sorted(r["all_values"]) for r in rollup_out.collect()}
    # txt files only: 1 2 3 4.5 per run (x2 runs in group_A); _dict.txt
    # contributes no numbers
    assert vals["group_B"] == [1.0, 2.0, 3.0, 4.5]
    res.write_history(str(tmp_path / "hist"))
    assert spark.read.parquet(str(tmp_path / "hist")).count() == 2
