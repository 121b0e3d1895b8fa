"""Pipeline compiler tests: rule matching, priority order, duplicate
preservation, simulate, errors-as-data execution, history sink.

Mirrors the reference's end-to-end engine test
(``test/test_validate.py:26-67``) and the priority/duplication
guarantees (``core/engine.py:403-412``).
"""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.plans.compiler import Pipeline
from batch_process_spark.plans.registry import Registry, retry
from batch_process_spark.sources.filetree import file_tree_df


@pytest.fixture(scope="module")
def reg():
    r = Registry()

    @r.register(name="count_rows")
    def count_rows(df, **cfg):
        return df.agg(F.count(F.lit(1)).alias("n"))

    @r.register(name="txt_only", priority=5)
    def txt_only(df, **cfg):
        return df.filter(F.col("ext") == "txt").select("relpath")

    @r.register(name="boom")
    def boom(df, **cfg):
        raise RuntimeError("kaboom")

    @r.register(name="tag", phase="post")
    def tag(df, label="x", **cfg):
        return df.withColumn("tag", F.lit(label))

    return r


@pytest.fixture(scope="module")
def tree(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ptree")
    (root / "a").mkdir()
    (root / "a" / "one.txt").write_text("1")
    (root / "a" / "two.log").write_text("2")
    (root / "three.txt").write_text("3")
    return file_tree_df(spark, str(root))


CONFIG = {
    "rules": {
        "**/*.txt": {
            "processors": ["txt_only", "txt_only"],  # duplicate preserved
            "priority": 1,
        },
        "**/*.log": {
            "processors": [{"name": "count_rows", "config": {}}],
            "priority": 9,
        },
        "a/": {"post_processors": [{"name": "tag", "config": {"label": "dirs"}}]},
    },
    "pre_process": ["count_rows"],
    "post_process": ["count_rows"],
}


def test_compile_order_and_duplicates(reg):
    p = Pipeline(CONFIG, reg)
    descr = [(s.phase, s.op_name, s.pattern) for s in p.stages]
    # global pre first, then inline by priority desc (log rule prio 9
    # before txt prio 1), duplicates preserved, then post, then global
    assert descr[0] == ("global_pre", "count_rows", None)
    assert descr[1] == ("inline", "count_rows", "**/*.log")
    assert descr[2] == ("inline", "txt_only", "**/*.txt")
    assert descr[3] == ("inline", "txt_only", "**/*.txt")
    assert descr[4] == ("post", "tag", "a/")
    assert descr[5] == ("global_post", "count_rows", None)
    assert [s.step for s in p.stages] == list(range(6))


def test_simulate_with_match_counts(reg, tree):
    p = Pipeline(CONFIG, reg)
    plan = p.simulate(tree)
    by_step = {d["step"]: d for d in plan}
    assert by_step[2]["n_matches"] == 2  # one.txt, three.txt
    assert by_step[1]["n_matches"] == 1  # two.log
    assert by_step[4]["n_matches"] == 1  # dir a
    plan2 = p.simulate(tree, max_items=2)
    assert len(plan2) == 2


def test_run_outputs_and_results(reg, tree):
    p = Pipeline(CONFIG, reg)
    res = p.run(tree)
    assert res.results.filter(F.col("status") == "failed").count() == 0
    txt_out = res.outputs[2]
    assert sorted(r["relpath"] for r in txt_out.collect()) == ["a/one.txt", "three.txt"]
    tag_out = res.outputs[4]
    assert tag_out.collect()[0]["tag"] == "dirs"


def test_run_errors_as_data(reg, tree):
    cfg = {"rules": {"**/*.txt": {"processors": ["boom", "txt_only"]}}}
    p = Pipeline(cfg, reg)
    res = p.run(tree)
    rows = {r["processor"]: r for r in res.results.collect()}
    assert rows["boom"]["status"] == "failed"
    assert "kaboom" in rows["boom"]["error"]
    assert rows["txt_only"]["status"] == "success"  # run continued


def test_run_eager_catches_runtime_failures(reg, tree, spark):
    # A stage whose plan ANALYZES fine but fails at execution: a
    # mapInPandas kernel that raises on real data. Lazy run records
    # success (the known caveat); eager=True executes each stage and
    # records the runtime failure like the reference's per-step records.
    r = Registry()

    @r.register(name="runtime_boom")
    def runtime_boom(df, **cfg):
        def kernel(batches):
            raise RuntimeError("runtime kaboom")
            yield  # pragma: no cover

        return df.select("relpath").mapInPandas(kernel, schema="relpath string")

    cfg = {"rules": {"**/*.txt": {"processors": ["runtime_boom"]}}}
    lazy = Pipeline(cfg, r).run(tree)
    assert lazy.results.collect()[0]["status"] == "success"  # documented gap
    eager = Pipeline(cfg, r).run(tree, eager=True)
    rec = eager.results.collect()[0]
    assert rec["status"] == "failed" and "runtime kaboom" in rec["error"]


def test_unknown_operator_is_recorded(reg, tree):
    p = Pipeline({"rules": {"**/*.txt": {"processors": ["nope"]}}}, reg)
    res = p.run(tree)
    assert res.results.collect()[0]["status"] == "failed"


def test_history_sink(reg, tree, tmp_path):
    p = Pipeline(CONFIG, reg)
    res = p.run(tree)
    hist = str(tmp_path / "history")
    res.write_history(hist)
    res.write_history(hist)  # append
    spark = tree.sparkSession
    assert spark.read.parquet(hist).count() == 12  # 6 stages x 2 runs


def test_explain(reg, tree):
    p = Pipeline({"rules": {"**/*.txt": {"processors": ["txt_only"]}}}, reg)
    plans = p.explain(tree)
    assert len(plans) == 1
    assert "Filter" in plans[0][1] or "filter" in plans[0][1].lower()


def test_retry_returns_error_record():
    calls = []

    @retry(max_attempts=3, delay=0.001)
    def flaky():
        calls.append(1)
        raise ValueError("nope")

    out = flaky()
    assert len(calls) == 3
    assert out["status"] == "failed" and "nope" in out["error"]

    @retry(max_attempts=3, delay=0.001)
    def eventually():
        calls.append(1)
        if len(calls) < 5:
            raise ValueError("again")
        return "ok"

    assert eventually() == "ok"


def test_flat_config_shape_and_rule_config(reg, tree):
    """The reference's flat config form: pattern keys at top level,
    rule-level config dict shared by the rule's processors."""
    flat = {
        "**/*.txt": {
            "processors": [
                "tag_like",
            ],
            "config": {"label": "from_rule"},
        },
        "pre_process": ["count_rows"],
    }
    r = Registry()

    @r.register(name="count_rows")
    def count_rows(df, **cfg):
        return df

    seen = {}

    @r.register(name="tag_like")
    def tag_like(df, label="default", **cfg):
        seen["label"] = label
        return df

    p = Pipeline(flat, r)
    assert [(s.phase, s.pattern) for s in p.stages] == [
        ("global_pre", None),
        ("inline", "**/*.txt"),
    ]
    p.run(tree)
    assert seen["label"] == "from_rule"


def test_per_proc_config_overrides_rule_config(reg, tree):
    r = Registry()
    seen = {}

    @r.register(name="op")
    def op(df, a=0, b=0, **cfg):
        seen.update(a=a, b=b)
        return df

    cfg = {
        "**/*.txt": {
            "processors": [{"name": "op", "config": {"a": 2}}],
            "config": {"a": 1, "b": 9},
        }
    }
    Pipeline(cfg, r).run(tree)
    assert seen == {"a": 2, "b": 9}  # per-proc a wins, rule-level b kept


def test_progress_snapshot_and_reporter(spark, tree):
    from batch_process_spark.plans.progress import ProgressReporter, snapshot

    snap = snapshot(spark)  # idle: nothing active
    assert snap.active_jobs == 0 and snap.fraction == 1.0

    with ProgressReporter(spark, interval=0.05) as rep:
        # a job with enough tasks to be observable
        spark.range(2_000_000, numPartitions=16).selectExpr("sum(id)").collect()
    # the reporter thread ran and captured snapshots without errors
    assert isinstance(rep.samples, list)


def test_job_group_cancellation(spark):
    import threading
    import time as _time

    from batch_process_spark.plans.progress import JobGroup
    from pyspark.sql import functions as F

    jg = JobGroup(spark, "cancel-test", "cancellable run")

    started = threading.Event()

    def slow_action():
        with jg:
            try:
                # a deliberately slow job (~1000s of UDF sleep total —
                # can only end quickly via cancellation)
                slow = F.udf(lambda x: (_time.sleep(1.0), x)[1])
                started.set()
                spark.range(1000, numPartitions=4).select(slow("id")).collect()
                return "finished"
            except Exception:
                return "cancelled"

    result = {}
    t = threading.Thread(target=lambda: result.update(r=slow_action()))
    t.start()
    started.wait(timeout=30)
    _time.sleep(3)  # let tasks actually run
    jg.cancel()
    t.join(timeout=120)
    assert result.get("r") == "cancelled"
