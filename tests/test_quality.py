"""Data-quality constraint suite: violations must be DETECTED (the
catalog oracle runs on clean TPC-H data where every check passes, so
these tests feed dirty data), and the column checks must share one
aggregation scan."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.quality import check_constraints


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, 10, 50.0, "O"),
        (2, 20, -5.0, "F"),    # range violation
        (2, 30, 60.0, "X"),    # duplicate key + bad status
        (3, None, 70.0, "P"),  # null custkey
        (4, 99, 700000.0, "O"),  # over max + orphan FK
    ]
    return spark.createDataFrame(rows, "k long, cust long, price double, status string")


@pytest.fixture(scope="module")
def parents(spark):
    return spark.createDataFrame([(10,), (20,), (30,)], "pk long")


def test_all_violation_kinds_detected(dirty, parents):
    out = {
        r["check_name"]: (r["violations"], r["passed"])
        for r in check_constraints(
            dirty,
            [
                {"type": "not_null", "column": "cust"},
                {"type": "unique", "column": "k"},
                {"type": "range", "column": "price", "min": 0, "max": 600000},
                {"type": "accepted_values", "column": "status", "values": ["O", "F", "P"]},
                {"type": "foreign_key", "column": "cust", "ref_df": parents, "ref_column": "pk"},
            ],
        ).collect()
    }
    assert out["not_null:cust"] == (1, False)
    assert out["unique:k"] == (1, False)          # one extra row for k=2
    assert out["range:price"] == (2, False)       # -5 and 700000
    assert out["accepted:status"] == (1, False)   # 'X'
    assert out["fk:cust->pk"] == (1, False)       # cust=99 orphan (NULL exempt)


def test_clean_data_passes(spark, parents):
    clean = spark.createDataFrame([(1, 10, 5.0), (2, 20, 6.0)], "k long, cust long, price double")
    out = check_constraints(
        clean,
        [
            {"type": "not_null", "column": "cust"},
            {"type": "unique", "column": "k"},
            {"type": "range", "column": "price", "min": 0},
            {"type": "foreign_key", "column": "cust", "ref_df": parents, "ref_column": "pk"},
        ],
    )
    assert all(r["passed"] and r["violations"] == 0 for r in out.collect())


def test_nulls_exempt_from_range_and_accepted(spark):
    df = spark.createDataFrame([(None, None)], "price double, status string")
    out = {
        r["check_name"]: r["violations"]
        for r in check_constraints(
            df,
            [
                {"type": "range", "column": "price", "min": 0},
                {"type": "accepted_values", "column": "status", "values": ["O"]},
            ],
        ).collect()
    }
    assert out == {"range:price": 0, "accepted:status": 0}  # use not_null for NULLs


def test_column_checks_share_one_scan(spark, dirty):
    """However many column checks, the plan reads the table ONCE (one
    aggregate over one scan; the stack unpivot is map-side)."""
    import contextlib
    import io

    df = check_constraints(
        dirty,
        [
            {"type": "not_null", "column": "cust"},
            {"type": "unique", "column": "k"},
            {"type": "range", "column": "price", "min": 0},
            {"type": "accepted_values", "column": "status", "values": ["O", "F", "P"]},
        ],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert tree.count("Scan") == 1


def test_bad_check_type_and_empty_list(spark, dirty):
    with pytest.raises(ValueError, match="unknown column check"):
        check_constraints(dirty, [{"type": "nope", "column": "k"}])
    with pytest.raises(ValueError, match="empty check list"):
        check_constraints(dirty, [])


def test_q143_psi_detects_synthetic_drift(spark, tmp_path):
    """PSI must actually move when the distribution moves: rebuild the
    q143 pipeline shape on synthetic data where the current window
    shifts mass into high buckets — total PSI over the drifted feed
    must clear the classic 0.2 alert bar, and an undrifted feed must
    sit near zero."""
    import math

    from pyspark.sql import functions as F

    def psi_total(ref_vals, cur_vals):
        from datetime import datetime

        rows = [(datetime(2024, 1, 1), float(v)) for v in ref_vals] + [
            (datetime(2024, 1, 20), float(v)) for v in cur_vals
        ]
        ev = spark.createDataFrame(rows, "ts timestamp, value double")
        cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
        per = (
            ev.select(
                F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("long").alias("bucket"),
                (F.col("ts") < cut).cast("int").alias("is_ref"),
            )
            .groupBy("bucket")
            .agg(
                F.sum("is_ref").cast("long").alias("n_ref"),
                F.sum(1 - F.col("is_ref")).cast("long").alias("n_cur"),
            )
        )
        tot = per.agg(F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
        p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + 10.0)
        p_ref = (F.col("n_ref") + 1.0) / (F.col("t_ref") + 10.0)
        rows = (
            per.crossJoin(F.broadcast(tot))
            .select(((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("c"))
            .collect()
        )
        return sum(r["c"] for r in rows)

    same = [i % 500 for i in range(1000)]
    shifted = [400 + (i % 100) for i in range(1000)]  # mass into buckets 8-9
    assert psi_total(same, same) < 0.01
    drifted = psi_total(same, shifted)
    assert drifted > 0.2 and math.isfinite(drifted)


def test_streaming_quality_counters_accumulate(spark, tmp_path):
    """The q144 monitor shape on dirty data: violation counters carry
    across micro-batches (batch 2's violations ADD to batch 1's), and
    the final totals equal the batch gate over all rows."""
    from pyspark.sql import functions as F

    from batch_process_spark.streaming.windows import run_stream_to_memory

    src = tmp_path / "feed"
    src.mkdir()
    schema = "user_id long, value double"

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )

    write("b0", [(1, 10.0), (None, 20.0)])          # 1 null violation

    def transform(stream):
        z = F.lit(0).cast("long")
        return stream.agg(
            F.coalesce(F.sum(F.col("user_id").isNull().cast("long")), z).alias("nulls"),
            F.coalesce(
                F.sum(F.coalesce(F.col("value") > 100, F.lit(False)).cast("long")), z
            ).alias("over"),
        )

    out = run_stream_to_memory(
        spark,
        str(src),
        schema,
        transform,
        query_name="quality_stream_test",
        output_mode="complete",
        feeds=[lambda: write("b1", [(None, 500.0), (2, 30.0)])],  # +1 null, +1 over
    )
    row = out.collect()[0]
    assert (row["nulls"], row["over"]) == (2, 1)


def test_quality_gate_pipeline_operator(spark, dirty):
    """The config-driven pipeline form: rule dicts from config produce
    the report frame, and fail_on_violation turns it into a hard gate
    that names the failing checks."""
    import batch_process_spark.plans.builtin_ops  # noqa: F401  (registers on import)
    from batch_process_spark.plans.registry import REGISTRY

    op = REGISTRY.get("quality_gate")
    checks = [
        {"type": "not_null", "column": "cust"},
        {"type": "range", "column": "price", "min": 0, "max": 600000},
    ]
    report = {r["check_name"]: r["violations"] for r in op(dirty, checks=checks).collect()}
    assert report == {"not_null:cust": 1, "range:price": 2}
    from batch_process_spark.operators.quality import GateError

    with pytest.raises(GateError, match=r"quality gate failed: .*not_null:cust\(1\)"):
        op(dirty, checks=checks, fail_on_violation=True)
    with pytest.raises(ValueError, match="non-empty 'checks'"):
        op(dirty)
    with pytest.raises(ValueError, match="foreign_key"):
        op(dirty, checks=[{"type": "foreign_key", "column": "cust"}])
    # clean data passes the hard gate and returns the report
    clean = dirty.filter("cust IS NOT NULL AND price >= 0 AND price <= 600000")
    assert op(clean, checks=checks, fail_on_violation=True).count() == 2


def test_gate_error_halts_pipeline(spark, dirty):
    """The property the gate exists for: in a Pipeline, a GateError
    stops the run — downstream stages (sinks included) record skipped
    and never execute on the rejected data; ordinary rules stay
    errors-as-data."""
    import batch_process_spark.plans.builtin_ops  # noqa: F401
    from batch_process_spark.plans.compiler import Pipeline
    from batch_process_spark.plans.registry import REGISTRY, Registry

    ran = []

    reg = Registry()
    reg._ops.update(REGISTRY._ops)

    @reg.register(name="probe_sink")
    def probe_sink(df, **cfg):
        ran.append(1)
        return df

    def config(hard):
        return {
            "post_process": [
                {"name": "quality_gate", "config": {
                    "checks": [{"type": "not_null", "column": "cust"}],
                    "fail_on_violation": hard}},
                {"name": "probe_sink", "config": {}},
            ]
        }

    res = Pipeline(config(True), registry=reg).run(dirty)
    recs = {r["processor"]: (r["status"], r["error"]) for r in res.results.collect()}
    assert recs["quality_gate"][0] == "failed" and "GateError" in recs["quality_gate"][1]
    assert recs["probe_sink"][0] == "skipped"
    assert "gate failed at step" in recs["probe_sink"][1]
    assert ran == []  # the sink never executed

    # without the hard flag the same rules are errors-as-data: the
    # report stage succeeds and downstream stages run
    res2 = Pipeline(config(False), registry=reg).run(dirty)
    assert all(r["status"] == "success" for r in res2.results.collect())
    assert ran == [1]
