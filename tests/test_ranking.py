"""Distributed global ranking (operators/ranking.global_ranks): must
equal the single-task global-window reference on every rank flavor,
including ties spanning would-be partition boundaries."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from batch_process_spark.operators.ranking import global_ranks


def _window_reference(df, order_cols, n_tiles):
    w = Window.orderBy(*order_cols)
    return df.select(
        *df.columns,
        F.row_number().over(w).cast("long").alias("row_number"),
        F.rank().over(w).cast("long").alias("rank"),
        F.dense_rank().over(w).cast("long").alias("dense_rank"),
        F.percent_rank().over(w).alias("percent_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.ntile(n_tiles).over(w).cast("long").alias("ntile"),
    )


def _assert_rank_parity(got, want, key="id"):
    g = {r[key]: r for r in got.collect()}
    w = {r[key]: r for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        for c in ["row_number", "rank", "dense_rank", "ntile"]:
            assert g[k][c] == w[k][c], f"{c} mismatch at {key}={k}: {g[k]} vs {w[k]}"
        for c in ["percent_rank", "cume_dist"]:
            assert abs(g[k][c] - w[k][c]) < 1e-12, f"{c} mismatch at {key}={k}"


def test_global_ranks_with_heavy_ties(spark):
    # values repeat heavily -> tie runs larger than any single range
    # partition would naively hold; ranks must still be exact
    rows = [(i, (i * 7) % 5, f"g{i % 3}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v long, g string").repartition(8)
    got = global_ranks(df, ["v", "id"], num_partitions=8, n_tiles=4)
    want = _window_reference(df, [F.col("v"), F.col("id")], 4)
    _assert_rank_parity(got, want)


def test_global_ranks_expression_keys(spark):
    rows = [(i, float(i % 7) + 0.004) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, bal double").repartition(5)
    got = global_ranks(
        df, [F.round("bal", 2), F.col("id")], sort_key_cols=["__b", "__i"],
        num_partitions=4, n_tiles=3,
    )
    want = _window_reference(df, [F.round("bal", 2), F.col("id")], 3)
    _assert_rank_parity(got, want)
    assert set(got.columns) - set(df.columns) == {
        "row_number", "rank", "dense_rank", "percent_rank", "cume_dist", "ntile"
    }


def test_global_ranks_fewer_rows_than_tiles(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    got = global_ranks(df, ["v"], n_tiles=5, num_partitions=2)
    want = _window_reference(df, [F.col("v")], 5)
    _assert_rank_parity(got, want)


def test_global_ranks_single_row(spark):
    df = spark.createDataFrame([(1, 10)], "id long, v long")
    r = global_ranks(df, ["v"], n_tiles=2).collect()[0]
    assert (r["row_number"], r["rank"], r["dense_rank"]) == (1, 1, 1)
    assert r["percent_rank"] == 0.0 and r["cume_dist"] == 1.0


def test_global_ranks_requires_names_for_exprs(spark):
    df = spark.createDataFrame([(1, 10)], "id long, v long")
    with pytest.raises(ValueError, match="sort_key_cols"):
        global_ranks(df, [F.round("v", 1)])


def test_no_empty_partition_window_in_plan(spark):
    """The q84 shape must not contain an unpartitioned WindowExec."""
    rows = [(i, float(i % 9)) for i in range(200)]
    df = spark.createDataFrame(rows, "c_custkey long, c_acctbal double")
    got = global_ranks(
        df, [F.round("c_acctbal", 2), F.col("c_custkey")],
        sort_key_cols=["__b", "__k"], n_tiles=4,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan or "PartitionBy" in plan  # no WindowExec at all expected
    assert "Window [" not in plan


def test_prepend_sequence_guard(spark):
    from batch_process_spark.operators.columns import prepend_sequence_columns

    big = spark.range(100_001).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="control tables"):
        prepend_sequence_columns(big, {"seq": [0] * 100_001}, order_by="k")
