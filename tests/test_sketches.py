"""Sketch operators: ε-bounds against exact answers."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    frequent_items,
    seeded_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def data(spark):
    # 10k rows, 1000 distinct users, skewed event types
    return spark.range(10000).select(
        (F.col("id") % 1000).alias("user"),
        (F.col("id") % 7).alias("seven"),
        F.when(F.col("id") % 10 < 7, "common").otherwise(
            F.concat(F.lit("rare_"), (F.col("id") % 13).cast("string"))
        ).alias("etype"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


def test_approx_distinct_bounds(data):
    r = approx_distinct(data, ["user", "seven"]).collect()[0]
    assert abs(r["approx_distinct_user"] - 1000) <= 50  # 2% rsd
    assert r["approx_distinct_seven"] == 7  # small cardinalities exact


def test_approx_distinct_grouped(data):
    out = approx_distinct(data, ["user"], keys=["seven"])
    assert out.count() == 7
    for r in out.collect():
        assert abs(r["approx_distinct_user"] - 1000) <= 60


def test_approx_quantiles_close_to_exact(data):
    r = approx_quantiles(data, "v", (0.5, 0.9)).collect()[0]
    assert abs(r["p50"] - 49.5) <= 2
    assert abs(r["p90"] - 89.1) <= 2


def test_frequent_items(data):
    out = frequent_items(data, "etype", min_share=0.05)
    rows = {r["etype"]: r["share"] for r in out.collect()}
    assert "common" in rows and rows["common"] == pytest.approx(0.7, abs=0.01)
    assert all(s >= 0.05 for s in rows.values())


def test_seeded_sample_deterministic(data):
    a = sorted(r["user"] for r in seeded_sample(data, 0.1, seed=7).collect())
    b = sorted(r["user"] for r in seeded_sample(data, 0.1, seed=7).collect())
    assert a == b
    assert 500 <= len(a) <= 1500  # ~10%


def test_stratified_sample(data):
    out = stratified_sample(data, "seven", {0: 1.0, 1: 0.0}, seed=7)
    got = {r["seven"] for r in out.select("seven").distinct().collect()}
    assert 0 in got and 1 not in got
