"""Incremental view maintenance: the refresh algebra must be exactly
batching- and order-insensitive, since that is the whole contract
(history never re-scanned, any delta slicing allowed)."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.ivm import refresh_rollup, rollup_aggregate

MEASURES = {
    "n": ("count", ""),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


@pytest.fixture(scope="module")
def rows(spark):
    data = [(i % 4, float((i * 7) % 100)) for i in range(200)]
    return spark.createDataFrame(data, "k long, v double")


def rollup_dict(df):
    return {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"]) for r in df.collect()
    }


def test_refresh_equals_full_recompute_any_slicing(spark, rows):
    full = rollup_dict(rollup_aggregate(rows, ["k"], MEASURES))
    # slice history/deltas three different ways; all must agree
    for cuts in [(50, 120), (1, 199), (100, 100)]:
        a, b = cuts
        base = rollup_aggregate(rows.limit(a), ["k"], MEASURES)
        r1 = refresh_rollup(base, rows.offset(a).limit(b - a), ["k"], MEASURES)
        r2 = refresh_rollup(r1, rows.offset(b), ["k"], MEASURES)
        assert rollup_dict(r2) == full, cuts


def test_new_and_untouched_keys(spark):
    hist = spark.createDataFrame([(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double")
    delta = spark.createDataFrame([(2, 7.0), (3, 1.0)], "k long, v double")
    base = rollup_aggregate(hist, ["k"], MEASURES)
    out = rollup_dict(refresh_rollup(base, delta, ["k"], MEASURES))
    assert out[1] == (2, 30.0, 10.0, 20.0)  # untouched key passes through
    assert out[2] == (2, 12.0, 5.0, 7.0)    # merged across history + delta
    assert out[3] == (1, 1.0, 1.0, 1.0)     # key born in the delta


def test_empty_delta_is_identity(spark):
    hist = spark.createDataFrame([(1, 10.0)], "k long, v double")
    empty = spark.createDataFrame([], "k long, v double")
    base = rollup_aggregate(hist, ["k"], MEASURES)
    assert rollup_dict(refresh_rollup(base, empty, ["k"], MEASURES)) == rollup_dict(base)


def test_non_mergeable_measure_rejected(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="non-mergeable"):
        rollup_aggregate(df, ["k"], {"med": ("median", "v")})
