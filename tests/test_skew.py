"""Salting utilities: skew-safe aggregation and join equivalence."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.skew import salted_agg, salted_join, with_salt
from tests.conftest import rows_set


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot", i, float(i % 7)) for i in range(900)]
    rows += [(f"k{i % 10}", i, float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, id long, v double")


def test_with_salt_deterministic(skewed):
    a = with_salt(skewed, 8).select("id", "__salt")
    b = with_salt(skewed, 8).select("id", "__salt")
    assert rows_set(a) == rows_set(b)
    n_buckets = a.select("__salt").distinct().count()
    assert 1 < n_buckets <= 8


def test_salted_agg_matches_plain(skewed):
    plain = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"), F.max("v").alias("max_v")
    )
    salted = salted_agg(
        skewed,
        ["k"],
        {"cnt_p": F.count(F.lit(1)), "sum_p": F.sum("v"), "max_p": F.max("v")},
        {"cnt": F.sum("cnt_p"), "sum_v": F.sum("sum_p"), "max_v": F.max("max_p")},
        buckets=8,
    )
    assert rows_set(plain) == rows_set(salted)


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"L{i}") for i in range(10)], "k string, label string"
    )
    plain = skewed.join(dim, "k").select("id", "label")
    salted = salted_join(skewed, dim, ["k"], buckets=4).select("id", "label")
    assert rows_set(plain) == rows_set(salted)


def test_salted_join_left(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    out = salted_join(skewed, dim, ["k"], buckets=4, how="left")
    assert out.count() == 1000
    assert out.filter(F.col("label").isNull()).count() == 100
