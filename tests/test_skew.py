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


def test_salted_join_bounds_max_task_rows(spark):
    """The probe guarantee as a regression guard: with one key owning
    20% of the fact and AQE's runtime splitter off, a plain shuffle
    join concentrates every hot-key row in one task while salted_join
    bounds the largest task near the even share (task time is linear
    in task rows for a hash join probe). Deterministic: measured as
    exact max rows per post-shuffle partition, not timing."""
    from pyspark.sql import functions as F

    from batch_process_spark.operators.skew import salted_join

    n, buckets, parts = 200_000, 8, 32
    hot = n // 5
    fact = spark.range(n).select(
        F.when(F.col("id") % 5 == 0, 0)
        .otherwise(F.pmod(F.hash("id"), 500) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(501).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))

    def max_task_rows(df):
        return (
            df.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )

    saved = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        plain = fact.join(dim, "k")
        salted = salted_join(fact, dim, ["k"], buckets=buckets)
        assert salted.count() == plain.count() == n
        mp = max_task_rows(plain)
        ms = max_task_rows(salted)
        assert mp >= hot  # the hot key's rows all land in one task
        # salted: the hot key splits into `buckets` (key, salt) groups
        # of hot/buckets rows each; a task holds the groups hash
        # placement gives it, so bound by a couple of group-shares on
        # top of twice the even cold share (placement variance)
        assert ms <= 2 * (hot // buckets) + 2 * (n // parts)
        assert ms < mp / 2
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
