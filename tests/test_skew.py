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


def _max_task_rows(df):
    return (
        df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )


def _noaqe(spark, parts=32):
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
    return saved


def test_wedge_join_salting_bounds_hub_tasks(spark):
    """Hub hardening for the q149/q166 wedge shape: a star vertex with
    in-degree and out-degree d owns a d^2 wedge task under the plain
    middle-vertex join; wedge_join(salt_buckets=b) spreads it across b
    (v, salt) tasks while producing the IDENTICAL wedge set."""
    from batch_process_spark.operators.graph import wedge_join

    hub, d, buckets, parts = 10_000, 300, 8, 32
    # star: u in [0,d) -> hub, hub -> w in (hub, hub+d]; canonical u<v
    edges = (
        spark.range(d)
        .select(F.col("id").alias("u"), F.lit(hub).alias("v"))
        .unionByName(
            spark.range(hub + 1, hub + 1 + d).select(
                F.lit(hub).alias("u"), F.col("id").alias("v")
            )
        )
        # background cold edges so the bound is non-vacuous
        .unionByName(
            spark.range(2000, 6000).select(
                F.col("id").alias("u"), (F.col("id") + 1).alias("v")
            )
        )
    )
    saved = _noaqe(spark, parts)
    try:
        plain = wedge_join(edges)
        salted = wedge_join(edges, salt_buckets=buckets)
        from tests.conftest import rows_set

        assert rows_set(plain) == rows_set(salted)  # exact same wedges
        mp = _max_task_rows(plain)
        ms = _max_task_rows(salted)
        assert mp >= d * d  # hub's d^2 wedges in one task
        # each (hub, salt) task carries ~d/buckets in-edges x d
        # out-edges; allow 2x placement variance
        assert ms <= 2 * (d * d // buckets) + 1000
        assert ms < mp / 2
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_grid_radius_join_salting_matches_and_bounds(spark):
    """Hot-cell hardening for the q161 grid-radius shape: a dense cell
    owning most points concentrates its candidate pairs in one task;
    salt_buckets=b bounds the max task near 1/b while the qualifying
    pair set stays IDENTICAL."""
    from batch_process_spark.operators.spatial import grid_radius_join

    buckets, parts, radius = 8, 32, 10
    # 400 points in one cell (urban core) + a sparse background
    dense = spark.range(400).select(
        F.col("id").alias("pid"),
        (F.pmod(F.hash("id"), 10)).alias("y"),
        (F.pmod(F.hash("id", F.lit(1)), 10)).alias("x"),
    )
    sparse = spark.range(400, 800).select(
        F.col("id").alias("pid"),
        (F.col("id") * 37 % 5000).alias("y"),
        (F.col("id") * 61 % 5000).alias("x"),
    )
    pts = dense.unionByName(sparse)
    saved = _noaqe(spark, parts)
    try:
        plain = grid_radius_join(pts, pts, "y", "x", radius=radius)
        salted = grid_radius_join(
            pts, pts, "y", "x", radius=radius, salt_buckets=buckets
        )
        from tests.conftest import rows_set

        key = lambda df: df.select("pid", "pid_r")
        assert rows_set(key(plain)) == rows_set(key(salted))
        mp = _max_task_rows(plain)
        ms = _max_task_rows(salted)
        assert mp >= 400 * 400 * 0.9  # hot cell's ~160k pairs, one task
        assert ms <= 2 * (400 * 400 // buckets)
        assert ms < mp / 2
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_salted_join_rejects_dim_preserving_types(spark, skewed):
    """Dim-preserving join types would emit unmatched dim rows once per
    salt replica — the operator must refuse them loudly."""
    dim = spark.createDataFrame([("hot", 1), ("absent", 2)], "k string, lbl int")
    for how in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="dim-preserving"):
            salted_join(skewed, dim, ["k"], buckets=4, how=how)


def test_with_salt_positional_spreads_identical_rows(spark):
    """Content-hash salting maps fully-identical rows to ONE bucket (a
    documented limitation); positional mode must actually spread them."""
    dup = spark.range(1000).select(
        F.lit("hot").alias("k"), F.lit(1.0).alias("v")
    ).repartition(4)
    content = with_salt(dup, 8).select("__salt").distinct().count()
    positional = with_salt(dup, 8, mode="positional").select("__salt").distinct().count()
    assert content == 1  # the limitation, pinned
    assert positional > 1

    # salted_agg over positional salt still merges exactly
    got = salted_agg(
        with_salt(dup, 8, mode="positional").drop("__salt"),
        ["k"],
        {"cnt_p": F.count(F.lit(1)), "sum_p": F.sum("v")},
        {"cnt": F.sum("cnt_p"), "sum_v": F.sum("sum_p")},
        buckets=8,
    ).collect()[0]
    assert (got["cnt"], got["sum_v"]) == (1000, 1000.0)


def test_graph_salt_buckets_preserve_semantics(spark):
    """salt_buckets (round 8): the salted state><edges join must give
    EXACTLY the unsalted labels for LPA, and PageRank ranks equal up to
    float reassociation — on a hub-skewed star+clique graph where the
    hub dominates one join partition."""
    from pyspark.sql import functions as F

    from batch_process_spark.operators.graph import label_propagation, pagerank

    # hub 0 connected to everyone; plus a 4-clique 100..103
    rows = [(0, i) for i in range(1, 40)] + [(100 + a, 100 + b) for a in range(4) for b in range(4) if a != b]
    e = spark.createDataFrame(rows, "u long, v long")
    edges = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()

    plain = {r["node"]: r["community"] for r in label_propagation(edges, rounds=3).collect()}
    salted = {
        r["node"]: r["community"]
        for r in label_propagation(edges, rounds=3, salt_buckets=4).collect()
    }
    assert plain == salted

    pr_plain = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()}
    pr_salted = {r["node"]: r["rank"] for r in pagerank(edges, iters=3, salt_buckets=4).collect()}
    assert set(pr_plain) == set(pr_salted)
    for n, v in pr_plain.items():
        assert abs(v - pr_salted[n]) <= 1e-12 * max(abs(v), 1e-300), (n, v, pr_salted[n])
