"""Hierarchy flattening operators: the pointer-doubling and per-level
formulations must agree with each other, with the checkpointed variant,
and with a driver-computed ground truth on a multi-root forest."""

from pyspark.sql import functions as F

from batch_process_spark.operators.hierarchy import (
    flatten_per_level,
    flatten_pointer_doubling,
)


def _forest(spark, n=300):
    # parent(k) = k div 3; roots are 1 and 2 (self-loop)
    return spark.range(1, n + 1).select(
        F.col("id").alias("node"),
        F.when(F.col("id") < 3, F.col("id"))
        .otherwise(F.floor(F.col("id") / 3))
        .cast("long")
        .alias("parent"),
    )


def _truth(n=300):
    out = {}
    for k in range(1, n + 1):
        cur, d = k, 0
        while cur >= 3:
            cur, d = cur // 3, d + 1
        out[k] = (cur, d)
    return out


def test_all_formulations_agree_with_ground_truth(spark):
    parents = _forest(spark)
    truth = _truth()
    max_depth = max(d for _, d in truth.values())
    rounds = max(1, (max_depth - 1).bit_length())
    for df in (
        flatten_pointer_doubling(parents, rounds),
        flatten_pointer_doubling(parents, rounds, checkpoint=True),
        flatten_per_level(parents, max_depth),
    ):
        got = {r["node"]: (r["root"], r["depth"]) for r in df.collect()}
        assert got == truth


def test_overprovisioned_rounds_are_idempotent(spark):
    parents = _forest(spark, n=50)
    truth = _truth(50)
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in flatten_pointer_doubling(parents, rounds=6).collect()
    }
    assert got == truth


def test_ancestor_closure_complete_and_exact(spark):
    from pyspark.sql import functions as F

    from batch_process_spark.operators.hierarchy import ancestor_closure

    parents = _forest(spark, n=120)
    got = {
        (r["node"], r["anc"]): r["dist"]
        for r in ancestor_closure(parents, rounds=4).collect()
    }
    # ground truth: walk each chain
    expect = {}
    for k in range(1, 121):
        cur, d = k, 0
        expect[(k, cur)] = 0
        while cur >= 3:
            cur, d = cur // 3, d + 1
            expect[(k, cur)] = d
    assert got == expect
    # checkpointed variant identical
    got2 = {
        (r["node"], r["anc"]): r["dist"]
        for r in ancestor_closure(parents, rounds=4, checkpoint=True).collect()
    }
    assert got2 == expect


def test_dangling_parent_fails_loudly_with_validate(spark):
    """A parent id with no node row silently drops the chain (inner
    self-join); validate=True must turn that into a loud error, and a
    closed forest must pass the same check."""
    import pytest

    bad = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 99)], "node long, parent long"
    )
    with pytest.raises(ValueError, match="dangling parent"):
        flatten_pointer_doubling(bad, rounds=2, validate=True)
    # silent-drop contract without validate: node 5 vanishes
    got = {r["node"] for r in flatten_pointer_doubling(bad, rounds=2).collect()}
    assert got == {1, 2}
    ok = _forest(spark, 50)
    assert flatten_per_level(ok, 5, validate=True).count() == 50
