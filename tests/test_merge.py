"""MERGE/upsert + SCD2 tests."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.merge import (
    OPEN_END,
    apply_deletes,
    merge_upsert,
    scd2_apply,
    scd2_init,
)
from tests.conftest import rows_set


def test_merge_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    source = spark.createDataFrame([(2, "B"), (4, "D")], "k long, v string")
    out = merge_upsert(target, source, ["k"])
    assert rows_set(out) == [(1, "a"), (2, "B"), (3, "c"), (4, "D")]


def test_apply_deletes(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dels = spark.createDataFrame([(2,)], "k long")
    assert rows_set(apply_deletes(target, dels, ["k"])) == [(1, "a")]


def test_scd2_lifecycle(spark):
    snap = spark.createDataFrame(
        [(1, "alice", "2020-01-01"), (2, "bob", "2020-01-01")],
        "id long, name string, ts string",
    )
    dim = scd2_init(snap, "ts")
    assert dim.filter(F.col("is_current")).count() == 2

    changes = spark.createDataFrame(
        [
            (1, "alicia", "2021-06-01"),
            (1, "alice2", "2022-01-01"),  # two chained changes for id=1
            (3, "carol", "2021-01-01"),   # brand-new key
        ],
        "id long, name string, ts string",
    )
    out = scd2_apply(dim, changes, ["id"], "ts")

    cur = {r["id"]: r["name"] for r in out.filter(F.col("is_current")).collect()}
    assert cur == {1: "alice2", 2: "bob", 3: "carol"}

    hist1 = sorted(
        (str(r["valid_from"]), str(r["valid_to"]), r["name"])
        for r in out.filter(F.col("id") == 1).collect()
    )
    # alice: 2020 -> closed at first change; alicia: closed at second;
    # alice2: open-ended
    assert hist1[0][2] == "alice" and hist1[0][1].startswith("2021-06-01")
    assert hist1[1][2] == "alicia" and hist1[1][1].startswith("2022-01-01")
    assert hist1[2][2] == "alice2" and hist1[2][1].startswith("9999-12-31")

    # no overlapping validity windows per key
    for rid in (1, 2, 3):
        spans = sorted(
            (str(r["valid_from"]), str(r["valid_to"]))
            for r in out.filter(F.col("id") == rid).collect()
        )
        for (f1, t1), (f2, t2) in zip(spans, spans[1:]):
            assert t1 <= f2


def test_scd2_rejects_out_of_order_changes(spark):
    snap = spark.createDataFrame([(1, "alice", "2021-01-01")], "id long, name string, ts string")
    dim = scd2_init(snap, "ts")
    changes = spark.createDataFrame(
        [
            (1, "old-alice", "2020-06-01"),  # BEFORE current valid_from -> reject
            (1, "alicia", "2022-01-01"),     # valid forward change -> apply
        ],
        "id long, name string, ts string",
    )
    rejected = []
    out = scd2_apply(dim, changes, ["id"], "ts", rejected_out=rejected)

    cur = {r["id"]: r["name"] for r in out.filter(F.col("is_current")).collect()}
    assert cur == {1: "alicia"}
    # no inverted validity interval anywhere
    for r in out.collect():
        assert str(r["valid_from"]) <= str(r["valid_to"])
    # the late change lands in the rejection frame, not the history
    assert [r["name"] for r in rejected[0].collect()] == ["old-alice"]
    assert "old-alice" not in {r["name"] for r in out.collect()}


def test_scd2_apply_idempotent_on_untouched_keys(spark):
    snap = spark.createDataFrame([(9, "zed", "2020-01-01")], "id long, name string, ts string")
    dim = scd2_init(snap, "ts")
    changes = spark.createDataFrame([], "id long, name string, ts string")
    out = scd2_apply(dim, changes, ["id"], "ts")
    assert rows_set(out.select("id", "name", "is_current")) == [(9, "zed", True)]


def test_snapshot_diff_classifies_with_null_safety(spark):
    """insert/delete/update/unchanged classification, NULL-safe: a
    NULL->value or value->NULL column change is an update, NULL->NULL
    is unchanged, and presence comes from join-side markers so an
    all-NULL row still classifies correctly."""
    from batch_process_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, None), (3, "c", 30.0), (4, None, 40.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, None, None), (3, "c", 31.0), (4, "d", 40.0), (5, "e", 50.0)],
        "id long, s string, v double",
    )
    out = {r["id"]: r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert out[1]["change_type"] == "delete" and out[1]["s"] == "a"
    assert out[2]["change_type"] == "unchanged"  # NULL == NULL, null-safe
    assert out[3]["change_type"] == "update" and out[3]["v"] == 31.0
    assert out[4]["change_type"] == "update" and out[4]["s"] == "d"  # NULL -> value
    assert out[5]["change_type"] == "insert" and out[5]["v"] == 50.0


def test_snapshot_diff_feed_replays_to_new_snapshot(spark):
    """The derived feed must reconstruct the new snapshot: applying
    inserts+updates via merge_upsert and deletes via apply_deletes to
    the old snapshot yields exactly the new one — the CDC round-trip
    contract."""
    from batch_process_spark.operators.merge import (
        apply_deletes,
        merge_upsert,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "x", 30.0), (9, "z", 90.0)],
        "id long, s string, v double",
    )
    feed = snapshot_diff(old, new, ["id"])
    ups = feed.filter(feed.change_type.isin("insert", "update")).drop("change_type")
    dels = feed.filter(feed.change_type == "delete").select("id")
    rebuilt = apply_deletes(merge_upsert(old, ups, ["id"]), dels, ["id"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_snapshot_diff_narrowed_compare_still_emits_all_columns(spark):
    """compare_cols narrows only the change TEST; the feed must still
    carry every shared non-key column or the merge_upsert round-trip
    nulls them out (review finding)."""
    from batch_process_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, status string, price double"
    )
    new = spark.createDataFrame(
        [(1, "a", 11.0), (2, "CHANGED", 20.0)], "id long, status string, price double"
    )
    out = {r["id"]: r for r in snapshot_diff(old, new, ["id"], compare_cols=["price"]).collect()}
    # price changed -> update; status-only change is invisible to the test...
    assert out[1]["change_type"] == "update"
    assert out[2]["change_type"] == "unchanged"
    # ...but BOTH columns ride the feed with new-side values
    assert out[1]["status"] == "a" and out[1]["price"] == 11.0
    assert out[2]["status"] == "CHANGED"


def test_snapshot_diff_rejects_unknown_compare_cols(spark):
    from batch_process_spark.operators.merge import snapshot_diff
    import pytest as _pytest

    old = spark.createDataFrame([(1, "a")], "id long, s string")
    new = spark.createDataFrame([(1, "a")], "id long, s string")
    with _pytest.raises(ValueError, match="compare_cols"):
        snapshot_diff(old, new, ["id"], compare_cols=["nope"])
