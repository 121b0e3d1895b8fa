"""Streaming CDC upsert sink + small-files compaction."""

import os

import pytest
from pyspark.sql import functions as F

from batch_process_spark.sinks.compact import compact_parquet, parquet_files
from batch_process_spark.streaming.cdc import stream_upsert_to_parquet, upsert_batch

from batch_process_spark.streaming.windows import drain_all


def test_upsert_batch_merge_semantics(spark, tmp_path):
    target = str(tmp_path / "cdc_target")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    upsert_batch(b1, target, ["k"])
    # batch 2: update key 2, insert key 3, within-batch dup of key 3
    b2 = spark.createDataFrame([(2, "B"), (3, "c"), (3, "c")], "k long, v string")
    upsert_batch(b2, target, ["k"])
    rows = sorted((r["k"], r["v"]) for r in spark.read.parquet(target).collect())
    assert rows == [(1, "a"), (2, "B"), (3, "c")]


def test_stream_upsert_end_to_end(spark, tmp_path):
    """Drive a real file-source stream through the foreachBatch upsert
    sink; the final target equals one-row-per-key of the source."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i % 10, f"v{i}") for i in range(100)], "k long, v string"
    ).write.parquet(src)
    target = str(tmp_path / "cdc_out")
    stream = spark.readStream.schema("k long, v string").parquet(src)
    q = stream_upsert_to_parquet(
        stream, target, ["k"], checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        drain_all(q)
    finally:
        q.stop()
    out = spark.read.parquet(target)
    assert out.count() == 10  # one row per key
    assert sorted(r["k"] for r in out.select("k").collect()) == list(range(10))


def test_compact_parquet_reduces_files(spark, tmp_path):
    path = str(tmp_path / "lake")
    spark.range(10_000).repartition(40).write.parquet(path)
    assert len(parquet_files(path)) == 40
    stats = compact_parquet(spark, path, target_mb=128)
    assert stats["files_before"] == 40
    assert stats["files_after"] <= 2
    assert spark.read.parquet(path).count() == 10_000


def test_compact_parquet_sorted_stats(spark, tmp_path):
    path = str(tmp_path / "sorted_lake")
    spark.range(10_000).withColumn("k", (F.col("id") * 7919) % 1000).write.mode(
        "overwrite"
    ).parquet(path)
    compact_parquet(spark, path, target_mb=1, sort_by=["k"])
    df = spark.read.parquet(path)
    assert df.count() == 10_000
    # range-partitioned + sorted: each output file covers a narrow,
    # non-overlapping k range => min/max stats are selective
    per_file = (
        df.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint ranges


def test_compact_noop_below_min_files(spark, tmp_path):
    path = str(tmp_path / "single")
    spark.range(10).coalesce(1).write.parquet(path)
    stats = compact_parquet(spark, path, target_mb=128)
    assert stats["files_before"] == stats["files_after"] == 1


def test_upsert_batch_latest_wins_with_order_col(spark, tmp_path):
    target = str(tmp_path / "cdc_ordered")
    b = spark.createDataFrame(
        [(1, "new", 5), (1, "old", 2), (2, "only", 1)], "k long, v string, seq long"
    )
    upsert_batch(b, target, ["k"], order_col="seq")
    rows = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert rows == {1: "new", 2: "only"}  # highest seq wins, not scan order


def test_upsert_batch_null_order_keeps_payload(spark, tmp_path):
    """A NULL order value must lose to non-NULL rows but never corrupt
    the surviving payload into NULLs."""
    target = str(tmp_path / "cdc_nullseq")
    b = spark.createDataFrame(
        [(1, "real", None), (2, "only-null", None)], "k long, v string, seq string"
    ).withColumn("seq", F.col("seq").cast("long"))
    upsert_batch(b, target, ["k"], order_col="seq")
    rows = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert rows == {1: "real", 2: "only-null"}  # payloads intact
    b2 = spark.createDataFrame([(1, "newer", 7), (1, "null-ts", None)],
                               "k long, v string, seq long")
    upsert_batch(b2, target, ["k"], order_col="seq")
    rows = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert rows[1] == "newer"  # non-null seq beats null


def test_upsert_batch_map_payload(spark, tmp_path):
    """Map-typed payloads are unorderable for struct aggregates; the
    fingerprint dedup must handle them."""
    target = str(tmp_path / "cdc_map")
    b = spark.createDataFrame(
        [(1, {"a": 1}), (1, {"a": 1}), (2, {"b": 2})], "k long, m map<string,int>"
    )
    upsert_batch(b, target, ["k"])
    out = {r["k"]: dict(r["m"]) for r in spark.read.parquet(target).collect()}
    assert out == {1: {"a": 1}, 2: {"b": 2}}
