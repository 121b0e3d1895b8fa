"""As-of join + streaming window tests."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.asof import asof_join, asof_join_pandas
from batch_process_spark.streaming.windows import session_agg, tumbling_window_agg


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", 1, 10.0),
            ("A", 5, 11.0),
            ("A", 9, 12.0),
            ("B", 3, 99.0),
        ],
        "sym string, t long, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", 0, 100),   # before any quote -> NULL
            ("A", 5, 200),   # exactly at quote t=5 -> 11.0 (ties include right)
            ("A", 7, 300),   # -> 11.0
            ("A", 20, 400),  # -> 12.0
            ("B", 4, 500),   # -> 99.0
            ("C", 1, 600),   # key with no quotes -> NULL
        ],
        "sym string, t long, qty long",
    )


EXPECTED = {100: None, 200: 11.0, 300: 11.0, 400: 12.0, 500: 99.0, 600: None}


def test_asof_join_window_rewrite(quotes, trades):
    out = asof_join(trades, quotes, on="t", by="sym")
    got = {r["qty"]: r["px_r"] for r in out.collect()}
    assert got == EXPECTED


def test_asof_join_pandas(quotes, trades):
    out = asof_join_pandas(trades, quotes, on="t", by="sym")
    got = {r["qty"]: r["px_r"] for r in out.collect()}
    assert got == EXPECTED


def test_asof_implementations_agree_on_random(spark):
    import random

    rnd = random.Random(7)
    left = spark.createDataFrame(
        [(rnd.choice("xyz"), rnd.randint(0, 1000), i) for i in range(200)],
        "k string, t long, i long",
    )
    right = spark.createDataFrame(
        [(rnd.choice("xyz"), rnd.randint(0, 1000) * 10, float(i)) for i in range(50)],
        "k string, t long, v double",
    )
    # dedupe right per (k, t) so both implementations are deterministic
    right = right.groupBy("k", "t").agg(F.max("v").alias("v"))
    a = {r["i"]: r["v_r"] for r in asof_join(left, right, on="t", by="k").collect()}
    b = {r["i"]: r["v_r"] for r in asof_join_pandas(left, right, on="t", by="k").collect()}
    assert a == b


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, "2024-01-01 10:05:00", 1, "a", 1.0),
        (2, "2024-01-01 10:20:00", 1, "a", 2.0),
        (3, "2024-01-01 11:30:00", 1, "b", 3.0),  # > 30 min gap -> new session
        (4, "2024-01-01 10:10:00", 2, "a", 4.0),
    ]
    return (
        spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string, value double")
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_tumbling_window_agg(events):
    out = tumbling_window_agg(events, width="1 hour", keys=["event_type"])
    got = {(str(r["bucket_start"]), r["event_type"]): r["n_events"] for r in out.collect()}
    assert got[("2024-01-01 10:00:00", "a")] == 3
    assert got[("2024-01-01 11:00:00", "b")] == 1


def test_sessionization(events):
    out = session_agg(events, gap_minutes=30)
    u1 = sorted(
        [(r["session_idx"], r["n_events"]) for r in out.filter(F.col("user_id") == 1).collect()]
    )
    assert u1 == [(1, 2), (2, 1)]  # 10:05+10:20 together, 11:30 alone


def test_streaming_matches_batch(spark, events, tmp_path):
    """The same aggregation through readStream == batch result."""
    from batch_process_spark.streaming.windows import run_stream_to_memory

    src = str(tmp_path / "ev")
    events.write.parquet(src)
    batch = {
        (str(r["bucket_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_window_agg(events, width="1 hour", keys=["event_type"]).collect()
    }
    out = run_stream_to_memory(
        spark,
        src,
        events.schema,
        lambda s: tumbling_window_agg(
            s.withWatermark("ts", "1 minute"), width="1 hour", keys=["event_type"]
        ),
        query_name="t_stream_out",
    )
    stream = {
        (str(r["bucket_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    assert stream == batch


def test_session_window_agg_matches_session_agg(spark, events):
    """Native session_window groups must agree with the lag/cumsum
    sessionization on event counts per (user, session)."""
    from batch_process_spark.streaming.windows import session_window_agg

    native = session_window_agg(events, gap="30 minutes")
    classic = session_agg(events, gap_minutes=30)
    n_native = sorted(
        (r["user_id"], r["n_events"]) for r in native.collect()
    )
    n_classic = sorted(
        (r["user_id"], r["n_events"]) for r in classic.collect()
    )
    assert n_native == n_classic


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermarked tumbling agg over REAL micro-batches: an event that
    arrives behind the watermark must be dropped from its (already
    closed) window; append mode emits each window exactly once."""
    from datetime import datetime

    from batch_process_spark.streaming.windows import (
        run_stream_to_memory,
        tumbling_window_agg,
    )

    src = tmp_path / "wm_src"
    src.mkdir()
    schema = "user_id int, ts timestamp, value double"

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def t(m):
        return datetime(2024, 1, 1, 10, m)

    # batch 1: two events in [10:00,10:10) + one at 10:20 that advances
    # the watermark to 10:15 (5 min delay) once the batch commits
    write("b1", [(1, t(1), 1.0), (1, t(2), 2.0), (1, t(20), 4.0)])

    feeds = [
        # batch 2: a LATE event for the closed 10:00 window (10:02 is
        # behind the 10:15 watermark -> must be dropped), plus 10:30
        # advancing the watermark further
        lambda: write("b2", [(1, t(2), 100.0), (1, t(30), 8.0)]),
        # batch 3: pushes the watermark past 10:35 so earlier windows flush
        lambda: write("b3", [(1, t(50), 16.0)]),
    ]

    out = run_stream_to_memory(
        spark,
        str(src),
        schema,
        lambda s: tumbling_window_agg(s, width="10 minutes", watermark="5 minutes"),
        query_name="wm_out",
        output_mode="append",
        feeds=feeds,
    ).collect()

    by_start = {r["bucket_start"]: r for r in out}
    w0 = by_start[t(0)]
    # the late 100.0 event was dropped: count 2, sum 3.0 — not 3/103.0
    assert w0["n_events"] == 2 and w0["sum_value"] == 3.0
    # each emitted window appears exactly once (append-mode contract)
    assert len(by_start) == len(out)


def test_stream_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark over real micro-batches: a dup
    inside the watermark window is dropped; after the watermark passes
    the key's eviction horizon, the same key counts as new."""
    from datetime import datetime

    from batch_process_spark.streaming.windows import (
        run_stream_to_memory,
        stream_dedup,
    )

    src = tmp_path / "dd_src"
    src.mkdir()
    schema = "k int, ts timestamp, value double"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def t(m):
        return datetime(2024, 1, 1, 10, m)

    write([(1, t(0), 1.0), (1, t(1), 2.0), (2, t(0), 3.0)])  # dup k=1 in-batch
    feeds = [
        # k=1 again within the 5-min window of its last-seen -> dropped;
        # ts 10:20 advances the watermark to 10:15, evicting both keys
        lambda: write([(1, t(3), 4.0), (3, t(20), 5.0)]),
        # k=1 returns AFTER eviction -> counts as new (bounded-state trade)
        lambda: write([(1, t(30), 6.0)]),
    ]
    out = run_stream_to_memory(
        spark,
        str(src),
        schema,
        lambda s: stream_dedup(s, ["k"], watermark="5 minutes"),
        query_name="dd_out",
        output_mode="append",
        feeds=feeds,
    ).collect()
    per_key = {}
    for r in out:
        per_key[r["k"]] = per_key.get(r["k"], 0) + 1
    assert per_key[2] == 1 and per_key[3] == 1
    assert per_key[1] == 2  # one in-window survivor + one post-eviction
    assert len(out) == 4


def test_stream_dedup_batch_fallback(spark):
    from batch_process_spark.streaming.windows import stream_dedup

    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 3.0)], "k int, value double"
    )
    assert stream_dedup(df, ["k"]).count() == 2


def test_stream_dedup_refuses_unbounded_streaming_state(spark, tmp_path):
    from batch_process_spark.streaming.windows import stream_dedup

    src = tmp_path / "dd_unbounded"
    src.mkdir()
    schema = "k int, ts timestamp, value double"
    spark.createDataFrame([], schema).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).format("parquet").load(str(src))
    with pytest.raises(ValueError, match="unbounded"):
        stream_dedup(stream, ["k"])
    # explicit opt-in builds the plan (plain dropDuplicates)
    assert stream_dedup(stream, ["k"], allow_unbounded_state=True).isStreaming
