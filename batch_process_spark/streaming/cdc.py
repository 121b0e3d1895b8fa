"""Streaming CDC ingestion: foreachBatch upsert into a parquet target.

The standard Structured-Streaming change-data pattern: each micro-batch
is applied to the target table with MERGE semantics (same-key rows
replaced, new keys appended) via ``operators/merge.merge_upsert``.

Without a transactional table format (no Delta/Iceberg jars in this
environment) the target is swapped wholesale per batch: write to a
temp dir, then replace. That is atomic enough for a single writer and
makes the semantics testable; a production 100 TB deployment would put
Delta/Iceberg under the same ``foreachBatch`` callback and get
partition-level rewrites + snapshot isolation with no change to the
upsert logic.
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_process_spark.operators.merge import merge_upsert


def upsert_batch(
    batch_df: DataFrame,
    target_dir: str,
    keys: Sequence[str],
    order_col: str | None = None,
) -> None:
    """Apply one (micro-)batch to the parquet target with MERGE
    semantics. Within-batch duplicate keys collapse to ONE row first —
    a batch must not insert the same key twice. With ``order_col`` the
    LATEST change wins (CDC ordering, ``max_by``); without it the
    winner is still deterministic (max over the full row struct), just
    not time-aware — ``dropDuplicates`` would keep whichever row a
    partition scan saw first, which varies across retries/partitioning
    and can silently replay an older value."""
    keys = list(keys)
    spark = batch_df.sparkSession
    payload = [c for c in batch_df.columns if c not in keys]
    order = F.col(order_col) if order_col else F.struct(*[F.col(c) for c in payload])
    batch_df = batch_df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), order).alias("__row")
    ).select(*keys, "__row.*")
    if os.path.exists(target_dir):
        merged = merge_upsert(spark.read.parquet(target_dir), batch_df, keys)
    else:
        merged = batch_df
    tmp = target_dir.rstrip("/") + ".__tmp__"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_dir):
        shutil.rmtree(target_dir)
    os.rename(tmp, target_dir)


def stream_upsert_to_parquet(
    stream: DataFrame,
    target_dir: str,
    keys: Sequence[str],
    checkpoint_dir: str | None = None,
    order_col: str | None = None,
):
    """Attach the CDC upsert sink to a streaming frame. Returns the
    started StreamingQuery (caller drives/stops it)."""
    writer = stream.writeStream.foreachBatch(
        lambda df, _id: upsert_batch(df, target_dir, keys, order_col=order_col)
    ).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
