"""Tabular sinks.

- CSV (K1): header on; ``single_file`` coalesces to one part for the
  reference's one-file-per-export convention (small results only — a
  100 TB result stays multi-part).
- Parquet (K2) / JSON (K6): direct writes; parquet replaces the
  reference's pickle (K3) and SQLite history (K4) sinks.
- ``cached_parquet``: the reference's sha1-keyed prepared-data cache
  (``plotting_impl.py:93-147``) — reuse across runs keyed on the
  logical inputs.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols,
    n_buckets: int = 32,
    sort_cols=None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates later joins/aggs on the
    bucket key without a shuffle (both sides bucketed on the same key
    and count => a sort-merge join with zero exchanges). The write
    itself shuffles once — amortized over every downstream join."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def cache_key(*parts: str) -> str:
    """sha1(inputs)[:16] — the reference's cache key recipe."""
    return hashlib.sha1("|".join(parts).encode("utf-8")).hexdigest()[:16]


def cached_parquet(
    spark: SparkSession, build, cache_dir: str, *key_parts: str
) -> DataFrame:
    """Return the cached frame for ``key_parts`` if present, else call
    ``build()`` (-> DataFrame), persist it to parquet, and return the
    re-read frame (so downstream reads scan the materialized copy)."""
    path = os.path.join(cache_dir, cache_key(*key_parts) + ".parquet")
    if not os.path.exists(path):
        build().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
