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


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by=None,
    max_records_per_file: int | None = None,
) -> None:
    """K2 parquet sink. ``partition_by`` lays the output out as
    hive-style directories so later reads prune whole partitions at
    planning time (pinned by ``test_sinks.py``'s pruning guard);
    ``max_records_per_file`` caps file size so a skewed partition
    can't produce one giant unsplittable-row-group file — the two
    layout levers that matter when the output is itself a 100 TB
    input to the next job."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by=None,
) -> None:
    """ORC sink (JVM-native, splittable, predicate-pushdown-capable —
    the columnar alternative when downstream consumers are Hive/Trino
    rather than parquet-first). Same layout levers as ``write_parquet``;
    Spark's ORC writer embeds min/max stripe statistics so filters
    push down on re-read (pinned by ``test_sinks.py``)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source twin of the sink: a plain ``spark.read.orc`` wrapper
    kept symmetric with the other formats so the mixed-format catalog
    (sources/readers.py S6) can route by extension."""
    return spark.read.orc(path)


#: pickle is a driver-side convenience sink (reference parity:
#: ``test/blade_load_extract/plugins/process_blade_load.py:63-65``
#: pickles the result frame next to the report) — small results only.
MAX_PICKLE_ROWS = 1_000_000


def write_pickle(df: DataFrame, path: str, max_rows: int = MAX_PICKLE_ROWS) -> str:
    """K3: pickle the (small) result as a pandas DataFrame — the
    reference's ``to_pickle`` sink. Guarded like the report adapters:
    a big frame fails loud instead of materializing on the driver
    (at scale the durable sink is parquet, K2)."""
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"write_pickle takes small results (<= {max_rows} rows); "
            "use write_parquet for bulk data"
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pdf.to_pickle(path)
    return path


def read_pickle(spark: SparkSession, path: str) -> DataFrame:
    """Round-trip loader for the K3 sink (pandas pickle -> DataFrame)."""
    import pandas as pd

    return spark.createDataFrame(pd.read_pickle(path))


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


def zorder_value(a, b):
    """Morton (Z-order) interleave of two NON-NEGATIVE int columns
    (each truncated to 32 bits) as a single BIGINT Column — points
    close in BOTH dimensions get close z-values, so a range-partitioned
    sort on z gives every output file a TIGHT min/max box on BOTH
    columns at once. Classic magic-number bit spreading (5 shift/mask
    stages per operand), all inside whole-stage codegen — no UDF.

    Callers normalize to non-negative ints first (rank, bucket id,
    scaled value); negative inputs raise at write time via the domain
    check in ``write_zordered``."""
    from pyspark.sql import functions as F

    def spread(x):
        x = x.bitwiseAND(F.lit(0xFFFFFFFF))
        x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
        x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
        x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
        x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x3333333333333333))
        x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x5555555555555555))
        return x

    from pyspark.sql import Column

    ca = a if isinstance(a, Column) else F.col(a)
    cb = b if isinstance(b, Column) else F.col(b)
    return spread(ca.cast("long")).bitwiseOR(F.shiftleft(spread(cb.cast("long")), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order layout sink: range-partition + sort the rows by the
    Morton interleave of (``col_a``, ``col_b``) before writing, so
    every parquet file carries a tight min/max footer box on BOTH
    columns — the multi-dimensional data-skipping lever (a plain sort
    on one column gives perfect skipping on that column and NONE on
    the other; Z-order trades a little of each for useful skipping on
    both). Readers need no cooperation: parquet row-group stats prune
    automatically for any engine. One range shuffle per write,
    amortized over every downstream selective read — at 100 TB this is
    the OPTIMIZE-ZORDER pass run after ingest. Both columns must be
    non-negative integers (normalize first); violations fail the write
    loudly rather than silently corrupting the curve."""
    from pyspark.sql import functions as F

    # The interleave spreads bit 31 of an operand to bit 62, and the
    # odd-operand shiftleft lands it on bit 63 — the sign bit — so any
    # value >= 2**31 would silently break the Morton sort order (and
    # >= 2**32 aliases under the 32-bit mask). The documented fail-loud
    # contract therefore bounds BOTH ends of the domain.
    _max = F.lit(2**31)
    guard = F.when(
        (F.col(col_a) < 0) | (F.col(col_b) < 0)
        | (F.col(col_a) >= _max) | (F.col(col_b) >= _max),
        F.raise_error(
            F.lit(f"write_zordered: value outside [0, 2^31) in {col_a}/{col_b}")
        ),
    ).otherwise(zorder_value(col_a, col_b))
    zdf = df.withColumn("__z", guard)
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
