"""Z-order (Morton-curve) layout: multi-dimensional clustering for
parquet data skipping.

A single-column sort makes parquet min/max stats selective on ONE
column; filters on any other column still read every file. Interleaving
the bits of several columns' quantized ranks (the Morton / Z-order key)
clusters ALL of them at once: each output file covers a small rectangle
of the multi-dimensional space, so a selective filter on ANY of the
z-ordered columns prunes most files from their footer stats — the same
lever Delta/Iceberg `OPTIMIZE ZORDER BY` pulls, built here from plain
column expressions (shiftright/bitwise AND/OR — JVM codegen, no UDF).

At 100 TB this is a one-time (or per-compaction) re-layout whose cost
is one range shuffle; every later scan with filters on the clustered
columns pays for it back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank-scale a numeric column into [0, 2**bits) as a long.

    Degenerate range (hi == lo) maps everything to 0 instead of
    dividing by zero. NULL values land in bucket 0 (alongside the
    minimum) rather than poisoning the whole Morton key — a NULL key
    would range-partition every null-bearing row into one unclustered
    file and silently defeat the skipping this module promises."""
    n = F.lit(float(2**bits))
    scaled = F.floor((col.cast("double") - lo) / (hi - lo) * n)
    bucket = F.when(hi == lo, F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(2**bits - 1), scaled))
    )
    return F.coalesce(bucket, F.lit(0)).cast("long")


def zorder_key(quantized: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each already-quantized long
    column into one Morton key (pure column expressions; for k columns
    the key uses k*bits bits, so keep k*bits <= 62)."""
    ncols = len(quantized)
    if ncols * bits > 62:
        raise ValueError(f"zorder key would need {ncols * bits} bits (> 62)")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for c, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * ncols + c))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to parquet clustered on the Z-order key of ``cols``.

    One pass computes per-column min/max bounds (broadcast back — the
    same two-pass shape as the histogram q110), a second range-shuffles
    on the Morton key into ``n_files`` roughly-equal files and sorts
    within each so row-group stats are tight on EVERY z-ordered column.
    The key column is dropped before writing."""
    reserved = {"__zorder__"} | {f"__lo_{c}" for c in cols} | {f"__hi_{c}" for c in cols}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"write_zordered uses internal column names {sorted(clash)}; "
            "rename them in the input first"
        )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    quantized = [
        _quantize(
            F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
        )
        for c in cols
    ]
    keyed = with_bounds.withColumn("__zorder__", zorder_key(quantized, bits))
    (
        keyed.repartitionByRange(n_files, "__zorder__")
        .sortWithinPartitions("__zorder__")
        .select(*df.columns)
        .write.mode(mode)
        .parquet(path)
    )


def file_clustering_report(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max of ``cols`` (via ``_metadata.file_path``) — the
    observable a layout claims to improve. Each row is one parquet
    file with its covered range per column; narrow ranges on every
    column = effective multi-dimensional clustering."""
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file"), *cols
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("file").agg(*aggs)
