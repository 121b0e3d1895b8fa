"""Z-order layout: the written files must cluster EVERY z-ordered
column, not just the first — the property a linear sort cannot have."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.sinks.layout import (
    file_clustering_report,
    write_zordered,
    zorder_key,
)


def _mean_normalized_range(report_rows, col, lo, hi):
    spans = [(r[f"max_{col}"] - r[f"min_{col}"]) / (hi - lo) for r in report_rows]
    return sum(spans) / len(spans)


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """Two independent uniform columns, 16 files: a z-ordered layout
    bounds BOTH columns' per-file span well below the global span; a
    plain sort on x leaves y's span at ~1.0."""
    n = 40_000
    df = spark.range(n).select(
        F.col("id"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
         .cast("long") % 10_000).alias("x"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("y"), F.col("id").cast("string"))), 1, 6), 16, 10)
         .cast("long") % 10_000).alias("y"),
    )

    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=8)
    zrep = file_clustering_report(spark, zpath, ["x", "y"]).collect()
    assert len(zrep) == 16

    lpath = str(tmp_path / "linear")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)
    lrep = file_clustering_report(spark, lpath, ["x", "y"]).collect()

    zx = _mean_normalized_range(zrep, "x", 0, 9999)
    zy = _mean_normalized_range(zrep, "y", 0, 9999)
    lx = _mean_normalized_range(lrep, "x", 0, 9999)
    ly = _mean_normalized_range(lrep, "y", 0, 9999)

    # Linear sort: x tightly clustered, y not clustered at all.
    assert lx < 0.2 and ly > 0.9
    # Z-order: BOTH dimensions bounded well below the unclustered span.
    # (The area per file is the same as a linear slice's — 16 files is
    # 16 files — the win is that the WORST dimension is bounded, so a
    # selective filter on EITHER column can prune files.)
    assert zx < 0.6 and zy < 0.6, f"zx={zx:.2f} zy={zy:.2f}"
    assert max(zx, zy) < 0.5 * ly


def test_zorder_write_preserves_rows_and_schema(spark, tmp_path):
    df = spark.range(1000).select(
        "id", (F.col("id") % 37).alias("a"), (F.col("id") % 53).alias("b")
    )
    path = str(tmp_path / "z2")
    write_zordered(df, path, ["a", "b"], n_files=4, bits=6)
    back = spark.read.parquet(path)
    assert sorted(back.columns) == sorted(df.columns)
    assert back.count() == 1000
    assert back.select(F.sum("id")).first()[0] == 999 * 1000 // 2


def test_zorder_key_interleaves_bits(spark):
    """Spot-check the Morton math: (x=0b11, y=0b00, 2 bits) -> 0b0101;
    (x=0b00, y=0b11) -> 0b1010."""
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3)], "x long, y long")
    out = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=2).alias("k")
    ).collect()
    assert [r["k"] for r in out] == [0b0101, 0b1010, 0b1111]


def test_zorder_degenerate_range_is_safe(spark, tmp_path):
    """A constant column must not divide by zero — everything lands in
    quantile 0 and the write succeeds."""
    df = spark.range(100).select("id", F.lit(7).alias("c"), (F.col("id") % 5).alias("d"))
    path = str(tmp_path / "z3")
    write_zordered(df, path, ["c", "d"], n_files=2, bits=4)
    assert spark.read.parquet(path).count() == 100


def test_zorder_rejects_oversized_key(spark):
    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b"), F.col("c"), F.col("d")], bits=16)


def test_zorder_null_values_stay_clustered(spark, tmp_path):
    """NULLs in a z-ordered column must not poison the Morton key:
    rows with a null dimension land in bucket 0 and the OTHER
    dimension stays clustered (a null key would range-partition every
    null row into one unclustered file)."""
    from pyspark.sql import functions as F2

    df = spark.range(10_000).select(
        "id",
        F2.when(F2.col("id") % 5 == 0, None)
        .otherwise(F2.col("id") % 100)
        .alias("x"),
        (F2.col("id") % 97).alias("y"),
    )
    path = str(tmp_path / "znull")
    write_zordered(df, path, ["x", "y"], n_files=8, bits=6)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.filter(F2.col("x").isNull()).count() == 2_000


def test_zorder_rejects_reserved_column_names(spark, tmp_path):
    df = spark.range(10).select("id", F.col("id").alias("__zorder__"))
    with pytest.raises(ValueError):
        write_zordered(df, str(tmp_path / "zz"), ["id", "__zorder__"])
