"""Approximate / sketch operators — the sublinear-memory analytics a
100 TB engine reaches for when exact answers don't pay their way.

All built on Spark's native sketch aggregates (HLL++, GK quantiles,
count-min-backed frequent items), which merge across partitions —
the whole point at scale: fixed-size state per partition, one tiny
shuffle. Exact twins exist in the engine for oracle checking; the
sketches themselves are verified by ε-bounds against exact results
in tests (cross-engine hash-matching is meaningless for
implementation-defined approximations).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, cols: Sequence[str], keys: Sequence[str] = (), rsd: float = 0.02) -> DataFrame:
    """HLL++ distinct counts (relative error ``rsd``), optionally per
    group. State: ~1.5KB per counter regardless of cardinality."""
    aggs = [F.approx_count_distinct(c, rsd=rsd).alias(f"approx_distinct_{c}") for c in cols]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000, keys: Sequence[str] = (),
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles; error <= 1/accuracy."""
    probs = F.array(*[F.lit(p) for p in probabilities])
    agg = F.percentile_approx(col, probs, accuracy).alias("quantiles")
    out = df.groupBy(*keys).agg(agg) if keys else df.agg(agg)
    for i, p in enumerate(probabilities):
        out = out.withColumn(f"p{int(p * 100)}", F.element_at("quantiles", i + 1))
    return out.drop("quantiles")


def frequent_items(df: DataFrame, col: str, min_share: float = 0.01, k: int = 20) -> DataFrame:
    """Heavy hitters: exact counts of the top-k items above a support
    share. (Spark's freqItems sketch gives candidates without counts;
    at scale the two-pass exact-count-of-candidates pattern below is
    the standard rewrite and stays one shuffle over candidate rows.)"""
    total = df.count()
    counts = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.round(F.col("cnt") / F.lit(total), 6))
        .filter(F.col("share") >= min_share)
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(k)
    )
    return counts


def seeded_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Deterministic Bernoulli sample (stable across reruns/retries —
    rand(seed) is per-partition deterministic)."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(df: DataFrame, key: str, fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum sampling fractions (e.g. downsample hot classes)."""
    return df.sampleBy(key, fractions=fractions, seed=seed)
