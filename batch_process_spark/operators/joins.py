"""Join operators.

The reference has no general join; its join-like behavior is label
enrichment via a lookup dict with fallback-to-name
(``processors/file_ops.py:252-266``) — i.e. a broadcast left join +
coalesce. We expose that pattern plus the standard surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_labels(
    facts: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    label_col: str = "label",
    default_col: str | None = None,
    default_value=None,
    broadcast: bool = True,
) -> DataFrame:
    """Left-join a small dimension onto facts; missing labels fall back
    to ``default_col`` (e.g. the name itself — the reference's
    ``all_dict.get(name, name)``) or ``default_value``.

    The dimension is broadcast by default — at 100 TB the fact side
    must never shuffle for a small lookup table.
    """
    d = F.broadcast(dim) if broadcast else dim
    out = facts.join(d, on=on, how="left")
    if default_col is not None:
        fallback = F.col(default_col)
    else:
        fallback = F.lit(default_value)
    return out.withColumn(label_col, F.coalesce(F.col(label_col), fallback))


def semi(a: DataFrame, b: DataFrame, on) -> DataFrame:
    return a.join(b, on=on, how="left_semi")


def anti(a: DataFrame, b: DataFrame, on) -> DataFrame:
    return a.join(b, on=on, how="left_anti")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Point-in-interval (range) join, half-open ``[start, end)``.

    A naive ``points.join(intervals, (ts >= start) & (ts < end))`` has
    no equi-key, so Spark falls back to BroadcastNestedLoopJoin —
    quadratic and a non-starter at scale. This rewrite buckets time at
    ``bucket_seconds``: each interval explodes to the buckets it covers
    (choose ``bucket_seconds`` >= typical interval length, so that's
    O(1) rows per interval), each point maps to one bucket, and the
    join becomes a hash equi-join on (keys..., bucket) with the exact
    range predicate as a residual filter.
    """
    keys = list(keys)
    # unix_timestamp handles both TIMESTAMP and TIMESTAMP_NTZ columns
    # (NTZ interpreted in the session timezone, pinned UTC engine-wide).
    # It truncates sub-second parts, which is harmless for BUCKETING
    # (floor-to-second then floor-to-bucket = floor-to-bucket) as long
    # as the end bucket is computed from end itself — an "end - 1s"
    # exclusivity trick would drop points landing in the final bucket
    # when end has a fractional second. Exactness lives in the residual
    # filter, so one possibly-empty boundary bucket row is fine.
    p_bucket = F.floor(F.unix_timestamp(F.col(point_col)) / bucket_seconds)
    i_start = F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds)
    i_end = F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds)
    iv = (
        # empty/inverted intervals match nothing; dropping them here also
        # keeps F.sequence from generating a DESCENDING bucket range (a
        # dirty end<start row would otherwise explode into thousands of
        # bucket rows that all die in the residual filter)
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn("__bucket", F.explode(F.sequence(i_start, i_end)))
    )
    pt = points.withColumn("__bucket", p_bucket)
    return (
        pt.join(iv, on=keys + ["__bucket"])
        .filter(
            (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bucket")
    )
