"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting covers most cases at runtime; explicit
salting remains the tool when a single group key dominates an
aggregation (AQE cannot split a single hash-agg group) or when joining
a skewed fact key against a small-but-not-broadcastable dim.

- ``salted_agg`` — two-phase aggregation: groupBy(key, salt) partial,
  then groupBy(key) final merge. Works for any algebraic aggregate
  (sum/count/min/max and combinations thereof).
- ``salted_join`` — explode the dim side over all salt values, salt
  the fact side randomly-but-deterministically, equi-join on
  (key, salt). Dim grows x salt_buckets; fact never duplicates.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, buckets: int, salt_col: str = "__salt", mode: str = "content"
) -> DataFrame:
    """Deterministic salt. Never ``rand()`` — resubmitted tasks must
    salt identically or shuffles double-count rows.

    - ``mode="content"`` (default): hash of the full row. Retry-safe
      unconditionally. LIMITATION: fully-identical rows all hash to
      ONE bucket — a hot key whose rows are duplicates (or whose
      payload has tiny cardinality) is NOT spread. Fine whenever some
      column varies (ids, timestamps, measures).
    - ``mode="positional"``: partition-relative position
      (monotonically_increasing_id), which spreads even identical
      rows. Retry-safe ONLY when the input's partition contents and
      order are deterministic (a fresh file scan is; the reduce side
      of a shuffle is not) — the same caveat Spark's own round-robin
      repartition carries.
    """
    if mode == "positional":
        return df.withColumn(
            salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
        )
    if mode != "content":
        raise ValueError(f"with_salt: unknown mode {mode!r}")
    return df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Mapping[str, Column],
    final_aggs: Mapping[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: name -> aggregate over the salted groups.
    ``final_aggs``: name -> aggregate over the partial columns (refer
    to the partial names). Example::

        salted_agg(df, ["k"],
                   {"cnt_p": F.count(F.lit(1)), "sum_p": F.sum("v")},
                   {"cnt": F.sum("cnt_p"), "sum_v": F.sum("sum_p")})
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(*[c.alias(n) for n, c in final_aggs.items()])


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: dim replicated per salt bucket, fact salted
    deterministically, join on (key..., salt). Use when the dim is too
    big to broadcast and fact keys are hot.

    Only FACT-PRESERVING join types are accepted: the dim side is
    exploded over every salt value, so a dim-preserving type (right/
    full/right_anti) would emit each unmatched dim row once PER SALT
    REPLICA — ``buckets`` null-padded duplicates instead of one row."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join: join type {how!r} is dim-preserving; the exploded "
            f"dim side would duplicate unmatched dim rows x{buckets}. Use a "
            "fact-preserving type (inner/left/left_semi/left_anti) or salt "
            "the other side."
        )
    on = list(on)
    f = with_salt(fact, buckets)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = f.join(d, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
