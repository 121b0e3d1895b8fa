"""MERGE / upsert / SCD2 — change-data application without a table
format (Delta/Iceberg jars are absent; the emulation is the classic
anti-join + union rewrite, which is also what the formats execute
logically).

- ``merge_upsert`` — source rows replace same-key target rows, new
  keys append (MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT).
- ``apply_deletes`` — anti-join removal.
- ``scd2_apply`` — slowly-changing-dimension type 2: incoming changes
  close the current row (valid_to = change ts) and append a new open
  row. History rows are immutable; one shuffle on the business key.

At 100 TB the rewrite is paired with partitioned storage so only
touched partitions rewrite (dynamic partition overwrite); the logical
plan here is unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 23:59:59"


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Upsert: target rows whose key appears in source are replaced."""
    keys = list(keys)
    kept = target.join(source.select(*keys).distinct(), on=keys, how="left_anti")
    return kept.unionByName(source, allowMissingColumns=True)


def apply_deletes(target: DataFrame, deletes: DataFrame, keys: Sequence[str]) -> DataFrame:
    return target.join(deletes.select(*list(keys)).distinct(), on=list(keys), how="left_anti")


def scd2_init(snapshot: DataFrame, ts_col: str) -> DataFrame:
    """Bootstrap an SCD2 dimension from a snapshot: every row open."""
    return (
        snapshot.withColumn("valid_from", F.col(ts_col).cast("timestamp"))
        .withColumn("valid_to", F.lit(OPEN_END).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .drop(ts_col)
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    rejected_out: list | None = None,
) -> DataFrame:
    """Apply timestamped attribute changes to an SCD2 dimension.

    For each change: the key's current row closes at the change
    timestamp; a new current row opens. Multiple changes per key in one
    batch chain correctly (window over change order). Unchanged keys
    pass through untouched.

    Precondition: change timestamps must be later than the affected
    key's current ``valid_from`` (SCD2 history is append-only forward
    in time). Late/out-of-order changes would otherwise close the
    current row with ``valid_to < valid_from`` — an inverted interval
    that silently corrupts as-of lookups — so they are REJECTED
    (errors-as-data, like the pipeline registry): filtered out of the
    apply, and appended as a DataFrame of the offending change rows to
    ``rejected_out`` when the caller passes a list.
    """
    keys = list(keys)
    ch = changes.withColumn("valid_from", F.col(ts_col).cast("timestamp")).drop(ts_col)

    # Reject changes at or before the key's current valid_from (one
    # broadcast-able probe of current rows; no extra shuffle of `ch` —
    # the join is on the same keys the window below shuffles on anyway).
    current_from = (
        dim.filter(F.col("is_current"))
        .select(*keys, F.col("valid_from").alias("__cur_from"))
    )
    ch = ch.join(current_from, on=keys, how="left")
    late = ch.filter(F.col("__cur_from").isNotNull() & (F.col("valid_from") <= F.col("__cur_from")))
    if rejected_out is not None:
        rejected_out.append(late.drop("__cur_from"))
    ch = ch.filter(F.col("__cur_from").isNull() | (F.col("valid_from") > F.col("__cur_from"))).drop(
        "__cur_from"
    )
    w = Window.partitionBy(*keys).orderBy("valid_from")
    ch = ch.withColumn(
        "valid_to",
        F.coalesce(F.lead("valid_from").over(w), F.lit(OPEN_END).cast("timestamp")),
    ).withColumn("is_current", F.col("valid_to") == F.lit(OPEN_END).cast("timestamp"))

    first_change = ch.groupBy(*keys).agg(F.min("valid_from").alias("__first_ts"))
    affected_current = (
        dim.filter(F.col("is_current"))
        .join(first_change, on=keys, how="inner")
        .withColumn("valid_to", F.col("__first_ts"))
        .withColumn("is_current", F.lit(False))
        .drop("__first_ts")
    )
    untouched = dim.join(first_change.select(*keys), on=keys, how="left_anti")
    closed_history = dim.filter(~F.col("is_current")).join(
        first_change.select(*keys), on=keys, how="left_semi"
    )
    return untouched.unionByName(closed_history).unionByName(affected_current).unionByName(ch)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Derive a change feed from two table snapshots — the INVERSE of
    ``merge_upsert``: classify every key as ``insert`` (new only),
    ``delete`` (old only), ``update`` (both, any compared column
    differs; NULL-safe) or ``unchanged``. Emits one row per key with
    the change type plus the new-side values (old-side for deletes).

    ``compare_cols`` narrows only the CHANGE TEST (default: every
    shared non-key column); the emitted feed always carries every
    shared non-key column, so a narrowed compare still round-trips
    through ``merge_upsert`` without nulling the non-compared columns
    (``unionByName(allowMissingColumns)`` would silently fill NULL for
    any column the feed dropped). Scale shape: ONE co-partitioned
    full-outer equi-join on the keys — both snapshots hash-shuffle
    once, comparison is map-side; at 100 TB this is the anti-entropy /
    CDC-derivation pass over two table versions, and the output feeds
    ``merge_upsert``/``scd2_apply`` unchanged."""
    keys = list(keys)
    shared = [c for c in new.columns if c in set(old.columns)]
    emit_cols = [c for c in shared if c not in keys]
    if compare_cols is None:
        compare_cols = emit_cols
    else:
        missing = [c for c in compare_cols if c not in emit_cols]
        if missing:
            raise ValueError(f"snapshot_diff: compare_cols not shared non-key: {missing}")
    # presence flags must come from non-null markers, not compared
    # columns (which may legitimately be NULL on either side)
    o = old.select(
        keys + [F.col(c).alias(f"__o_{c}") for c in emit_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        keys + [F.col(c).alias(f"__n_{c}") for c in emit_cols]
    ).withColumn("__in_new", F.lit(True))
    j = o.join(n, on=keys, how="full_outer")
    changed = None
    for c in compare_cols:
        ne = ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        changed = ne if changed is None else (changed | ne)
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed if changed is not None else F.lit(False), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out_vals = [
        F.when(F.col("__in_new").isNull(), F.col(f"__o_{c}"))
        .otherwise(F.col(f"__n_{c}"))
        .alias(c)
        for c in emit_cols
    ]
    return j.select(*keys, change_type.alias("change_type"), *out_vals)
