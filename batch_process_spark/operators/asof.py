"""As-of (nearest-prior) join — an operator Spark lacks natively.

Two implementations:

- ``asof_join`` — the exact, scale-shaped composition: tag and union
  both sides, sort within key partitions, carry the right side's last
  seen values forward with ``last(ignorenulls)`` over an unbounded
  preceding window, keep left rows. One shuffle on the key; no
  broadcast constraint on either side. (The classic streaming-merge
  rewrite of ``pd.merge_asof``.)
- ``asof_join_pandas`` — per-key ``pd.merge_asof`` via
  ``applyInPandas`` for when per-group data fits in memory and the
  tolerance/direction surface of pandas is wanted.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` key(s).

    Ties on the time column: the right row sorts before the left row
    (``__side`` 0 < 1), so an exactly-simultaneous right row IS
    visible to the left row — pandas ``merge_asof`` semantics.
    """
    by = [by] if isinstance(by, str) else list(by)
    right_cols = list(right_cols or [c for c in right.columns if c != on and c not in by])

    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *by, F.col(on), *[F.col(c).alias(c + suffix) for c in right_cols]
    ).withColumn("__side", F.lit(0))
    merged = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_cols:
        merged = merged.withColumn(c + suffix, F.last(c + suffix, ignorenulls=True).over(w))
    return merged.filter(F.col("__side") == 1).drop("__side")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    tolerance=None,
) -> DataFrame:
    """Per-key ``pd.merge_asof`` (backward) via applyInPandas."""
    import pandas as pd

    right_cols = list(right_cols or [c for c in right.columns if c != on and c != by])
    lt = left.withColumn("__is_left", F.lit(True))
    rt = right.select(by, on, *right_cols).withColumn("__is_left", F.lit(False))
    merged = lt.unionByName(rt, allowMissingColumns=True)

    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    rtypes = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_fields += [f"{c}{suffix} {rtypes[c]}" for c in right_cols]
    schema = ", ".join(out_fields)
    left_names = [f.name for f in left.schema.fields]

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        l = pdf[pdf["__is_left"]].sort_values(on)
        r = pdf[~pdf["__is_left"]].sort_values(on)
        l = l[left_names]
        r = r[[on, *right_cols]].rename(columns={c: c + suffix for c in right_cols})
        if l.empty:
            return pd.DataFrame(columns=[*left_names, *[c + suffix for c in right_cols]])
        kwargs = {"tolerance": tolerance} if tolerance is not None else {}
        return pd.merge_asof(l, r, on=on, direction="backward", **kwargs)

    return merged.groupBy(by).applyInPandas(per_key, schema=schema)
