"""Incremental view maintenance (IVM) for algebraic rollups.

At 100 TB the RAW HISTORY is never re-scanned: a materialized
per-key rollup holds MERGEABLE partial state (count / sum / min /
max), and each new drop of rows folds in with one aggregation over
the DELTA plus a merge with the existing rollup. Honest cost
accounting: the merge re-aggregates the standing rollup (one pass
over |rollup| + |delta| partials, with a key shuffle) — what is
saved is every pass over the raw event history, which dominates by
the compression ratio of the rollup. Storing the rollup bucketed on
the keys removes the merge's shuffle; a touched-keys-only rewrite
(anti-join passthrough of untouched keys) trades the shuffle for two
joins and wins when deltas touch few keys. Derived measures
(avg) reconstruct from the partials at read time; non-mergeable
holistic measures (exact median) are exactly what the sketch layer
(`operators/sketches.py`) replaces with mergeable state.

The merge is a full-outer union-and-reaggregate over partials, which
is itself algebraic: refresh(refresh(R, d1), d2) == refresh(R, d1+d2)
== full recompute — order- and batching-insensitive, the property the
oracle pins.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure kinds whose partial state merges by a plain aggregate
MERGE_FN = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def rollup_aggregate(
    rows: DataFrame, keys: Sequence[str], measures: Mapping[str, tuple[str, str]]
) -> DataFrame:
    """Build rollup partials from raw rows.

    ``measures``: out_col -> (kind, source_col) with kind one of
    count/sum/min/max (count ignores its source and counts rows).
    """
    aggs = []
    for out, (kind, src) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).cast("long").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(src).alias(out))
        elif kind in ("min", "max"):
            aggs.append(getattr(F, kind)(src).alias(out))
        else:
            raise ValueError(f"non-mergeable measure kind {kind!r}; use a sketch")
    return rows.groupBy(*keys).agg(*aggs)


def refresh_rollup(
    existing: DataFrame,
    delta_rows: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Fold a delta into a materialized rollup: aggregate the DELTA
    (one pass over new rows only), union with the existing partials,
    and re-aggregate per key with each measure's MERGE function
    (count/sum -> sum of partials, min/max -> min/max of partials).
    Keys present only in the delta appear; untouched keys pass through
    the re-aggregation with unchanged VALUES (they do ride the merge
    shuffle — see the module docstring's cost note). Raw history is
    never re-read."""
    keys = list(keys)
    delta = rollup_aggregate(delta_rows, keys, measures)
    merged = existing.select(delta.columns).unionByName(delta)
    aggs = []
    for out, (kind, _src) in measures.items():
        aggs.append(MERGE_FN[kind](out).alias(out))
    return merged.groupBy(*keys).agg(*aggs)
