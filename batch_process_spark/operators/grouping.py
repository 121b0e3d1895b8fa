"""Grouping operators: group-split, exporter merges, per-level dir aggs.

Reference semantics preserved:

- ``split_dataframe_by_groups`` (``utils/adapters/df_helpers.py:80-123``):
  ``groupby(cols, dropna=False)`` — NULL group keys are KEPT (Spark's
  default groupBy already keeps NULL keys); empty key list means one
  global group.
- per-file result merge (``utils/exporters.py:34-53``): fixed agg recipe
  max/sum/sum/first/list/max. ``first`` is made deterministic with
  ``min_by`` on an ordering column (distributed "first" is undefined
  otherwise), and the status list is sorted so results are stable
  across partitionings.
- per-directory accumulation on dir exit (``utils/pipeline.py:91-95``,
  demo pipelines): expressed as groupBy over path-hierarchy level
  columns at each depth — the scalable rewrite of the reference's
  order-dependent context mutation.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: split_by_groups is a control-plane shape (one Python object per
#: group); past this many groups the caller almost certainly wants the
#: distributed forms instead. Fail loud, don't build 10^6 DataFrames.
MAX_SPLIT_GROUPS = 10_000


def split_by_groups(df: DataFrame, keys: Sequence[str], max_groups: int = MAX_SPLIT_GROUPS):
    """Return (key_row_dict, sub_df) per group, NULL keys kept.

    The reference materializes a list of pandas frames; distributed we
    expose the same shape lazily: the distinct key set is collected
    (small by construction — it is a grouping key set), and each sub-df
    is a filtered view that Catalyst prunes via partition/predicate
    pushdown. For bulk per-group processing prefer
    ``df.groupBy(*keys).applyInPandas`` (per-group kernels) or
    ``grouped_counts`` (aggregates) — this function guards itself with
    ``max_groups`` so a high-cardinality key fails loud instead of
    building one DataFrame per key driver-side.
    """
    keys = list(keys)
    if not keys:
        return [({}, df)]
    distinct = df.select(*keys).distinct().limit(max_groups + 1).collect()
    if len(distinct) > max_groups:
        raise ValueError(
            f"split_by_groups: more than max_groups={max_groups} distinct key "
            "tuples — use groupBy().applyInPandas / grouped_counts for bulk "
            "per-group processing, or raise max_groups explicitly"
        )
    out = []
    for row in distinct:
        kd = row.asDict()
        pred = None
        for k, v in kd.items():
            p = F.col(k).isNull() if v is None else (F.col(k) == F.lit(v))
            pred = p if pred is None else (pred & p)
        out.append((kd, df.filter(pred).drop(*keys)))
    return out


def grouped_counts(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """NULL-keeping group sizes (the cheap aggregate form of split)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))


def merge_results(
    df: DataFrame,
    file_col: str = "file",
    order_col: str = "timestamp",
    lines_col: str = "lines",
    words_col: str = "words",
    chars_col: str = "chars",
    lang_col: str = "lang",
    status_col: str = "status",
) -> DataFrame:
    """Per-file merge of execution records (``utils/exporters.py:34-53``):
    lines->max, words->sum, chars->sum, lang->first-by-time,
    status->sorted list, timestamp->max.

    Two-stage formulation: the status list is the only non-codegen
    aggregate (``collect_list`` forces ObjectHashAggregate and ships
    every status string through the shuffle), but statuses are
    low-cardinality, so stage 1 pre-aggregates on (file, status) —
    all codegen, map-side partial combine reduces the exchange to
    ~files x distinct-statuses rows however many records there are —
    and stage 2 rebuilds the sorted multiset from (status, count) via
    ``array_repeat`` over a few rows per file. Every other aggregate
    composes exactly across the two stages (max of maxes, sum of
    sums, min_by of min_bys); the tiny second exchange costs less
    than object-serializing the full status column."""
    s1 = df.groupBy(file_col, status_col).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.max(lines_col).alias("__max_lines"),
        F.sum(words_col).alias("__sum_words"),
        F.sum(chars_col).alias("__sum_chars"),
        F.min_by(lang_col, order_col).alias("__lang0"),
        F.min(order_col).alias("__ts0"),
        F.max(order_col).alias("__ts1"),
    )
    return s1.groupBy(file_col).agg(
        F.max("__max_lines").alias("max_lines"),
        F.sum("__sum_words").alias("sum_words"),
        F.sum("__sum_chars").alias("sum_chars"),
        F.min_by("__lang0", "__ts0").alias("first_lang"),
        F.array_sort(
            F.flatten(
                # NULL statuses must stay OUT of the list (collect_list's
                # contract in the one-stage form drops NULL elements):
                # masking the whole array to NULL for the NULL-status
                # group lets collect_list drop it, while that group's
                # rows still feed every other aggregate
                F.collect_list(
                    F.when(
                        F.col(status_col).isNotNull(),
                        F.array_repeat(
                            F.col(status_col),
                            # array_repeat takes int; past 2^31 rows per
                            # (file,status) the cast would wrap silently
                            # (negative -> empty array, dropped status).
                            # A multiset that large is unbuildable
                            # anyway, so fail loudly instead.
                            F.when(
                                F.col("__cnt") > F.lit(2**31 - 1),
                                F.raise_error(
                                    F.lit(
                                        "merge_results: per-(file,status) count "
                                        "exceeds Int.MaxValue; statuses multiset "
                                        "is unbuildable at this cardinality"
                                    )
                                ).cast("int"),
                            ).otherwise(F.col("__cnt").cast("int")),
                        ),
                    )
                )
            )
        ).alias("statuses"),
        F.max("__ts1").alias("last_ts"),
    )


def dir_level_aggregate(
    df: DataFrame,
    level: int,
    aggs: Mapping[str, Column] | None = None,
    level_prefix: str = "level",
) -> DataFrame:
    """Aggregate file rows at directory depth ``level`` — the distributed
    equivalent of the reference's on-dir-exit accumulation (§4a of
    SURVEY): groupBy(level0..levelK).

    ``aggs`` maps output name -> aggregate Column; default counts rows
    and flattens a ``values`` array column if present.
    """
    keys = [f"{level_prefix}{i}" for i in range(level + 1)]
    if aggs is None:
        aggs = {"n_files": F.count(F.lit(1))}
        if "values" in df.columns:
            aggs["all_values"] = F.flatten(F.collect_list("values"))
    return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def summary_stats(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """count/mean/min/max per group (``complex_demo_processor.py:333-341``)."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.avg(value_col).alias("mean"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
    )
