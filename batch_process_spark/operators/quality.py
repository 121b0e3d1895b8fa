"""Data-quality constraint checks — the intake gate a 100 TB pipeline
runs before trusting a new drop of data (the Deequ/dbt-test shape,
re-expressed as one Spark aggregation).

All COLUMN-level checks over a table compile into a SINGLE ``agg`` —
one scan however many checks — then unpivot to one row per check via
``stack`` (pure plan; nothing collects). Referential-integrity checks
need the parent table and compile to a null-producing left join (the
anti-join count), one per FK, with the parent side size-gated for
broadcast like every other dim join in this engine.

Check spec grammar::

    {"type": "not_null",        "column": c}
    {"type": "unique",          "column": c}          # exact; swap HLL at scale
    {"type": "range",           "column": c, "min": x, "max": y}  # either bound optional
    {"type": "accepted_values", "column": c, "values": [...]}
    {"type": "foreign_key",     "column": c, "ref_df": parent, "ref_column": pk}

Every check yields ``(check_name, violations, passed)`` — violations is
the ROW count that breaks the rule (NULLs don't violate range/accepted
checks; use not_null for that), so thresholds compose downstream.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_process_spark.operators.joins import gated_broadcast


class GateError(RuntimeError):
    """A hard quality gate failed. Pipeline.run treats this class
    specially: the failing stage records as failed AND every later
    stage is skipped — unlike ordinary operator errors, which are
    errors-as-data and do not stop the run."""


def _column_check_expr(check: Mapping[str, Any]):
    """(check_name, aggregate Column counting violating rows)."""
    c = check["column"]
    col = F.col(c)
    t = check["type"]
    z = F.lit(0).cast("long")  # sum over zero/all-NULL rows is NULL, not 0
    if t == "not_null":
        return f"not_null:{c}", F.coalesce(F.sum(col.isNull().cast("long")), z)
    if t == "unique":
        # duplicate rows beyond the first occurrence of each value
        return f"unique:{c}", F.count(col) - F.count_distinct(col)
    if t == "range":
        if "min" not in check and "max" not in check:
            raise ValueError(
                f"range check on {c!r} has neither 'min' nor 'max' — "
                "a bound-less range always passes (likely a config typo)"
            )
        cond = F.lit(False)
        if "min" in check:
            cond = cond | (col < F.lit(check["min"]))
        if "max" in check:
            cond = cond | (col > F.lit(check["max"]))
        # NULL comparisons yield NULL, not a violation (use not_null)
        return f"range:{c}", F.coalesce(F.sum(F.coalesce(cond, F.lit(False)).cast("long")), z)
    if t == "accepted_values":
        bad = (~col.isin(list(check["values"]))) & col.isNotNull()
        return f"accepted:{c}", F.coalesce(F.sum(bad.cast("long")), z)
    raise ValueError(f"unknown column check type {t!r}")


def check_constraints(df: DataFrame, checks: Sequence[Mapping[str, Any]]) -> DataFrame:
    """One row per check: (check_name, violations, passed).

    Column checks share ONE aggregation pass over ``df``;
    ``foreign_key`` checks union in one anti-join count each (the
    parent's distinct keys ride a size-gated broadcast — at real scale
    an oversized parent falls back to a shuffle join instead of OOMing).
    """
    spark = df.sparkSession
    col_checks = [c for c in checks if c["type"] != "foreign_key"]
    fk_checks = [c for c in checks if c["type"] == "foreign_key"]
    out = None
    if col_checks:
        named = [_column_check_expr(c) for c in col_checks]
        agg = df.agg(
            *[expr.cast("long").alias(f"__c{i}") for i, (_, expr) in enumerate(named)]
        )
        # unpivot via explode of literal structs — check names are
        # BOUND as literals, never interpolated into SQL text (a column
        # name with a quote must not break the generated plan)
        rows = F.array(
            *[
                F.struct(
                    F.lit(name).alias("check_name"),
                    F.col(f"__c{i}").alias("violations"),
                )
                for i, (name, _) in enumerate(named)
            ]
        )
        out = agg.select(F.explode(rows).alias("__r")).select(
            "__r.check_name", "__r.violations"
        )
    for c in fk_checks:
        child_col, parent, pk = c["column"], c["ref_df"], c["ref_column"]
        pkeys = parent.select(F.col(pk).alias(child_col)).distinct()
        orphans = (
            df.select(child_col)
            .filter(F.col(child_col).isNotNull())
            .join(gated_broadcast(pkeys), child_col, "left_anti")
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(
                F.lit(f"fk:{child_col}->{pk}").alias("check_name"),
                F.col("violations").cast("long"),
            )
        )
        out = orphans if out is None else out.unionByName(orphans)
    if out is None:
        raise ValueError("check_constraints: empty check list")
    return out.withColumn("passed", F.col("violations") == 0)
