"""Scan-time audit metrics via Spark's Observation API — counters that
ride the SAME action as the query instead of costing a second scan.

The reference appends a results row per processor call
(``decorators/processor.py:43-44``) — cheap when everything is one
process. The distributed equivalent CANNOT be "run the pipeline, then
run count()/null-count() again": at 100 TB every audit re-scan is a
full pass over the fact table. ``df.observe`` attaches aggregate
expressions to the plan as accumulator-style metrics collected DURING
whatever action executes the frame (write, count, foreachBatch) — the
audit is free, the numbers arrive with the job.

Contract notes (probed, pinned by tests):
- metrics materialize only after an ACTION runs the observed frame;
  ``Observation.get`` blocks until then;
- expressions must be aggregates over the observed plan node — they
  see rows AT THE POINT OF ATTACHMENT, so attach before a filter to
  audit what the filter drops;
- one Observation instance binds to one DataFrame once (Spark enforces
  uniqueness); ``scan_audit`` makes a fresh one per call.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def scan_audit(
    df: DataFrame, metrics: Mapping[str, Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach audit metrics to ``df``; returns (observed_df, observation).
    Run any action on the returned frame, then read
    ``observation.get`` — a dict — at zero extra scans.

    Default metrics: ``n_rows`` plus a ``null_<col>`` count for every
    top-level column (the data-quality intake staple). Pass ``metrics``
    to override with any aggregate expressions."""
    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
        for c in df.columns:
            # backtick-quote: a raw name containing dots would parse as
            # struct-field access ('user.id' -> field id of column user)
            # — exactly the messy intake names this audit exists for
            metrics[f"null_{c}"] = F.sum(
                F.col("`" + c + "`").isNull().cast("long")
            )
    obs = Observation()
    named = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *named), obs


def audited_write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> dict:
    """Write ``df`` to parquet and return the audit dict from the SAME
    job — row count and per-column null counts with no second scan of
    the input (the write IS the action that fills the metrics)."""
    observed, obs = scan_audit(df)
    observed.write.mode(mode).parquet(path)
    return dict(obs.get)
