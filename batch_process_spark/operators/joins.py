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
