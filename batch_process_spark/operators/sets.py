"""Set operations with schema alignment.

Reference: append-to-table (``utils/adapters/df_helpers.py:187-372``)
concatenates frames whose columns differ, filling missing columns with
NA. Spark-first: ``unionByName(allowMissingColumns=True)`` — a
zero-shuffle operation (pure union of partitions).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame


def union_align(frames: Sequence[DataFrame]) -> DataFrame:
    """Union any number of frames by column name; columns missing from a
    frame become NULL (reference's schema-alignment append)."""
    if not frames:
        raise ValueError("union_align needs at least one frame")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def intersect_keys(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key-level intersection (free generalization the reference lacks)."""
    return a.select(*keys).distinct().intersect(b.select(*keys).distinct())


def except_keys(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key-level difference."""
    return a.select(*keys).distinct().exceptAll(b.select(*keys).distinct())
