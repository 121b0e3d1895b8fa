"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``batch_process_spark.queries`` (one entry per implemented SURVEY §2
operator, DuckDB-oracle-checked at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batch_process_spark.queries import ORACLES, QUERIES
import batch_process_spark.queries_ext  # noqa: F401  (registers part-2 queries)
import batch_process_spark.queries_ext2  # noqa: F401  (registers part-3 queries)
import batch_process_spark.queries_ext3  # noqa: F401  (registers part-4 queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted => rows-only check)."""
    return dict(ORACLES)
