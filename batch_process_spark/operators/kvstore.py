"""Key-value record store surface (the reference's pluggable table
backend, ``deprecated/table_backend.py:17-188`` and
``deprecated/simple_table_backend.py:36-170``).

Records were bucketed by a JSON-serialized key dict and re-selected
with the selector mini-language. Distributed, the whole mechanism
collapses: keys are ordinary columns, a write is an aligned append,
and a read is one ``filter`` + ``select`` — the flattened
``"<json-keys>_data_<idx>"`` output shape disappears because the key
columns travel with every row.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_spark.operators.filtering import select_records
from batch_process_spark.operators.sets import union_align


class KVStore:
    """Records with arbitrary key columns + payload columns."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._df: DataFrame | None = None

    def put(self, keys: Mapping[str, Any], records: Sequence[Mapping[str, Any]] | DataFrame) -> None:
        """Store records under a key dict; keys become columns
        broadcast onto every record row."""
        if isinstance(records, DataFrame):
            df = records
        else:
            df = self.spark.createDataFrame([dict(r) for r in records])
        for k, v in keys.items():
            df = df.withColumn(k, F.lit(v))
        self._df = df if self._df is None else union_align([self._df, df])

    def get(self, selectors: Mapping[str, Any] | None = None, columns: Sequence[str] | None = None) -> DataFrame:
        """Read records whose key columns match the selectors
        (``None``/callable/list/``re:``/``in:``/glob/exact)."""
        if self._df is None:
            raise ValueError("empty store")
        out = select_records(self._df, selectors or {})
        return out.select(*columns) if columns else out

    def keys(self, key_cols: Sequence[str]) -> DataFrame:
        if self._df is None:
            raise ValueError("empty store")
        return self._df.select(*key_cols).distinct()
