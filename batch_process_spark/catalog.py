"""TableStore — named tables with the reference's metadata semantics.

Reference: the in-memory pandas "table database"
(``utils/adapters/df_helpers.py:187-372`` write/append,
``:375-562`` read). Preserved semantics:

- per-table metadata: ``table_keys`` (default grouping keys),
  ``base_col_names`` (full schema / default projection), ``keys``
  (composite PK used for validation).
- append with schema alignment: new batches may add columns; missing
  columns on either side become NULL.
- extra-column attachment on write: scalars broadcast to every row.
- read = filter -> project -> group with metadata defaults:
  ``out_col`` defaults to ``base_col_names``; ``group_keys`` defaults
  to ``table_keys`` minus the filtered columns (a constant column is
  pointless to group on — reference ``df_helpers.py:443-448``).
- ``out_option``: ``"frame"`` (one DataFrame), ``"groups"``
  (grouped aggregate), ``"split"`` (list of (key_dict, sub_df)).

Spark-first: tables are DataFrames (optionally persisted parquet);
append is ``unionByName`` (no shuffle); reads compile to
filter/select/groupBy so Catalyst prunes and pushes down.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_spark.operators.filtering import filter_dataframe
from batch_process_spark.operators.grouping import split_by_groups
from batch_process_spark.operators.sets import union_align


@dataclass
class TableMeta:
    table_keys: list[str] = field(default_factory=list)
    base_col_names: list[str] = field(default_factory=list)
    keys: list[str] = field(default_factory=list)

    def merge(self, other: "TableMeta") -> "TableMeta":
        def _merged(a: list[str], b: list[str]) -> list[str]:
            return a + [x for x in b if x not in a]

        return TableMeta(
            table_keys=_merged(self.table_keys, other.table_keys),
            base_col_names=_merged(self.base_col_names, other.base_col_names),
            keys=_merged(self.keys, other.keys),
        )


class TableStore:
    """Catalog of named DataFrames + TableMeta."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}
        self._meta: dict[str, TableMeta] = {}

    # -- write path ------------------------------------------------------
    def write(
        self,
        name: str,
        df: DataFrame,
        extra_columns: Mapping[str, Any] | None = None,
        table_keys: Sequence[str] | None = None,
        keys: Sequence[str] | None = None,
    ) -> DataFrame:
        """Append ``df`` to table ``name`` with schema alignment.

        ``extra_columns`` scalars are broadcast onto every row before
        the append (reference ``df_helpers.py:233-269``). Metadata is
        created on first write and merged on later writes.
        """
        if extra_columns:
            for k, v in extra_columns.items():
                df = df.withColumn(k, v if isinstance(v, Column) else F.lit(v))
        incoming_meta = TableMeta(
            table_keys=list(table_keys or []),
            base_col_names=list(df.columns),
            keys=list(keys or []),
        )
        if name in self._tables:
            existing_cols = set(self._tables[name].columns)
            self._tables[name] = union_align([self._tables[name], df])
            self._meta[name] = self._meta[name].merge(incoming_meta)
        else:
            self._tables[name] = df
            self._meta[name] = incoming_meta
        bad = [k for k in self._meta[name].table_keys + self._meta[name].keys
               if k not in self._tables[name].columns]
        if bad:
            raise ValueError(f"table {name!r}: key columns missing from data: {bad}")
        return self._tables[name]

    # -- read path -------------------------------------------------------
    def read(
        self,
        name: str,
        filter_dict: Mapping[str, Any] | None = None,
        out_col: Sequence[str] | None = None,
        group_keys: Sequence[str] | None = None,
        out_option: str = "frame",
        aggs: Mapping[str, Column] | None = None,
    ):
        """filter -> project -> group with metadata defaults (A2)."""
        if name not in self._tables:
            raise KeyError(f"unknown table {name!r}")
        df, meta = self._tables[name], self._meta[name]
        filter_dict = dict(filter_dict or {})
        if filter_dict:
            df = filter_dataframe(df, filter_dict)
        if group_keys is None:
            group_keys = [k for k in meta.table_keys if k not in filter_dict]
        else:
            group_keys = list(group_keys)
        if out_col is None:
            out_col = [c for c in meta.base_col_names if c in df.columns]
        else:
            missing = [c for c in out_col if c not in df.columns]
            if missing:
                raise ValueError(f"out_col not in table {name!r}: {missing}")
            out_col = list(out_col)
        proj = list(dict.fromkeys([*group_keys, *out_col]))
        df = df.select(*proj)
        if out_option == "frame":
            return df
        if out_option == "split":
            return split_by_groups(df, group_keys)
        if out_option == "groups":
            aggs = aggs or {"n_rows": F.count(F.lit(1))}
            return df.groupBy(*group_keys).agg(*[c.alias(n) for n, c in aggs.items()])
        raise ValueError(f"out_option must be frame|split|groups, got {out_option!r}")

    # -- persistence -----------------------------------------------------
    def save(self, root: str) -> None:
        """Materialize every table to parquet + a metadata JSON sidecar
        (the durable form of the reference's in-memory dict-of-frames)."""
        import json
        import os

        os.makedirs(root, exist_ok=True)
        meta = {}
        for name, df in self._tables.items():
            df.write.mode("overwrite").parquet(os.path.join(root, name + ".parquet"))
            m = self._meta[name]
            meta[name] = {
                "table_keys": m.table_keys,
                "base_col_names": m.base_col_names,
                "keys": m.keys,
            }
        with open(os.path.join(root, "_catalog.json"), "w", encoding="utf-8") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "TableStore":
        import json
        import os

        store = cls(spark)
        with open(os.path.join(root, "_catalog.json"), encoding="utf-8") as f:
            meta = json.load(f)
        for name, m in meta.items():
            store._tables[name] = spark.read.parquet(os.path.join(root, name + ".parquet"))
            store._meta[name] = TableMeta(**m)
        return store

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    def meta(self, name: str) -> TableMeta:
        return self._meta[name]

    def names(self) -> list[str]:
        return sorted(self._tables)
