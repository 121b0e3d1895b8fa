"""Column prepend / reorder operators.

Reference: ``prepend_dict_columns`` (``utils/adapters/df_helpers.py:126-181``)
inserts a dict of columns at the front of a frame; scalars broadcast,
sequences must match the row count; existing columns may be overwritten.

Spark-first translation: scalars become ``F.lit`` projections (pure
Catalyst, no shuffle). Per-row sequences have no scalable equivalent of
"assign by position" — positional identity is not a distributed concept —
so they are supported only via an explicit zip on a deterministic order
column, documented as a small-data path.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prepend_columns(df: DataFrame, kv: Mapping[str, Any]) -> DataFrame:
    """Prepend scalar/Column values as leading columns (overwriting any
    same-named column, preserving its new front position)."""
    front = []
    for name, val in kv.items():
        col = val if isinstance(val, Column) else F.lit(val)
        front.append(col.alias(name))
    rest = [c for c in df.columns if c not in kv]
    return df.select(*front, *rest)


#: URI scheme per RFC 3986: letter, then letters/digits/+/-/. — the
#: digit matters (s3/s3a/o3fs), a plain [a-z]+ misses cloud schemes.
_SCHEME_RX = "^[a-zA-Z][a-zA-Z0-9+.-]*:/*"


def with_provenance(
    df: DataFrame,
    file_col: str = "source_file",
    row_col: str | None = None,
) -> DataFrame:
    """Attach source-file provenance — the lineage every training-data
    pipeline needs to trace an example back to its shard.

    ``file_col``: the originating file path (scheme-stripped so it
    compares equal across engines/filesystems). ``row_col`` (optional):
    the row's position WITHIN its file. When ``df`` is a direct file
    scan, both come from the source's hidden ``_metadata`` column
    (exact file row index, stable under any later repartitioning).
    Otherwise the fallback is ``input_file_name`` + a per-file window
    over ``monotonically_increasing_id`` — which reflects true in-file
    position ONLY if ``df`` has not been shuffled since the scan; call
    this right after the read.
    """
    try:
        # native path: exact and shuffle-proof, but _metadata resolves
        # only on a file-source scan
        out = df.withColumn(
            file_col, F.regexp_replace(F.col("_metadata.file_path"), _SCHEME_RX, "/")
        )
        if row_col:
            out = out.withColumn(row_col, F.col("_metadata.row_index"))
        return out
    except Exception:
        pass
    out = df.withColumn(
        file_col, F.regexp_replace(F.input_file_name(), _SCHEME_RX, "/")
    )
    if row_col:
        w = Window.partitionBy(file_col).orderBy(F.monotonically_increasing_id())
        out = out.withColumn(row_col, F.row_number().over(w) - 1)
    return out


def prepend_sequence_columns(
    df: DataFrame,
    kv: Mapping[str, Sequence],
    order_by: str | Sequence[str],
) -> DataFrame:
    """Prepend per-row sequences aligned to ``order_by`` rank order.

    The reference aligns sequences by positional index of the pandas
    frame; distributed frames have no stable position, so the caller
    names the ordering column(s). Values are shipped as an array literal
    and indexed by ``row_number`` — intended for small control tables
    (the reference's use case), not bulk data.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    n = df.count()
    if n > 100_000:
        # each sequence ships as an n-element array literal inside the
        # plan AND the row_number window is global (single task) — both
        # are control-table shapes, not bulk-data ones
        raise ValueError(
            f"prepend_sequence_columns is for small control tables; got {n} rows "
            "(literal-array + global-window shape). Join a proper mapping table instead."
        )
    for name, seq in kv.items():
        if len(seq) != n:
            raise ValueError(
                f"sequence for {name!r} has {len(seq)} items, DataFrame has {n} rows"
            )
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    idx = F.row_number().over(w) - F.lit(1)
    out = df.withColumn("__pos__", idx)
    front = []
    for name, seq in kv.items():
        arr = F.array(*[F.lit(v) for v in seq])
        out = out.withColumn(name, F.element_at(arr, F.col("__pos__") + 1))
        front.append(name)
    rest = [c for c in df.columns if c not in kv]
    return out.select(*front, *rest)
