"""Nested-structure functions.

The reference's nested-dict toolbox (``utils/nested_dicts.py:17-226``:
path get/set, flatten with separator keys, unflatten) maps onto Spark
types: nested dicts are ``StructType``/``MapType`` columns, and
flatten/unflatten become schema transforms:

- ``flatten_struct``  — struct/nested-struct columns -> flat columns
  with separator-joined names (``a.b.c`` -> ``a_b_c``).
- ``unflatten_struct`` — inverse: grouped flat columns -> one struct.
- ``explode_map``      — MapType -> (key, value) rows.
- ``json_to_struct`` / ``struct_to_json`` — JSON-blob columns.

All pure projections; no data movement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_struct(df: DataFrame, sep: str = "_", max_depth: int = 10) -> DataFrame:
    """Recursively flatten all struct columns into top-level columns
    with ``sep``-joined names (the reference's ``flatten_dict``)."""
    for _ in range(max_depth):
        struct_fields = [f for f in df.schema.fields if isinstance(f.dataType, T.StructType)]
        if not struct_fields:
            break
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                for sub in f.dataType.fields:
                    cols.append(F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}"))
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)
    return df


def unflatten_struct(df: DataFrame, prefixes: list[str], sep: str = "_") -> DataFrame:
    """Group ``prefix<sep>*`` columns back into one struct column per
    prefix (the reference's ``unflatten_dict``)."""
    out_cols = []
    used: set[str] = set()
    for prefix in prefixes:
        members = [c for c in df.columns if c.startswith(prefix + sep)]
        if not members:
            raise ValueError(f"no columns with prefix {prefix!r}")
        used.update(members)
        out_cols.append(
            F.struct(*[F.col(f"`{c}`").alias(c[len(prefix) + len(sep):]) for c in members]).alias(prefix)
        )
    rest = [F.col(f"`{c}`") for c in df.columns if c not in used]
    return df.select(*rest, *out_cols)


def explode_map(df: DataFrame, map_col: str, key_alias: str = "key", value_alias: str = "value") -> DataFrame:
    """MapType column -> one row per entry."""
    return df.select(
        *[c for c in df.columns if c != map_col],
        F.explode(F.col(map_col)).alias(key_alias, value_alias),
    )


def json_to_struct(col: Column | str, schema: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def struct_to_json(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(c)


def get_path(col: Column | str, path: str, sep: str = ".") -> Column:
    """Path-addressed nested access (``context.get(['a','b'])``)."""
    c = F.col(col) if isinstance(col, str) else col
    for part in path.split(sep):
        c = c.getField(part)
    return c
