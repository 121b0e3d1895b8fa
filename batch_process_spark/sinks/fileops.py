"""File operations (K9): backup / rename / delete over selected files.

Control-plane operations: selection is a DataFrame (the file-tree frame
filtered by rules), the filesystem mutation runs driver-side over the
collected path list — these are small control sets, and mutating shared
filesystems from executors invites partial-failure chaos. Each op
returns a result DataFrame (path, status, error) — errors-as-data,
mirroring ``processors/file_ops.py:28-168``.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame


def _result_df(spark, rows):
    return spark.createDataFrame(
        rows or [("", "", "")], "path string, status string, error string"
    ).filter("path != ''")


def backup_files(files: DataFrame, root: str, backup_dir: str, path_col: str = "path") -> DataFrame:
    """Tree-preserving copy (copy2 semantics) of selected files."""
    spark = files.sparkSession
    rootp = Path(root)
    rows = []
    for r in files.select(path_col).collect():
        src = Path(r[0])
        try:
            rel = src.relative_to(rootp)
            dest = Path(backup_dir) / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dest)
            rows.append((str(src), "success", None))
        except Exception as exc:
            rows.append((str(src), "failed", f"{type(exc).__name__}: {exc}"))
    return _result_df(spark, rows)


def rename_files(files: DataFrame, prefix: str, path_col: str = "path") -> DataFrame:
    """Prefix-rename selected files (reference ``rename`` op)."""
    spark = files.sparkSession
    rows = []
    for r in files.select(path_col).collect():
        src = Path(r[0])
        try:
            dest = src.with_name(prefix + src.name)
            src.rename(dest)
            rows.append((str(src), "success", None))
        except Exception as exc:
            rows.append((str(src), "failed", f"{type(exc).__name__}: {exc}"))
    return _result_df(spark, rows)


def delete_files(files: DataFrame, path_col: str = "path", dry_run: bool = True) -> DataFrame:
    """Delete selected files. ``dry_run=True`` by default — destructive
    ops opt in explicitly."""
    spark = files.sparkSession
    rows = []
    for r in files.select(path_col).collect():
        src = Path(r[0])
        try:
            if dry_run:
                rows.append((str(src), "would_delete", None))
            else:
                src.unlink()
                rows.append((str(src), "success", None))
        except Exception as exc:
            rows.append((str(src), "failed", f"{type(exc).__name__}: {exc}"))
    return _result_df(spark, rows)
