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

#: Driver-side safety valve: a selection glob that accidentally matches
#: the whole lake must fail loud, not OOM the driver building a Python
#: list of 10^8 paths. Bulk mutations belong in a distributed job
#: (``foreachPartition``) against an object store, not in this
#: control-plane module.
MAX_CONTROL_FILES = 1_000_000


def _collect_paths(files: DataFrame, path_col: str, max_files: int):
    rows = files.select(path_col).limit(max_files + 1).collect()
    if len(rows) > max_files:
        raise ValueError(
            f"file-op selection exceeds max_files={max_files}; this is a "
            "driver-side control-plane op — narrow the selection or raise "
            "max_files explicitly if the driver can hold the path list"
        )
    return rows


def _result_df(spark, rows):
    return spark.createDataFrame(
        rows or [("", "", "")], "path string, status string, error string"
    ).filter("path != ''")


def backup_files(
    files: DataFrame,
    root: str,
    backup_dir: str,
    path_col: str = "path",
    max_files: int = MAX_CONTROL_FILES,
) -> DataFrame:
    """Tree-preserving copy (copy2 semantics) of selected files."""
    spark = files.sparkSession
    rootp = Path(root)
    rows = []
    for r in _collect_paths(files, path_col, max_files):
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


def rename_files(
    files: DataFrame,
    prefix: str,
    path_col: str = "path",
    max_files: int = MAX_CONTROL_FILES,
) -> DataFrame:
    """Prefix-rename selected files (reference ``rename`` op)."""
    spark = files.sparkSession
    rows = []
    for r in _collect_paths(files, path_col, max_files):
        src = Path(r[0])
        try:
            dest = src.with_name(prefix + src.name)
            src.rename(dest)
            rows.append((str(src), "success", None))
        except Exception as exc:
            rows.append((str(src), "failed", f"{type(exc).__name__}: {exc}"))
    return _result_df(spark, rows)


def delete_files(
    files: DataFrame,
    path_col: str = "path",
    dry_run: bool = True,
    max_files: int = MAX_CONTROL_FILES,
) -> DataFrame:
    """Delete selected files. ``dry_run=True`` by default — destructive
    ops opt in explicitly."""
    spark = files.sparkSession
    rows = []
    for r in _collect_paths(files, path_col, max_files):
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
