"""File-tree source: the reference's recursive scan as a DataFrame.

- ``file_tree_df`` — one row per file AND directory (the reference
  visits both), with ``relpath``, ``level0..levelN``, ``is_dir``,
  ``size``, ``mtime``, ``ext``, ``name``. Listing happens driver-side
  (metadata only; trees of millions of entries should come from a
  storage inventory / ``binaryFile`` listing instead — the columns and
  rule semantics are identical).
- ``match_rule`` — the reference's glob-rule semantics
  (``core/engine.py:439-462``) compiled to a Column predicate:
  ``**`` globstar, ``*``/``?``/``[...]`` within a segment, trailing
  ``/`` = directories only, ``"."`` = the root itself, patterns are
  relative to the scan root.
- ``read_tree_texts`` — whole-file text per file via Spark's
  ``binaryFile`` source (distributed read; UTF-8 errors ignored, the
  reference's ``safe_read_text``).
- ``label_dimension`` / ``attach_labels`` — the ``_dict.txt`` /
  ``.cate`` label+category enrichment (S12/J1) as a broadcast join.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_spark.operators.filtering import scan_char_class, translate_char_class

MAX_LEVELS = 8


def file_tree_df(
    spark: SparkSession, root: str, max_levels: int = MAX_LEVELS
) -> DataFrame:
    """Scan ``root`` recursively into a DataFrame of files + dirs."""
    rootp = Path(root)
    # The scan root itself is a visitable node (relpath ""): the
    # reference hangs pre-processor rules on "." and runs them at the
    # root, so the root must exist as a row for match_rule(".") to hit.
    root_st = rootp.stat()
    rows = [(str(rootp), "", True, 0, int(root_st.st_mtime))]
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for name in sorted(dirnames):
            p = Path(dirpath) / name
            st = p.stat()
            rows.append((str(p), p.relative_to(rootp).as_posix(), True, 0, int(st.st_mtime)))
        for name in sorted(filenames):
            p = Path(dirpath) / name
            st = p.stat()
            rows.append(
                (str(p), p.relative_to(rootp).as_posix(), False, st.st_size, int(st.st_mtime))
            )
    df = spark.createDataFrame(
        rows, "path string, relpath string, is_dir boolean, size long, mtime long"
    )
    parts = F.split(F.col("relpath"), "/")
    df = df.withColumn("name", F.element_at(parts, -1)).withColumn(
        "ext",
        F.when(
            F.col("name").contains(".") & ~F.col("is_dir"),
            F.regexp_extract(F.col("name"), r"\.([^.]+)$", 1),
        ).otherwise(F.lit("")),
    )
    for i in range(max_levels):
        df = df.withColumn(
            f"level{i}",
            F.when((F.col("relpath") != "") & (F.size(parts) > i), F.element_at(parts, i + 1)),
        )
    return df


def glob_to_tree_regex(pattern: str) -> str:
    """Reference rule glob -> regex over the relative posix path.

    ``**`` crosses directory separators; ``*``/``?`` stay within one
    segment; character classes pass through.
    """
    out = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "*":
            if i + 1 < n and pattern[i + 1] == "*":
                # '**/' matches zero or more whole segments
                if i + 2 < n and pattern[i + 2] == "/":
                    out.append(r"(?:[^/]+/)*")
                    i += 2
                else:
                    out.append(r".*")
                    i += 1
            else:
                out.append(r"[^/]*")
        elif ch == "?":
            out.append(r"[^/]")
        elif ch == "[":
            # classes delegate to fnmatch's own translation so every
            # edge case (leading-']' literal, '!' negation, literal '^',
            # invalid ranges -> never-match) agrees with CPython
            j = scan_char_class(pattern, i)
            if j < 0:
                out.append(re.escape("["))
            else:
                out.append(translate_char_class(pattern[i : j + 1]))
                i = j
        else:
            out.append(re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


def match_rule(pattern: str) -> Column:
    """Rule pattern -> boolean Column over (relpath, is_dir) columns."""
    if pattern == ".":
        # the scan root: file_tree_df emits it with relpath ""; accept a
        # literal "." too for frames built by other producers
        return F.col("relpath").isin("", ".")
    dir_only = pattern.endswith("/")
    if dir_only:
        pattern = pattern.rstrip("/")
    rx = glob_to_tree_regex(pattern)
    # only the explicit "." rule selects the scan root: '*'/'**'/'*/'
    # match the empty relpath as regexes, but a broad glob must never
    # hand the root itself to file ops (rename/delete of the scan root)
    pred = (F.col("relpath") != "") & F.col("relpath").rlike(rx)
    if dir_only:
        pred = pred & F.col("is_dir")
    return pred


def read_tree_texts(
    spark: SparkSession, root: str, glob: str | None = None, max_levels: int = MAX_LEVELS
) -> DataFrame:
    """Distributed whole-file text read under ``root`` (files only).

    Uses the binaryFile source (pushdown on pathGlobFilter) + UTF-8
    decode with errors ignored — the reference's lenient
    ``safe_read_text`` (``utils/io_helpers.py:5-9``).

    Note: Spark's file index skips ``_``- and ``.``-prefixed names
    (Hadoop metadata convention), so control files like ``_dict.txt``
    are invisible here — by design: they are read driver-side by
    ``label_dimension`` (os.walk), which does see them.
    """
    import pandas as pd

    reader = (
        spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    bin_df = reader.load(root).select(
        F.col("path"), F.col("length").alias("size"), F.col("content")
    )

    rootstr = str(Path(root).resolve())

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = [
                (bytes(b) if b is not None else b"").decode("utf-8", errors="ignore")
                for b in pdf["content"]
            ]
            paths = [re.sub(r"^file:", "", p) for p in pdf["path"]]
            rels = [
                os.path.relpath(p, rootstr).replace(os.sep, "/") for p in paths
            ]
            yield pd.DataFrame(
                {"path": paths, "relpath": rels, "size": pdf["size"], "text": texts}
            )

    df = bin_df.mapInPandas(decode, "path string, relpath string, size long, text string")
    parts = F.split(F.col("relpath"), "/")
    df = df.withColumn("name", F.element_at(parts, -1)).withColumn(
        "ext",
        F.when(
            F.col("name").contains("."),
            F.regexp_extract(F.col("name"), r"\.([^.]+)$", 1),
        ).otherwise(F.lit("")),
    )
    for i in range(max_levels):
        df = df.withColumn(
            f"level{i}", F.when(F.size(parts) > i, F.element_at(parts, i + 1))
        )
    return df


# ---------------------------------------------------------------------------
# label / category dimension (S12)
# ---------------------------------------------------------------------------

_DICT_LINE = re.compile(r"^\s*([^#,\s]+)\s*[,\s]\s*(.+?)\s*$")


def parse_dict_text(text: str) -> list[tuple[str, str]]:
    """Parse ``_dict.txt`` content: ``name label`` per line, comma or
    whitespace separated, ``#`` comments, malformed lines skipped
    (reference ``processors/file_ops.py:226-248``)."""
    out = []
    for line in text.splitlines():
        if line.strip().startswith("#"):
            continue
        m = _DICT_LINE.match(line)
        if m:
            out.append((m.group(1), m.group(2)))
    return out


def label_dimension(
    spark: SparkSession, root: str, dict_name: str = "_dict.txt", category_suffix: str = ".cate"
) -> DataFrame:
    """Build the (dir, name, label, category) dimension from mapping
    files in the tree (driver-side: these are tiny control files)."""
    rows = []
    rootp = Path(root)
    for dirpath, _dirnames, filenames in os.walk(root):
        reldir = Path(dirpath).relative_to(rootp).as_posix()
        reldir = "" if reldir == "." else reldir
        category = None
        for fn in filenames:
            if fn.endswith(category_suffix):
                category = fn[: -len(category_suffix)]
        if dict_name in filenames:
            text = (Path(dirpath) / dict_name).read_text(encoding="utf-8", errors="ignore")
            for name, label in parse_dict_text(text):
                rows.append((reldir, name, label, category))
    return spark.createDataFrame(
        rows, "dir string, name string, label string, category string"
    )


def attach_labels(tree: DataFrame, dim: DataFrame) -> DataFrame:
    """Broadcast-join labels/categories onto the tree; label falls back
    to the file name (the reference's ``dict.get(name, name)``)."""
    t = tree.withColumn(
        "dir",
        F.when(
            F.col("relpath").contains("/"),
            F.regexp_replace(F.col("relpath"), r"/[^/]+$", ""),
        ).otherwise(F.lit("")),
    )
    out = t.join(F.broadcast(dim), on=["dir", "name"], how="left")
    return out.withColumn("label", F.coalesce(F.col("label"), F.col("name")))
