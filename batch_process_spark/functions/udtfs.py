"""Python UDTFs (user-defined TABLE functions, Spark 4 ``@udtf``).

The reference's §2.12 surface lets a plugin emit multiple records per
input (``plans/registry.py`` models that for pipelines; the Arrow
1->N kernels in ``sources/struct_text.py`` / ``operators/multimodal.py``
are the hot-path form). This module exposes the ENGINE-NATIVE
table-function interface on top: a registered UDTF is callable from
SQL (``SELECT * FROM sentence_split(col)`` / LATERAL joins), which the
mapInPandas kernels are not.

Scale note: UDTFs evaluate row-at-a-time in Python workers — the slow
path by design. Use them for API parity and moderate row counts; for
corpus-scale 1->N transforms prefer the Arrow kernels (chunking,
struct_text.parse_files) which batch through Arrow.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

#: Sentence-boundary rewrite shared with the DuckDB oracle: RE2 (DuckDB)
#: has no lookbehind, so BOTH engines mark boundaries by rewriting
#: "[.!?]<ws>" to "[.!?]\\x01" and splitting on \\x01 — identical
#: semantics without lookbehind on either side.
_BOUNDARY = re.compile(r"([.!?])\s+")


@udtf(returnType="idx int, sentence string, n_tokens int")
class SentenceSplit:
    """text -> one row per sentence with its index and token count.

    Token count matches the catalog's split-on-single-space convention
    (q152/q21): ``len([t for t in s.split(' ') if t])``.
    """

    def eval(self, text: str):  # noqa: D102 — contract is the class doc
        if text is None:
            return
        marked = _BOUNDARY.sub("\\1\x01", text)
        idx = 0
        for s in marked.split("\x01"):
            if not s:
                continue
            yield idx, s, len([t for t in s.split(" ") if t])
            idx += 1


@udtf(returnType="idx int, window string, n_tokens int")
class TokenWindows:
    """text -> overlapping token windows of ``width`` every ``stride``
    tokens (the sliding-context shape an LLM-data pipeline cuts for
    training windows; the non-overlapping Arrow twin is
    ``operators/chunking.py``). Window starts at 0, stride, 2*stride,
    ... while start < n_tokens; the tail window may be short. Tokens
    are the catalog's split-on-single-space convention."""

    def eval(self, text: str, width: int, stride: int):
        if text is None or width is None or stride is None or stride <= 0 or width <= 0:
            return
        toks = [t for t in text.split(" ") if t]
        idx = 0
        for s in range(0, len(toks), stride):
            w = toks[s : s + width]
            yield idx, " ".join(w), len(w)
            idx += 1


def register_udtfs(spark: SparkSession) -> None:
    """Register every engine UDTF on the session (idempotent)."""
    spark.udtf.register("sentence_split", SentenceSplit)
    spark.udtf.register("token_windows", TokenWindows)
