"""Multi-condition filter compiler + selector mini-language.

Re-expresses two reference mechanisms as Catalyst ``Column`` expressions
(so predicate pushdown / pruning stay free):

- ``filter_dataframe`` — per-column conditions combined with and/or
  (reference: ``utils/adapters/df_helpers.py:9-77``). Condition forms:
  ``None`` => IS NULL, scalar => equality, list/tuple/set => membership,
  ``Column`` => used as-is, callable => called with the Column.
- selector mini-language of the key-value backend
  (reference: ``deprecated/table_backend.py:73-108`` and
  ``deprecated/simple_table_backend.py:102-123``): ``"re:PAT"`` regex,
  ``"in:SUB"`` substring, glob strings, exact scalars, membership lists.

All compilation is driver-side string/Column manipulation; nothing here
executes per-row Python.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _compile_condition(col: Column, cond: Any) -> Column:
    """One column condition -> boolean Column (NULL-safe: a NULL result
    never satisfies the filter, matching the reference's NaN=>False)."""
    if cond is None:
        return col.isNull()
    if isinstance(cond, Column):
        return cond
    if callable(cond):
        out = cond(col)
        if not isinstance(out, Column):
            raise TypeError("callable condition must return a Column")
        return out
    if isinstance(cond, (list, tuple, set, frozenset)):
        return col.isin(list(cond))
    return col == F.lit(cond)


def filter_dataframe(
    df: DataFrame,
    conditions: Mapping[str, Any],
    combine: str = "and",
) -> DataFrame:
    """Filter ``df`` by per-column conditions.

    ``combine`` is ``"and"`` or ``"or"``. Unknown columns raise
    ``ValueError`` (reference validates the same way). NULL comparison
    results count as non-matches under both combiners (Spark's ternary
    logic gives this for AND; for OR we coalesce each predicate to
    False so one NULL cannot poison the disjunction).
    """
    if combine not in ("and", "or"):
        raise ValueError(f"combine must be 'and' or 'or', got {combine!r}")
    missing = [c for c in conditions if c not in df.columns]
    if missing:
        raise ValueError(f"filter columns not in DataFrame: {missing}")
    if not conditions:
        return df
    preds = [_compile_condition(F.col(c), v) for c, v in conditions.items()]
    if combine == "and":
        expr = reduce(lambda a, b: a & b, preds)
    else:
        preds = [F.coalesce(p, F.lit(False)) for p in preds]
        expr = reduce(lambda a, b: a | b, preds)
    return df.filter(expr)


_GLOB_CHARS = re.compile(r"[*?\[]")


def translate_char_class(cls: str) -> str:
    """Delegate a complete ``[...]`` glob class to ``fnmatch.translate``
    so every edge case matches CPython's semantics exactly: ``!``
    negation, leading-``]`` literal member, literal ``^`` (escaped, NOT
    negation), and invalid ranges like ``[b-.]`` becoming ``(?!)``
    (match nothing) instead of a regex compile error at query time.
    Property-tested against fnmatch in ``test_property_globs``."""
    import fnmatch

    t = fnmatch.translate(cls)
    # translate wraps as '(?s:...)\\Z' on CPython 3.8+
    if t.startswith("(?s:") and t.endswith(")\\Z"):
        return t[4:-3]
    return re.escape(cls)  # unexpected shape: fall back to literal


def scan_char_class(pattern: str, i: int) -> int:
    """Index of the closing ``]`` of the class starting at ``i`` (which
    must hold '['), or -1 if unterminated — fnmatch scanning rules: a
    ``]`` directly after ``[`` or ``[!`` is a literal member."""
    n = len(pattern)
    j = i + 1
    if j < n and pattern[j] == "!":
        j += 1
    if j < n and pattern[j] == "]":
        j += 1
    while j < n and pattern[j] != "]":
        j += 1
    return j if j < n else -1


def glob_to_regex(pattern: str) -> str:
    """fnmatch-style glob -> anchored Java-compatible regex."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch == "[":
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


def compile_selector(col: Column, selector: Any) -> Column:
    """Selector mini-language -> boolean Column.

    ``None`` matches everything; callables receive the Column;
    lists/tuples are membership; ``"re:PAT"`` regex search (unanchored);
    ``"in:SUB"`` substring; strings containing ``* ? [`` glob-match;
    anything else is exact equality.
    """
    if selector is None:
        return F.lit(True)
    if isinstance(selector, Column):
        return selector
    if callable(selector):
        return selector(col)
    if isinstance(selector, (list, tuple, set, frozenset)):
        return col.isin(list(selector))
    if isinstance(selector, str):
        if selector.startswith("re:"):
            return col.rlike(selector[3:])
        if selector.startswith("in:"):
            return col.contains(selector[3:])
        if _GLOB_CHARS.search(selector):
            return col.rlike(glob_to_regex(selector))
        return col == F.lit(selector)
    return col == F.lit(selector)


def select_records(df: DataFrame, selectors: Mapping[str, Any]) -> DataFrame:
    """Apply a dict of column->selector (the reference's ``get_tables``
    read path, ``deprecated/table_backend.py:110-184``) as one filter.

    Reference nuance (``_match_value``): a list/tuple selector against a
    SEQUENCE-typed stored value means sequence equality, not membership —
    resolvable here because the schema is known."""
    from pyspark.sql.types import ArrayType

    missing = [c for c in selectors if c not in df.columns]
    if missing:
        raise ValueError(f"selector columns not in DataFrame: {missing}")
    preds = []
    for c, s in selectors.items():
        if isinstance(s, (list, tuple)) and isinstance(df.schema[c].dataType, ArrayType):
            preds.append(F.col(c) == F.array(*[F.lit(v) for v in s]))
        else:
            preds.append(compile_selector(F.col(c), s))
    if not preds:
        return df
    return df.filter(reduce(lambda a, b: a & b, preds))
