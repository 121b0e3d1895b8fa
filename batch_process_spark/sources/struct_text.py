"""Declarative struct-text parser combinators.

A small schema language for extracting records from semi-structured
line-oriented reports. Re-implemented from the reference's
specification-by-test (the implementation file is absent from the
snapshot): ``__test_struct_text_parser.py:19-213`` defines the API —
``Field`` (regex + converter + ``group_labels``/``labels``/named
groups), ``Optional``, ``OneOf`` (first match wins), ``Repeat(until=)``
producing lists of dicts, ``parse_text(text, schema, key_end)`` ->
records, and ``flatten_to_dataframe(records, explode_field)``.

Semantics (as pinned by the spec tests):

- A record starts where the first schema element matches a line.
- ``Field``: regex on one line. No capture group => presence flag
  (key: label -> True). One group => converted scalar under ``label``.
  Multiple groups with ``group_labels``/``labels`` => one key per
  group. Named groups ``(?P<name>...)`` => keys by group name, the
  field label itself is NOT emitted.
- Required fields scan forward (skipping junk lines) until they match,
  the record terminator matches, a new record starts, or EOF.
- ``Optional``: tried on the current line only; skipped silently.
- ``OneOf``: alternatives tried in order on the current line.
- ``Repeat(items, until)``: loops items until ``until`` matches (the
  terminator line is NOT consumed); non-matching lines are skipped.
- ``key_end``: hard record terminator (consumed).
- ``nmatchmax``: cap on the number of records parsed.

Driver-side this is plain Python; at scale it runs inside
``mapInPandas`` over whole-file text rows (one Arrow batch of files in,
N parsed records out) — see ``parse_files``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable, Iterator, Sequence


@dataclass
class Field:
    label: str
    pattern: str
    converter: Callable[[str], Any] = str
    group_labels: Sequence[str] | None = None
    labels: Sequence[str] | None = None  # synonym accepted by the spec

    def __post_init__(self):
        self._rx = re.compile(self.pattern)

    def try_match(self, line: str, use_search: bool) -> dict | None:
        m = self._rx.search(line) if use_search else self._rx.match(line)
        if not m:
            return None
        named = m.groupdict()
        if named:
            return {k: self._convert(v) for k, v in named.items() if v is not None}
        groups = m.groups()
        if not groups:
            return {self.label: True}
        multi = self.group_labels or self.labels
        if multi:
            if len(multi) != len(groups):
                raise ValueError(
                    f"field {self.label!r}: {len(multi)} labels for {len(groups)} groups"
                )
            return {k: self._convert(v) for k, v in zip(multi, groups)}
        if len(groups) == 1:
            return {self.label: self._convert(groups[0])}
        return {self.label: tuple(self._convert(g) for g in groups)}

    def _convert(self, v):
        if v is None:
            return None
        try:
            return self.converter(v)
        except (TypeError, ValueError):
            return v  # lenient: keep raw text on conversion failure


@dataclass
class Optional:
    inner: "Field | OneOf"


@dataclass
class OneOf:
    alternatives: Sequence["Field"]

    def try_match(self, line: str, use_search: bool) -> dict | None:
        for alt in self.alternatives:
            out = alt.try_match(line, use_search)
            if out is not None:
                return out
        return None


@dataclass
class Repeat:
    label: str
    items: Sequence["Field | OneOf"]
    until: str

    def __post_init__(self):
        self._until_rx = re.compile(self.until)


def _first_field(schema) -> Field:
    head = schema[0]
    if isinstance(head, Optional):
        head = head.inner
    if isinstance(head, OneOf):
        return head.alternatives[0]
    if isinstance(head, Repeat):
        raise ValueError("schema cannot start with Repeat")
    return head


def parse_text(
    text: str,
    schema: Sequence,
    key_end: str | None = None,
    use_search: bool = False,
    nmatchmax: int | None = None,
) -> list[dict]:
    """Parse ``text`` into a list of record dicts per the schema."""
    lines = text.splitlines()
    n = len(lines)
    start_rx = _first_field(schema)._rx
    end_rx = re.compile(key_end) if key_end else None

    def matches_start(line: str) -> bool:
        return bool(start_rx.search(line) if use_search else start_rx.match(line))

    records: list[dict] = []
    i = 0
    while i < n:
        if not matches_start(lines[i]):
            i += 1
            continue
        record: dict = {}
        terminated = False
        j = i
        for ei, elem in enumerate(schema):
            if terminated or j >= n:
                break
            if isinstance(elem, Optional):
                out = elem.inner.try_match(lines[j], use_search) if j < n else None
                if out is not None:
                    record.update(out)
                    j += 1
                continue
            if isinstance(elem, Repeat):
                items: list[dict] = []
                while j < n:
                    if elem._until_rx.search(lines[j]):
                        break  # terminator NOT consumed
                    if end_rx and end_rx.search(lines[j]):
                        j += 1
                        terminated = True
                        break
                    matched = None
                    for it in elem.items:
                        matched = it.try_match(lines[j], use_search)
                        if matched is not None:
                            break
                    if matched is not None:
                        items.append(matched)
                    j += 1  # consume matched or skip junk
                record[elem.label] = items
                continue
            # Field / OneOf: required — scan forward to find it.
            # key_end only terminates after the first element (the spec
            # allows key_end == the record-start pattern, e.g. OUTPUT=).
            found = False
            while j < n:
                if ei > 0 and end_rx and end_rx.search(lines[j]):
                    j += 1
                    terminated = True
                    break
                if ei > 0 and matches_start(lines[j]):
                    terminated = True  # next record begins; this field missing
                    break
                out = elem.try_match(lines[j], use_search)
                if out is not None:
                    record.update(out)
                    j += 1
                    found = True
                    break
                j += 1
            if not found and not terminated:
                break
        records.append(record)
        if nmatchmax is not None and len(records) >= nmatchmax:
            break
        i = max(j, i + 1)
    return records


def flatten_to_dataframe(records: list[dict], explode_field: str | None = None):
    """Records -> pandas DataFrame. With ``explode_field``, each element
    of that list field becomes a row; its keys become
    ``{explode_field}_{key}`` columns; scalar fields repeat per row."""
    import pandas as pd

    if explode_field is None:
        return pd.DataFrame(records)
    rows = []
    for rec in records:
        base = {k: v for k, v in rec.items() if k != explode_field}
        items = rec.get(explode_field) or [None]
        for item in items:
            row = dict(base)
            if isinstance(item, dict):
                for k, v in item.items():
                    row[f"{explode_field}_{k}"] = v
            rows.append(row)
    return pd.DataFrame(rows)


def parse_files(
    df,
    schema: Sequence,
    text_col: str = "text",
    id_cols: Sequence[str] = ("path",),
    key_end: str | None = None,
    use_search: bool = False,
    explode_field: str | None = None,
    output_schema: str | None = None,
    nmatchmax: int | None = None,
):
    """Run the parser over a DataFrame of whole-file texts.

    One Arrow batch of files in, N flattened records out (1->N UDTF
    shape, SURVEY §2.12). ``output_schema`` is the Spark DDL of the
    flattened record columns (id columns are prepended automatically).
    Missing keys become NULLs; extra keys are dropped — the
    errors-as-data convention, nothing raises per-file.
    """
    import pandas as pd

    id_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    full_schema = (
        ", ".join(f"{c} {id_types[c]}" for c in id_cols) + ", " + output_schema
    )
    out_cols = [s.strip().split(" ")[0] for s in output_schema.split(",")]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for _, row in pdf.iterrows():
                recs = parse_text(
                    row[text_col] or "", schema, key_end, use_search, nmatchmax
                )
                flat = flatten_to_dataframe(recs, explode_field)
                if flat.empty:
                    continue
                for c in id_cols:
                    flat[c] = row[c]
                frames.append(flat)
            if not frames:
                yield pd.DataFrame(columns=[*id_cols, *out_cols])
                continue
            out = pd.concat(frames, ignore_index=True)
            for c in out_cols:
                if c not in out.columns:
                    out[c] = None
                else:
                    # multi-group fields carry tuples (Arrow wants lists);
                    # pandas fills missing keys with NaN (Arrow wants None)
                    out[c] = out[c].map(
                        lambda v: list(v)
                        if isinstance(v, tuple)
                        else (None if (isinstance(v, float) and v != v) else v)
                    )
            yield out[[*id_cols, *out_cols]]

    return df.mapInPandas(batches, schema=full_schema)
