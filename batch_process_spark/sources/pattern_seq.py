"""Pattern-sequence parser — the reference's second (lower-level)
text-extraction API, specified by ``_test_read_parser.py`` (the
implementation file ``utils/read.py`` is absent from the snapshot).

A ``key_match`` spec is a sequence whose elements are either a regex
string (a *leaf*) or a nested list of alternative leaf-groups (a
*block*): ``[head_rx, [[rx_a, rx_b], [rx_c]], tail_rx]``. The parser
walks the text line by line, matching spec elements in order; block
alternatives may repeat (each line is tried against every leaf of
every alternative) until the element AFTER the block matches — that
line ends the block ("block end": later occurrences of block leaves
are ignored). ``data_type`` mirrors the spec shape with converter
lists per capture group; ``labels`` names each element (either one
label per block, or nested per-leaf labels).

``extract_records(result, schema)`` then selects values:

- ``{"name", "label", "level": "leaf", "indices": [i], "cast": [f]}``
  -> the i-th capture of the FIRST match of that leaf.
- ``{"level": "leaf"|"block", "mode": "repeat_flat", "repeat_index": n}``
  -> the n-th occurrence among that label's repeated matches
  (flattened in match order), first capture, converted.
"""

from __future__ import annotations

import re
from typing import Any, Sequence


def _leaf_entries(element, labels, data_type):
    """Normalize one spec element to a list of (regex, label, casts)."""
    if isinstance(element, str):
        return [(re.compile(element), labels, data_type or [str])]
    out = []
    for ai, alt in enumerate(element):
        for li, leaf in enumerate(alt):
            if isinstance(labels, (list, tuple)):
                lbl = labels[ai][li]
            else:
                lbl = labels  # single label names the whole block
            casts = None
            if data_type is not None:
                casts = data_type[ai][li]
            out.append((re.compile(leaf), lbl, casts or [str]))
    return out


def parse_pattern_sequence(
    text: str,
    key_match: Sequence,
    labels: Sequence,
    data_type: Sequence | None = None,
) -> dict:
    """Parse ``text`` against the spec; returns
    ``{"rounds": [{"items": [...]}]}`` where each item is
    ``{"label", "level": "leaf"|"block", "matches": [[casted...], ...],
    "leaf_matches": {leaf_label: [[casted...], ...]}}``.
    """
    lines = text.splitlines()
    n_elems = len(key_match)
    items: list[dict] = []
    pos = 0
    ei = 0
    while ei < n_elems and pos <= len(lines):
        element = key_match[ei]
        elem_labels = labels[ei] if labels else None
        elem_types = data_type[ei] if data_type else None
        if isinstance(element, str):
            rx = re.compile(element)
            casts = (elem_types or [str])
            matched = None
            while pos < len(lines):
                m = rx.match(lines[pos])
                pos += 1
                if m:
                    matched = [
                        _cast(g, casts[min(i, len(casts) - 1)])
                        for i, g in enumerate(m.groups())
                    ]
                    break
            items.append(
                {
                    "label": elem_labels if isinstance(elem_labels, str) else str(elem_labels),
                    "level": "leaf",
                    "matches": [matched] if matched is not None else [],
                    "leaf_matches": {},
                }
            )
            ei += 1
            continue
        # block element: try leaves repeatedly until the next spec
        # element matches (block end) or EOF
        leaves = _leaf_entries(element, elem_labels, elem_types)
        next_rx = None
        if ei + 1 < n_elems and isinstance(key_match[ei + 1], str):
            next_rx = re.compile(key_match[ei + 1])
        block_label = elem_labels if isinstance(elem_labels, str) else "block"
        block_matches: list[list] = []
        leaf_matches: dict[str, list] = {}
        while pos < len(lines):
            line = lines[pos]
            if next_rx and next_rx.match(line):
                break  # block ends; next element consumes this line
            for rx, lbl, casts in leaves:
                m = rx.match(line)
                if m:
                    vals = [
                        _cast(g, casts[min(i, len(casts) - 1)])
                        for i, g in enumerate(m.groups())
                    ]
                    block_matches.append(vals)
                    leaf_matches.setdefault(lbl, []).append(vals)
                    break
            pos += 1
        items.append(
            {
                "label": block_label,
                "level": "block",
                "matches": block_matches,
                "leaf_matches": leaf_matches,
            }
        )
        ei += 1
    return {"rounds": [{"items": items}]}


def _cast(value, fn):
    if value is None:
        return None
    try:
        return fn(value)
    except (TypeError, ValueError):
        return value


def extract_records(result: dict, schema: Sequence[dict]) -> dict:
    """Select named values out of a parse result (see module doc)."""
    out: dict[str, Any] = {}
    items = result.get("rounds", [{}])[0].get("items", [])
    for sel in schema:
        name = sel["name"]
        label = sel["label"]
        level = sel.get("level", "leaf")
        mode = sel.get("mode")
        matches = _collect_matches(items, label, level)
        if not matches:
            out[name] = None
            continue
        if mode == "repeat_flat":
            idx = sel.get("repeat_index", 0)
            vals = matches[idx] if idx < len(matches) else None
            out[name] = vals[0] if isinstance(vals, list) and vals else vals
        else:
            first = matches[0]
            indices = sel.get("indices", [0])
            casts = sel.get("cast", [lambda v: v])
            picked = [
                _cast(first[i], casts[min(j, len(casts) - 1)])
                for j, i in enumerate(indices)
                if i < len(first)
            ]
            out[name] = picked[0] if len(picked) == 1 else picked
    return out


def _collect_matches(items, label, level):
    """Match order: block-level label -> its flattened matches;
    leaf-level label -> matches recorded under that leaf across items."""
    for item in items:
        if level == "block" and item["level"] == "block" and item["label"] == label:
            return item["matches"]
        if level == "leaf":
            if item["level"] == "leaf" and item["label"] == label:
                return item["matches"]
            if item["level"] == "block" and label in item["leaf_matches"]:
                return item["leaf_matches"][label]
    return []
