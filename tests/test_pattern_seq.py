"""Pattern-sequence parser tests — mirror the reference's
``_test_read_parser.py`` spec (impl absent from the snapshot), plus
hypothesis fuzz for the struct-text parser (never raises)."""

import pytest
from hypothesis import given, settings, strategies as st

from batch_process_spark.sources.pattern_seq import extract_records, parse_pattern_sequence
from batch_process_spark.sources.struct_text import Field, OneOf, Optional as OptField, Repeat, parse_text

TEXT = "\n".join([
    "HEADER X",
    "A: 1",
    "B: 2.5",
    "C: 10",
    "C: 20",
    "TAIL Y",
    "B: 9.9",  # after block end — must be ignored
])

KEY_MATCH = [
    r"\s*HEADER\s+(\w+)",
    [
        [r"\s*A:\s*(\d+)", r"\s*B:\s*(-?\d+\.\d+)"],
        [r"\s*C:\s*(\d+)"],
    ],
    r"\s*TAIL\s+(\w+)",
]

DATA_TYPE = [
    [str],
    [[[int], [float]], [[int]]],
    [str],
]


def test_block_end_and_extraction():
    labels = ["head", "block", "tail"]
    result = parse_pattern_sequence(TEXT, key_match=KEY_MATCH, labels=labels, data_type=DATA_TYPE)
    rounds = result.get("rounds", [])
    assert len(rounds) >= 1
    items = rounds[0].get("items", [])
    block_items = [it for it in items if it.get("level") == "block" and it.get("label") == "block"]
    assert block_items, "block item should exist"
    # B selected by index; second C by repeat_flat
    schema = [
        {"name": "B", "label": "B", "level": "leaf", "indices": [0], "cast": [float]},
        {"name": "C2", "label": "block", "level": "block", "mode": "repeat_flat", "repeat_index": 1},
    ]
    # leaf label "B" requires per-leaf labels; with a single block label,
    # select B positionally from the block instead
    schema_blk = [
        {"name": "B", "label": "block", "level": "block", "mode": "repeat_flat", "repeat_index": 1},
        {"name": "C2", "label": "block", "level": "block", "mode": "repeat_flat", "repeat_index": 3},
    ]
    records = extract_records(result, schema_blk)
    assert records["B"] == pytest.approx(2.5)
    assert records["C2"] == 20


def test_leaf_label_extraction():
    labels = ["head", [["A", "B"], ["C"]], "tail"]
    result = parse_pattern_sequence(TEXT, key_match=KEY_MATCH, labels=labels, data_type=DATA_TYPE)
    schema = [
        {"name": "B1", "label": "B", "level": "leaf", "indices": [0], "cast": [float]},
        {"name": "C2", "label": "C", "level": "leaf", "mode": "repeat_flat", "repeat_index": 1},
    ]
    records = extract_records(result, schema)
    assert records["B1"] == pytest.approx(2.5)
    assert records["C2"] == 20


def test_block_end_excludes_trailing():
    labels = ["head", [["A", "B"], ["C"]], "tail"]
    result = parse_pattern_sequence(TEXT, key_match=KEY_MATCH, labels=labels, data_type=DATA_TYPE)
    items = result["rounds"][0]["items"]
    block = [it for it in items if it["level"] == "block"][0]
    # B: 9.9 after TAIL must NOT be in the block
    b_vals = block["leaf_matches"].get("B", [])
    assert b_vals == [[2.5]]
    tail = [it for it in items if it["label"] == "tail"][0]
    assert tail["matches"] == [["Y"]]


def test_missing_leaf_gives_none():
    labels = ["head", [["A", "B"], ["C"]], "tail"]
    result = parse_pattern_sequence("HEADER X\nTAIL Y", KEY_MATCH, labels, DATA_TYPE)
    records = extract_records(result, [
        {"name": "B1", "label": "B", "level": "leaf", "indices": [0], "cast": [float]},
    ])
    assert records["B1"] is None


# -- struct-text parser fuzz --------------------------------------------------

FUZZ_SCHEMA = [
    Field(label="h", pattern=r"^H\s+(\w+)"),
    OptField(Field(label="x", pattern=r"^X:\s*(\d+)", converter=int)),
    OneOf([
        Field(label="ta", pattern=r"^T:\s*A"),
        Field(label="tb", pattern=r"^T:\s*B"),
    ]),
    Repeat(label="items", items=[Field(label="i", pattern=r"^I:\s*(\w+)")], until=r"^F$"),
]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="HXTIF: AB\n0123abc", max_size=300))
def test_parse_text_never_raises(text):
    records = parse_text(text, FUZZ_SCHEMA, key_end=r"^END$")
    assert isinstance(records, list)
    for r in records:
        assert isinstance(r, dict)
        assert isinstance(r.get("items", []), list)
