"""Struct-text parser tests — mirrors the reference's spec-by-test
(``__test_struct_text_parser.py``), whose implementation file is absent
from the snapshot; these cases pin the same observable behavior.
"""

import pytest

from batch_process_spark.sources.struct_text import (
    Field,
    OneOf,
    Optional as OptField,
    Repeat,
    flatten_to_dataframe,
    parse_files,
    parse_text,
)


def test_repeat_optional_oneof_parse():
    text = "\n".join([
        "HEADER A",
        "X: 10",
        "Y: 3.14",
        "TYPE: ALPHA",
        "ITEM: v1",
        "ITEM: v2",
        "FOOTER",
        "HEADER B",
        "X: 20",
        "TYPE: BETA",
        "ITEM: v9",
        "FOOTER",
    ])
    schema = [
        Field(label="header", pattern=r"^HEADER\s+(\w+)", converter=str),
        OptField(Field(label="x", pattern=r"^X:\s*(\d+)", converter=int)),
        OptField(Field(label="y", pattern=r"^Y:\s*(-?\d+\.\d+)", converter=float)),
        OneOf([
            Field(label="type_alpha", pattern=r"^TYPE:\s*ALPHA"),
            Field(label="type_beta", pattern=r"^TYPE:\s*BETA"),
        ]),
        Repeat(label="items", items=[
            Field(label="item", pattern=r"^ITEM:\s*(\w+)", converter=str)
        ], until=r"^FOOTER"),
    ]
    records = parse_text(text, schema, key_end=r"^END$", use_search=False)
    assert len(records) == 2
    r0, r1 = records
    assert r0["header"] == "A"
    assert r0.get("x") == 10
    assert r0.get("y") == pytest.approx(3.14)
    assert "type_alpha" in r0
    assert r0.get("items") == [{"item": "v1"}, {"item": "v2"}]
    assert r1["header"] == "B"
    assert r1.get("x") == 20
    assert "y" not in r1
    assert "type_beta" in r1
    assert r1.get("items") == [{"item": "v9"}]


def test_field_group_labels_expand():
    schema = [
        Field(
            label="vec",
            pattern=r"^V:\s*(-?\d+\.\d+)\s+(-?\d+\.\d+)\s+(-?\d+\.\d+)",
            converter=float,
            group_labels=["vx", "vy", "vz"],
        )
    ]
    records = parse_text("V: 1.0 2.5 -3.2", schema, key_end=r"^END$")
    assert len(records) == 1
    r = records[0]
    assert r["vx"] == pytest.approx(1.0)
    assert r["vy"] == pytest.approx(2.5)
    assert r["vz"] == pytest.approx(-3.2)
    assert "vec" not in r


def test_labels_and_named_groups():
    text = "\n".join([
        "OUTPUT = HEADER ONE",
        "COMPONENT = AIRFRAME",
        "V: 1.0 2.5 -3.2",
        "END",
        "OUTPUT = HEADER TWO",
        "COMPONENT = ROTOR",
        "V: -1 0 3.5",
        "END",
    ])
    schema = [
        Field(label="out", pattern=r"^OUTPUT\s*=\s*(?P<header>.+)$", converter=str),
        Field(label="comp_line", pattern=r"^COMPONENT\s*=\s*(?P<comp>.+)$", converter=str),
        Field(
            label="vec",
            pattern=r"^V:\s*(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)",
            converter=float,
            labels=["vx", "vy", "vz"],
        ),
    ]
    records = parse_text(text, schema, key_end=r"^END$")
    assert len(records) == 2
    r0, r1 = records
    assert r0["header"] == "HEADER ONE"
    assert r0["comp"] == "AIRFRAME"
    assert "out" not in r0 and "comp_line" not in r0
    assert r0["vx"] == pytest.approx(1.0)
    assert r1["header"] == "HEADER TWO"
    assert r1["vy"] == pytest.approx(0.0)
    assert r1["vz"] == pytest.approx(3.5)


OUT_TEXT = "\n".join([
    "junk preamble",
    " OUTPUT = AIRFRAME SENSOR  1 ROTOR 1",
    " OUTPUT KIND = ACCELERATION",
    " RESPONSE KIND = HARMONIC",
    " COMPONENT = AIRFRAME",
    " SOME = VALUE",
    " free text line",
    " OUTPUT = AIRFRAME SENSOR  2 ROTOR 1",
    " OUTPUT KIND = VELOCITY",
    " COMPONENT = ROTOR",
    " another line",
])


def _out_schema():
    return [
        Field(label="output", pattern=r"^\s*OUTPUT\s*=\s*(.+)$", converter=str),
        OptField(Field(label="output_kind", pattern=r"^\s*OUTPUT\s+KIND\s*=\s*(.+)$", converter=str)),
        OptField(Field(label="response_kind", pattern=r"^\s*RESPONSE\s+KIND\s*=\s*(.+)$", converter=str)),
        OptField(Field(label="component", pattern=r"^\s*COMPONENT\s*=\s*(.+)$", converter=str)),
        Repeat(label="body", items=[
            OneOf([
                Field(label="kv", pattern=r"^\s*([A-Z][A-Z0-9 _-]+)\s*=\s*(.+)$", converter=str),
                Field(label="line", pattern=r"^(.+)$", converter=str),
            ])
        ], until=r"^\s*OUTPUT\s*="),
    ]


def test_parse_output_blocks():
    records = parse_text(OUT_TEXT, _out_schema(), key_end=r"^\s*OUTPUT\s*=", nmatchmax=5)
    assert len(records) == 2
    r0 = records[0]
    assert "AIRFRAME SENSOR" in r0["output"]
    assert r0["output_kind"] == "ACCELERATION"
    assert r0["component"] == "AIRFRAME"
    body = records[0]["body"]
    assert any("kv" in b for b in body)
    assert any("line" in b for b in body)


def test_flatten_explode():
    records = parse_text(OUT_TEXT, _out_schema(), key_end=r"^\s*OUTPUT\s*=")
    df = flatten_to_dataframe(records, explode_field="body")
    assert not df.empty
    for col in ["output", "output_kind", "component"]:
        assert col in df.columns
    assert any(c.startswith("body_") for c in df.columns)
    assert df["output"].astype(str).str.contains("AIRFRAME SENSOR").any()


def test_parse_files_spark(spark):
    files = spark.createDataFrame(
        [("f1.out", OUT_TEXT), ("f2.out", "no blocks here")],
        "path string, text string",
    )
    out = parse_files(
        files,
        _out_schema(),
        text_col="text",
        id_cols=["path"],
        key_end=r"^\s*OUTPUT\s*=",
        explode_field="body",
        output_schema="output string, output_kind string, response_kind string, component string, body_kv array<string>, body_line string",
    )
    rows = out.collect()
    assert all(r["path"] == "f1.out" for r in rows)  # empty file yields no rows
    assert any(r["output_kind"] == "ACCELERATION" for r in rows)
    assert any(r["body_line"] is not None for r in rows)


def test_converter_failure_is_lenient():
    records = parse_text("X: abc", [Field(label="x", pattern=r"^X:\s*(\w+)", converter=int)])
    assert records[0]["x"] == "abc"  # falls back to raw text, no raise
