"""Tests: nested-struct functions, text row-ops, file ops."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.functions.nested import (
    explode_map,
    flatten_struct,
    get_path,
    json_to_struct,
    struct_to_json,
    unflatten_struct,
)
from batch_process_spark.operators.textops import (
    count_code_lines,
    count_lines,
    remove_blank_lines,
    word_char_counts,
)
from batch_process_spark.sinks.fileops import backup_files, delete_files, rename_files
from batch_process_spark.sources.filetree import file_tree_df


def test_flatten_unflatten_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, {"b": {"c": 2, "d": "x"}, "e": 3})],
        "a long, s struct<b: struct<c: long, d: string>, e: long>",
    )
    flat = flatten_struct(df)
    assert set(flat.columns) == {"a", "s_b_c", "s_b_d", "s_e"}
    assert flat.collect()[0]["s_b_c"] == 2
    back = unflatten_struct(flat, ["s_b"])
    assert back.collect()[0]["s_b"]["c"] == 2


def test_unflatten_unknown_prefix(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="prefix"):
        unflatten_struct(df, ["nope"])


def test_explode_map_and_json(spark):
    df = spark.createDataFrame([(1, '{"k": 5, "tag": "x"}')], "id long, props string")
    parsed = df.withColumn("p", json_to_struct("props", "k long, tag string"))
    assert parsed.collect()[0]["p"]["k"] == 5
    assert get_path(F.col("p"), "tag") is not None
    rt = parsed.withColumn("j", struct_to_json("p")).collect()[0]["j"]
    assert '"k":5' in rt
    m = df.withColumn("m", F.from_json("props", "map<string,string>"))
    ex = explode_map(m, "m")
    assert sorted((r["key"], r["value"]) for r in ex.collect()) == [("k", "5"), ("tag", "x")]


def test_textops(spark):
    txt = "line1\n\n# comment\n  \ncode()\n// slash comment\nend"
    df = spark.createDataFrame([(txt,)], "text string")
    r = df.select(
        count_lines("text").alias("lines"),
        count_code_lines("text").alias("code"),
        remove_blank_lines("text").alias("clean"),
    ).collect()[0]
    assert r["lines"] == 7
    assert r["code"] == 3  # line1, code(), end
    assert "\n\n" not in r["clean"] and "  " not in r["clean"].split("\n")
    wc = word_char_counts(df).collect()[0]
    # tokens: line1, #, comment, code(), //, slash, comment, end
    assert wc["chars"] == len(txt) and wc["words"] == 8


@pytest.fixture()
def optree(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "a.txt").write_text("aaa")
    (tmp_path / "b.txt").write_text("bbb")
    (tmp_path / "c.log").write_text("ccc")
    return tmp_path


def test_backup_files(spark, optree, tmp_path_factory):
    dest = tmp_path_factory.mktemp("backup")
    tree = file_tree_df(spark, str(optree)).filter(~F.col("is_dir") & (F.col("ext") == "txt"))
    res = backup_files(tree, str(optree), str(dest))
    assert res.filter(F.col("status") == "success").count() == 2
    assert (dest / "sub" / "a.txt").read_text() == "aaa"  # tree preserved


def test_fileops_guard_oversized_selection(spark, optree):
    tree = file_tree_df(spark, str(optree)).filter(~F.col("is_dir"))
    with pytest.raises(ValueError, match="max_files"):
        delete_files(tree, max_files=1)
    # and the guard never fired a single mutation
    assert (optree / "b.txt").exists() and (optree / "c.log").exists()


def test_rename_and_delete(spark, optree):
    tree = file_tree_df(spark, str(optree)).filter(F.col("name") == "c.log")
    res = rename_files(tree, "old_")
    assert res.collect()[0]["status"] == "success"
    assert (optree / "old_c.log").exists()

    tree2 = file_tree_df(spark, str(optree)).filter(F.col("name") == "old_c.log")
    dry = delete_files(tree2, dry_run=True)
    assert dry.collect()[0]["status"] == "would_delete"
    assert (optree / "old_c.log").exists()
    real = delete_files(tree2, dry_run=False)
    assert real.collect()[0]["status"] == "success"
    assert not (optree / "old_c.log").exists()
