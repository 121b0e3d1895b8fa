"""TableStore + grouping/sets/columns tests.

Mirrors the reference's write->append->filter->group integration
(``test/test_df_helpers_complex.py:15-105``): extra-column broadcast,
schema-aligned append, metadata-default group keys, split/groups/frame
outputs, NaN/NULL group keys.
"""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.catalog import TableStore
from batch_process_spark.operators.columns import prepend_columns, prepend_sequence_columns
from batch_process_spark.operators.grouping import merge_results, split_by_groups, summary_stats
from batch_process_spark.operators.sets import except_keys, intersect_keys, union_align
from tests.conftest import rows_set


def test_split_by_groups_guards_cardinality(spark):
    df = spark.range(50).withColumn("k", F.col("id"))
    with pytest.raises(ValueError, match="max_groups"):
        split_by_groups(df, ["k"], max_groups=10)


@pytest.fixture()
def store(spark):
    st = TableStore(spark)
    df1 = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "a long, b long")
    st.write("tbl", df1, extra_columns={"src": "init"}, table_keys=["src"], keys=["src"])
    df2 = spark.createDataFrame(
        [(4, 40, "app", "t1"), (5, 50, "app2", "t2")], "a long, b long, src string, tag string"
    )
    st.write("tbl", df2)
    return st


def test_append_schema_alignment(store):
    tbl = store.table("tbl")
    assert set(tbl.columns) == {"a", "b", "src", "tag"}
    # first batch rows got NULL tag
    assert tbl.filter(F.col("tag").isNull()).count() == 3


def test_metadata_merge(store):
    meta = store.meta("tbl")
    assert meta.table_keys == ["src"]
    assert meta.base_col_names == ["a", "b", "src", "tag"]


def test_read_frame_with_filter(store):
    out = store.read("tbl", filter_dict={"src": "app"})
    assert rows_set(out.select("a", "b")) == [(4, 40)]


def test_read_groups_default_keys(store):
    # filtering on the only table_key leaves no group keys => global agg
    out = store.read("tbl", filter_dict={"src": "init"}, out_option="groups",
                     aggs={"n": F.count(F.lit(1)), "sum_b": F.sum("b")})
    assert rows_set(out) == [(3, 60)]


def test_read_split(store):
    groups = store.read("tbl", out_option="split")
    keys = sorted(kd["src"] for kd, _ in groups)
    assert keys == ["app", "app2", "init"]
    by_key = {kd["src"]: sub for kd, sub in groups}
    assert by_key["init"].count() == 3


def test_read_unknown_out_col_raises(store):
    with pytest.raises(ValueError, match="out_col"):
        store.read("tbl", out_col=["missing"])


def test_split_null_group_keys(spark):
    df = spark.createDataFrame(
        [("x", 1), (None, 2), ("x", 3), (None, 4)], "k string, v long"
    )
    groups = split_by_groups(df, ["k"])
    assert len(groups) == 2
    null_group = [sub for kd, sub in groups if kd["k"] is None][0]
    assert sorted(r["v"] for r in null_group.collect()) == [2, 4]


def test_split_empty_keys_single_group(spark):
    df = spark.createDataFrame([(1,), (2,)], "v long")
    groups = split_by_groups(df, [])
    assert len(groups) == 1 and groups[0][0] == {}


def test_union_align_disjoint_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, only_a string")
    b = spark.createDataFrame([(2, 9.5)], "id long, only_b double")
    u = union_align([a, b])
    assert set(u.columns) == {"id", "only_a", "only_b"}
    assert u.count() == 2
    assert u.filter(F.col("only_b").isNull()).count() == 1


def test_intersect_except_keys(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(2,), (3,), (4,)], "k long")
    assert rows_set(intersect_keys(a, b, ["k"])) == [(2,), (3,)]
    assert rows_set(except_keys(a, b, ["k"])) == [(1,)]


def test_prepend_columns_order_and_overwrite(spark):
    df = spark.createDataFrame([(1, "old")], "a long, tag string")
    out = prepend_columns(df, {"run": "r1", "tag": "new"})
    assert out.columns == ["run", "tag", "a"]
    assert rows_set(out) == [("r1", "new", 1)]


def test_prepend_sequence_columns(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "v long")
    out = prepend_sequence_columns(df, {"lbl": ["a", "b", "c"]}, order_by="v")
    assert rows_set(out.select("v", "lbl")) == [(1, "a"), (2, "b"), (3, "c")]


def test_prepend_sequence_length_mismatch(spark):
    df = spark.createDataFrame([(1,), (2,)], "v long")
    with pytest.raises(ValueError, match="2 rows"):
        prepend_sequence_columns(df, {"lbl": ["a"]}, order_by="v")


def test_merge_results_recipe(spark):
    df = spark.createDataFrame(
        [
            ("f1", 10, 5, 100, "en", "ok", "2024-01-01 10:00:00"),
            ("f1", 20, 7, 200, "de", "fail", "2024-01-01 09:00:00"),
            ("f2", 1, 1, 1, "fr", "ok", "2024-01-02 00:00:00"),
        ],
        "file string, lines long, words long, chars long, lang string, status string, timestamp string",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    out = merge_results(df)
    r = {row["file"]: row for row in out.collect()}
    assert r["f1"]["max_lines"] == 20
    assert r["f1"]["sum_words"] == 12
    assert r["f1"]["first_lang"] == "de"  # earliest timestamp wins
    assert r["f1"]["statuses"] == ["fail", "ok"]


def test_summary_stats(spark):
    df = spark.createDataFrame([("g", 1.0), ("g", 3.0)], "k string, v double")
    out = summary_stats(df, ["k"], "v").collect()[0]
    assert out["n"] == 2 and out["mean"] == 2.0 and out["min"] == 1.0 and out["max"] == 3.0


def test_store_save_load_roundtrip(spark, store, tmp_path):
    root = str(tmp_path / "catalog")
    store.save(root)
    loaded = TableStore.load(spark, root)
    assert loaded.names() == ["tbl"]
    assert loaded.meta("tbl").table_keys == ["src"]
    # metadata-default read works identically on the reloaded store
    out = loaded.read("tbl", filter_dict={"src": "init"}, out_option="groups",
                      aggs={"n": F.count(F.lit(1))})
    assert rows_set(out) == [(3,)]


def test_with_provenance_multi_file(spark, tmp_path):
    from batch_process_spark.operators.columns import with_provenance

    path = str(tmp_path / "shards")
    spark.range(100).withColumn("k", F.col("id") % 4).repartition(4, "k").write.parquet(path)
    df = with_provenance(spark.read.parquet(path), row_col="row_in_file")
    rows = df.collect()
    # scheme stripped, real paths, full coverage
    files = {r["source_file"] for r in rows}
    assert all(f.startswith("/") and f.endswith(".parquet") for f in files)
    assert len(files) > 1 and len(rows) == 100
    # row_in_file is a dense 0..n-1 numbering within each file
    per_file = {}
    for r in rows:
        per_file.setdefault(r["source_file"], []).append(r["row_in_file"])
    for f, idxs in per_file.items():
        assert sorted(idxs) == list(range(len(idxs)))


def test_with_provenance_exact_file_order(spark, tmp_path):
    """The native _metadata path must report the TRUE in-file position
    (not an arbitrary dense numbering), surviving a later shuffle."""
    from batch_process_spark.operators.columns import with_provenance

    path = str(tmp_path / "one_shard")
    spark.range(50).coalesce(1).write.parquet(path)  # file order == id order
    df = with_provenance(spark.read.parquet(path), row_col="r").repartition(8)
    got = sorted((r["r"], r["id"]) for r in df.collect())
    assert got == [(i, i) for i in range(50)]


def test_with_provenance_strips_digit_schemes():
    from batch_process_spark.operators.columns import _SCHEME_RX
    import re

    assert re.sub(_SCHEME_RX, "/", "s3a://bucket/x.parquet") == "/bucket/x.parquet"
    assert re.sub(_SCHEME_RX, "/", "file:///root/x.parquet") == "/root/x.parquet"
    assert re.sub(_SCHEME_RX, "/", "o3fs://vol/x.parquet") == "/vol/x.parquet"


def test_merge_results_drops_null_statuses(spark):
    """The two-stage rewrite must keep collect_list's contract: NULL
    statuses stay OUT of the sorted list while the NULL-status rows
    still feed every other aggregate (review finding)."""
    from batch_process_spark.operators.grouping import merge_results

    df = spark.createDataFrame(
        [
            ("f", 10, 5, 100, "en", None, 1.0),
            ("f", 99, 7, 200, "de", "ok", 2.0),
        ],
        "file string, lines int, words int, chars int, lang string, status string, ts double",
    )
    row = merge_results(
        df, file_col="file", lines_col="lines", words_col="words",
        chars_col="chars", lang_col="lang", status_col="status", order_col="ts",
    ).collect()[0]
    assert row["statuses"] == ["ok"]          # no NULL element
    assert row["max_lines"] == 99             # NULL-status row still aggregated
    assert row["sum_words"] == 12
    assert row["first_lang"] == "en"
