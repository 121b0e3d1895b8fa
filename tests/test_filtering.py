"""filter_dataframe + selector language tests.

Mirrors the reference's case list in ``test/test_df_helpers.py:19-168``
(exact / callable / membership / None / or-combine / error types) and
the selector variants of ``test_pipeline_helpers.py:167-210``.
"""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.filtering import (
    filter_dataframe,
    glob_to_regex,
    select_records,
)
from tests.conftest import rows_set


@pytest.fixture(scope="module")
def sample_df(spark):
    # the reference's sample_df fixture (FIXTURES.md §1)
    return spark.createDataFrame(
        [
            (10.0, 1, "x", None),
            (20.0, -1, "y", "val"),
            (10.0, 5, "x", "val"),
            (30.0, 6, "z", None),
            (None, 0, "y", "val"),
        ],
        "A double, B long, C string, D string",
    )


def test_exact_match(sample_df):
    out = filter_dataframe(sample_df, {"A": 10.0})
    assert out.count() == 2


def test_callable_condition(sample_df):
    out = filter_dataframe(sample_df, {"B": lambda c: c > 0})
    assert sorted(r["B"] for r in out.collect()) == [1, 5, 6]


def test_membership(sample_df):
    out = filter_dataframe(sample_df, {"C": ["x", "z"]})
    assert out.count() == 3


def test_none_means_null(sample_df):
    out = filter_dataframe(sample_df, {"D": None})
    assert sorted(r["B"] for r in out.collect()) == [1, 6]


def test_and_combine(sample_df):
    out = filter_dataframe(sample_df, {"A": 10.0, "C": "x"})
    assert out.count() == 2


def test_or_combine_null_safe(sample_df):
    # NULL in A must not poison the OR
    out = filter_dataframe(sample_df, {"A": 30.0, "B": 0}, combine="or")
    assert sorted(r["B"] for r in out.collect()) == [0, 6]


def test_unknown_column_raises(sample_df):
    with pytest.raises(ValueError, match="not in DataFrame"):
        filter_dataframe(sample_df, {"nope": 1})


def test_bad_combine_raises(sample_df):
    with pytest.raises(ValueError, match="combine"):
        filter_dataframe(sample_df, {"A": 1}, combine="xor")


def test_empty_conditions_noop(sample_df):
    assert filter_dataframe(sample_df, {}).count() == 5


# -- selector mini-language -------------------------------------------------

@pytest.fixture(scope="module")
def kv_df(spark):
    return spark.createDataFrame(
        [("a", "red", "k1"), ("b", "blue", "k2"), ("c", "green", "k3"), ("d", "grey", "k4")],
        "name string, color string, k string",
    )


def test_selector_exact(kv_df):
    assert rows_set(select_records(kv_df, {"color": "blue"})) == [("b", "blue", "k2")]


def test_selector_membership(kv_df):
    assert select_records(kv_df, {"color": ["red", "green"]}).count() == 2


def test_selector_regex(kv_df):
    assert sorted(r["name"] for r in select_records(kv_df, {"color": "re:^gr"}).collect()) == ["c", "d"]


def test_selector_substring(kv_df):
    assert select_records(kv_df, {"color": "in:ree"}).count() == 1


def test_selector_glob(kv_df):
    assert select_records(kv_df, {"color": "g*"}).count() == 2
    assert select_records(kv_df, {"color": "gre?"}).count() == 1


def test_selector_none_matches_all(kv_df):
    assert select_records(kv_df, {"color": None}).count() == 4


def test_selector_sequence_equality_on_array_column(spark):
    """Reference _match_value nuance: list selector vs sequence-typed
    stored value means SEQUENCE EQUALITY, not membership."""
    df = spark.createDataFrame(
        [("a", ["x", "y"]), ("b", ["x"]), ("c", ["y", "x"])],
        "name string, tags array<string>",
    )
    out = select_records(df, {"tags": ["x", "y"]})
    assert [r["name"] for r in out.collect()] == ["a"]  # order-sensitive equality


def test_glob_to_regex_classes():
    assert glob_to_regex("a[bc]d") == "^a[bc]d$"
    assert glob_to_regex("a[!bc]d") == "^a[^bc]d$"
    assert glob_to_regex("*.txt") == r"^.*\.txt$"


def test_interval_join_semantics(spark):
    from batch_process_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00"), (2, "2024-01-03 00:00:00"), (3, "2024-01-05 00:00:00")],
        "pid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivs = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),   # [1st, 3rd): pid 1 only
         (20, "2024-01-02 00:00:00", "2024-01-06 00:00:00")],  # pids 2 and 3
        "iid long, start string, end string",
    ).withColumn("start", F.col("start").cast("timestamp")).withColumn(
        "end", F.col("end").cast("timestamp")
    )
    out = interval_join(points, ivs, "ts", "start", "end")
    pairs = sorted((r["pid"], r["iid"]) for r in out.collect())
    # half-open: pid 2 at exactly interval-10's end is excluded
    assert pairs == [(1, 10), (2, 20), (3, 20)]


def test_interval_join_subsecond_end_and_inverted(spark):
    from batch_process_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00.200")], "pid long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivs = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 00:01:00.500"),  # frac-second end
         (99, "2024-01-01 00:05:00", "2024-01-01 00:00:00")],     # inverted -> nothing
        "iid long, start string, end string",
    ).withColumn("start", F.col("start").cast("timestamp")).withColumn(
        "end", F.col("end").cast("timestamp")
    )
    out = interval_join(points, ivs, "ts", "start", "end", bucket_seconds=60)
    # the point lands in bucket 1; a truncating end-1s rule would stop
    # the interval at bucket 0 and silently drop this match
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 10)]
