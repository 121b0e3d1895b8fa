"""KVStore selector parity (FIXTURES §7) + property-based tests for
the filter compiler and glob matcher (hypothesis)."""

import fnmatch
import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from batch_process_spark.operators.filtering import filter_dataframe, glob_to_regex
from batch_process_spark.operators.kvstore import KVStore


@pytest.fixture(scope="module")
def store(spark):
    kv = KVStore(spark)
    kv.put(
        {"level0": "a", "level1": "x", "color": "red"},
        [{"k": "k1", "payload": [[1, 2]]}],
    )
    kv.put(
        {"level0": "a", "level1": "y", "color": "blue"},
        [{"k": "k2", "payload": [[3]]}, {"k": "k3", "payload": [[4, 5]]}],
    )
    kv.put(
        {"level0": "b", "level1": "x", "color": "green"},
        [{"k": "k4", "payload": [[6]]}],
    )
    kv.put(
        {"level0": "b", "level1": "z", "color": "grey"},
        [{"k": "k5", "payload": [[7]]}],
    )
    return kv


def ks(df):
    return sorted(r["k"] for r in df.collect())


def test_kv_exact(store):
    assert ks(store.get({"color": "blue"})) == ["k2", "k3"]


def test_kv_membership(store):
    assert ks(store.get({"color": ["red", "green"]})) == ["k1", "k4"]


def test_kv_glob_regex_substring(store):
    assert ks(store.get({"color": "g*"})) == ["k4", "k5"]
    assert ks(store.get({"color": "re:^gr"})) == ["k4", "k5"]
    assert ks(store.get({"color": "in:ree"})) == ["k4"]


def test_kv_multi_key_and_payload(store):
    out = store.get({"level0": "a", "level1": "y"})
    assert ks(out) == ["k2", "k3"]
    payloads = {r["k"]: r["payload"] for r in out.collect()}
    assert payloads["k3"] == [[4, 5]]


def test_kv_match_all_and_keys(store):
    assert store.get().count() == 5
    assert store.keys(["level0"]).count() == 2


def test_kv_empty_raises(spark):
    with pytest.raises(ValueError, match="empty"):
        KVStore(spark).get()


# -- property-based ---------------------------------------------------------

GLOB_ALPHA = st.text(alphabet="abcx*?", min_size=0, max_size=6)
NAMES = st.text(alphabet="abcx", min_size=0, max_size=6)


@settings(max_examples=200, deadline=None)
@given(pattern=GLOB_ALPHA, name=NAMES)
def test_glob_matches_fnmatch(pattern, name):
    """glob_to_regex must agree with Python's fnmatch on */? globs."""
    expected = fnmatch.fnmatchcase(name, pattern)
    got = re.match(glob_to_regex(pattern), name) is not None
    assert got == expected


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(-5, 5), st.sampled_from(["x", "y", "z"])),
        min_size=0,
        max_size=20,
    ),
    threshold=st.integers(-5, 5),
    cat=st.sampled_from(["x", "y", "z"]),
)
def test_filter_compiler_matches_python(spark_prop, data, threshold, cat):
    """filter_dataframe == plain Python filtering on random frames."""
    df = spark_prop.createDataFrame(
        [(i, v, c) for i, (v, c) in enumerate(data)] or [(0, 0, "x")],
        "id long, v long, c string",
    )
    if not data:
        df = df.filter(F.lit(False))
    out = filter_dataframe(df, {"v": lambda col: col > threshold, "c": cat})
    got = sorted(r["id"] for r in out.collect())
    expected = sorted(i for i, (v, c) in enumerate(data) if v > threshold and c == cat)
    assert got == expected


@pytest.fixture(scope="session")
def spark_prop(spark):
    return spark
