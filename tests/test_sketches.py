"""Sketch operators: ε-bounds against exact answers."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    frequent_items,
    seeded_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def data(spark):
    # 10k rows, 1000 distinct users, skewed event types
    return spark.range(10000).select(
        (F.col("id") % 1000).alias("user"),
        (F.col("id") % 7).alias("seven"),
        F.when(F.col("id") % 10 < 7, "common").otherwise(
            F.concat(F.lit("rare_"), (F.col("id") % 13).cast("string"))
        ).alias("etype"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


def test_approx_distinct_bounds(data):
    r = approx_distinct(data, ["user", "seven"]).collect()[0]
    assert abs(r["approx_distinct_user"] - 1000) <= 50  # 2% rsd
    assert r["approx_distinct_seven"] == 7  # small cardinalities exact


def test_approx_distinct_grouped(data):
    out = approx_distinct(data, ["user"], keys=["seven"])
    assert out.count() == 7
    for r in out.collect():
        assert abs(r["approx_distinct_user"] - 1000) <= 60


def test_approx_quantiles_close_to_exact(data):
    r = approx_quantiles(data, "v", (0.5, 0.9)).collect()[0]
    assert abs(r["p50"] - 49.5) <= 2
    assert abs(r["p90"] - 89.1) <= 2


def test_frequent_items(data):
    out = frequent_items(data, "etype", min_share=0.05)
    rows = {r["etype"]: r["share"] for r in out.collect()}
    assert "common" in rows and rows["common"] == pytest.approx(0.7, abs=0.01)
    assert all(s >= 0.05 for s in rows.values())


def test_seeded_sample_deterministic(data):
    a = sorted(r["user"] for r in seeded_sample(data, 0.1, seed=7).collect())
    b = sorted(r["user"] for r in seeded_sample(data, 0.1, seed=7).collect())
    assert a == b
    assert 500 <= len(a) <= 1500  # ~10%


def test_stratified_sample(data):
    out = stratified_sample(data, "seven", {0: 1.0, 1: 0.0}, seed=7)
    got = {r["seven"] for r in out.select("seven").distinct().collect()}
    assert 0 in got and 1 not in got


def test_hll_registers_match_python_on_adversarial_corpora(spark):
    """Property-style cross-check on generated corpora batched into ONE
    job: unicode, empty strings, long keys, heavy duplication, near-
    collisions. Every (corpus, bucket) register must equal the hashlib
    recompute — the md5/rho math has no data-dependent branches left
    to hide in."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from batch_process_spark.operators.sketches import hll_register_table

    rng = random.Random(42)
    corpora: dict[str, list[str]] = {
        "empty_and_dupes": ["", "", "a", "a", "a"],
        "unicode": ["héllo", "мир", "日本語テキスト", "🙂🙃", "é"],
        "long": ["x" * 10_000, "y" * 9_999, ("ab" * 5_000)],
        "numeric_strings": [str(i) for i in range(500)],
        "random_ascii": [
            "".join(rng.choice("abcdefghij") for _ in range(rng.randint(1, 30)))
            for _ in range(500)
        ],
    }
    rows = [(cid, k) for cid, keys in corpora.items() for k in keys]
    df = spark.createDataFrame(rows, "cid string, key string")
    got = {
        (r["cid"], r["bucket"]): r["max_rho"]
        for r in hll_register_table(df, "key", ["cid"]).collect()
    }

    want: dict = {}
    for cid, keys in corpora.items():
        for k in keys:
            h = hashlib.md5(k.encode("utf-8")).hexdigest()
            bucket = int(h[:2], 16)
            w = int(h[2:14], 16)
            rho = 49 if w == 0 else 49 - w.bit_length()
            kk = (cid, bucket)
            want[kk] = max(want.get(kk, 0), rho)
    assert got == want


def test_cms_matches_python_on_adversarial_tokens(spark):
    """Counter cells from unicode/empty-ish token counts must equal the
    hashlib recompute, and lookups must never underestimate."""
    import hashlib

    from batch_process_spark.operators.sketches import cms_counter_table, cms_lookup

    counts = {"a": 100, "héllo": 7, "🙂": 3, "x" * 1000: 1, "0": 12, "00": 5}
    df = spark.createDataFrame(list(counts.items()), "token string, cnt long")
    counters = cms_counter_table(df, depth=3, width=8)
    got = {(r["row_salt"], r["bucket"]): r["cell"] for r in counters.collect()}

    want: dict = {}
    for tok, c in counts.items():
        for salt in range(3):
            b = int(hashlib.md5(f"{salt}:{tok}".encode()).hexdigest()[:8], 16) % 8
            want[(salt, b)] = want.get((salt, b), 0) + c
    assert got == want

    est = {
        r["token"]: r["cms_estimate"]
        for r in cms_lookup(df.select("token"), counters, depth=3, width=8).collect()
    }
    assert all(est[t] >= c for t, c in counts.items())


def test_bottom_k_sample_properties(spark):
    """The three contract properties: fixed size per group,
    mergeability (shard samples merge to the global sample), and
    membership stability under corpus growth."""
    from pyspark.sql import functions as F

    from batch_process_spark.operators.sketches import bottom_k_sample

    df = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], "grp long, id long"
    )
    s = bottom_k_sample(df, "grp", 5, "id")
    rows = s.collect()
    per = {}
    for r in rows:
        per.setdefault(r["grp"], set()).add(r["id"])
    assert all(len(v) == 5 for v in per.values())

    # mergeable: bottom-k of (bottom-k of shard A union bottom-k of B)
    # equals bottom-k of A union B
    a, b = df.filter("id < 150"), df.filter("id >= 150")
    merged = bottom_k_sample(
        bottom_k_sample(a, "grp", 5, "id").unionByName(
            bottom_k_sample(b, "grp", 5, "id")
        ),
        "grp", 5, "id",
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rows))

    # growth stability: adding rows never RESHUFFLES the sample — a
    # member leaves ONLY when evicted by a new smaller-hash arrival,
    # asserted against the actual hash values
    bigger = spark.createDataFrame([(i % 3, i) for i in range(600)], "grp long, id long")
    hashes = {
        r["id"]: r["h"]
        for r in bigger.select("id", F.xxhash64("id", F.lit(0)).alias("h")).collect()
    }
    s2 = {r["grp"]: set() for r in rows}
    for r in bottom_k_sample(bigger, "grp", 5, "id").collect():
        s2[r["grp"]].add(r["id"])
    new_ids = {i for i in range(300, 600)}
    for g in per:
        assert len(s2[g]) == 5
        evicted = per[g] - s2[g]
        newcomers = s2[g] - per[g]
        # every newcomer is genuinely new data, and each one's hash
        # beats every evicted member's hash (strict replacement)
        assert newcomers <= new_ids
        assert len(newcomers) == len(evicted)
        if evicted:
            assert max(hashes[n] for n in newcomers) < min(hashes[e] for e in evicted)
        # survivors are exactly the old members not displaced
        assert per[g] - evicted <= s2[g]
    # determinism: rerunning on the same data is identical
    again = bottom_k_sample(df, "grp", 5, "id").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
