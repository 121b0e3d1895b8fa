"""Non-vacuity + semantics tests for the part-7 query catalog (q101+)."""

import pytest

from batch_process_spark.queries import QUERIES
import batch_process_spark.queries_ext6  # noqa: F401  (registers q101+)

SF = "/root/testdata/sf0.001"


def test_q101_binding_group_and_downsampling(spark):
    """Exactly one group must be binding (rate 10000) and the others
    strictly downsampled at distinct rates — both branches of the
    least/floor derivation exercised; kept counts within rate bounds."""
    rows = QUERIES["q101_mixture_rebalance"](spark, SF).collect()
    assert len(rows) == 4
    rates = sorted(r["rate"] for r in rows)
    assert rates[-1] == 10000 and rates[-2] < 10000
    assert len(set(rates)) == 4, "degenerate targets: rates must differ"
    for r in rows:
        assert 0 < r["n_kept"] and r["kept_chars"] > 0


def test_q101_rates_track_targets(spark):
    """Derived rates must be ordered like the target shares: a larger
    share never gets a smaller keep rate (masses are ~uniform)."""
    rows = {r["grp"]: r["rate"] for r in QUERIES["q101_mixture_rebalance"](spark, SF).collect()}
    assert rows[0] >= rows[1] >= rows[2] >= rows[3]


def test_q102_threshold_splits_corpus(spark):
    """The 3.4-nat NLL threshold must flag SOME docs but not ALL, and
    every scored doc is counted exactly once."""
    rows = QUERIES["q102_bigram_lm_score"](spark, SF).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_high = sum(r["n_high"] for r in rows)
    assert 0 < n_high < n_docs
    for r in rows:
        assert 0.0 < r["avg_nll"] <= r["max_nll"]


def test_q101_plan_broadcasts_rates(spark):
    """The rate table must come back to the corpus as a BROADCAST hash
    join — a shuffle join on a 4-row dim would be a plan regression."""
    plan = QUERIES["q101_mixture_rebalance"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q103_kmeans_partitions_all_vectors(spark):
    """Every vector lands in exactly one cluster; clusters are
    non-trivial (more than one cluster survives two iterations) and
    distances are non-negative."""
    rows = QUERIES["q103_kmeans"](spark, SF).collect()
    assert 2 <= len(rows) <= 4
    total = sum(r["n_vectors"] for r in rows)
    assert total == 500  # embeddings table row count at sf0.001
    for r in rows:
        assert r["avg_sqdist"] >= 0.0


def test_q103_kmeans_iteration_improves(spark):
    """Two Lloyd iterations must not be a no-op: the final assignment
    must differ from assigning straight to the init centroids (else
    the recompute step is dead code on this data)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from batch_process_spark.queries import _t

    emb = _t(spark, SF, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "vf")
    ).select("vec_id", "pos", F.col("vf").cast("double").alias("v"))
    c0 = dims.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), "pos", F.col("v").alias("c")
    )
    d0 = (
        dims.join(F.broadcast(c0), "pos")
        .groupBy("vec_id", "cid")
        .agg(F.sum((F.col("v") - F.col("c")) ** 2).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    a0 = (
        d0.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .groupBy("cid")
        .count()
        .collect()
    )
    init_sizes = sorted((r["cid"], r["count"]) for r in a0)
    final = QUERIES["q103_kmeans"](spark, SF).collect()
    final_sizes = sorted((r["cluster"], r["n_vectors"]) for r in final)
    assert init_sizes != final_sizes


def test_q104_funnel_monotone_dropoff(spark):
    """Stage counts must be non-increasing, non-vacuous at every stage
    (some users drop at each boundary, some survive to purchase)."""
    row = QUERIES["q104_funnel"](spark, SF).collect()[0]
    ns = [row["n_signup"], row["n_view"], row["n_click"], row["n_purchase"]]
    assert ns[0] >= ns[1] >= ns[2] >= ns[3]
    assert ns[0] > ns[3], "no drop-off anywhere (vacuous window)"
    assert ns[3] >= 1, "nobody converts (vacuous funnel)"
    assert abs(row["conv"] - round(ns[3] / ns[0], 4)) < 1e-9


def test_q105_cohort_triangle(spark):
    """Offset-0 count per cohort must equal the cohort size (every
    user is active in their own first week) and dominate later
    offsets; offsets are non-negative."""
    rows = QUERIES["q105_retention_cohorts"](spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r["week_offset"] >= 0
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets
        assert offsets[0] == max(offsets.values())


def test_ngram_frame_matches_hof_form(spark):
    """The Arrow gram kernel must emit exactly the HOF form's grams
    (frequency-preserving) — q102's oracle parity rides on this."""
    from pyspark.sql import functions as F
    from batch_process_spark.operators.text import ngram_frame, ngrams_col

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hof = (
        docs.select("doc_id", F.explode(ngrams_col("text", 2)).alias("g"))
        .groupBy("doc_id", "g")
        .count()
    )
    ker = ngram_frame(docs, ["doc_id"], "text", 2).groupBy("doc_id", "g").count()
    assert hof.exceptAll(ker).count() == 0
    assert ker.exceptAll(hof).count() == 0


def test_ngram_frame_edge_cases(spark):
    """Empty / single-token / punctuation-only / NULL docs emit
    nothing; mixed-case + padding tokenizes like tokens_col."""
    from batch_process_spark.operators.text import ngram_frame

    edge = spark.createDataFrame(
        [(1, ""), (2, "hello"), (3, "!!! ??"), (4, None), (5, "  A b  ")],
        "doc_id int, text string",
    )
    got = sorted(map(tuple, ngram_frame(edge, ["doc_id"], "text", 2).collect()))
    assert got == [(5, "a b")]


def test_distinct_tokens_frame_matches_hof(spark):
    """Kernel vocabulary == HOF vocabulary (count and set)."""
    from pyspark.sql import functions as F
    from batch_process_spark.operators.dedup import tokens_col
    from batch_process_spark.operators.text import distinct_tokens_frame

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hof = docs.select(F.explode(tokens_col("text")).alias("t")).distinct()
    ker = distinct_tokens_frame(docs, "text").distinct()
    assert hof.exceptAll(ker).count() == 0
    assert ker.exceptAll(hof).count() == 0


def test_q106_props_deciles_complete(spark):
    """Every (type, decile) count positive; deciles within 0..9; the
    JSON extraction must never produce NULL k on the testdata."""
    rows = QUERIES["q106_props_json"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["k_decile"] <= 9
        assert r["n_events"] > 0 and r["max_k"] <= 99


def test_q107_anomaly_flags_some_not_all(spark):
    """|z|>2 must flag SOME hours somewhere but never all of a type's
    hours; max |z| is positive once any type has variance."""
    rows = QUERIES["q107_hourly_anomaly"](spark, SF).collect()
    assert rows
    total_hours = sum(r["n_hours"] for r in rows)
    total_anom = sum(r["n_anomalies"] for r in rows)
    assert 0 < total_anom < total_hours
    for r in rows:
        assert r["n_anomalies"] < r["n_hours"]
        assert r["max_abs_z"] >= 0.0


def test_q108_rows_normalize_to_one(spark):
    """Each cur row's probabilities must sum to ~1 (rounding to 4dp
    can drift the sum by <= n*5e-5) and transitions must be positive."""
    rows = QUERIES["q108_markov_transitions"](spark, SF).collect()
    assert rows
    by_cur = {}
    for r in rows:
        assert r["n_transitions"] > 0 and 0.0 < r["prob"] <= 1.0
        by_cur.setdefault(r["cur"], []).append(r["prob"])
    for cur, ps in by_cur.items():
        assert abs(sum(ps) - 1.0) < 5e-4 * len(ps)


def test_q109_sample_prefers_heavy_docs(spark):
    """The weighted sample must draw 50 docs total and favor longer
    docs: the sampled docs' mean n_chars must exceed the corpus mean
    (w = n_chars makes that overwhelmingly likely at 50 draws)."""
    from pyspark.sql import functions as F
    from batch_process_spark.queries import _t
    from batch_process_spark.queries_ext4 import _hash_bucket

    rows = QUERIES["q109_weighted_sample"](spark, SF).collect()
    assert sum(r["n_sampled"] for r in rows) == 50
    docs = _t(spark, SF, "documents").filter(F.col("n_chars") > 0)
    bucket = _hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(":wsample")))
    key = F.log((bucket + F.lit(1.0)) / F.lit(10001.0)) / F.col("n_chars")
    top = docs.select("n_chars", key.alias("k")).orderBy(F.desc("k")).limit(50)
    sampled_mean = top.agg(F.avg("n_chars")).collect()[0][0]
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sampled_mean > corpus_mean
