"""Tests for query-catalog part 17 (q229-q234): closed-form fixtures
where the metric is known by construction (the DuckDB oracle pins the
same queries value-for-value on the real tables; these pin the
SEMANTICS on inputs whose answer is derivable by hand)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark, rows, path):
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_zipf_slope_exact_minus_one_on_two_point_fit(spark, tmp_path):
    """With exactly two vocabulary terms at frequencies 4 and 2, the
    OLS fit through (ln1, ln4), (ln2, ln2) has slope EXACTLY
    (ln2 - ln4)/(ln2 - ln1) = -1 — the Zipf ideal by construction.
    A second source with frequencies 8 and 2 gives slope -2."""
    from batch_process_spark.queries_ext16 import q229_zipf_slope

    d = str(tmp_path)
    _docs(
        spark,
        [
            ("aa aa aa aa bb bb", "s1"),
            ("cc cc cc cc cc cc cc cc dd dd", "s2"),
        ],
        d,
    )
    out = {r["source"]: (r["n_terms"], r["zipf_slope"]) for r in
           q229_zipf_slope(spark, d).collect()}
    assert out["s1"] == (2, -1.0)
    assert out["s2"] == (2, -2.0)


def test_dedup_threshold_curve_closed_form(spark, tmp_path):
    """Three docs with dup_frac 1.0 / 0.75 / 0.0 (the q207 fixture
    shapes) -> histogram buckets 9 / 7 / 0; the suffix-sum curve
    publishes thresholds 0.9 (1 doc, its 10 tokens) and 0.7
    (2 docs, 21 tokens) over 31 total tokens."""
    from batch_process_spark.queries_ext16 import q230_dedup_threshold_curve

    base = "one two three four five six seven eight nine ten"
    d = str(tmp_path)
    _docs(
        spark,
        [
            (base, "s"),                   # 3 spans, all dup'd in doc 1 -> 1.0
            ("zzz " + base, "s"),          # 4 spans, 3 dup'd -> 0.75
            ("a b c d e f g h i j", "s"),  # clean -> 0.0
        ],
        d,
    )
    rows = {r["threshold"]: r for r in q230_dedup_threshold_curve(spark, d).collect()}
    assert set(rows) == {0.9, 0.7}
    assert rows[0.9]["docs_dropped"] == 1 and rows[0.9]["tokens_dropped"] == 10
    assert rows[0.7]["docs_dropped"] == 2 and rows[0.7]["tokens_dropped"] == 21
    exp = math.floor(21 / 31 * 1_000_000 + 0.5) / 1_000_000
    assert rows[0.7]["frac_tokens_dropped"] == exp


def _write_embeddings(spark, vecs, path):
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def test_context_budget_pack_cuts_at_the_window(spark, tmp_path):
    """Six 250-token docs, budget 600: every query keeps EXACTLY its
    top-2 candidates (cum 250, 500 fit; 750 overflows), cum_tokens is
    the running prefix, and ranks are contiguous from 1."""
    import numpy as np

    from batch_process_spark.queries_ext16 import q231_context_budget_pack

    d = str(tmp_path)
    rng = np.random.default_rng(5)
    _write_embeddings(spark, rng.normal(size=(6, 64)), d)
    text = " ".join(f"tok{i}" for i in range(250))
    _docs(spark, [(text, "s")] * 6, d)

    out = q231_context_budget_pack(spark, d).collect()
    per_q: dict = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    for qid, rows in per_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2]
        assert [r["cum_tokens"] for r in rows] == [250, 500]
        assert all(r["n_tokens"] == 250 for r in rows)


def test_matryoshka_identity_and_planted_prefix_collision(spark, tmp_path):
    """The full-dim row is recall 1.0 by construction. A corpus where
    vectors 20 and 21 are distinguishable only ABOVE dim 16 (identical
    first 16 dims; query 0 is vector 20's full twin) loses vector 20
    from query 0's top-1 at prefix 16 only probabilistically — so the
    structural assertions are: three rows, n_queries 20 each, full-dim
    recall exactly 1.0, and every recall in [0, 1] with
    recall(16) <= recall(32) monotonicity NOT asserted (truncation is
    not monotone in general); the value-level pin lives in the DuckDB
    oracle on the real embeddings table."""
    import numpy as np

    from batch_process_spark.queries_ext16 import q232_matryoshka_eval

    d = str(tmp_path)
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(30, 64))
    vecs[21, :16] = vecs[20, :16]  # prefix-16 collision pair
    _write_embeddings(spark, vecs, d)

    rows = {r["prefix_dim"]: r for r in q232_matryoshka_eval(spark, d).collect()}
    assert set(rows) == {64, 32, 16}
    for dim, r in rows.items():
        assert r["n_queries"] == 20
        assert 0.0 <= r["recall_at_10"] <= 1.0
    assert rows[64]["recall_at_10"] == 1.0


def test_license_propagation_restrictive_wins(spark, tmp_path):
    """Two near-identical docs (q79's minhash finds them) from sources
    src0 (tier 0) and src2 (tier 2): the surviving min-id doc is the
    permissive one, but the cluster's effective tier must be 2 — the
    restricted twin's terms survive its deletion."""
    from batch_process_spark.queries_ext16 import q233_license_propagation

    base = " ".join(f"word{i}" for i in range(40))
    spark.createDataFrame(
        [
            (1, base, "en", "src0", len(base)),
            (2, base + " tail", "en", "src2", len(base) + 5),
            (40, " ".join(f"other{i}" for i in range(40)), "en", "src1", 300),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    rows = {
        (r["survivor_tier"], r["effective_tier"]): (r["n_clusters"], r["docs_absorbed"])
        for r in q233_license_propagation(spark, str(tmp_path)).collect()
    }
    # q79's near-dup corpus plants a mutated copy of doc-id%20==0 docs:
    # doc 40's twin (1000040) forms a (tier 1, tier 1) cluster of size 2
    assert rows[(0, 2)] == (1, 1)
    assert rows[(1, 1)] == (1, 1)
    assert set(rows) == {(0, 2), (1, 1)}


def test_epoch_plan_uniform_split_closed_form(spark, tmp_path):
    """Two sources, 100 vs 400 unique tokens (plus one exact duplicate
    doc that must NOT count): budget = 4 x 500 = 2000, uniform split
    1000 each -> srcA repeats 10 epochs (over cap), srcB 2.5 (under)."""
    from batch_process_spark.queries_ext16 import q234_epoch_mixture_plan

    ta = " ".join(f"a{i}" for i in range(100))
    tb = " ".join(f"b{i}" for i in range(400))
    spark.createDataFrame(
        [
            (0, ta, "en", "srcA", len(ta)),
            (1, ta, "en", "srcA", len(ta)),  # exact dup: zero effective tokens
            (2, tb, "en", "srcB", len(tb)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    rows = {r["source"]: r for r in q234_epoch_mixture_plan(spark, str(tmp_path)).collect()}
    assert rows["srcA"]["effective_tokens"] == 100
    assert rows["srcB"]["effective_tokens"] == 400
    assert rows["srcA"]["allocated_tokens"] == 1000
    assert rows["srcA"]["epochs"] == 10.0 and rows["srcA"]["over_cap"] is True
    assert rows["srcB"]["epochs"] == 2.5 and rows["srcB"]["over_cap"] is False


def test_label_confusion_finds_the_planted_mislabel(spark, tmp_path):
    """Two orthogonal-direction label clusters; one vector carries
    label 1 but points along label 0's direction — the confusion
    matrix must show exactly that one off-diagonal cell."""
    from batch_process_spark.queries_ext16 import q235_label_confusion

    d = str(tmp_path)
    rows = []
    for i in range(10):  # label 0: +x axis
        rows.append((i, [10.0, 0.0] + [0.1 * (i % 3)] * 62, 0))
    for i in range(10, 20):  # label 1: +y axis
        rows.append((i, [0.0, 10.0] + [0.1 * (i % 3)] * 62, 1))
    rows.append((99, [10.0, 0.0] + [0.0] * 62, 1))  # mislabeled
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    out = {
        (r["true_label"], r["predicted_label"]): r["n_vectors"]
        for r in q235_label_confusion(spark, d).collect()
    }
    assert out[(0, 0)] == 10          # clean label-0 vectors stay
    assert out[(1, 0)] == 1           # the planted mislabel crosses
    assert out.get((1, 1), 0) == 10   # clean label-1 vectors stay
    assert (0, 1) not in out


def test_lsh_blocking_eval_closed_form(spark, tmp_path):
    """Three near-identical vectors (pairwise cosine ~1, same LSH
    bucket) + one isolated opposite-direction vector: exact pairs = 3
    (the clique), candidates = the clique's 3 (the isolate shares no
    bucket... or if it does, its pairs fail the verify), recall 1.0,
    and every verified pair is exact -> precision consistency:
    n_verified <= n_candidates and pair_recall = n_verified/n_exact."""
    import numpy as np

    from batch_process_spark.queries_ext16 import q236_lsh_blocking_eval

    d = str(tmp_path)
    base = np.ones(64)
    rows = [
        (0, base + 0.01), (1, base + 0.02), (2, base + 0.03),
        (3, -base),
    ]
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    r = q236_lsh_blocking_eval(spark, d).collect()[0]
    assert r["n_exact_pairs"] == 3            # the clique; -base fails 0.3
    assert r["n_verified"] == 3               # same bucket (identical signs)
    assert r["pair_recall"] == 1.0
    assert r["n_verified"] <= r["n_candidates"]


def test_soft_dedup_weights_sum_to_content_units(spark, tmp_path):
    """A 2-doc near-dup pair weighs 1/2 each; singletons weigh 1 — the
    source's effective mass equals its count of distinct content
    units. The planted %20==0 mutated twin halves doc 0's weight."""
    from batch_process_spark.queries_ext16 import q237_soft_dedup_weights

    base = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(40))
    spark.createDataFrame(
        [
            (0, base, "en", "srcA", len(base)),    # %20==0 -> mutated twin planted
            (1, other, "en", "srcB", len(other)),  # singleton
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    rows = {r["source"]: r for r in q237_soft_dedup_weights(spark, str(tmp_path)).collect()}
    # srcA: doc 0 + its mutated copy (both attribute to srcA), each 0.5
    assert rows["srcA"]["n_docs"] == 2
    assert rows["srcA"]["effective_docs"] == 1.0
    assert rows["srcA"]["mean_weight"] == 0.5
    assert rows["srcB"]["n_docs"] == 1 and rows["srcB"]["effective_docs"] == 1.0


def test_crosslingual_neardup_finds_the_planted_translation_pair(spark, tmp_path):
    """Two near-identical embeddings with different langs land in the
    off-diagonal (en, fr) cell; a same-lang pair lands on the
    diagonal with n_cross 0."""
    import numpy as np

    from batch_process_spark.queries_ext16 import q238_crosslingual_neardup

    d = str(tmp_path)
    base = np.ones(64)
    vecs = [
        (0, base + 0.01), (1, base + 0.02),      # en-fr translation pair
        (10, -base + 0.01), (11, -base + 0.02),  # de-de same-lang pair
    ]
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    text = " ".join(f"t{i}" for i in range(20))
    spark.createDataFrame(
        [(0, text, "en", "s", 1), (1, text, "fr", "s", 1),
         (10, text, "de", "s", 1), (11, text, "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    rows = {(r["lang_a"], r["lang_b"]): r for r in
            q238_crosslingual_neardup(spark, d).collect()}
    assert rows[("en", "fr")]["n_pairs"] == 1 and rows[("en", "fr")]["n_cross"] == 1
    assert rows[("de", "de")]["n_pairs"] == 1 and rows[("de", "de")]["n_cross"] == 0
