"""Tests for query-catalog part 18 (q239-q247): closed-form fixtures
where the metric is known by construction (the DuckDB oracle pins the
same queries value-for-value on the real tables; these pin the
SEMANTICS on inputs whose answer is derivable by hand)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark, rows, path):
    spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _py_score(text: str) -> float:
    """Plain-Python twin of the q222/q239 quality formula."""
    import re

    n = len(text)
    punct = len(re.findall(r"[!-/:-@\[-`{-~]", text))
    digits = len(re.findall(r"[0-9]", text))
    toks = len(re.findall(r"[0-9a-zA-Z]+", text))
    score = (
        1.0
        - min(punct / n * 2 if n else 0.0, 0.4)
        - min(digits / n * 2 if n else 0.0, 0.3)
        - (0.3 if (toks < 5 or toks > 100000) else 0.0)
    )
    return max(score, 0.0)


def test_q239_quality_survivor_beats_min_id(spark, tmp_path):
    """One planted near-dup cluster: the base doc (id 0) carries digit
    penalty; its mutated copy (+1000000, four clean appended words)
    dilutes the digit ratio and scores HIGHER — so the quality-aware
    election changes the survivor, and the gain equals the hand-
    computed score difference (quantized at 1e-6)."""
    from batch_process_spark.queries_ext17 import q239_survivor_quality_pick

    # alpha-only filler (digits in the filler would hit the 0.3 cap on
    # BOTH sides and tie the scores) + two digit tokens for the penalty
    base = " ".join(f"w{chr(97 + i) * 4}" for i in range(18)) + " 99 88"
    mutated = base + " extra trailing words appended"
    d = str(tmp_path)
    _docs(spark, [(base, "en")], d)

    rows = q239_survivor_quality_pick(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    gain = _py_score(mutated) - _py_score(base)
    assert gain > 0  # the mutated copy really is cleaner
    exp = math.floor(gain * 1_000_000 + 0.5) / 1_000_000
    assert r["n_clusters"] == 1
    assert r["n_survivors_changed"] == 1
    assert r["avg_quality_gain"] == exp
    assert r["max_quality_gain"] == exp


def test_q239_no_gain_when_copies_tie(spark, tmp_path):
    """An EXACT-duplicate pair (two identical docs, no mutation edge)
    ties on quality, so min-id keeps the survivorship and the gain is
    zero."""
    from batch_process_spark.queries_ext17 import q239_survivor_quality_pick

    text = " ".join(f"tok{i}" for i in range(20))
    d = str(tmp_path)
    # two identical docs; doc_id 1 is not %20==0 so no mutated copies
    # enter except doc 0's — make BOTH ids non-multiples of 20 by
    # offsetting: write explicitly
    spark.createDataFrame(
        [(1, text, "en", "src0", len(text)), (2, text, "en", "src0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    r = q239_survivor_quality_pick(spark, d).collect()[0]
    assert r["n_clusters"] == 1 and r["n_survivors_changed"] == 0
    assert r["avg_quality_gain"] == 0.0 and r["max_quality_gain"] == 0.0


def test_q240_novelty_curve_closed_form(spark, tmp_path):
    """Three 10-word docs: doc0 unique, doc1 an exact copy of doc0
    (zero novel spans), doc2 unique. Ingest deciles by id range
    (0..2 -> buckets 0/3/6); novelty 1.0 / 0.0 / 1.0."""
    from batch_process_spark.queries_ext17 import q240_span_novelty_curve

    s = "one two three four five six seven eight nine ten"
    u = "alpha beta gamma delta epsi zeta eta theta iota kappa"
    d = str(tmp_path)
    _docs(spark, [(s, "en"), (s, "en"), (u, "en")], d)

    out = {r["ingest_decile"]: r for r in q240_span_novelty_curve(spark, d).collect()}
    assert set(out) == {0, 3, 6}
    assert out[0]["n_docs"] == 1 and out[0]["n_spans"] == 3 and out[0]["novelty"] == 1.0
    assert out[3]["novelty"] == 0.0  # the copy saw every span already
    assert out[6]["novelty"] == 1.0


def test_q241_oov_rate_vocab_cut(spark, tmp_path):
    """Language 'aa' supplies exactly 1000 distinct terms at frequency
    2 (they fill the whole top-1000 vocabulary); language 'bb' supplies
    5 singleton terms that fall outside the cut -> OOV 0.0 vs 1.0."""
    from batch_process_spark.queries_ext17 import q241_oov_rate

    common = " ".join(f"w{i:04d}" for i in range(1000))
    d = str(tmp_path)
    _docs(
        spark,
        [(common + " " + common, "aa"), ("zz1 zz2 zz3 zz4 zz5", "bb")],
        d,
    )
    out = {r["lang"]: r for r in q241_oov_rate(spark, d).collect()}
    assert out["aa"]["n_tokens"] == 2000 and out["aa"]["oov_rate"] == 0.0
    assert out["bb"]["n_tokens"] == 5 and out["bb"]["n_oov"] == 5
    assert out["bb"]["oov_rate"] == 1.0


def test_q242_dup_by_length_closed_form(spark, tmp_path):
    """Duplicated pair at SHORT length, unique doc at LONG length: the
    short decile carries avg_dup_frac 1.0, the long decile 0.0, and
    the bucket ids follow the char-range formula."""
    from batch_process_spark.queries_ext17 import q242_dup_by_length

    short = "one two three four five six seven eight nine ten"
    long = " ".join(f"unique{i:02d}word" for i in range(30))
    d = str(tmp_path)
    _docs(spark, [(short, "en"), (short, "en"), (long, "en")], d)

    out = {r["len_decile"]: r for r in q242_dup_by_length(spark, d).collect()}
    lo, hi = len(short), len(long)
    b_short = min(int((len(short) - lo) * 10.0 // (hi - lo + 1)), 9)
    b_long = min(int((len(long) - lo) * 10.0 // (hi - lo + 1)), 9)
    assert set(out) == {b_short, b_long}
    assert out[b_short]["n_docs"] == 2 and out[b_short]["avg_dup_frac"] == 1.0
    assert out[b_long]["n_docs"] == 1 and out[b_long]["avg_dup_frac"] == 0.0


def _embs(spark, vecs_labels, path):
    spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(vecs_labels)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def test_q243_dim_variance_closed_form(spark, tmp_path):
    """Two vectors [0,1,5] and [2,3,5]: per-dim population variance
    1.0 / 1.0 / 0.0 -> 3 dims, 1 dead (the constant dim), min 0,
    max 1, mean 2/3."""
    from batch_process_spark.queries_ext17 import q243_dim_variance

    d = str(tmp_path)
    _embs(spark, [((0.0, 1.0, 5.0), 0), ((2.0, 3.0, 5.0), 1)], d)
    r = q243_dim_variance(spark, d).collect()[0]
    assert r["n_dims"] == 3 and r["n_dead_dims"] == 1
    assert r["min_variance"] == 0.0 and r["max_variance"] == 1.0
    assert r["mean_variance"] == 0.666667


def test_q244_anisotropy_closed_form(spark, tmp_path):
    """Orthonormal pair [1,0], [0,1]: centroid (0.5, 0.5) has norm
    sqrt(0.5); every vector has norm 1 -> anisotropy 0.707107. A
    narrow cone ([1,0] twice) scores exactly 1."""
    import math

    from batch_process_spark.queries_ext17 import q244_anisotropy

    d = str(tmp_path)
    _embs(spark, [((1.0, 0.0), 0), ((0.0, 1.0), 1)], d)
    r = q244_anisotropy(spark, d).collect()[0]
    assert r["n_vectors"] == 2 and r["mean_norm"] == 1.0
    exp = math.floor(math.sqrt(0.5) * 1e6 + 0.5) / 1e6
    assert r["centroid_norm"] == exp and r["anisotropy"] == exp

    _embs(spark, [((1.0, 0.0), 0), ((1.0, 0.0), 1)], d + "/cone")
    r2 = q244_anisotropy(spark, d + "/cone").collect()[0]
    assert r2["anisotropy"] == 1.0


def test_q245_hubness_closed_form(spark, tmp_path):
    """With k >= sample-1 every vector sits in every other vector's
    top-k, so the k-occurrence histogram is one bucket at n-1; a
    planted hub (one vector maximally aligned with everyone under
    k=1... checked via 3 near-axis vectors where the middle one is
    both neighbors' top-1 while the extremes split) lands the hub at
    k_occ 2 and the extremes at 0 and 1."""
    from batch_process_spark.queries_ext17 import q245_hubness_audit

    d = str(tmp_path)
    # 3 vectors, k=10 >= 2: all-pairs -> every k_occ = 2
    _embs(spark, [((1.0, 0.0), 0), ((0.8, 0.6), 1), ((0.0, 1.0), 2)], d)
    out = {r["k_occurrence"]: r["n_vectors"] for r in
           q245_hubness_audit(spark, d).collect()}
    assert out == {2: 3}


def test_q246_jsd_closed_form(spark, tmp_path):
    """One source == the corpus -> JSD exactly 0. Two equal-mass
    DISJOINT sources -> each source's divergence from the corpus
    marginal equals the hand-computed mixture constant
    0.5*log2(4/3) + 0.25*log2(2/3) + 0.25 (~0.311278 bits),
    identical for both sources by symmetry."""
    import math

    from batch_process_spark.queries_ext17 import q246_source_token_jsd

    d = str(tmp_path)
    _docs(spark, [("aa bb cc dd", "only")], d)
    rows = q246_source_token_jsd(spark, d).collect()
    assert len(rows) == 1 and rows[0]["jsd_bits"] == 0.0

    d2 = str(tmp_path / "two")
    spark.createDataFrame(
        [(0, "aa bb cc dd", "en", "s1", 11), (1, "ee ff gg hh", "en", "s2", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d2}/documents.parquet")
    exp = 0.5 * math.log2(4 / 3) + 0.25 * math.log2(2 / 3) + 0.25
    exp = math.floor(exp * 1e6 + 0.5) / 1e6
    out = {r["source"]: r["jsd_bits"] for r in
           q246_source_token_jsd(spark, d2).collect()}
    assert out == {"s1": exp, "s2": exp}


def test_q247_containment_closed_form(spark, tmp_path):
    """A 12-word doc whose words are exactly the PREFIX of a 16-word
    doc: all 5 of A's spans occur in B -> containment(A in B) = 1.0;
    the reverse direction (5 of B's 9 spans) is 0.56 and filtered by
    the 0.9 threshold; an unrelated doc never appears."""
    from batch_process_spark.queries_ext17 import q247_span_containment

    words = [f"w{chr(97 + i)}" for i in range(16)]
    a = " ".join(words[:12])     # 5 spans
    b = " ".join(words)          # 9 spans, first 5 shared
    u = " ".join(f"u{i}" for i in range(12))
    d = str(tmp_path)
    _docs(spark, [(a, "en"), (b, "en"), (u, "en")], d)

    rows = q247_span_containment(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["contained"], r["container"]) == (0, 1)
    assert r["shared_spans"] == 5 and r["n_spans"] == 5
    assert r["containment"] == 1.0
