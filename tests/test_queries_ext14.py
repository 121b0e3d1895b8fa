"""Tests for query-catalog part 15: corpus-composition diagnostics
(q202 source-pair n-gram overlap, q203 type-token ratio, q204 n-gram
novelty curve) — closed-form fixtures where the metric's value is
known by construction, independent of the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_source_overlap_identical_and_disjoint(spark, tmp_path):
    """Two identical sources -> Jaccard 1.0; a third sharing nothing
    -> 0 rows against it (inner join on grams emits no pair)."""
    from batch_process_spark.queries_ext14 import q202_source_ngram_overlap

    df = _docs(
        spark,
        [
            ("alpha beta gamma delta", "en", "s1"),
            ("alpha beta gamma delta", "en", "s2"),
            ("zz yy xx ww", "en", "s3"),
        ],
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        (r["source_a"], r["source_b"]): r["jaccard_sim"]
        for r in q202_source_ngram_overlap(spark, d).collect()
    }
    assert out == {("s1", "s2"): 1.0}


def test_type_token_ratio_closed_form(spark, tmp_path):
    """'a a a a' -> TTR 0.25; 'a b c d' -> TTR 1.0."""
    from batch_process_spark.queries_ext14 import q203_type_token_ratio

    df = _docs(spark, [("a a a a", "en", "rep"), ("a b c d", "en", "div")])
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        r["source"]: (r["n_tokens"], r["ttr"])
        for r in q203_type_token_ratio(spark, d).collect()
    }
    assert out == {"rep": (4, 0.25), "div": (4, 1.0)}


def test_novelty_curve_conservation_and_monotonicity(spark, tmp_path):
    """The curve's cumulative total equals the corpus' distinct-gram
    count (every gram lands in exactly one decile — its first), and
    a repeat-only tail contributes zero new grams."""
    from batch_process_spark.operators.dedup import shingles_col
    from batch_process_spark.queries_ext14 import q204_ngram_novelty_curve

    rows = [("the quick brown fox jumps", "en", "s")] + [
        ("the quick brown fox jumps", "en", "s")
    ] * 9  # docs 1..9 repeat doc 0 exactly
    df = _docs(spark, rows)
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = sorted(
        (r["decile"], r["new_grams"], r["cum_grams"])
        for r in q204_ngram_novelty_curve(spark, d).collect()
    )
    n_distinct = (
        df.select(F.explode(shingles_col("text", 3)).alias("g")).distinct().count()
    )
    assert out == [(0, n_distinct, n_distinct)]  # all novelty in decile 0
