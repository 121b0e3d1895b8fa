"""Query catalog part 18 (q239-q242): round-10 curation analytics —
the decisions a training-data pipeline makes AFTER the dedup/quality
measurements exist:

- q239: quality-aware survivor election — when a near-dup cluster
  collapses, keep the HIGHEST-QUALITY member instead of the min-id
  convention; the output prices exactly how much quality the naive
  convention leaves on the table (clusters changed, total/average
  score gain).
- q240: span-novelty ingestion curve — per ingestion decile (doc_id
  order), the fraction of spans never seen in any earlier document;
  the diminishing-returns curve that says when more of the same
  source stops adding content.
- q241: out-of-vocabulary rate per language against the corpus's own
  top-1000 vocabulary — the tokenizer-coverage proxy that flags
  languages/scripts the vocabulary underserves.
- q242: duplication x length interaction — average duplicated-content
  fraction per document-length decile; answers "is our duplication
  concentrated in short boilerplate or long mirrored documents",
  which decides whether a length floor substitutes for span dedup.

All four are full value-hash oracles over the standard tables.

Reference parity: beyond the reference (SURVEY §7 M6); LLM-pipeline
audits the brief adds on top of the reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_process_spark.functions.rounding import round_half_up
from batch_process_spark.operators import text
from batch_process_spark.operators.dedup import tokens_col
from batch_process_spark.queries import ORACLES, _q, _t
from batch_process_spark.queries_ext import DUCK_TOKENS
from batch_process_spark.queries_ext15 import _SPAN_SQL_CTES, _span_frame

import batch_process_spark.queries_ext15  # noqa: F401  (registers q207/q79 deps)
import batch_process_spark.queries_ext3  # noqa: F401  (registers q79's oracle)

# ---------------------------------------------------------------------------
# shared: the q222/q23 quality-score formula (unrounded; both engines
# evaluate the identical per-row expression, so comparisons/argmaxes
# see identical doubles)
# ---------------------------------------------------------------------------

_SCORE_SQL = (
    "greatest(1.0"
    " - least(CASE WHEN length({t}) > 0 THEN"
    "   length(regexp_replace({t}, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE / length({t})"
    "   ELSE 0.0 END * 2, 0.4)"
    " - least(CASE WHEN length({t}) > 0 THEN"
    "   length(regexp_replace({t}, '[^0-9]', '', 'g'))::DOUBLE / length({t})"
    "   ELSE 0.0 END * 2, 0.3)"
    " - CASE WHEN len({tok}) < 5 OR len({tok}) > 100000 THEN 0.3 ELSE 0.0 END,"
    " 0.0)"
)


def _score_col(t) -> F.Column:
    n_chars = F.length(t)
    punct = F.regexp_count(t, F.lit(r"[!-/:-@\[-`{-~]"))
    digits = F.regexp_count(t, F.lit(r"[0-9]"))
    n_tokens = text.token_count_ws(t)
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, digits / n_chars).otherwise(F.lit(0.0))
    return F.greatest(
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(0.4))
        - F.least(digit_ratio * 2, F.lit(0.3))
        - F.when((n_tokens < 5) | (n_tokens > 100000), 0.3).otherwise(0.0),
        F.lit(0.0),
    )


# ---------------------------------------------------------------------------
# q239: quality-aware survivor election for near-dup clusters
# ---------------------------------------------------------------------------


def _q239_oracle() -> str:
    score = _SCORE_SQL.format(t="text", tok=DUCK_TOKENS.format(t="text"))
    return f"""
    WITH cl AS ({ORACLES['q79_dedup_clusters']}),
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, concat(text, ' extra trailing words appended')
      FROM documents WHERE doc_id % 20 = 0
    ),
    q AS (SELECT doc_id, {score} AS q FROM corpus),
    j AS (SELECT node, component, q.q FROM cl JOIN q ON q.doc_id = cl.node),
    r AS (SELECT *, row_number() OVER (PARTITION BY component
                                       ORDER BY q DESC, node) AS rn FROM j),
    per AS (
      SELECT component,
             max(CASE WHEN rn = 1 THEN node END) AS best_node,
             CAST(floor((max(CASE WHEN rn = 1 THEN q END)
                         - max(CASE WHEN node = component THEN q END))
                        * 1000000 + 0.5) AS BIGINT) AS gain_u
      FROM r GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN best_node <> component THEN 1 ELSE 0 END) AS BIGINT)
             AS n_survivors_changed,
           floor(sum(gain_u)::DOUBLE / count(*) + 0.5) / 1000000 AS avg_quality_gain,
           floor(max(gain_u)::DOUBLE + 0.5) / 1000000 AS max_quality_gain
    FROM per
    """


@_q("q239_survivor_quality_pick", _q239_oracle())
def q239_survivor_quality_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor election: for every near-dup cluster
    (q79), the survivor SHOULD be the member with the highest quality
    score (ties to the lowest id), not the min-id convention — keeping
    the cleaner twin is free training-data quality. Output: how many
    clusters change survivors, and the average/maximum per-cluster
    score gain (quantized to 1e-6 units per cluster BEFORE averaging,
    so both engines average identical integers — the q01 micro-unit
    discipline).

    Scale shape: q79's clustering plus a node-sized score join; the
    election is one per-component argmax (max of a (score, -id)
    struct, no window over data-scale rows); final output is 1 row."""
    from batch_process_spark.queries_ext import _near_dup_corpus
    from batch_process_spark.queries_ext3 import q79_dedup_clusters

    sc = _near_dup_corpus(spark, sf_dir).select(
        F.col("doc_id").alias("sid"), _score_col(F.col("text")).alias("q")
    )
    cl = q79_dedup_clusters(spark, sf_dir)
    j = cl.join(sc, cl.node == sc.sid).select("node", "component", "q")
    per = j.groupBy("component").agg(
        F.max(F.struct(F.col("q"), (-F.col("node")).alias("negid"))).alias("best"),
        F.max(F.when(F.col("node") == F.col("component"), F.col("q"))).alias(
            "minid_q"
        ),
    )
    gain_u = F.floor(
        (F.col("best.q") - F.col("minid_q")) * 1_000_000 + F.lit(0.5)
    ).cast("long")
    changed = (-F.col("best.negid")) != F.col("component")
    per = per.select(changed.alias("changed"), gain_u.alias("gain_u"))
    return per.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("changed").cast("long")).alias("n_survivors_changed"),
        (
            F.floor(F.sum("gain_u").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
            / 1_000_000
        ).alias("avg_quality_gain"),
        (F.floor(F.max("gain_u").cast("double") + F.lit(0.5)) / 1_000_000).alias(
            "max_quality_gain"
        ),
    )


# ---------------------------------------------------------------------------
# q240: span-novelty ingestion curve
# ---------------------------------------------------------------------------


@_q(
    "q240_span_novelty_curve",
    f"""
    WITH {_SPAN_SQL_CTES},
    occ AS (SELECT DISTINCT doc_id, h FROM s),
    f AS (SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS first_doc
          FROM occ),
    per AS (
      SELECT doc_id, count(*) AS n_spans,
             sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS n_novel
      FROM f GROUP BY 1
    ),
    b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM per)
    SELECT least(CAST(floor((doc_id - lo) * 10.0 / (hi - lo + 1)) AS INT), 9)
             AS ingest_decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_spans) AS BIGINT) AS n_spans,
           floor(sum(n_novel)::DOUBLE / sum(n_spans) * 1000000 + 0.5) / 1000000
             AS novelty
    FROM per, b
    GROUP BY 1
    """,
)
def q240_span_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-novelty ingestion curve: walking the corpus in doc_id
    (ingestion) order, a span is NOVEL iff no earlier document contains
    it — per ingestion decile, the fraction of (distinct) spans that
    are novel. A flattening curve is the measured diminishing-returns
    signal: the marginal batch is mostly content the corpus already
    has, and the budget moves to a different source.

    Scale shape: the Arrow span kernel once, repartition on h, distinct
    + first-doc as a MIN WINDOW over h on that partitioning (the q207
    shape — no self-join, assembly runs once); the per-doc frame then
    buckets by doc_id RANGE deciles off a broadcast 1-row min/max (the
    q110 pattern — no global NTILE sort), final agg is 10 rows."""
    docs = _t(spark, sf_dir, "documents")
    occ = _span_frame(docs).repartition(F.col("h")).distinct()
    first = F.min("doc_id").over(Window.partitionBy("h"))
    f = occ.select("doc_id", (F.col("doc_id") == first).cast("long").alias("novel"))
    per = f.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"), F.sum("novel").alias("n_novel")
    )
    b = per.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    decile = F.least(
        F.floor(
            (F.col("doc_id") - F.col("lo")) * 10.0 / (F.col("hi") - F.col("lo") + 1)
        ).cast("int"),
        F.lit(9),
    )
    return (
        per.crossJoin(F.broadcast(b))
        .groupBy(decile.alias("ingest_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            round_half_up(F.sum("n_novel") / F.sum("n_spans"), 6).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# q241: OOV rate per language vs the corpus's own top vocabulary
# ---------------------------------------------------------------------------

_VOCAB_K = 1000


@_q(
    "q241_oov_rate",
    f"""
    WITH tok AS (
      SELECT lang, unnest({DUCK_TOKENS.format(t='text')}) AS term FROM documents
    ),
    tf AS (SELECT term, count(*) AS f FROM tok GROUP BY 1),
    top AS (SELECT term FROM tf ORDER BY f DESC, term LIMIT {_VOCAB_K})
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN top.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           floor(sum(CASE WHEN top.term IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*) * 1000000 + 0.5) / 1000000 AS oov_rate
    FROM tok LEFT JOIN top USING (term)
    GROUP BY lang
    """,
)
def q241_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against the corpus's OWN
    top-{K} vocabulary (count-ranked, ties to the term) — the
    tokenizer-coverage proxy: a language whose token mass falls mostly
    outside the shared vocabulary will fragment into long subword
    sequences, and its fertility (q221) and loss will degrade; this is
    the audit that catches it before training.

    Scale shape: one token explode feeds both the (term) count agg
    (map-side partials) and the membership probe; the top-K cut is
    orderBy+limit = TakeOrderedAndProject (per-partition heaps, never
    a global sort), and the K-row vocabulary broadcasts back — the
    token stream itself never joins a corpus-scale table."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(tokens_col("text")).alias("term"))
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    top = tf.orderBy(F.desc("f"), F.asc("term")).limit(_VOCAB_K).select("term")
    j = tok.join(F.broadcast(top).withColumn("__in", F.lit(1)), "term", "left")
    oov = F.when(F.col("__in").isNull(), 1).otherwise(0)
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(oov).cast("long").alias("n_oov"),
        round_half_up(F.sum(oov) / F.count(F.lit(1)), 6).alias("oov_rate"),
    )


q241_oov_rate.__doc__ = q241_oov_rate.__doc__.format(K=_VOCAB_K)


# ---------------------------------------------------------------------------
# q242: duplication x document-length interaction
# ---------------------------------------------------------------------------


@_q(
    "q242_dup_by_length",
    f"""
    WITH dupes AS ({ORACLES['q207_sliding_span_dedup']}),
    j AS (
      SELECT d.doc_id, length(d.text) AS n_chars, dup.dup_frac, dup.n_spans
      FROM documents d JOIN dupes dup ON dup.doc_id = d.doc_id
    ),
    b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM j)
    SELECT least(CAST(floor((n_chars - lo) * 10.0 / (hi - lo + 1)) AS INT), 9)
             AS len_decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_spans) AS BIGINT) AS n_spans,
           floor(avg(dup_frac) * 1000000 + 0.5) / 1000000 AS avg_dup_frac
    FROM j, b
    GROUP BY 1
    """,
)
def q242_dup_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication x length interaction: average sliding-span
    duplicated-content fraction (q207) per document-LENGTH decile
    (char-range buckets). If duplication concentrates in the short
    deciles it is boilerplate a length floor already removes; if the
    long deciles carry it, the corpus holds mirrored documents only
    span dedup can see — the table that decides which knife to use.
    Docs too short for spans (<8 words) are outside the audit, as in
    q207/q222.

    Scale shape: q207's per-doc frame joined doc-grained to a length
    projection; buckets come from a broadcast 1-row min/max (q110
    pattern); final agg is 10 rows."""
    from batch_process_spark.queries_ext15 import q207_sliding_span_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    dup = q207_sliding_span_dedup(spark, sf_dir).select(
        "doc_id", "dup_frac", "n_spans"
    )
    j = docs.join(dup, "doc_id")
    b = j.agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
    decile = F.least(
        F.floor(
            (F.col("n_chars") - F.col("lo")) * 10.0 / (F.col("hi") - F.col("lo") + 1)
        ).cast("int"),
        F.lit(9),
    )
    return (
        j.crossJoin(F.broadcast(b))
        .groupBy(decile.alias("len_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            round_half_up(F.avg("dup_frac"), 6).alias("avg_dup_frac"),
        )
    )
