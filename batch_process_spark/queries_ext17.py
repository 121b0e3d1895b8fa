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
- q243: embedding dimension health — per-dimension variance summary
  with a dead-dimension count (capacity a truncation or PQ layout
  should drop first).
- q244: embedding anisotropy — ||mean vector|| / mean ||vector||, the
  narrow-cone pathology scalar tracked per model version.
- q245: hubness audit — exact k-occurrence histogram of the cosine
  kNN graph on a bounded sample (hubs degrade kNN dedup/retrieval;
  antihubs are unreachable).
- q246: per-source token-distribution shift — Jensen-Shannon
  divergence of each source against the corpus marginal (the
  mixture-design companion to q101/q234).
- q247: span containment — asymmetric duplication (a doc whose spans
  live inside a longer container) that symmetric Jaccard under-scores;
  the quote/mirror/wrapper detector.

All nine are full value-hash oracles over the standard tables.

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
from batch_process_spark.queries_ext15 import (
    _SPAN_SQL_CTES,
    _span_occ,
    _span_scale_parts,
)

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
    occ = _span_occ(docs).distinct()
    first = F.min("doc_id").over(Window.partitionBy("h"))
    f = occ.select("doc_id", (F.col("doc_id") == first).cast("long").alias("novel"))
    # gated self-sizing of the per-doc exchange (occ-grain input) —
    # see _span_occ round-13 note; below the gate the plan is unchanged
    n = _span_scale_parts(docs)
    if n:
        f = f.repartition(n, "doc_id")
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


# ---------------------------------------------------------------------------
# q243: embedding dimension health — per-dimension variance table
# ---------------------------------------------------------------------------

_DEAD_VAR = 0.01  # a dimension below this variance is "dead" capacity


@_q(
    "q243_dim_variance",
    f"""
    WITH d AS (
      SELECT u.i - 1 AS pos, embedding[u.i]::DOUBLE AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    per AS (
      SELECT pos, CAST(count(*) AS BIGINT) AS n,
             floor((sum(v * v) / count(*)
                    - (sum(v) / count(*)) * (sum(v) / count(*)))
                   * 1000000 + 0.5) / 1000000 AS variance
      FROM d GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum(CASE WHEN variance < {_DEAD_VAR} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dead_dims,
           floor(min(variance) * 1000000 + 0.5) / 1000000 AS min_variance,
           floor(max(variance) * 1000000 + 0.5) / 1000000 AS max_variance,
           floor(avg(variance) * 1000000 + 0.5) / 1000000 AS mean_variance
    FROM per
    """,
)
def q243_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding dimension health: population variance per dimension,
    summarized as the dead-dimension count (variance < 0.01 — capacity
    the model pays for but cannot use), min/max/mean variance. A
    truncation plan (q232 matryoshka) or a PQ subspace layout should
    read this table first: dead or near-dead dimensions are the first
    to drop. Variance from the E[x^2]-E[x]^2 moments, both engines on
    the same formula, per-dim values rounded to 6dp BEFORE the summary
    (the 6dp grid is the comparison contract, not raw float sums).

    Scale shape: one posexplode into a (pos)-keyed partial agg — dims
    rows out of any corpus size; the summary is a 1-row reduce."""
    emb = _t(spark, sf_dir, "embeddings")
    d = emb.select(F.posexplode("embedding").alias("pos", "v")).select(
        "pos", F.col("v").cast("double").alias("v")
    )
    n = F.count(F.lit(1))
    var = F.sum(F.col("v") * F.col("v")) / n - (F.sum("v") / n) * (F.sum("v") / n)
    per = d.groupBy("pos").agg(round_half_up(var, 6).alias("variance"))
    dead = F.when(F.col("variance") < _DEAD_VAR, 1).otherwise(0)
    return per.agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.sum(dead).cast("long").alias("n_dead_dims"),
        round_half_up(F.min("variance"), 6).alias("min_variance"),
        round_half_up(F.max("variance"), 6).alias("max_variance"),
        round_half_up(F.avg("variance"), 6).alias("mean_variance"),
    )


# ---------------------------------------------------------------------------
# q244: embedding anisotropy — mean-vector norm vs mean vector norm
# ---------------------------------------------------------------------------


@_q(
    "q244_anisotropy",
    """
    WITH d AS (
      SELECT vec_id, u.i - 1 AS pos, embedding[u.i]::DOUBLE AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    centroid AS (SELECT pos, sum(v) / count(*) AS c FROM d GROUP BY 1),
    cn AS (SELECT sqrt(sum(c * c)) AS centroid_norm FROM centroid),
    vn AS (SELECT vec_id, sqrt(sum(v * v)) AS nv FROM d GROUP BY 1),
    mn AS (SELECT avg(nv) AS mean_norm, CAST(count(*) AS BIGINT) AS n_vectors
           FROM vn)
    SELECT n_vectors,
           floor(centroid_norm * 1000000 + 0.5) / 1000000 AS centroid_norm,
           floor(mean_norm * 1000000 + 0.5) / 1000000 AS mean_norm,
           floor(centroid_norm / mean_norm * 1000000 + 0.5) / 1000000
             AS anisotropy
    FROM cn, mn
    """,
)
def q244_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding anisotropy: ||mean vector|| / mean ||vector|| — 0 for
    a directionally balanced embedding space, toward 1 when every
    vector points the same way (the 'narrow cone' pathology that makes
    cosine similarities uniformly high and retrieval/clustering
    mushy). The single scalar an embedding-health dashboard tracks per
    model version next to q225's field checks.

    Scale shape: one posexplode feeding two tiny aggregates (dims-row
    centroid, 1-row norm means); nothing corpus-sized shuffles."""
    emb = _t(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("v"))
    centroid = d.groupBy("pos").agg(
        (F.sum("v") / F.count(F.lit(1))).alias("c")
    )
    cn = centroid.agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("centroid_norm"))
    vn = d.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"))
    mn = vn.agg(
        F.avg("nv").alias("mean_norm"), F.count(F.lit(1)).alias("n_vectors")
    )
    return cn.crossJoin(mn).select(
        "n_vectors",
        round_half_up(F.col("centroid_norm"), 6).alias("centroid_norm"),
        round_half_up(F.col("mean_norm"), 6).alias("mean_norm"),
        round_half_up(F.col("centroid_norm") / F.col("mean_norm"), 6).alias(
            "anisotropy"
        ),
    )


# ---------------------------------------------------------------------------
# q245: hubness audit — k-occurrence distribution on a bounded sample
# ---------------------------------------------------------------------------

_HUB_SAMPLE = 300  # fixed audit sample (the exact referee is O(n^2))
_HUB_K = 10


def _q245_oracle() -> str:
    from batch_process_spark.queries_ext import _DOT

    cos = (
        f"round({_DOT.format(a='a.embedding', b='b.embedding')} / "
        f"(sqrt({_DOT.format(a='a.embedding', b='a.embedding')}) * "
        f"sqrt({_DOT.format(a='b.embedding', b='b.embedding')})), 6)"
    )
    return f"""
    WITH s AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id < {_HUB_SAMPLE}),
    scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid, {cos} AS score
      FROM s a JOIN s b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT qid, nid FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY score DESC, nid) AS rn
        FROM scored
      ) WHERE rn <= {_HUB_K}
    ),
    occ AS (
      SELECT s.vec_id, count(knn.qid) AS k_occ
      FROM s LEFT JOIN knn ON knn.nid = s.vec_id
      GROUP BY 1
    )
    SELECT CAST(k_occ AS INT) AS k_occurrence,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM occ GROUP BY 1
    """


@_q("q245_hubness_audit", _q245_oracle())
def q245_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit: on a fixed {N}-vector sample, build the exact
    cosine k-NN graph (k={K}) and publish the k-occurrence histogram —
    how many vectors appear in 0, 1, ..., many other vectors' top-k.
    A heavy right tail (hub vectors in everyone's neighbor list) is
    the high-dimensional pathology that silently degrades kNN-based
    dedup and retrieval; antihubs (k-occurrence 0) are unreachable by
    any neighbor search. Skewed hubness argues for centering or
    re-normalizing embeddings before the ANN index is built.

    Scale shape: the all-pairs referee is bounded to the fixed sample
    (the q236 discipline — documented cost, never corpus x corpus);
    per-query top-k via one window over sample-sized rows, then two
    tiny aggs. At corpus scale the same histogram is computed by
    ``operators.similarity.hubness_estimate`` over ``ivf_topk`` /
    ``ivfpq_topk`` output (|Q| x k rows, no all-pairs join) —
    agreement vs this exact referee is measured in BASELINE.md §5."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _HUB_SAMPLE)
    from batch_process_spark.operators.dedup import ensure_parallelism
    from batch_process_spark.operators.similarity import dot, l2_norm

    # r14 (guide §1.2/§2.5): hoist each side's L2 norm out of the
    # O(sample^2) referee loop (the inlined cosine re-folded both
    # self-dots per pair — 3 interpreted folds x 64 dims x 90k pairs,
    # the query's whole single-task wall) and spread the probe side —
    # the sample arrives as one scan split, so the pair loop otherwise
    # runs on one core. sqrt(a)*sqrt(b) over the same doubles is
    # bit-identical to the inlined form.
    a = ensure_parallelism(
        emb.select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("ea"),
            l2_norm(F.col("embedding")).alias("__na"),
        )
    )
    b = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("eb"),
        l2_norm(F.col("embedding")).alias("__nb"),
    )
    scored = (
        a.join(b, F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            F.round(
                dot(F.col("ea"), F.col("eb")) / (F.col("__na") * F.col("__nb")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("nid"))
    knn = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _HUB_K
    )
    counts = knn.groupBy(F.col("nid").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("k_occ")
    )
    occ = (
        emb.select("vec_id")
        .join(counts, "vec_id", "left")
        .select(F.coalesce("k_occ", F.lit(0)).alias("k_occ"))
    )
    return occ.groupBy(F.col("k_occ").cast("int").alias("k_occurrence")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


q245_hubness_audit.__doc__ = q245_hubness_audit.__doc__.format(
    N=_HUB_SAMPLE, K=_HUB_K
)


# ---------------------------------------------------------------------------
# q246: per-source token-distribution shift (Jensen-Shannon vs corpus)
# ---------------------------------------------------------------------------


@_q(
    "q246_source_token_jsd",
    f"""
    WITH tok AS (
      SELECT source, unnest({DUCK_TOKENS.format(t='text')}) AS term
      FROM documents
    ),
    st AS (SELECT source, term, count(*) AS f FROM tok GROUP BY 1, 2),
    stot AS (SELECT source, sum(f) AS tot FROM st GROUP BY 1),
    ct AS (SELECT term, sum(f) AS cf FROM st GROUP BY 1),
    ctot AS (SELECT sum(cf) AS ctot FROM ct),
    pq AS (
      SELECT st.source, st.f::DOUBLE / stot.tot AS p,
             ct.cf::DOUBLE / ctot.ctot AS q
      FROM st JOIN stot USING (source) JOIN ct USING (term), ctot
    ),
    -- corpus terms ABSENT from the source contribute q*log2(q/m) with
    -- p=0: handled via the missing-mass complement (sum over present
    -- terms of q, the rest integrates with p=0)
    parts AS (
      SELECT source,
             sum(0.5 * p * log2(p / ((p + q) / 2))
                 + 0.5 * q * log2(q / ((p + q) / 2))) AS present,
             1.0 - sum(q) AS q_missing
      FROM pq GROUP BY 1
    )
    SELECT source,
           floor((present + 0.5 * q_missing) * 1000000 + 0.5) / 1000000
             AS jsd_bits
    FROM parts
    """,
)
def q246_source_token_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution shift per source: Jensen-Shannon divergence (bits)
    between each source's token distribution and the corpus-wide one —
    the mixture-design companion to q101/q234: a source with high JSD
    is the one whose up/down-weighting moves the training distribution
    most, and a JSD jump release-over-release is a content-drift alarm
    (q209's embedding drift, restated on raw tokens). Terms the source
    lacks contribute 0.5*q*log2(q/((0+q)/2)) = 0.5*q per missing term
    (log2(2) = 1), folded in closed form as half the missing corpus
    mass — no anti-join materializes the absent vocabulary.

    Scale shape: one token explode into (source, term) partial-agg
    counts; the corpus marginal joins at term grain; output is one row
    per source."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens_col("text")).alias("term"))
    st = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("f"))
    stot = st.groupBy("source").agg(F.sum("f").alias("tot"))
    ct = st.groupBy("term").agg(F.sum("f").alias("cf"))
    ctot = ct.agg(F.sum("cf").alias("ctot"))
    pq_ = (
        st.join(stot, "source")
        .join(ct, "term")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            (F.col("f").cast("double") / F.col("tot")).alias("p"),
            (F.col("cf").cast("double") / F.col("ctot")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    part = 0.5 * F.col("p") * F.log2(F.col("p") / m) + 0.5 * F.col("q") * F.log2(
        F.col("q") / m
    )
    parts = pq_.groupBy("source").agg(
        F.sum(part).alias("present"), (F.lit(1.0) - F.sum("q")).alias("q_missing")
    )
    return parts.select(
        "source",
        round_half_up(F.col("present") + 0.5 * F.col("q_missing"), 6).alias(
            "jsd_bits"
        ),
    )


# ---------------------------------------------------------------------------
# q247: span containment — asymmetric duplication (doc inside doc)
# ---------------------------------------------------------------------------

_CONT_THRESH = 0.9  # fraction of a doc's spans found in the container
_CONT_DF_CAP = 10   # q219's boilerplate cap on the pair join
_CONT_MIN_SPANS = 5  # ignore docs too short to make the claim


@_q(
    "q247_span_containment",
    f"""
    WITH {{spans}},
    sd AS (SELECT DISTINCT doc_id, h FROM s),
    tot AS (SELECT doc_id, count(*) AS n_spans FROM sd GROUP BY 1),
    keep AS (
      SELECT h FROM sd GROUP BY h
      HAVING count(*) > 1 AND count(*) <= {_CONT_DF_CAP}
    ),
    kept AS (SELECT sd.doc_id, sd.h FROM sd JOIN keep USING (h)),
    pairs AS (
      SELECT a.doc_id AS contained, b.doc_id AS container,
             CAST(count(*) AS BIGINT) AS shared_spans
      FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id != b.doc_id
      GROUP BY 1, 2
    )
    SELECT contained, container, shared_spans,
           CAST(t.n_spans AS BIGINT) AS n_spans,
           floor(shared_spans::DOUBLE / t.n_spans * 1000000 + 0.5) / 1000000
             AS containment
    FROM pairs JOIN tot t ON t.doc_id = pairs.contained
    WHERE t.n_spans >= {_CONT_MIN_SPANS}
      AND shared_spans::DOUBLE / t.n_spans >= {_CONT_THRESH}
    """.format(spans=_SPAN_SQL_CTES),
)
def q247_span_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric duplication: document A is CONTAINED in document B
    when >= 90% of A's distinct 8-word spans also occur in B — the
    quote/mirror/wrapper case symmetric Jaccard dedup (q18/q79)
    systematically under-scores, because the long container dilutes
    the union. Emits (contained, container, shared spans, containment
    fraction) for docs with at least {_CONT_MIN_SPANS} spans; the
    denominator is ALL the contained doc's distinct spans (so a doc
    sharing only a few informative spans with everyone cannot fake
    containment), while the pair join counts spans under q219's
    boilerplate df-cap (> {_CONT_DF_CAP} docs carry no containment
    signal and would fan out quadratically — at 100 TB the cap is what
    keeps the join linear-ish; a doc made purely of boilerplate is
    therefore reported uncontained, the conservative direction).

    Scale shape: the Arrow span kernel once, distinct at (doc, h),
    df-capped pair join (build side one row per hash), per-doc span
    totals join at pair grain."""
    docs = _t(spark, sf_dir, "documents")
    spans = _span_occ(docs).distinct()
    # gated self-sizing (see _span_occ round-13 note): the per-doc
    # totals exchange carries occ-grain rows, and ONE explicit
    # contained-keyed exchange serves the pair aggregate (contained ⊂
    # {contained, container}), the containment join (both sides land
    # n-partitioned on the join key), and nothing else re-shuffles the
    # pair stream. Below the gate the plan is unchanged.
    n = _span_scale_parts(docs)
    t_in = spans.repartition(n, "doc_id") if n else spans
    tot = t_in.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    keep = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") > 1) & (F.col("df") <= _CONT_DF_CAP))
        .select("h")
    )
    kept = spans.join(keep, "h")
    a = kept.select(F.col("h"), F.col("doc_id").alias("contained"))
    b = kept.select(F.col("h"), F.col("doc_id").alias("container"))
    raw = a.join(b, "h").filter(F.col("contained") != F.col("container"))
    if n:
        raw = raw.repartition(n, "contained")
    pairs = raw.groupBy("contained", "container").agg(
        F.count(F.lit(1)).alias("shared_spans")
    )
    j = pairs.join(tot.withColumnRenamed("doc_id", "contained"), "contained")
    frac = F.col("shared_spans") / F.col("n_spans")
    return (
        j.filter((F.col("n_spans") >= _CONT_MIN_SPANS) & (frac >= _CONT_THRESH))
        .select(
            "contained", "container", "shared_spans",
            F.col("n_spans").cast("long").alias("n_spans"),
            round_half_up(frac, 6).alias("containment"),
        )
    )


q247_span_containment.__doc__ = q247_span_containment.__doc__.format(
    _CONT_MIN_SPANS=_CONT_MIN_SPANS, _CONT_DF_CAP=_CONT_DF_CAP
)
