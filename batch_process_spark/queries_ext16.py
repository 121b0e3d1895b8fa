"""Query catalog part 17 (q229+): round-9 corpus-curation analytics
around the dedup/retrieval north stars —

- q229: per-source Zipf slope of the token rank-frequency curve (the
  language-health fingerprint: natural text sits near -1; template/
  boilerplate-dominated sources flatten or steepen it).
- q230: dedup threshold sensitivity curve — documents and tokens that
  a dup_frac cutoff would drop, per cutoff, in ONE pass over q207's
  per-doc duplication fractions (the "where do we set the knob"
  table a curation run publishes before committing a threshold).
- q231: RAG context packing under a token budget — per query, walk
  the exact cosine ranking (q25) and keep candidates while the
  cumulative token count fits the context window.
- q232: matryoshka truncation eval — recall@10 of prefix-dim cosine
  retrieval (dims 64/32/16) against the full-dimension ranking; the
  measurement that prices serving on truncated embeddings.
- q233: license propagation through dedup clusters — survivors inherit
  the most restrictive license among the duplicates they absorb (the
  compliance diff a provenance-safe dedup run publishes).
- q234: epoch/repeat mixture plan under a token budget — per source,
  how many epochs its unique tokens must repeat to fill a uniform
  allocation, flagging sources pushed past the ~4-epoch knee
  (data-constrained scaling).

- q235: label-noise audit — nearest-centroid cosine confusion matrix
  over the embeddings table (off-diagonal mass = relabel/drop triage).
- q236: embedding-LSH blocking quality — candidate precision and pair
  recall of the sign-bucket blocking vs the exact all-pairs referee on
  a fixed audit sample (q211's text-MinHash audit, embedding twin).
- q237: soft dedup — duplicate-aware 1/cluster_size sampling weights
  per source (repeat discounting instead of hard removal).
- q238: cross-lingual near-duplicate matrix — q26's verified embedding
  pairs labeled by both documents' languages; off-diagonal mass is the
  translation-duplicate leak same-language dedup cannot see.

All ten are full value-hash oracles over the standard tables.

Reference parity: beyond the reference (SURVEY §7 M6); these are the
LLM-pipeline audits the brief adds on top of the reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_process_spark.functions.rounding import round_half_up
from batch_process_spark.operators import similarity
from batch_process_spark.operators import text
from batch_process_spark.operators.dedup import tokens_col
from batch_process_spark.queries import ORACLES, _q, _t
from batch_process_spark.queries_ext import DUCK_TOKENS  # also registers q25's oracle

import batch_process_spark.queries_ext15  # noqa: F401  (registers q207's oracle, read below)

# ---------------------------------------------------------------------------
# q229: Zipf slope per source
# ---------------------------------------------------------------------------

_ZIPF_TOP = 200  # vocabulary prefix the slope is fitted on (rank 1..N)


@_q(
    "q229_zipf_slope",
    f"""
    WITH tok AS (
      SELECT source, unnest({DUCK_TOKENS.format(t='text')}) AS term
      FROM documents
    ),
    tf AS (
      SELECT source, term, count(*) AS f FROM tok GROUP BY source, term
    ),
    ranked AS (
      SELECT source, term, f,
             row_number() OVER (PARTITION BY source ORDER BY f DESC, term) AS r
      FROM tf
    ),
    xy AS (
      SELECT source, ln(r::DOUBLE) AS x, ln(f::DOUBLE) AS y
      FROM ranked WHERE r <= {_ZIPF_TOP}
    ),
    s AS (
      SELECT source, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM xy GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_terms,
           floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000 + 0.5)
             / 1000000 AS zipf_slope
    FROM s
    """,
)
def q229_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: OLS slope of ln(frequency) against
    ln(rank) over the top-200 vocabulary — natural language lands
    near -1 (Zipf 1949); machine-generated or boilerplate-heavy
    sources drift flat (top terms under-dominant) or steep (a few
    templates swamp everything). Computed from explicit sum
    aggregates (n, Σx, Σy, Σxy, Σx²) rather than an engine regr_slope
    so BOTH engines evaluate the identical closed formula; ranks
    break frequency ties on the term so the fitted set is unique.

    Scale shape: token explode -> (source, term) partial-agg count
    (map-side combine does the heavy lifting), a per-source top-200
    window over the COUNTED frame (vocab-sized, not corpus-sized),
    and a 5-number reduce per source."""
    tok = _t(spark, sf_dir, "documents").select(
        "source", F.explode(tokens_col("text")).alias("term")
    )
    tf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("source").orderBy(F.desc("f"), F.asc("term"))
    xy = (
        tf.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _ZIPF_TOP)
        .select(
            "source",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("f").cast("double")).alias("y"),
        )
    )
    n, sx, sy = F.count(F.lit(1)), F.sum("x"), F.sum("y")
    sxy, sxx = F.sum(F.col("x") * F.col("y")), F.sum(F.col("x") * F.col("x"))
    return xy.groupBy("source").agg(
        n.alias("n_terms"),
        round_half_up((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# q230: dedup threshold sensitivity curve
# ---------------------------------------------------------------------------


def _q230_oracle() -> str:
    return f"""
    WITH dupes AS ({ORACLES['q207_sliding_span_dedup']}),
    toks AS (
      SELECT doc_id, len({DUCK_TOKENS.format(t='text')}) AS n_tokens
      FROM documents
    ),
    d AS (
      SELECT least(CAST(floor(dup_frac * 10) AS INT), 9) AS b, t.n_tokens
      FROM dupes JOIN toks t USING (doc_id)
    ),
    hist AS (
      SELECT b, CAST(count(*) AS BIGINT) AS docs, CAST(sum(n_tokens) AS BIGINT) AS toks
      FROM d GROUP BY b
    ),
    total AS (SELECT sum(toks) AS all_toks FROM hist),
    curve AS (
      SELECT b,
             sum(docs) OVER (ORDER BY b DESC) AS docs_dropped,
             sum(toks) OVER (ORDER BY b DESC) AS tokens_dropped
      FROM hist
    )
    SELECT floor(b::DOUBLE * 10 + 0.5) / 100 AS threshold,
           CAST(docs_dropped AS BIGINT) AS docs_dropped,
           CAST(tokens_dropped AS BIGINT) AS tokens_dropped,
           floor(tokens_dropped / t.all_toks * 1000000 + 0.5) / 1000000
             AS frac_tokens_dropped
    FROM curve, total t
    WHERE b > 0
    """


@_q("q230_dedup_threshold_curve", _q230_oracle())
def q230_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sensitivity of span-level dedup: for each dup_frac
    cutoff t (0.1 .. 0.9, bucket lower edges), how many documents and
    tokens a "drop when dup_frac >= t" rule removes — the one-page
    table that decides the knob before a destructive curation run.
    Semantics are bucket-granular (cutoffs ARE the decile lower
    edges): one histogram pass over q207's per-doc frame, then a
    9-row suffix-sum window — no per-threshold rescan, no
    threshold x corpus join, so the cost at 100 TB is q207 plus a
    10-row window. Only spannable docs (>= 8 words) participate,
    as in q207."""
    from batch_process_spark.queries_ext15 import q207_sliding_span_dedup

    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", text.token_count_ws("text").alias("n_tokens")
    )
    d = (
        q207_sliding_span_dedup(spark, sf_dir)
        .join(toks, "doc_id")
        .select(
            F.least(F.floor(F.col("dup_frac") * 10).cast("int"), F.lit(9)).alias("b"),
            "n_tokens",
        )
    )
    hist = d.groupBy("b").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("toks")
    )
    w = Window.orderBy(F.desc("b")).rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        hist.select(
            "b",
            F.sum("docs").over(w).alias("docs_dropped"),
            F.sum("toks").over(w).alias("tokens_dropped"),
            F.sum("toks").over(wt).alias("all_toks"),
        )
        .filter(F.col("b") > 0)
        .select(
            (F.floor(F.col("b").cast("double") * 10 + 0.5) / 100).alias("threshold"),
            "docs_dropped",
            "tokens_dropped",
            round_half_up(F.col("tokens_dropped") / F.col("all_toks"), 6).alias(
                "frac_tokens_dropped"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q231: RAG context packing under a token budget
# ---------------------------------------------------------------------------

_CTX_BUDGET = 600  # tokens per assembled context


def _q231_oracle() -> str:
    return f"""
    WITH ranked AS ({ORACLES['q25_embedding_topk']}),
    toks AS (
      SELECT doc_id, len({DUCK_TOKENS.format(t='text')}) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT r.query_id, r.vec_id AS doc_id, r.rank, t.n_tokens,
             sum(t.n_tokens) OVER (PARTITION BY r.query_id ORDER BY r.rank)
               AS cum_tokens
      FROM ranked r JOIN toks t ON t.doc_id = r.vec_id
    )
    SELECT query_id, doc_id, rank, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM cum WHERE cum_tokens <= {_CTX_BUDGET}
    """


@_q("q231_context_budget_pack", _q231_oracle())
def q231_context_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly: per query, take the exact cosine ranking
    (q25's top-10) in rank order and keep candidates while the
    cumulative token count still fits a 600-token (_CTX_BUDGET) context
    window (greedy prefix — the standard context packer; a candidate
    that overflows the window is cut along with everything ranked
    below it). vec_id keys the documents table directly (the testdata
    contract: embedding i encodes document i).

    Scale shape: the ranking is q25's bounded candidate frame
    (queries x 10 rows); the token counts join on doc_id (broadcast
    of the candidate side at scale, the corpus side prunes to the
    candidate ids); the running sum windows over 10-row partitions."""
    from batch_process_spark.queries_ext import q25_embedding_topk

    ranked = q25_embedding_topk(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", text.token_count_ws("text").cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranked.join(toks, "doc_id")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _CTX_BUDGET)
        .select("query_id", "doc_id", "rank", "n_tokens", "cum_tokens")
    )


# ---------------------------------------------------------------------------
# q232: matryoshka truncation retrieval eval
# ---------------------------------------------------------------------------

_MAT_DIMS = (64, 32, 16)
_MAT_QUERIES = 20
_MAT_K = 10

_MAT_DOT = "list_sum(list_transform(range(1, {d} + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"


def _q232_oracle() -> str:
    per_dim = []
    for d in _MAT_DIMS:
        dot = _MAT_DOT.format(d=d, a="e.embedding", b="q.qe")
        na = _MAT_DOT.format(d=d, a="e.embedding", b="e.embedding")
        nb = _MAT_DOT.format(d=d, a="q.qe", b="q.qe")
        per_dim.append(f"""
      SELECT {d} AS prefix_dim, query_id, vec_id, rank FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round({dot} / (sqrt({na}) * sqrt({nb})), 6) DESC,
                          e.vec_id ASC) AS rank
        FROM embeddings e CROSS JOIN
             (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
              WHERE vec_id < {_MAT_QUERIES}) q
      ) WHERE rank <= {_MAT_K}""")
    union = " UNION ALL ".join(per_dim)
    return f"""
    WITH allranks AS ({union}),
    truth AS (SELECT query_id, vec_id FROM allranks WHERE prefix_dim = {_MAT_DIMS[0]}),
    hits AS (
      SELECT a.prefix_dim, a.query_id,
             count(t.vec_id) AS n_hits
      FROM allranks a
      LEFT JOIN truth t ON t.query_id = a.query_id AND t.vec_id = a.vec_id
      GROUP BY a.prefix_dim, a.query_id
    )
    SELECT prefix_dim,
           CAST(count(*) AS BIGINT) AS n_queries,
           floor(avg(n_hits / {_MAT_K}.0) * 1000000 + 0.5) / 1000000
             AS recall_at_{_MAT_K}
    FROM hits GROUP BY prefix_dim
    """


@_q("q232_matryoshka_eval", _q232_oracle())
def q232_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval: recall@10 of cosine retrieval on
    PREFIX dimensions (64 = full, 32, 16) against the full-dimension
    ranking, averaged over 20 queries — the table that prices serving
    on truncated embeddings (MRL-style models keep most recall at
    half dim; a non-matryoshka encoder craters, and this measurement
    is how you find out before deploying). The 64-row is the identity
    sanity check (recall 1.0 by construction).

    Scale shape: one brute-force top-k per prefix dim over the SLICED
    embedding (the scan reads the same column; the slice is free
    projection work) — each is the q25 bounded-candidate plan; the
    recall join compares queries x k row sets, all tiny."""
    emb = _t(spark, sf_dir, "embeddings")
    per_dim = []
    for d in _MAT_DIMS:
        sliced = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        queries = sliced.filter(F.col("vec_id") < _MAT_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        per_dim.append(
            similarity.brute_force_topk(sliced, queries, k=_MAT_K)
            .select(
                F.lit(d).alias("prefix_dim"), "query_id", "vec_id", "rank"
            )
        )
    allranks = per_dim[0]
    for p in per_dim[1:]:
        allranks = allranks.unionByName(p)
    # truth is a filter of allranks — rename BOTH join keys so the
    # self-join resolves unambiguously (same-lineage attributes on the
    # two sides of == otherwise misbind)
    truth = allranks.filter(F.col("prefix_dim") == _MAT_DIMS[0]).select(
        F.col("query_id").alias("tq"), F.col("vec_id").alias("tvec")
    )
    hits = (
        allranks.join(
            truth,
            (F.col("query_id") == F.col("tq")) & (F.col("vec_id") == F.col("tvec")),
            "left",
        )
        .groupBy("prefix_dim", "query_id")
        .agg(F.count("tvec").alias("n_hits"))
    )
    return hits.groupBy("prefix_dim").agg(
        F.count(F.lit(1)).alias("n_queries"),
        round_half_up(F.avg(F.col("n_hits") / _MAT_K), 6).alias(f"recall_at_{_MAT_K}"),
    )


# ---------------------------------------------------------------------------
# q233: license propagation through dedup clusters
# ---------------------------------------------------------------------------


def _q233_oracle() -> str:
    from batch_process_spark.queries_ext3 import _cc_oracle

    return f"""
    WITH clusters AS ({_cc_oracle()}),
    lic AS (
      SELECT doc_id,
             CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 3 AS tier
      FROM documents
    ),
    t AS (
      SELECT c.node, c.component, c.cluster_size, l.tier
      FROM clusters c JOIN lic l ON l.doc_id = c.node % 1000000
    ),
    per_c AS (
      SELECT component, cluster_size,
             max(tier) AS effective_tier,
             max(CASE WHEN node = component THEN tier END) AS survivor_tier
      FROM t GROUP BY component, cluster_size
    )
    SELECT survivor_tier, effective_tier,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size - 1) AS BIGINT) AS docs_absorbed
    FROM per_c GROUP BY survivor_tier, effective_tier
    """


@_q("q233_license_propagation", _q233_oracle())
def q233_license_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-safe dedup: when a near-dup cluster collapses to one
    survivor, the survivor must INHERIT the most restrictive license
    in the cluster (dropping a restricted twin does not launder its
    terms out of the kept text). License tier derives from the source
    id (src<N> -> N % 3: 0 permissive / 1 attribution / 2 restricted —
    the testdata's stand-in for a real license column); mutated
    near-dup copies (doc_id + 1e6, q79's corpus) inherit their base
    document's source. Output is the tier-transition matrix over
    cluster SURVIVORS (q79's min-id convention: survivor == component
    id): every cell with effective_tier > survivor_tier is a document
    whose usable terms just changed — the compliance diff a curation
    run must publish.

    Scale shape: q79's clustering plus one tier join (node-sized) and
    two tiny aggregates (clusters, then a <=9-row matrix)."""
    from batch_process_spark.queries_ext3 import q79_dedup_clusters

    lic = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.regexp_extract("source", r"([0-9]+)", 1).cast("int") % 3).alias("tier"),
    )
    cl = q79_dedup_clusters(spark, sf_dir)
    t = cl.join(lic, (cl.node % 1000000) == lic.doc_id).select(
        "node", "component", "cluster_size", "tier"
    )
    per_c = t.groupBy("component", "cluster_size").agg(
        F.max("tier").alias("effective_tier"),
        F.max(F.when(F.col("node") == F.col("component"), F.col("tier"))).alias(
            "survivor_tier"
        ),
    )
    return per_c.groupBy("survivor_tier", "effective_tier").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("cluster_size") - 1).alias("docs_absorbed"),
    )


# ---------------------------------------------------------------------------
# q234: epoch/repeat mixture plan under a token budget
# ---------------------------------------------------------------------------

_EPOCH_BUDGET_X = 4  # train budget = 4x the whole deduped corpus
_EPOCH_CAP = 4.0     # repeat factor beyond which returns degrade


def _q234_oracle() -> str:
    return f"""
    WITH h AS (
      SELECT doc_id, source, md5(text) AS hh,
             len({DUCK_TOKENS.format(t='text')}) AS n_tokens
      FROM documents
    ),
    surv AS (SELECT hh, min(doc_id) AS keep_id FROM h GROUP BY hh),
    eff AS (
      SELECT source,
             sum(CASE WHEN doc_id = keep_id THEN n_tokens ELSE 0 END) AS eff_tokens
      FROM h JOIN surv USING (hh)
      GROUP BY source
    ),
    tot AS (SELECT sum(eff_tokens) AS all_eff, count(*) AS n_sources FROM eff)
    SELECT source,
           CAST(eff_tokens AS BIGINT) AS effective_tokens,
           CAST(floor({_EPOCH_BUDGET_X} * t.all_eff / t.n_sources) AS BIGINT)
             AS allocated_tokens,
           floor(floor({_EPOCH_BUDGET_X} * t.all_eff / t.n_sources)
                 / eff_tokens * 1000000 + 0.5) / 1000000 AS epochs,
           floor({_EPOCH_BUDGET_X} * t.all_eff / t.n_sources)
             / eff_tokens > {_EPOCH_CAP} AS over_cap
    FROM eff, tot t
    """


@_q("q234_epoch_mixture_plan", _q234_oracle())
def q234_epoch_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repeat/epoch plan a data-constrained training run publishes
    (Muennighoff et al. 2023): with a total budget of 4x
    (_EPOCH_BUDGET_X) the deduped corpus split UNIFORMLY across
    sources (the mixture target), each source's unique tokens must be
    repeated allocated/effective epochs — and any source pushed past
    ~4 epochs (_EPOCH_CAP) is flagged (returns from repetition decay
    there; the planner should re-weight or find more data). Effective
    tokens use q226's exact-dedup survivor accounting (min-doc-id per
    content hash, cross-source duplicates credit the survivor only).

    Scale shape: one hash partial-agg + hash join (q226's), a 1-row
    total, then a 20-row projection — the plan is corpus-scan bound."""
    from batch_process_spark.operators.dedup import tokens_col

    h = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("hh"),
        text.token_count_ws("text").cast("long").alias("n_tokens"),
    )
    surv = h.groupBy("hh").agg(F.min("doc_id").alias("keep_id"))
    eff = (
        h.join(surv, "hh")
        .groupBy("source")
        .agg(
            F.sum(
                F.when(F.col("doc_id") == F.col("keep_id"), F.col("n_tokens")).otherwise(0)
            ).alias("eff_tokens")
        )
    )
    tot = eff.agg(
        F.sum("eff_tokens").alias("all_eff"), F.count(F.lit(1)).alias("n_sources")
    )
    alloc = F.floor(_EPOCH_BUDGET_X * F.col("all_eff") / F.col("n_sources"))
    return eff.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("eff_tokens").alias("effective_tokens"),
        alloc.cast("long").alias("allocated_tokens"),
        round_half_up(alloc / F.col("eff_tokens"), 6).alias("epochs"),
        (alloc / F.col("eff_tokens") > _EPOCH_CAP).alias("over_cap"),
    )


# ---------------------------------------------------------------------------
# q235: label-noise audit — nearest-centroid confusion matrix
# ---------------------------------------------------------------------------


@_q(
    "q235_label_confusion",
    """
    WITH d AS (
      SELECT vec_id, label, u.i - 1 AS pos, embedding[u.i]::DOUBLE AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    cent AS (SELECT label AS clabel, pos, round(avg(v), 12) AS c
             FROM d GROUP BY 1, 2),
    cn AS (SELECT clabel, sum(c * c) AS nc FROM cent GROUP BY 1),
    vn AS (SELECT vec_id, sum(v * v) AS nv FROM d GROUP BY 1),
    dots AS (
      SELECT d.vec_id, c.clabel, sum(d.v * c.c) AS dot
      FROM d JOIN cent c USING (pos) GROUP BY 1, 2
    ),
    scores AS (
      SELECT vec_id, clabel,
             round(dot / (sqrt(nv) * sqrt(nc)), 6) AS s
      FROM dots JOIN vn USING (vec_id) JOIN cn USING (clabel)
    ),
    pred AS (
      SELECT vec_id, clabel FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, clabel) AS rn
        FROM scores
      ) WHERE rn = 1
    )
    SELECT e.label AS true_label, p.clabel AS predicted_label,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM embeddings e JOIN pred p USING (vec_id)
    GROUP BY 1, 2
    """,
)
def q235_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: assign every embedding to its NEAREST label
    centroid by cosine and publish the (true label, predicted label)
    confusion matrix — off-diagonal mass is the mislabel/ambiguity
    candidate set an annotation pass reviews before the labels are
    trusted for training (the relabel-or-drop triage). Cosine rounded
    to 6 decimals before the argmax, ties to the lowest label — the
    q25/q103 determinism discipline, so both engines pick identical
    winners.

    Scale shape: the centroid table is labels x dims (one partial-agg
    pass, map-side combined); it broadcasts back and every vector
    scores against all L centroids with in-row zip_with arithmetic
    (the q95 pattern widened from own-label to all-labels — rows x L
    intermediate, argmax reduced BEFORE anything shuffles); the
    confusion matrix is an L^2-row aggregate."""
    emb = _t(spark, sf_dir, "embeddings")
    dims = emb.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
    cent = (
        dims.groupBy(F.col("label").alias("clabel"), F.col("pos"))
        # centroid components rounded to 12dp in BOTH engines before the
        # cosine: the per-(label,pos) float sum order differs across
        # engines/partitionings, and an unrounded 1e-15 drift could flip
        # the 6dp-rounded argmax at a boundary (the q01 summation-order
        # hazard, fixed at the centroid instead of the sum)
        .agg(F.round(F.avg(F.col("v").cast("double")), 12).alias("c"))
        .groupBy("clabel")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cvec")
        )
        .withColumn(
            "nc", F.aggregate("cvec", F.lit(0.0), lambda acc, x: acc + x * x)
        )
    )
    dot = F.aggregate(
        F.zip_with("embedding", "cvec", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
    )
    scored = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("s", F.round(dot / (F.sqrt(nv) * F.sqrt(F.col("nc"))), 6))
    )
    pred = scored.groupBy("vec_id", "label").agg(
        F.max(F.struct(F.col("s"), (-F.col("clabel")).cast("long").alias("__nl"))).alias("m")
    )
    return pred.groupBy(
        F.col("label").alias("true_label"),
        (-F.col("m.__nl")).cast("int").alias("predicted_label"),
    ).agg(F.count(F.lit(1)).alias("n_vectors"))


# ---------------------------------------------------------------------------
# q236: embedding-LSH blocking quality (candidate precision / pair recall)
# ---------------------------------------------------------------------------

_Q236_SAMPLE = 300      # fixed audit sample (the all-pairs referee is O(n^2))
_Q236_THRESH = 0.3      # q26's near-dup threshold
_Q236_BITS = 4


def _q236_oracle() -> str:
    from batch_process_spark.queries_ext import _DOT, _bucket_sql
    from batch_process_spark.operators.similarity import _seeded_hyperplanes

    planes = _seeded_hyperplanes(64, _Q236_BITS, seed=42)
    cos = (
        f"round({_DOT.format(a='a.embedding', b='b.embedding')} / "
        f"(sqrt({_DOT.format(a='a.embedding', b='a.embedding')}) * "
        f"sqrt({_DOT.format(a='b.embedding', b='b.embedding')})), 6)"
    )
    return f"""
    WITH s AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding', planes)} AS bucket
      FROM embeddings WHERE vec_id < {_Q236_SAMPLE}
    ),
    exact AS (
      SELECT count(*) AS n FROM s a JOIN s b ON a.vec_id < b.vec_id
      WHERE {cos} >= {_Q236_THRESH}
    ),
    cand AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, {cos} AS score
      FROM s a JOIN s b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN score >= {_Q236_THRESH} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_verified
      FROM cand
    )
    SELECT CAST(e.n AS BIGINT) AS n_exact_pairs, a.n_candidates, a.n_verified,
           floor(a.n_verified / a.n_candidates::DOUBLE * 1000000 + 0.5) / 1000000
             AS candidate_precision,
           floor(a.n_verified / e.n::DOUBLE * 1000000 + 0.5) / 1000000
             AS pair_recall
    FROM agg a, exact e
    """


@_q("q236_lsh_blocking_eval", _q236_oracle())
def q236_lsh_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit for the embedding-LSH near-dup path
    (q26): on a FIXED audit sample (vec_id < 300 — the exact all-pairs
    referee is O(n^2), so production audits run on a sample exactly
    like this), measure the sign-bucket blocking's candidate PRECISION
    (verified / same-bucket candidates — how much exact-scoring work
    the blocking wastes) and pair RECALL (verified / all true pairs —
    what the blocking misses; the verify step makes precision-of-output
    1.0 by construction, so recall is the number that can silently
    rot). The q211 audit asks this for the text-MinHash path; this is
    its embedding twin. Same seeded hyperplanes as q26, replicated as
    SQL literals in the oracle."""
    from batch_process_spark.operators.dedup import ensure_parallelism
    from batch_process_spark.operators.similarity import (
        _seeded_hyperplanes,
        dot,
        l2_norm,
        lsh_bucket,
    )

    planes = _seeded_hyperplanes(64, _Q236_BITS, seed=42)
    s = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _Q236_SAMPLE)
        .select(
            "vec_id",
            "embedding",
            lsh_bucket(F.col("embedding"), planes).alias("bucket"),
            # r14: per-vector norm hoisted out of the O(sample^2)
            # referee loop; probe side spread (q245's rationale —
            # bit-identical score, same-single-task wall removed)
            l2_norm(F.col("embedding")).alias("__nrm"),
        )
    )
    a, b = ensure_parallelism(s).alias("a"), s.alias("b")
    score = F.round(
        dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.__nrm") * F.col("b.__nrm")),
        6,
    )
    exact = (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(score >= _Q236_THRESH)
        .agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    )
    cand = (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(score.alias("score"))
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum((F.col("score") >= _Q236_THRESH).cast("long")).alias("n_verified"),
        )
    )
    return cand.crossJoin(F.broadcast(exact)).select(
        "n_exact_pairs",
        "n_candidates",
        "n_verified",
        round_half_up(F.col("n_verified") / F.col("n_candidates"), 6).alias(
            "candidate_precision"
        ),
        round_half_up(F.col("n_verified") / F.col("n_exact_pairs"), 6).alias(
            "pair_recall"
        ),
    )


# ---------------------------------------------------------------------------
# q237: soft dedup — duplicate-aware sampling weights per source
# ---------------------------------------------------------------------------


def _q237_oracle() -> str:
    from batch_process_spark.queries_ext import _NEAR_DUP_CORPUS
    from batch_process_spark.queries_ext3 import _cc_oracle

    return f"""
    WITH clusters AS ({_cc_oracle()}),
    corpus AS ({_NEAR_DUP_CORPUS}),
    w AS (
      SELECT c.doc_id,
             1.0 / coalesce(cl.cluster_size, 1) AS weight
      FROM corpus c LEFT JOIN clusters cl ON cl.node = c.doc_id
    ),
    src AS (
      SELECT d.source, w.doc_id, w.weight
      FROM w JOIN documents d ON d.doc_id = w.doc_id % 1000000
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           floor(sum(weight) * 1000000 + 0.5) / 1000000 AS effective_docs,
           floor(sum(weight) / count(*) * 1000000 + 0.5) / 1000000
             AS mean_weight
    FROM src GROUP BY source
    """


@_q("q237_soft_dedup_weights", _q237_oracle())
def q237_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup: instead of dropping near-duplicates, weight every
    document by 1/cluster_size (its q79 near-dup cluster; singletons
    weigh 1) so each duplicated content unit contributes one document
    of total sampling mass — the repeat-discounting alternative to
    hard removal (duplicates stay available, their gradient mass does
    not multiply). Output per source: raw docs, EFFECTIVE docs (the
    weighted mass a sampler should draw against), and the mean weight
    — a low mean flags the duplication-heavy sources. Mutated copies
    (doc_id + 1e6, q79's corpus) attribute to their base document's
    source, as in q233.

    Scale shape: q79's clustering, a left join at corpus granularity
    (cluster frame is pairs-sized, much smaller), and a sources-sized
    aggregate."""
    from batch_process_spark.queries_ext import _near_dup_corpus
    from batch_process_spark.queries_ext3 import q79_dedup_clusters

    corpus = _near_dup_corpus(spark, sf_dir).select("doc_id")
    cl = q79_dedup_clusters(spark, sf_dir).select(
        F.col("node").alias("doc_id"), "cluster_size"
    )
    # rename the corpus-side id before joining back to documents — the
    # corpus derives FROM documents, so keeping both as doc_id would be
    # a same-lineage ambiguous self-join
    w = corpus.join(cl, "doc_id", "left").select(
        F.col("doc_id").alias("wid"),
        (F.lit(1.0) / F.coalesce(F.col("cluster_size"), F.lit(1))).alias("weight"),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    src = w.join(docs, (F.col("wid") % 1000000) == F.col("doc_id")).select(
        "source", "weight"
    )
    return src.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        round_half_up(F.sum("weight"), 6).alias("effective_docs"),
        round_half_up(F.sum("weight") / F.count(F.lit(1)), 6).alias("mean_weight"),
    )


# ---------------------------------------------------------------------------
# q238: cross-lingual near-duplicate matrix
# ---------------------------------------------------------------------------


def _q238_oracle() -> str:
    from batch_process_spark.queries import ORACLES

    return f"""
    WITH pairs AS ({ORACLES['q26_embedding_neardup']}),
    lp AS (
      SELECT p.id_a, p.id_b, p.score,
             least(da.lang, db.lang) AS lang_a,
             greatest(da.lang, db.lang) AS lang_b
      FROM pairs p
      JOIN documents da ON da.doc_id = p.id_a
      JOIN documents db ON db.doc_id = p.id_b
    )
    SELECT lang_a, lang_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN lang_a != lang_b THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross,
           floor(avg(score) * 1000000 + 0.5) / 1000000 AS avg_score
    FROM lp GROUP BY lang_a, lang_b
    """


@_q("q238_crosslingual_neardup", _q238_oracle())
def q238_crosslingual_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Translation-duplicate detection: q26's verified embedding
    near-dup pairs, labeled with both documents' languages (embedding
    i encodes document i — the q231 testdata contract) and aggregated
    into a language-pair matrix. Off-diagonal cells (lang_a != lang_b)
    are content that survives SAME-language dedup untouched — the
    multilingual-corpus leak every per-language pipeline has to hunt
    explicitly, because text-level MinHash (q18) cannot see it.
    Language pair normalized (least, greatest) so (en, fr) and
    (fr, en) land in one cell.

    Scale shape: q26's bucket-blocked pair stream (never all-pairs) +
    two id-equi joins to the lang dimension + a langs^2-row aggregate."""
    from batch_process_spark.queries_ext import q26_embedding_neardup

    pairs = q26_embedding_neardup(spark, sf_dir)
    langs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    lp = (
        pairs.join(langs.withColumnRenamed("lang", "la"), pairs.id_a == langs.doc_id)
        .drop("doc_id")
        .join(
            langs.withColumnRenamed("lang", "lb").withColumnRenamed("doc_id", "doc_b"),
            pairs.id_b == F.col("doc_b"),
        )
        .select(
            F.least("la", "lb").alias("lang_a"),
            F.greatest("la", "lb").alias("lang_b"),
            "score",
        )
    )
    return lp.groupBy("lang_a", "lang_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("lang_a") != F.col("lang_b")).cast("long")).alias("n_cross"),
        round_half_up(F.avg("score"), 6).alias("avg_score"),
    )
