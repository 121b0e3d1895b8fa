"""Query catalog part 16 (q205+): product quantization — the
compressed-vector layer of the similarity-search north star. q205
trains per-subspace codebooks and encodes the corpus (codes pinned
per vector under the oracle via md5, reconstruction error exact to
1e-4); q206 runs asymmetric-distance (ADC) top-k search over the
codes — m table lookups per candidate instead of d multiplies, the
query-side half of a FAISS-style IVFPQ deployment (the IVF half is
q25-q27/similarity.py).

Oracle discipline: the q103 deterministic-kmeans pattern, per
subspace — init = k lowest vec_ids, one Lloyd round, argmin ties to
the lowest centroid id, float32->double casts before any arithmetic.
See operators/pq.py for the 100 TB shuffle accounting.

Reference parity: beyond the reference (SURVEY §7 M6 north star);
its analytics stop at pandas group-bys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_process_spark.functions.rounding import round_half_up
from batch_process_spark.operators import pq
from batch_process_spark.queries import _q, _t
from batch_process_spark.queries_ext8 import _memoized_persist

_PQ_SUBDIM = 16  # 64-dim embeddings -> m = 4 subspaces
_PQ_K = 4

# Shared training/encoding CTE block (DuckDB): per-subspace twin of the
# q103 kmeans SQL. cb = codebook after one Lloyd round; a2 = final
# assignments with per-subspace squared reconstruction error.
_PQ_SQL_CTES = f"""
    dims AS (
      SELECT vec_id, CAST(floor((u.i - 1) / {_PQ_SUBDIM}) AS INT) AS sub,
             ((u.i - 1) % {_PQ_SUBDIM}) AS spos,
             embedding[u.i]::DOUBLE AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    init AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_PQ_K}),
    c0 AS (SELECT d.sub, d.vec_id AS cid, d.spos, d.v AS c
           FROM dims d JOIN init USING (vec_id)),
    d1 AS (
      SELECT d.vec_id, d.sub, c.cid, sum((d.v - c.c) * (d.v - c.c)) AS dist
      FROM dims d JOIN c0 c ON d.sub = c.sub AND d.spos = c.spos
      GROUP BY 1, 2, 3
    ),
    a1 AS (
      SELECT vec_id, sub, cid FROM (
        SELECT vec_id, sub, cid,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
        FROM d1) WHERE rn = 1
    ),
    cb AS (
      SELECT a.sub, a.cid, d.spos, avg(d.v) AS c
      FROM dims d JOIN a1 a ON d.vec_id = a.vec_id AND d.sub = a.sub
      GROUP BY 1, 2, 3
    ),
    d2 AS (
      SELECT d.vec_id, d.sub, c.cid, sum((d.v - c.c) * (d.v - c.c)) AS dist
      FROM dims d JOIN cb c ON d.sub = c.sub AND d.spos = c.spos
      GROUP BY 1, 2, 3
    ),
    a2 AS (
      SELECT vec_id, sub, cid, dist FROM (
        SELECT vec_id, sub, cid, dist,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
        FROM d2) WHERE rn = 1
    )
"""


def _codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized PQ codebook over the embeddings table (feeds
    both q205's encode and q206's LUT + codes — trained once)."""
    emb = _t(spark, sf_dir, "embeddings")
    return _memoized_persist(pq.pq_train(emb, _PQ_SUBDIM, k=_PQ_K, iters=1))


# ---------------------------------------------------------------------------
# q205: PQ train + encode (codes + reconstruction error per vector)
# ---------------------------------------------------------------------------


@_q(
    "q205_product_quantization",
    f"""
    WITH {_PQ_SQL_CTES}
    SELECT e.vec_id, e.label,
           md5(string_agg(CAST(a.cid AS VARCHAR), ',' ORDER BY a.sub)) AS codes_md5,
           floor(sum(a.dist) * 10000 + 0.5) / 10000 AS recon_sqerr
    FROM a2 a JOIN embeddings e USING (vec_id)
    GROUP BY 1, 2
    """,
)
def q205_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ compression of the embedding corpus: 64 float32 (256 B) ->
    4 codes, with the per-vector squared reconstruction error as the
    quality metric. Every code of every vector is pinned under the
    oracle by the md5 over the sub-ordered code string (the
    collection column itself would crash the driver's sort, as in
    q159). Scale shape: training and encoding are (vec_id, sub)
    partial aggs against a codebook frame AQE chooses how to join;
    nothing quadratic, no driver collect (operators/pq.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    enc = pq.pq_encode(emb, _codebook(spark, sf_dir), _PQ_SUBDIM, keep_dist=True)
    per_vec = enc.groupBy("vec_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "cid"))),
                    lambda s: s["cid"].cast("string"),
                ),
                ",",
            )
        ).alias("codes_md5"),
        round_half_up(F.sum("dist")).alias("recon_sqerr"),
    )
    return per_vec.join(emb.select("vec_id", "label"), "vec_id").select(
        "vec_id", "label", "codes_md5", "recon_sqerr"
    )


# ---------------------------------------------------------------------------
# q206: ADC top-k search over the PQ codes
# ---------------------------------------------------------------------------


@_q(
    "q206_pq_adc_topk",
    f"""
    WITH {_PQ_SQL_CTES},
    q AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 5),
    qd AS (SELECT d.vec_id AS query_id, d.sub, d.spos, d.v
           FROM dims d JOIN q ON d.vec_id = q.query_id),
    lut AS (
      SELECT qd.query_id, c.sub, c.cid, sum((qd.v - c.c) * (qd.v - c.c)) AS l
      FROM qd JOIN cb c ON qd.sub = c.sub AND qd.spos = c.spos
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT l.query_id, a.vec_id,
             floor(sum(l.l) * 1000000 + 0.5) / 1000000 AS adc_dist
      FROM a2 a JOIN lut l ON a.sub = l.sub AND a.cid = l.cid
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id, adc_dist, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q206_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-10 per query over the PQ codes: the
    query's exact subvectors score against each corpus vector's
    assigned centroids via a (queries x m x k)-row lookup table —
    m additions per candidate, never a d-dim multiply against the
    corpus. The LUT is broadcast; the corpus-side exchange carries
    one 8-byte partial per (query, vector). Ranking orders by the
    ROUNDED distance then vec_id in both engines, so FP sum-order
    drift (1e-15, vs inter-vector distance gaps orders larger)
    cannot reorder the cut."""
    emb = _t(spark, sf_dir, "embeddings")
    cb = _codebook(spark, sf_dir)
    codes = _memoized_persist(pq.pq_encode(emb, cb, _PQ_SUBDIM))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    adc = pq.pq_adc_scores(queries, cb, codes, _PQ_SUBDIM)
    scored = adc.select(
        "query_id",
        "vec_id",
        (F.floor(F.col("adc") * 1000000 + F.lit(0.5)) / 1000000).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )
