"""Query catalog part 5 (q89+): training-data pipeline depth.

The operations a 100 TB corpus pipeline runs between raw ingest and
tokenized shards, each oracle-checked against DuckDB:

- distributed global ranking (the scale-safe ORDER-BY-only window)
- vocabulary building (token counts -> deterministic top-V)
- hash-bucketed train/val/test splits (reproducible, join-free)
- per-source stratified sampling at configured rates (seedless
  determinism via content hash, so re-runs and retries agree)

No reference parity claimed here — these extend the engine beyond
the reference's surface (SURVEY §2 is covered by q01-q88); they are
the LLM-data-pipeline operators the project brief names first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_spark.queries import _q, _t
from batch_process_spark.queries_ext import DUCK_TOKENS

# Engine-portable uniform hash to [0, 10000): first 8 md5 hex chars of
# a string key, mod 10^4. Both engines compute it bit-identically, so
# split/sample membership is stable across engines, retries, and
# partitionings — the property that makes hash-bucketed splits the
# right tool where rand(seed) is not reproducible across planners.
_BUCKETS = 10_000


def _hash_bucket(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % _BUCKETS


def _duck_bucket(expr: str) -> str:
    return f"(CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT) % {_BUCKETS})"


@_q(
    "q89_distributed_rank",
    """
    SELECT o_orderkey,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(ntile(8)     OVER w AS BIGINT) AS octile
    FROM orders
    WHERE o_orderstatus = 'F'
    WINDOW w AS (ORDER BY round(o_totalprice, 0), o_orderkey)
    """,
)
def q89_distributed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ranking over a fact-sized input via the two-phase
    distributed ranker (``operators/ranking.global_ranks``): range
    shuffle + per-partition Arrow local ranks + broadcast partition
    offsets. The oracle is the single-task window form — identical
    semantics, minus the scale bottleneck. Ties exercised by rounding
    the order key to whole currency units."""
    from batch_process_spark.operators.ranking import global_ranks

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    ranked = global_ranks(
        orders,
        [F.round("o_totalprice", 0), F.col("o_orderkey")],
        sort_key_cols=["__price0", "__ok"],
        n_tiles=8,
    )
    return ranked.select(
        "o_orderkey",
        F.col("rank").alias("rnk"),
        F.col("dense_rank").alias("drnk"),
        F.col("row_number").alias("rn"),
        F.col("ntile").alias("octile"),
    )


@_q(
    "q90_vocab_build",
    f"""
    WITH toks AS (
      SELECT unnest({DUCK_TOKENS.format(t='text')}) AS token FROM documents
    ),
    counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
    SELECT token, CAST(cnt AS BIGINT) AS cnt
    FROM counts ORDER BY cnt DESC, token LIMIT 500
    """,
)
def q90_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: corpus token counts -> deterministic top-V
    (count desc, token asc tie-break). explode + partial-agg count, so
    the shuffle carries (token, partial count); the top-V is a
    TakeOrdered per-partition heap merge, never a global sort of the
    full vocabulary."""
    from batch_process_spark.operators.dedup import tokens_col

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(500)
    )


@_q(
    "q91_hash_split",
    f"""
    WITH b AS (
      SELECT lang, {_duck_bucket("CAST(doc_id AS VARCHAR)")} AS bucket FROM documents
    ),
    s AS (
      SELECT lang,
             CASE WHEN bucket < 9000 THEN 'train'
                  WHEN bucket < 9500 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT split, lang, count(*) AS n_docs
    FROM s GROUP BY split, lang
    """,
)
def q91_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test split (90/5/5) by hashing the
    document id into 10k buckets — no rand(), no join against a split
    table, stable under retries and repartitioning, and any engine
    computing the same md5 prefix assigns every doc identically (the
    oracle literally re-derives the split)."""
    docs = _t(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.col("doc_id").cast("string"))
    split = (
        F.when(bucket < 9000, "train").when(bucket < 9500, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# Per-10k keep rates keyed on sources that EXIST in the documents table
# (src0..src19 in the generated testdata); unlisted sources fall back to
# the default rate rather than 0 so the hash-membership path is exercised
# on every stratum (round-3 advice: the old web/books/code/wiki keys
# matched nothing and the query was vacuously green on 0 rows).
_SAMPLE_RATES = {"src0": 2500, "src1": 7500, "src2": 5000, "src3": 10000}
_SAMPLE_RATE_DEFAULT = 1000  # 10% for every other stratum


@_q(
    "q92_stratified_sample",
    f"""
    WITH r AS (
      SELECT source,
             {_duck_bucket("CAST(doc_id AS VARCHAR) || ':sample'")} AS bucket,
             n_chars
      FROM documents
    ),
    kept AS (
      SELECT source, n_chars FROM r
      WHERE bucket < CASE source
        WHEN 'src0' THEN 2500 WHEN 'src1' THEN 7500
        WHEN 'src2' THEN 5000 WHEN 'src3' THEN 10000 ELSE 1000 END
    )
    SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
    FROM kept GROUP BY source
    """,
)
def q92_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified sampling at configured rates (data-mixing
    weights: keep 25% src0, 75% src1, 50% src2, 100% src3, 10% rest) —
    membership decided by a salted content hash, not rand(seed):
    deterministic across engines, retries, and partitionings, and
    independent of the split hash (different salt). Map-only until the
    final tiny agg."""
    docs = _t(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(":sample")))
    expr = None
    for src, r in _SAMPLE_RATES.items():
        expr = F.when(F.col("source") == src, r) if expr is None else expr.when(F.col("source") == src, r)
    rate = expr.otherwise(_SAMPLE_RATE_DEFAULT)
    return (
        docs.select("source", "n_chars", bucket.alias("__b"), rate.alias("__r"))
        .filter(F.col("__b") < F.col("__r"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )
