"""Query catalog part 2: report parsing, north-star dedup/similarity/
text-analysis/multimodal operators, and join-heavy TPC-H-style queries.

Registered into the same QUERIES/ORACLES dicts as ``queries.py``
(imported from there). Oracle SQL for the hash-heavy operators
(minhash, simhash) is generated programmatically so both engines run
the exact same md5-based math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_spark.operators import dedup, joins, similarity, text
from batch_process_spark.operators.multimodal import attach_binary, decode_features
from batch_process_spark.operators.sets import union_align
from batch_process_spark.queries import _q, _t, round_half_up

# DuckDB expression fragments matching the library's token/shingle defs
DUCK_TOKENS = (
    "list_filter(regexp_split_to_array(lower(trim({t})), '[^0-9a-zA-Z]+'), x -> x <> '')"
)


def duck_shingles(t: str, k: int = 3) -> str:
    """DuckDB expr for distinct k-word shingles, mirroring
    ``dedup.shingles_col`` (1-based list indexing, concat_ws skips
    out-of-range NULLs)."""
    w = f"__w"
    joined = ", ".join([f"{w}[i+{j}]" for j in range(k)])
    return (
        f"(SELECT list_distinct(list_transform(range(1, greatest(len({w}) - {k - 1}, 1) + 1), "
        f"i -> concat_ws(' ', {joined}))) FROM (SELECT {DUCK_TOKENS.format(t=t)} AS {w}))"
    )


# ---------------------------------------------------------------------------
# S10/S11: fixed-format report parse round-trip
# ---------------------------------------------------------------------------

@_q(
    "q16_report_roundtrip",
    r"""
    WITH reports AS (
      SELECT o_orderkey,
             concat(' ORDER ', o_orderkey, chr(10),
                    ' STATUS = ', o_orderstatus, chr(10),
                    ' PRIORITY = ', o_orderpriority, chr(10),
                    ' TOTAL ', round(o_totalprice, 2), ' END') AS body
      FROM orders WHERE o_orderkey <= 500
    )
    SELECT o_orderkey,
           CAST(regexp_extract(body, 'ORDER (\d+)', 1) AS BIGINT)       AS parsed_key,
           regexp_extract(body, 'STATUS = (\w+)', 1)                    AS parsed_status,
           regexp_extract(body, 'PRIORITY = ([0-9]-[A-Z]+)', 1)         AS parsed_priority,
           CAST(regexp_extract(body, 'TOTAL ([0-9.]+)', 1) AS DOUBLE)   AS parsed_total
    FROM reports
    """,
)
def q16_report_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: fixed-format report block parsing (regex field extraction,
    the blade-load pattern): synthesize a text report per order, parse
    fields back out with the same regexes the reference uses."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    body = F.concat(
        F.lit(" ORDER "), F.col("o_orderkey"), F.lit("\n"),
        F.lit(" STATUS = "), F.col("o_orderstatus"), F.lit("\n"),
        F.lit(" PRIORITY = "), F.col("o_orderpriority"), F.lit("\n"),
        F.lit(" TOTAL "), F.round("o_totalprice", 2), F.lit(" END"),
    )
    reports = orders.select("o_orderkey", body.alias("body"))
    return reports.select(
        "o_orderkey",
        F.regexp_extract("body", r"ORDER (\d+)", 1).cast("bigint").alias("parsed_key"),
        F.regexp_extract("body", r"STATUS = (\w+)", 1).alias("parsed_status"),
        F.regexp_extract("body", r"PRIORITY = ([0-9]-[A-Z]+)", 1).alias("parsed_priority"),
        F.regexp_extract("body", r"TOTAL ([0-9.]+)", 1).cast("double").alias("parsed_total"),
    )


# ---------------------------------------------------------------------------
# North star: dedup
# ---------------------------------------------------------------------------

_DUP_CORPUS = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + exact duplicates of every 10th doc under new ids."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return union_align([docs, dups])


@_q(
    "q17_dedup_exact",
    f"""
    WITH corpus AS ({_DUP_CORPUS})
    SELECT min(doc_id) AS doc_id, count(*) AS dup_count
    FROM corpus GROUP BY md5(text)
    """,
)
def q17_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star exact dedup: content-hash groupBy, deterministic
    canonical row, dup counts. One shuffle on the 128-bit hash."""
    return dedup.exact_dedup(_dup_corpus(spark, sf_dir), "text", "doc_id").select(
        "doc_id", "dup_count"
    )


_NEAR_DUP_CORPUS = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, concat(text, ' extra trailing words appended') AS text
      FROM documents WHERE doc_id % 20 = 0
"""


def _near_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + slightly-mutated copies (suffix appended) => true
    near-duplicates for LSH/jaccard pipelines to find."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    muts = (
        docs.filter(F.col("doc_id") % 20 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra trailing words appended")))
    )
    return union_align([docs, muts])


def _minhash_oracle(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    corpus_sql: str | None = None,
    tail: str | None = None,
) -> str:
    rows = num_hashes // bands
    sh = duck_shingles("text", 3)
    P = dedup.MINHASH_P
    minhashes = ", ".join(
        f"list_aggregate(list_transform(xs, x -> ({dedup.MINHASH_A[j]} * x + {dedup.MINHASH_B[j]}) % {P}), 'min') AS m{j}"
        for j in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5(concat_ws('|', '%d', %s))" % (b, ", ".join(f"m{b * rows + r}" for r in range(rows)))
        for b in range(bands)
    )
    tail = tail or f"""
    SELECT id_a, id_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
                 (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 6)
             AS jaccard_sim
    FROM cands
    JOIN docs a ON a.doc_id = cands.id_a
    JOIN docs b ON b.doc_id = cands.id_b
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
          (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= {threshold}
    """
    return f"""
    WITH corpus AS ({corpus_sql or _NEAR_DUP_CORPUS}),
    docs AS (SELECT doc_id, {sh} AS shingles FROM corpus),
    fps AS (SELECT doc_id, shingles,
                   list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS xs
            FROM docs),
    sigs AS (SELECT doc_id, shingles, {minhashes} FROM fps),
    banded AS (
      SELECT doc_id, unnest([{band_exprs}]) AS band_key FROM sigs
    ),
    cands AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM banded l JOIN banded r USING (band_key)
      WHERE l.doc_id < r.doc_id
    )
    {tail}
    """


@_q("q18_minhash_lsh_neardup", _minhash_oracle())
def q18_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star near-dup: MinHash(16) + 4-band LSH candidates +
    exact-Jaccard verify at 0.7. The md5 hash family makes signatures
    engine-portable, so the oracle runs the identical pipeline."""
    return dedup.minhash_near_dup_pairs(
        _near_dup_corpus(spark, sf_dir), "doc_id", "text",
        k=3, num_hashes=16, bands=4, threshold=0.7,
    )


@_q(
    "q19_blocked_jaccard",
    f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             list_distinct({DUCK_TOKENS.format(t='text')}) AS grams
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                 (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS jaccard_sim
    FROM d a JOIN d b ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
          (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.3
    """,
)
def q19_blocked_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star exact n-gram Jaccard with blocking on (lang, n_chars)
    — the pairwise join stays inside blocks, never quadratic."""
    return dedup.blocked_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        block_cols=["lang", "n_chars"], k=1, threshold=0.3,
    )


def _simhash_oracle(n_docs: int = 50) -> str:
    """Generated SQL computing the identical 64-bit simhash: md5 hex
    nibble bits, majority vote, hex-string signature."""
    bit_terms = []
    for j in range(64):
        nib_idx = j // 4 + 1
        shift = 3 - j % 4
        bit_terms.append(
            f"CASE WHEN 2 * list_sum(list_transform(hashes, h -> "
            f"(strpos('0123456789abcdef', h[{nib_idx}]) - 1 >> {shift}) & 1)) > len(hashes) "
            f"THEN 1 ELSE 0 END AS b{j}"
        )
    nibbles = []
    for i in range(16):
        b = i * 4
        nibbles.append(
            f"substr('0123456789abcdef', b{b} * 8 + b{b+1} * 4 + b{b+2} * 2 + b{b+3} + 1, 1)"
        )
    return f"""
    WITH toks AS (
      SELECT doc_id, list_transform(list_distinct({DUCK_TOKENS.format(t='text')}), t -> md5(t)) AS hashes
      FROM documents WHERE doc_id < {n_docs}
    ),
    bits AS (SELECT doc_id, {', '.join(bit_terms)} FROM toks)
    SELECT doc_id, concat({', '.join(nibbles)}) AS sig FROM bits
    """


@_q("q20_simhash", _simhash_oracle())
def q20_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star SimHash: 64-bit signature from md5 nibble bits with
    majority vote — bit-exact against the generated DuckDB oracle.
    Uses the explode + codegen'd bit-sum plan (``simhash_docs``)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return dedup.simhash_docs(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# North star: text analysis
# ---------------------------------------------------------------------------

@_q(
    "q21_token_stats",
    f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len({DUCK_TOKENS.format(t='text')})) AS BIGINT) AS total_ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|\\d|[^\\sA-Za-z\\d]'))) AS BIGINT) AS total_bpe_tokens
    FROM documents GROUP BY lang
    """,
)
def q21_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star token counting: whitespace tokens + BPE-ish regex
    pieces, aggregated per language. Map-only + tiny shuffle.

    Negative result, measured round 7: an Arrow kernel counting with
    pyarrow's RE2 (`count_substring_regex`, ~10x faster than
    java.util.regex single-core on the BPE alternation: 88 ms for all
    of sf0.1) is 1.5x SLOWER end-to-end (0.41 s vs 0.28 s same
    session) — shipping the text column through the Python-worker
    Arrow round trip costs more than the regex win, and both sides
    scale with text bytes, so the ratio does not flip at 100 TB. The
    codegen `regexp_count` pass stays."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count_ws("text")).alias("total_ws_tokens"),
        F.sum(text.token_count_bpe_ish("text")).alias("total_bpe_tokens"),
    )


_DUCK_SW = {
    "en": "['the','and','of','to','a','in','is','it','that','for']",
    "de": "['der','die','das','und','ist','von','mit','ein','nicht','zu']",
    "fr": "['le','la','les','et','de','un','une','est','pas','pour']",
    "es": "['el','la','los','y','de','un','una','es','no','para']",
}


def _langid_oracle() -> str:
    scores = ", ".join(
        f"len(list_filter(toks, t -> list_contains({_DUCK_SW[c]}, t)))::DOUBLE / greatest(len(toks), 1) AS s_{c}"
        for c in ["en", "de", "fr", "es"]
    )
    return f"""
    WITH d AS (SELECT doc_id, lang, {DUCK_TOKENS.format(t='text')} AS toks FROM documents),
    s AS (SELECT doc_id, lang, {scores} FROM d),
    p AS (
      SELECT doc_id, lang,
             CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  ELSE 'de' END AS pred_lang
      FROM s)
    SELECT lang, pred_lang, count(*) AS n_docs FROM p GROUP BY lang, pred_lang
    """


@_q("q22_lang_id", _langid_oracle())
def q22_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star language ID: stopword-ratio argmax heuristic
    (struct-max tie-break == the oracle's fixed CASE order)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", text.lang_id("text").alias("pred_lang")).groupBy(
        "lang", "pred_lang"
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@_q(
    "q23_quality_scores",
    f"""
    WITH q AS (
      SELECT doc_id, lang,
             length(text) AS n_chars_q,
             len({DUCK_TOKENS.format(t='text')}) AS n_tokens,
             length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE / length(text) AS punct_ratio,
             length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / length(text) AS digit_ratio
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           floor(avg(n_tokens) * 10000 + 0.5) / 10000 AS avg_tokens,
           floor(avg(punct_ratio) * 1000000 + 0.5) / 1000000 AS avg_punct,
           floor(avg(
             greatest(1.0 - least(punct_ratio * 2, 0.4) - least(digit_ratio * 2, 0.3)
                      - CASE WHEN n_tokens < 5 OR n_tokens > 100000 THEN 0.3 ELSE 0.0 END, 0.0)
           ) * 1000000 + 0.5) / 1000000 AS avg_quality
    FROM q GROUP BY lang
    """,
)
def q23_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star quality scoring: char-class ratios + Gopher-style
    penalty score, averaged per language."""
    docs = text.quality_features(_t(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        round_half_up(F.avg("n_tokens"), 4).alias("avg_tokens"),
        round_half_up(F.avg("punct_ratio"), 6).alias("avg_punct"),
        round_half_up(F.avg("quality_score"), 6).alias("avg_quality"),
    )


@_q(
    "q24_fingerprint",
    f"""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct({DUCK_TOKENS.format(t='text')})), ' ')) AS fp
      FROM documents
    )
    SELECT count(*) AS n_docs, count(DISTINCT fp) AS n_distinct_fp,
           min(fp) AS min_fp, max(fp) AS max_fp
    FROM fp
    """,
)
def q24_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star document fingerprint: md5 over the sorted distinct
    token set (order/whitespace-insensitive blocking key)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", text.fingerprint("text").alias("fp")
    )
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_distinct_fp"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


# ---------------------------------------------------------------------------
# North star: similarity search
# ---------------------------------------------------------------------------

_DOT = "list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"


@_q(
    "q25_embedding_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round({_DOT.format(a='e.embedding', b='q.qe')} /
                   (sqrt({_DOT.format(a='e.embedding', b='e.embedding')}) *
                    sqrt({_DOT.format(a='q.qe', b='q.qe')})), 6) AS score
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q25_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star similarity search: exact brute-force cosine top-10
    per query (queries broadcast; corpus never shuffles)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.brute_force_topk(emb, queries, k=10)


def _plane_dot_sql(col: str, plane: list[float]) -> str:
    """DuckDB dot product of an embedding column with a literal plane."""
    lits = ", ".join(repr(x) for x in plane)
    return f"list_sum(list_transform(range(1, 65), i -> {col}[i]::DOUBLE * [{lits}][i]))"


def _bucket_sql(col: str, planes: list[list[float]]) -> str:
    """DuckDB replica of similarity.lsh_bucket: sign-bit string key.

    The seeded hyperplanes are embedded as SQL literals, so the oracle
    computes byte-identical buckets (both engines: float element ->
    DOUBLE cast, multiply by the same double literal, sequential sum)."""
    bits = " || ".join(
        f"(CASE WHEN {_plane_dot_sql(col, p)} > 0 THEN '1' ELSE '0' END)" for p in planes
    )
    return "(" + bits + ")"


_Q26_PLANES = similarity._seeded_hyperplanes(64, 4, seed=42)
_Q27_PLANES = similarity._seeded_hyperplanes(64, 6, seed=42)


@_q(
    "q26_embedding_neardup",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding', _Q26_PLANES)} AS bucket
      FROM embeddings
    )
    SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           round({_DOT.format(a='l.embedding', b='r.embedding')} /
                 (sqrt({_DOT.format(a='l.embedding', b='l.embedding')}) *
                  sqrt({_DOT.format(a='r.embedding', b='r.embedding')})), 6) AS score
    FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
    WHERE round({_DOT.format(a='l.embedding', b='r.embedding')} /
                (sqrt({_DOT.format(a='l.embedding', b='l.embedding')}) *
                 sqrt({_DOT.format(a='r.embedding', b='r.embedding')})), 6) >= 0.3
    """,
)
def q26_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star embedding near-dup: LSH sign-bucket blocking + exact
    cosine verify. The oracle replicates the seeded hyperplanes as SQL
    literals, so the bucket-blocked pair set matches exactly."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(emb, threshold=0.3, n_bits=4)


@_q(
    "q27_ann_lsh",
    f"""
    WITH c AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding', _Q27_PLANES)} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM c WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round({_DOT.format(a='c.embedding', b='q.qe')} /
                   (sqrt({_DOT.format(a='c.embedding', b='c.embedding')}) *
                    sqrt({_DOT.format(a='q.qe', b='q.qe')})), 6) AS score
      FROM c JOIN q USING (bucket)
    )
    SELECT query_id, vec_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q27_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star ANN: random-hyperplane LSH bucketed search. Approximate
    vs brute force, but deterministic given the seeded hyperplanes — the
    oracle rebuilds the same buckets from SQL literals and ranks the
    same candidate sets."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.lsh_topk(emb, queries, k=10, n_bits=6)


# ---------------------------------------------------------------------------
# North star: multimodal columns
# ---------------------------------------------------------------------------

@_q(
    "q28_multimodal_features",
    """
    SELECT doc_id AS media_id,
           strlen(text)                      AS n_bytes,
           md5(text)                         AS checksum,
           16 + strlen(text) % 64            AS width,
           16 + (strlen(text) // 64) % 64    AS height
    FROM documents WHERE doc_id < 100
    """,
)
def q28_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star multimodal plumbing: binary payload column + typed
    metadata struct -> Arrow-batched mapInPandas decode (deterministic
    stub kernel). Checksum/dims are oracle-checkable because the stub
    derives them from the bytes."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = attach_binary(docs, "text", "doc_id", kind="image")
    feats = decode_features(media, fake=True)
    return feats.select("media_id", "n_bytes", "checksum", "width", "height")


# ---------------------------------------------------------------------------
# Join-heavy TPC-H-style queries (bench headliners)
# ---------------------------------------------------------------------------

@_q(
    "q29_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 20
    """,
)
def q29_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k. The customer branch is
    a pure SEMI join (no customer columns survive), so it folds to an
    InSet filter on orders when the segment's key set is bounded
    (semi_join_to_inset; falls back to a broadcast semi join past the
    cap). orders' is fact-DERIVED, so its broadcast is size-GATED
    (gated_broadcast on the pruned-scan estimate): below the cap
    lineitem (the 100 TB side) probes a broadcast map-side and never
    shuffles; past it — real-scale orders — the join falls back to a
    shuffle-hash equi-join on l_orderkey instead of OOMing a forced
    broadcast."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    bldg_keys = joins.semi_join_to_inset(cust, "c_custkey")
    if bldg_keys is not None:
        orders2 = orders.filter(F.col("o_custkey").isin(bldg_keys))
    else:  # unbounded segment: keep a real (size-gated) semi join
        orders2 = orders.join(
            joins.gated_broadcast(cust.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey", "left_semi",
        )
    # Gate on the pruned orders scan (the InSet filter doesn't change
    # the size-only estimate, which is the conservative read we want).
    # Bounded-small orders2 is inlined at plan-build time (LocalTableScan
    # broadcast: zero build jobs per run); past the caps — real-scale
    # orders — the size-gated broadcast/shuffle path is kept unchanged.
    o2 = orders2.select("o_orderkey", "o_orderdate")
    o2_local = joins.inline_local(o2)
    build = F.broadcast(o2_local) if o2_local is not None else joins.gated_broadcast(o2, orders)
    return (
        li.join(build, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@_q(
    "q30_local_supplier_volume",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q30_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, restructured so lineitem (the
    100 TB side) probes at most TWO broadcast build sides — each
    broadcast materialization is a whole Spark job, and the naive
    all-dims-broadcast tree pays five of them per run:

    - nation><region (ASIA) folds to a constant 5-entry map literal
      (fold_dim_to_map): zero jobs, applied to supplier as an InSet
      filter + n_name lookup inside supplier's own broadcast build;
    - orders><customer pre-joins INSIDE one build side with a
      shuffle-hash hint (a nested broadcast(customer) would spawn its
      own job; the hash join rides the same build job's stages).

    The orders><customer composite is fact-DERIVED, so its broadcast is
    size-GATED on its join INPUTS (gated_broadcast(oc, orders', cust');
    a join's own size-only estimate multiplies children and would
    always overshoot — the summed inputs bound an FK equi-join whose
    output has at most one customer row per order). Below the cap
    lineitem never shuffles and the only post-probe exchange is the
    final n_name agg; past it — real-scale orders — lineitem><oc runs
    as a shuffle-hash equi-join on l_orderkey with only the true dims
    (ASIA suppliers + folded nation map) broadcast. Falls back to the
    classic all-broadcast tree if the nation fold overflows its bound
    (it cannot: nations are schema-bounded at 25)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    asia_nations = joins.fold_dim_to_map(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey),
        "n_nationkey", "n_name",
    )
    if asia_nations is None:  # unreachable for TPC-H; classic tree as fallback
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(joins.gated_broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(
                joins.gated_broadcast(supp),
                (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
            )
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        )

    supp2 = (
        supp.filter(F.col("s_nationkey").isin(list(asia_nations)))
        .select(
            "s_suppkey", "s_nationkey",
            joins.map_literal(asia_nations)[F.col("s_nationkey")].alias("n_name"),
        )
    )
    o2 = orders.select("o_orderkey", "o_custkey")
    c2 = cust.select("c_custkey", "c_nationkey")
    oc = o2.join(c2.hint("shuffle_hash"), o2.o_custkey == c2.c_custkey)
    return (
        li.join(joins.gated_broadcast(oc, o2, c2), li.l_orderkey == F.col("o_orderkey"))
        .join(
            # supplier scales linearly with SF (~1/5 kept by the ASIA
            # filter) — at the 100 TB target it is a 100M+-row table,
            # so the broadcast must be stats-gated like the oc side.
            # (Plan-time inlining was MEASURED here and reverted: a
            # LocalTableScan build side re-serializes its rows on every
            # broadcast build, which at oc's 150k rows costs more than
            # the parquet-scan build chain it replaced — q30 steady
            # 0.32 s -> 0.52 s. inline_local pays off only for narrow
            # few-10k-row build sides like q29's.)
            joins.gated_broadcast(supp2),
            (li.l_suppkey == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@_q(
    "q31_revenue_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q31_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg — the pushdown/codegen
    showcase (no shuffle beyond the final scalar agg). Window moved to
    1996 in round 6: the round-3 testdata regeneration shifted
    shipdates to start in 1995, leaving the canonical 1994 window
    EMPTY — the query was passing vacuously on (NULL, 0) = (NULL, 0)
    for three rounds. 1996 selects ~12k rows at sf0.1, so the revenue
    aggregate is load-bearing again."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )
