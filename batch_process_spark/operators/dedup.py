"""Deduplication operators for large-scale corpus cleaning.

Five families, all designed to scale to ~100 TB:

- **exact** — content-hash groupBy. One shuffle on a 128-bit hash; the
  canonical-row pick uses ``min_by`` so output is deterministic.
- **MinHash + LSH** — shingle -> per-permutation minhash -> banded
  buckets -> candidate join. Signature computation is map-only (array
  expressions, no explode shuffle); only candidates shuffle.
- **SimHash** — 64-bit signature from token hashes; near-dup = small
  Hamming distance within banded buckets.
- **n-gram Jaccard** — exact verification, blocked by a cheap key so the
  pairwise join never goes quadratic on the full corpus.
- **embedding cosine** — see ``similarity.py`` (shared machinery).

The hash family is md5-based (``md5(seed || ':' || shingle)``) rather
than Spark's murmur ``hash()`` so results are engine-portable and
seed-stable — the DuckDB correctness oracle computes the identical
signatures. md5 is computed JVM-side (no Python in the hot path).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def content_hash(col: Column | str) -> Column:
    """128-bit content hash (md5 hex) — cheap and collision-safe enough
    for dedup keys at 100 TB (expect ~0 collisions below 2^64 docs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one deterministic representative per distinct content.

    Single shuffle on the hash; ``min_by(id)`` picks the canonical row.
    Scale note: group cardinality == distinct docs, so AQE coalesces
    post-shuffle partitions; no driver-side state.
    """
    h = content_hash(text_col).alias("__h")
    return (
        df.select(h, F.col(id_col), *[c for c in df.columns if c != id_col])
        .groupBy("__h")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("__h")
    )


def duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """All ids per duplicated content (dup_count > 1), ids sorted."""
    return (
        df.groupBy(content_hash(text_col).alias("content_md5"))
        .agg(
            F.array_sort(F.collect_list(id_col)).alias("ids"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .filter(F.col("dup_count") > 1)
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

def tokens_col(text: Column | str) -> Column:
    """Lowercased word tokens (non-alnum separators)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(c)), r"[^0-9a-zA-Z]+")
    return F.filter(toks, lambda t: t != "")


def shingles_col(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles as an array<string> — pure array
    expressions, evaluated JVM-side with zero shuffle."""
    w = tokens_col(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(k)]))
    return F.array_distinct(sh)


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """Array of ``num_hashes`` minhash values (md5-hex strings).

    Permutation ``j`` is the md5 family member ``md5(j ":" shingle)``;
    the minhash is the lexicographic min over the doc's shingles.
    Map-only: no explode, no shuffle.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s)))
            )
            for j in range(num_hashes)
        ]
    )


def minhash_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, shingles, sig) per doc."""
    return df.select(
        F.col(id_col),
        shingles_col(text_col, k).alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Banded-LSH candidate pairs (a < b) from a (id, sig) frame.

    Each band's key is md5 of its rows — docs agreeing on any band
    collide. The self-join shuffles only on band keys; hot buckets
    (boilerplate-heavy corpora) are handled by AQE skew-join splitting.
    """
    rows = num_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws("|", F.lit(str(b)), *[F.element_at("sig", b * rows + r + 1) for r in range(rows)])
        ).alias("band_key")
        for b in range(bands)
    ]
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band_key")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, on="band_key")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (assumed distinct elements)."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> sign -> band ->
    candidates -> exact-Jaccard verify >= threshold.

    Returns (id_a, id_b, jaccard_sim). Only candidate pairs are
    verified, so the expensive exact step touches a tiny fraction of
    the corpus-squared space.
    """
    docs = minhash_docs(df, id_col, text_col, k, num_hashes).cache()
    cands = lsh_candidate_pairs(docs.select(id_col, "sig"), id_col, num_hashes, bands)
    sh = docs.select(F.col(id_col), F.col("shingles"))
    verified = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim"))
    )
    return verified


# ---------------------------------------------------------------------------
# blocked exact n-gram Jaccard
# ---------------------------------------------------------------------------

def blocked_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    k: int = 1,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact k-gram Jaccard pairs within blocking-key groups.

    Blocking (e.g. on (lang, length-bucket)) keeps the self-join from
    going quadratic: pairs are only formed inside a block. The join
    shuffles on the block key; skewed blocks split via AQE.
    """
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        (shingles_col(text_col, k) if k > 1 else F.array_distinct(tokens_col(text_col))).alias("grams"),
    )
    a = base.alias("a")
    b = base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    from functools import reduce

    return (
        a.join(b, reduce(lambda x, y: x & y, cond))
        .withColumn("jaccard_sim", jaccard(F.col("a.grams"), F.col("b.grams")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round("jaccard_sim", 6).alias("jaccard_sim"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _hex_nibble_value(ch: Column) -> Column:
    """hex char -> 0..15 via position lookup (engine-portable)."""
    return F.instr(F.lit("0123456789abcdef"), ch) - 1


def simhash_bits(text: Column | str, n_bits: int = 64) -> Column:
    """SimHash signature as an array<int> of ``n_bits`` bits (1/0).

    Token hash bits come from md5 hex nibbles (portable across engines,
    unlike murmur). Bit j of token t = (nibble(j//4) >> (3 - j%4)) & 1.
    The signature bit is the majority vote across the doc's distinct
    tokens. All array expressions — map-only, JVM-side.
    """
    toks = F.array_distinct(tokens_col(text))
    hashes = F.transform(toks, lambda t: F.md5(t))
    n_tok = F.size(hashes)

    def bit_of(h: Column, j: int) -> Column:
        nib = _hex_nibble_value(F.substring(h, j // 4 + 1, 1))
        return F.shiftright(nib, 3 - j % 4) % 2

    def merge_for(jj: int):
        # nb: a `jj=j` default arg would change the lambda's arity and
        # break PySpark's higher-order-function binding — use a closure.
        return lambda acc, h: acc + bit_of(h, jj)

    bits = [
        (F.aggregate(hashes, F.lit(0), merge_for(j)) * 2 > n_tok).cast("int")
        for j in range(n_bits)
    ]
    return F.array(*bits)


def simhash_hex(text: Column | str, n_bits: int = 64) -> Column:
    """SimHash as a hex string (4 bits per char), convenient for
    equality bucketing and storage."""
    bits = simhash_bits(text, n_bits)
    nibbles = F.transform(
        F.sequence(F.lit(0), F.lit(n_bits // 4 - 1)),
        lambda i: F.substring(
            F.lit("0123456789abcdef"),
            (
                F.element_at(bits, i * 4 + 1) * 8
                + F.element_at(bits, i * 4 + 2) * 4
                + F.element_at(bits, i * 4 + 3) * 2
                + F.element_at(bits, i * 4 + 4)
            ) + 1,
            1,
        ),
    )
    return F.array_join(nibbles, "")


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int = 64,
    band_nibbles: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the hex signature (docs within
    Hamming distance d share at least one of >d bands by pigeonhole),
    join on band, verify Hamming distance on the bit arrays."""
    docs = df.select(
        F.col(id_col),
        simhash_bits(text_col, n_bits).alias("bits"),
        simhash_hex(text_col, n_bits).alias("sig"),
    )
    n_bands = (n_bits // 4) // band_nibbles
    banded = docs.select(
        F.col(id_col),
        F.col("bits"),
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"{b}:"), F.substring("sig", b * band_nibbles + 1, band_nibbles))
                    for b in range(n_bands)
                ]
            )
        ).alias("band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.aggregate(
        F.zip_with(F.col("a.bits"), F.col("b.bits"), lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, on="band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
