"""Streaming near-duplicate detection against a static corpus index —
the crawl-ingest shape of the MinHash-LSH pipeline: the corpus is
indexed ONCE (banded signatures, persisted), and each arriving
micro-batch of documents is checked against it map-side + one
stream-static equi-join, never against itself and never all-pairs.

This is the incremental complement of the batch self-join
(``operators/dedup.py::minhash_near_dup_pairs``): ingest dedups new
documents against what already exists; periodic batch runs handle
within-corpus duplication. Both share the same shingle/signature/band
kernels, so a pair flags identically whichever path sees it.

100 TB shape: the index is (bands x corpus) rows of (16-byte key, id,
shingle array), hash-partitioned on band_key once at build; each
micro-batch shuffles only its OWN banded rows to the matching index
partitions (stream-static joins re-read the static side per batch
UNLESS it is persisted — hence ``build_lsh_index`` persists). State:
none (the join is stateless; the index is a plain cached table), so
there is no watermark requirement and no unbounded-state trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_process_spark.operators.dedup import (
    band_key_array,
    jaccard,
    shingle_sig_frame,
)


def build_lsh_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    persist: bool = True,
) -> DataFrame:
    """Banded signature index of a STATIC corpus:
    (band_key, corpus_id, corpus_shingles) — one row per (doc, band).
    Empty-shingle docs are dropped (their sentinel signature would
    collide in every band and can never verify). Persisted by default:
    a stream-static join re-executes the static plan every micro-batch,
    which without the persist means re-shingling the corpus per batch.
    """
    sh = shingle_sig_frame(corpus, id_col, text_col, k, num_hashes)
    idx = sh.filter(F.size("shingles") > 0).select(
        F.col(id_col).alias("corpus_id"),
        F.col("shingles").alias("corpus_shingles"),
        F.explode(band_key_array(num_hashes, bands)).alias("band_key"),
    )
    return idx.persist() if persist else idx


def build_lsh_index_bucketed(
    corpus: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    n_buckets: int = 32,
) -> DataFrame:
    """The at-scale index layout: the banded corpus index written as a
    ``band_key``-BUCKETED (and sorted) managed table, returned as the
    table's DataFrame. Why this exists (measured, BASELINE §5k): a
    stream-static hash join re-shuffles a merely-PERSISTED static side
    on EVERY micro-batch — linear in corpus size per batch — and
    local-mode AQE hides it by broadcasting the capped index. The
    bucketed layout pays the index shuffle ONCE at build; each
    micro-batch then shuffles only its own (batch x bands) rows into
    the bucket partitioning, so per-batch cost scales with batch size
    alone. Plan-guarded: the join against this index has NO exchange
    above the index scan (tests/test_sinks.py)."""
    from batch_process_spark.sinks.writers import write_bucketed

    idx = build_lsh_index(
        corpus, id_col, text_col, k, num_hashes, bands, persist=False
    )
    write_bucketed(idx, table, "band_key", n_buckets=n_buckets, sort_cols="band_key")
    return corpus.sparkSession.table(table)


def stream_neardup_against_corpus(
    stream_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """(stream_id, corpus_id, jaccard_sim) for every arriving document
    whose exact shingle Jaccard against an indexed corpus document is
    >= ``threshold``. Works on a STREAMING ``stream_docs`` (the
    shingle/sign kernel is a map-only ``mapInPandas``, legal in
    streams) or a batch frame (same plan, finite).

    A pair agreeing on multiple bands emits once per agreeing band
    WITHIN its micro-batch (streaming append mode cannot distinct
    without watermark state; the duplicates are band-bounded — <= 4x
    at the default — and verify to the identical row). Sinks that need
    exactly-one-row-per-pair dedupe at the sink (pairs are tiny
    relative to the corpus; the catalog query does exactly this).
    """
    sh = shingle_sig_frame(
        stream_docs.select(F.col(id_col), F.col(text_col)),
        id_col,
        text_col,
        k,
        num_hashes,
    )
    banded = sh.filter(F.size("shingles") > 0).select(
        F.col(id_col).alias("stream_id"),
        F.col("shingles").alias("stream_shingles"),
        F.explode(band_key_array(num_hashes, bands)).alias("band_key"),
    )
    sim = jaccard(F.col("stream_shingles"), F.col("corpus_shingles"))
    return (
        banded.join(index, "band_key")
        .withColumn("jaccard_sim", sim)
        .filter(F.col("jaccard_sim") >= threshold)
        .select("stream_id", "corpus_id", F.round("jaccard_sim", 6).alias("jaccard_sim"))
    )
