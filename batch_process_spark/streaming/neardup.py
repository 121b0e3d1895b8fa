"""Streaming near-duplicate detection against a static corpus index —
the crawl-ingest shape of the MinHash-LSH pipeline: the corpus is
indexed ONCE, and each arriving micro-batch of documents is checked
against it map-side + stateless stream-static equi-joins, never
against itself and never all-pairs.

This is the incremental complement of the batch self-join
(``operators/dedup.py::minhash_near_dup_pairs``): ingest dedups new
documents against what already exists; periodic batch runs handle
within-corpus duplication. Both share the same shingle/signature/band
kernels, so a pair flags identically whichever path sees it.

Index layout (NORMALIZED — two tables, not one):

- ``bands``:    (band_key, corpus_id)           — bands x corpus rows,
                24ish bytes each; the candidate-generation side.
- ``shingles``: (corpus_id, corpus_shingles)    — ONE row per doc.

A single denormalized table (shingle array repeated per band row) costs
``bands``x the corpus text in index memory and ships every collided
row's full array through the join; the normalized form keeps the hot
candidate join on fixed-width rows and fetches shingle arrays ONLY for
candidate corpus_ids (a batch-sized semi-fetch, not an index-sized
carry). State: none anywhere — no watermark requirement, no
unbounded-state trap.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_process_spark.operators.dedup import (
    band_key_array,
    jaccard,
    shingle_sig_frame,
)


@dataclass
class LshIndex:
    """The two persisted/bucketed halves of a corpus LSH index."""

    bands: DataFrame  # (band_key, corpus_id)
    shingles: DataFrame  # (corpus_id, corpus_shingles)
    # the shared shingle/minhash kernel frame, persisted so BOTH halves
    # materialize from one kernel pass; released once the build's
    # consumers have materialized (build_lsh_index does it eagerly,
    # build_lsh_index_bucketed after its two table writes)
    parent: DataFrame | None = None

    def unpersist(self) -> None:
        for df in (self.bands, self.shingles, self.parent):
            if df is None:
                continue
            try:
                df.unpersist()
            except Exception:
                pass
        self.parent = None


def build_lsh_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    persist: bool = True,
) -> LshIndex:
    """Normalized banded index of a STATIC corpus (see module doc).
    Empty-shingle docs are dropped (their sentinel signature would
    collide in every band and can never verify). Both halves persisted
    by default: a stream-static join re-executes the static plan every
    micro-batch, which without the persist means re-shingling the
    corpus per batch.

    The expensive shingle+minhash kernel runs ONCE: the shared parent
    frame is persisted and both halves are materialized eagerly from
    it (the first count executes the kernel and fills the parent
    cache, the second reads it back), then the parent is released —
    two independently-cached halves would each re-run the kernel on
    first use."""
    sh = shingle_sig_frame(corpus, id_col, text_col, k, num_hashes)
    # persisted BEFORE either half materializes, so the kernel runs
    # once whichever half executes first (cache lookup is by plan)
    nonempty = sh.filter(F.size("shingles") > 0).persist()
    band_rows = nonempty.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(band_key_array(num_hashes, bands)).alias("band_key"),
    )
    shingle_rows = nonempty.select(
        F.col(id_col).alias("corpus_id"), F.col("shingles").alias("corpus_shingles")
    )
    if persist:
        band_rows = band_rows.persist()
        shingle_rows = shingle_rows.persist()
        band_rows.count()
        shingle_rows.count()
        nonempty.unpersist()
        return LshIndex(bands=band_rows, shingles=shingle_rows)
    # caller (the bucketed builder) materializes both halves, then
    # releases the parent via LshIndex.unpersist()
    return LshIndex(bands=band_rows, shingles=shingle_rows, parent=nonempty)


def build_lsh_index_bucketed(
    corpus: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    n_buckets: int = 32,
) -> LshIndex:
    """The at-scale index layout: both index halves written as BUCKETED
    sorted managed tables (``<table>_bands`` on band_key,
    ``<table>_shingles`` on corpus_id). Why (measured, BASELINE §5k): a
    stream-static hash join re-shuffles a merely-PERSISTED static side
    on EVERY micro-batch — linear in corpus size per batch — and
    local-mode AQE hides it by broadcasting the capped index. Bucketing
    pays each index shuffle ONCE at build; each micro-batch then
    shuffles only its own rows into the bucket partitionings, so
    per-batch cost scales with batch size alone. Plan-guarded: the
    candidate join against the bands table has NO exchange above the
    index scan (tests/test_sinks.py)."""
    from batch_process_spark.sinks.writers import write_bucketed

    idx = build_lsh_index(
        corpus, id_col, text_col, k, num_hashes, bands, persist=False
    )
    spark = corpus.sparkSession
    write_bucketed(
        idx.bands, f"{table}_bands", "band_key", n_buckets=n_buckets, sort_cols="band_key"
    )
    write_bucketed(
        idx.shingles,
        f"{table}_shingles",
        "corpus_id",
        n_buckets=n_buckets,
        sort_cols="corpus_id",
    )
    # both table writes have materialized from the shared parent cache;
    # release it before handing out the bucketed-table handles
    idx.unpersist()
    return LshIndex(
        bands=spark.table(f"{table}_bands"),
        shingles=spark.table(f"{table}_shingles"),
    )


def stream_neardup_against_corpus(
    stream_docs: DataFrame,
    index: LshIndex,
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

    Two stateless equi-joins per batch: candidates on ``band_key``
    against the fixed-width bands table, then corpus shingles fetched
    by ``corpus_id`` for CANDIDATES ONLY — the index's shingle arrays
    never ride the hot join. A pair agreeing on multiple bands emits
    once per agreeing band within its micro-batch (append mode cannot
    distinct without watermark state; duplicates are band-bounded —
    <= ``bands``x — and verify to the identical row). Sinks needing
    exactly-one-row-per-pair dedupe at the sink (pairs are tiny; the
    catalog query does exactly this).
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
    cands = banded.join(index.bands, "band_key")
    sim = jaccard(F.col("stream_shingles"), F.col("corpus_shingles"))
    return (
        cands.join(index.shingles, "corpus_id")
        .withColumn("jaccard_sim", sim)
        .filter(F.col("jaccard_sim") >= threshold)
        .select("stream_id", "corpus_id", F.round("jaccard_sim", 6).alias("jaccard_sim"))
    )
