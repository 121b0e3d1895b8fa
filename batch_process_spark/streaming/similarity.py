"""Streaming similarity serving: top-k cosine retrieval for QUERY
VECTORS arriving as a stream, against a static indexed corpus — the
online half of the `operators/similarity.py` family (q25 brute force /
q26 LSH / q27 IVF are the offline half).

Shape: ``foreachBatch``. Each micro-batch of queries is a plain batch
DataFrame, so the batch kernels apply verbatim — one BLAS scoring pass
over the (persisted) corpus per batch, per-partition top-k, exact
merge. Every query is answered exactly once, in the batch it arrives
in, so the union of per-batch answers IS the batch answer over all
queries — the equivalence the catalog query (q172) pins against the
brute-force oracle.

Why foreachBatch instead of a stream-static join + window: Structured
Streaming's append mode cannot run a per-query ranking window without
watermark state, and the retrieval result is per-query-final anyway
(no cross-batch state at all). foreachBatch gives each micro-batch
batch-DataFrame semantics — the standard serving pattern for
model-inference-shaped streaming work.

100 TB: the corpus stays persisted and partitioned; each batch costs
one corpus scan regardless of stream history. Corpus-side growth is
handled by reindexing offline (the ivf/lsh variants cut the per-batch
scan to probed buckets — swap ``scorer``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def stream_topk_serving(
    stream_queries: DataFrame,
    corpus: DataFrame,
    sink: Callable[[DataFrame, int], None],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scorer: Callable | None = None,
    checkpoint_dir: str | None = None,
):
    """Start a streaming query answering each arriving query vector
    with its exact top-``k`` corpus neighbors; ``sink(result_df,
    batch_id)`` receives each batch's answers. Returns the started
    ``StreamingQuery`` (caller drains/stops). ``scorer`` defaults to
    the exact ``brute_force_topk``; pass ``ivf_topk``/``lsh_topk``
    (same signature) for the bucketed scale path."""
    from batch_process_spark.operators.similarity import brute_force_topk

    score = scorer or brute_force_topk

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # No emptiness pre-check: that would cost an extra job (take(1)
        # re-reads the batch source) on EVERY trigger. The scorer
        # already collects the tiny query side once and short-circuits
        # an empty batch to an empty typed frame without touching the
        # corpus, so sinks see a (usually empty-on-idle) frame of the
        # stable result schema either way.
        out = score(
            corpus,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            query_id_col=query_id_col,
            k=k,
        )
        sink(out, batch_id)

    writer = stream_queries.writeStream.foreachBatch(handle).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def bounded_collect_sink(max_rows_per_batch: int = 10_000):
    """The serving loop's DRIVER-SIDE sink contract (the q172 pattern),
    packaged: returns ``(sink, collected)`` where ``sink`` is a
    ``foreachBatch``-compatible callable appending each batch's rows to
    ``collected``.

    Collecting is safe here BY CONSTRUCTION — a top-k serving batch is
    bounded at k x queries-in-batch rows — and the explicit
    ``max_rows_per_batch`` guard keeps that construction honest: a sink
    accidentally wired to an unbounded frame (raw scores, a forgotten
    ``limit``) fails loudly on the offending batch instead of OOMing
    the driver. The bounded ``limit(n + 1).collect()`` never pulls more
    than the cap + 1 rows even when misused.

    At 100 TB this sink is for ANSWERS (k rows per query), not data:
    high-volume results belong in a real writer (kafka/parquet
    ``foreachBatch`` body), not on the driver.
    """
    collected: list = []

    def sink(df: DataFrame, batch_id: int) -> None:
        rows = df.limit(max_rows_per_batch + 1).collect()
        if len(rows) > max_rows_per_batch:
            raise ValueError(
                f"bounded_collect_sink: batch {batch_id} exceeds "
                f"{max_rows_per_batch} rows — this sink is for bounded "
                "top-k answers; route bulk results to a real writer"
            )
        collected.extend(rows)

    return sink, collected
