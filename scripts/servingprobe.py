"""Streaming PQ serving (q214's ADC tier) per-batch cost vs corpus
size — the §5k discipline applied to vector serving: a FIXED 64-query
micro-batch served against 1x and 4x corpora, steady-batch wall,
shuffle bytes per batch, and the no-broadcast column that forecasts
the 100 TB cluster (locally AQE broadcasts the bounded candidate/query
sides; on a cluster the join strategy must not depend on that).

The contract under test (make_adc_scorer's docstring): a serving batch
costs one MAP-ONLY pass over the m-bytes-per-vector codes frame plus
an id-equi-join touching queries x rerank_factor x k float rows —
so per-batch SHUFFLE is proportional to the batch (partitions x Q x R
candidate rows), NOT the corpus, and the only corpus-proportional term
is the compressed codes scan (m int64s per vector — 16 longs vs 64
floats; the tier below is IVFPQ serving, which prunes that scan to
probed mass, measured in scripts/ivfrecall.py).

Usage: python scripts/servingprobe.py [n_vectors...] (default 65536 262144)
Prints markdown rows for BASELINE.md §5.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pandas as pd

from batch_process_spark.operators import pq
from batch_process_spark.session import get_spark
from scripts.pqprobe import N_CLUSTERS, SEED, corpus_df
from scripts.scaleprobe import fmt_shuffle, shuffle_delta, shuffle_write_bytes

SUBDIM = 4
K = 10
RERANK = 5
N_QUERIES = 64


def query_batch(dim: int = 64):
    centers = np.random.default_rng(SEED).normal(size=(N_CLUSTERS, dim))
    rng = np.random.default_rng(SEED + 42)
    rows = []
    for qid in range(N_QUERIES):
        i, j = rng.choice(N_CLUSTERS, size=2, replace=False)
        v = (centers[i] + centers[j]) / 2 + 0.05 * rng.normal(size=dim)
        v /= np.linalg.norm(v)
        rows.append((qid, [float(x) for x in v]))
    return rows


def main() -> None:
    from batch_process_spark.streaming.similarity import (
        bounded_collect_sink,
        stream_topk_serving,
    )
    from batch_process_spark.streaming.windows import drain_all

    sizes = [int(float(s)) for s in sys.argv[1:]] or [65_536, 262_144]
    spark = get_spark("servingprobe", extra_conf={"spark.ui.enabled": "true"})
    port = int((spark.sparkContext.uiWebUrl or ":4040").rsplit(":", 1)[1])
    qrows = query_batch()

    print("| corpus vecs | codes rows | per-batch (s) | batch shuffle MB | B/(QxR) | no-bcast (s) | no-bcast MB | answers |")
    print("|---|---|---|---|---|---|---|---|")
    for n in sizes:
        corpus = corpus_df(spark, n).persist()
        corpus.count()
        cb = pq.pq_train(corpus, SUBDIM, k=256, iters=2, fused=True)
        codes = pq.pq_encode_fused(corpus, cb, SUBDIM).persist()
        n_codes = codes.count()
        scorer = pq.make_adc_scorer(cb, codes, SUBDIM, rerank_factor=RERANK)

        with tempfile.TemporaryDirectory() as sdir:
            def feed(batch_no: int) -> None:
                pdf = pd.DataFrame(
                    [(q + batch_no * 1000, v) for q, v in qrows],
                    columns=["query_id", "embedding"],
                )
                spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(sdir)

            feed(0)
            sink, collected = bounded_collect_sink(max_rows_per_batch=K * N_QUERIES)
            stream = (
                spark.readStream.schema("query_id long, embedding array<double>")
                .format("parquet")
                .load(sdir)
            )
            q = stream_topk_serving(stream, corpus, sink, k=K, scorer=scorer)
            try:
                drain_all(q)  # batch 0: cold (plan + codebook collect)
                # timer and shuffle poll start BEFORE the feed: the
                # default trigger runs continuously, so a post-feed
                # timer can miss a batch the engine already picked up
                sb0 = shuffle_write_bytes(port)
                t0 = time.time()
                feed(1)
                drain_all(q)  # batch 1: steady
                wall = time.time() - t0
                shuf = fmt_shuffle(
                    shuffle_delta(sb0, shuffle_write_bytes(port)),
                    N_QUERIES * RERANK * K,
                )
                saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                try:
                    sb2 = shuffle_write_bytes(port)
                    t0 = time.time()
                    feed(2)
                    drain_all(q)  # batch 2: steady, no broadcast anywhere
                    wall_nb = time.time() - t0
                    nb = shuffle_delta(sb2, shuffle_write_bytes(port))
                    nb_mb = f"{nb / 2**20:.1f}" if nb is not None else "n/a"
                finally:
                    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
                err = q.exception()
                if err is not None:
                    raise err
            finally:
                q.stop()
            n_answers = len(collected)
        print(
            f"| {n:,} | {n_codes:,} | {wall:.2f} | {shuf} | {wall_nb:.2f} | {nb_mb} | {n_answers} |"
        )
        assert n_answers == 3 * K * N_QUERIES, n_answers

        # the production fix for the no-bcast seam (BASELINE 5u): float
        # corpus stored BUCKETED on vec_id — the rerank id-join is then
        # exchange-free on the corpus side, so the no-broadcast per-batch
        # shuffle should collapse to candidate/window traffic only,
        # independent of corpus size
        from batch_process_spark.sinks.writers import write_bucketed

        write_bucketed(corpus, "servingprobe_corpus_bkt", "vec_id", n_buckets=32)
        bkt = spark.table("servingprobe_corpus_bkt")
        with tempfile.TemporaryDirectory() as sdir2:
            def feed2(batch_no: int) -> None:
                pdf = pd.DataFrame(
                    [(q + batch_no * 1000, v) for q, v in qrows],
                    columns=["query_id", "embedding"],
                )
                spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(sdir2)

            feed2(0)
            sink2, collected2 = bounded_collect_sink(max_rows_per_batch=K * N_QUERIES)
            stream2 = (
                spark.readStream.schema("query_id long, embedding array<double>")
                .format("parquet")
                .load(sdir2)
            )
            q2 = stream_topk_serving(stream2, bkt, sink2, k=K, scorer=scorer)
            try:
                drain_all(q2)
                saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                try:
                    sbb = shuffle_write_bytes(port)
                    t0 = time.time()
                    feed2(1)
                    drain_all(q2)
                    wall_bkt = time.time() - t0
                    bb = shuffle_delta(sbb, shuffle_write_bytes(port))
                    bb_mb = f"{bb / 2**20:.1f}" if bb is not None else "n/a"
                finally:
                    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
                err = q2.exception()
                if err is not None:
                    raise err
            finally:
                q2.stop()
            # same answers off the bucketed corpus
            a_plain = {tuple(r) for r in collected}
            a_bkt = {tuple(r) for r in collected2}
            assert a_bkt <= a_plain, "bucketed-corpus serving answers diverged"
        print(
            f"|   ^ bucketed corpus, no-bcast | | {wall_bkt:.2f} | | | | {bb_mb} | {len(collected2)} |"
        )
        spark.sql("DROP TABLE IF EXISTS servingprobe_corpus_bkt")
        corpus.unpersist()
        codes.unpersist()


if __name__ == "__main__":
    main()
