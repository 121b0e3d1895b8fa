"""PQ at scale: encode shuffle-bytes/vector, ADC + rerank recall, and
wall-clock against exact brute force.

What must be true for PQ to be the 100 TB compressed-scan path:

- ENCODING is map-only (the fused Arrow kernel: codebook in the task
  closure, one BLAS pass per batch) — shuffle bytes per vector ~0 and
  independent of N;
- ADC SEARCH scans m int64 codes per vector instead of d floats, and
  only partitions x Q x R candidate rows shuffle (the brute_force_topk
  merge shape);
- recall@10 of the DEPLOYMENT shape (retrieve R=100 by ADC, rerank
  those exactly) stays high where raw ADC@10 alone does not — PQ is a
  candidate generator, not a final ranker.

Corpus: 50 Gaussian clusters with within-cluster spread EQUAL to the
center scale (continuous variation — a tight-atom corpus makes every
cluster member share codes and ADC degenerate by construction, which
is an indictment of the corpus, not the method), L2-NORMALIZED so
cosine and L2 rankings coincide and the exact cosine ground truth
(brute_force_topk) is the right referee for L2-ADC. Queries are
cluster-pair midpoints (the ivfrecall adversarial setup), normalized.

Config sweep: m=16 subspaces x 4 dims, (k=64, R=100) vs the standard
byte-code (k=256, R=200) — recall at fixed k/R decays with N (more
foreign near-neighbors crowd a fixed candidate budget), and the sweep
shows k=256/R=200 holding ~0.99 where k=64/R=100 sags; scale k and R
with the corpus, not the scan (both stay O(m) per vector).

Usage: python scripts/pqprobe.py [n_vectors...]  (default 65536 262144)
Prints markdown rows for BASELINE.md §5.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from batch_process_spark.operators import pq
from batch_process_spark.operators.similarity import brute_force_topk
from batch_process_spark.session import get_spark
from scripts.scaleprobe import fmt_shuffle, shuffle_delta, shuffle_write_bytes

N_CLUSTERS = 50
N_QUERIES = 64
SUBDIM = 4  # 64-dim -> m = 16 subspaces
K = 10
SEED = 7


def _ui_port(spark) -> int:
    url = spark.sparkContext.uiWebUrl or "http://localhost:4040"
    return int(url.rsplit(":", 1)[1])


def corpus_df(spark, n: int, dim: int = 64):
    """Normalized loose-clustered corpus, generated distributed."""
    centers = np.random.default_rng(SEED).normal(size=(N_CLUSTERS, dim))

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(SEED + 1 + int(ids[0]))
            cl = ids % N_CLUSTERS
            vecs = centers[cl] + rng.normal(size=(len(ids), dim))
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
    )


def queries_df(spark, dim: int = 64):
    centers = np.random.default_rng(SEED).normal(size=(N_CLUSTERS, dim))
    rng = np.random.default_rng(SEED + 999)
    rows = []
    for qid in range(N_QUERIES):
        a, b = rng.choice(N_CLUSTERS, size=2, replace=False)
        mid = (centers[a] + centers[b]) / 2 + 0.1 * rng.normal(size=dim)
        mid /= np.linalg.norm(mid)
        rows.append((qid, [float(x) for x in mid]))
    return spark.createDataFrame(rows, "query_id long, embedding array<double>")


def run(spark, n: int, k_code: int, rerank: int) -> None:
    port = _ui_port(spark)
    corpus = corpus_df(spark, n).persist()
    corpus.count()
    queries = queries_df(spark)

    t0 = time.time()
    cb = pq.pq_train(corpus, SUBDIM, k=k_code, iters=1, fused=True).persist()
    cb.count()
    t_train = time.time() - t0

    codes = pq.pq_encode_fused(corpus, cb, SUBDIM).persist()
    t0 = time.time()
    n_codes = codes.count()
    t_encode = time.time() - t0
    sb0 = shuffle_write_bytes(port)
    pq.pq_encode_fused(corpus, cb, SUBDIM).count()
    sb1 = shuffle_write_bytes(port)
    enc_shuffle = fmt_shuffle(shuffle_delta(sb0, sb1), n)

    t0 = time.time()
    exact_rows = brute_force_topk(corpus, queries, k=K).collect()
    t_brute = time.time() - t0
    exact = {(r["query_id"], r["vec_id"]) for r in exact_rows}

    sb0 = shuffle_write_bytes(port)
    t0 = time.time()
    adc_rows = pq.pq_adc_topk_fused(codes, queries, cb, SUBDIM, k=rerank).collect()
    t_adc = time.time() - t0
    sb1 = shuffle_write_bytes(port)
    adc_shuffle = fmt_shuffle(shuffle_delta(sb0, sb1), n)

    per_q: dict = {}
    for r in adc_rows:
        per_q.setdefault(r["query_id"], []).append((r["adc"], r["vec_id"]))
    got10 = {
        (qid, vid)
        for qid, lst in per_q.items()
        for _, vid in sorted(lst)[:K]
    }
    recall_adc = len(got10 & exact) / len(exact)

    # deployment shape: rerank the R candidates exactly (bounded join)
    cand = spark.createDataFrame(
        [(r["query_id"], r["vec_id"]) for r in adc_rows],
        "query_id long, vec_id long",
    )
    rer = (
        cand.join(corpus, "vec_id")
        .join(F.broadcast(queries.select("query_id", F.col("embedding").alias("qe"))), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with("embedding", "qe", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    rer10 = {
        (r["query_id"], r["vec_id"])
        for r in rer.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= K)
        .collect()
    }
    recall_rerank = len(rer10 & exact) / len(exact)

    print(
        f"| {n:,} | {k_code} | {rerank} | {t_train:.1f} | {t_encode:.1f} | {enc_shuffle} | "
        f"{t_brute:.1f} | {t_adc:.1f} | {adc_shuffle} | "
        f"{recall_adc:.3f} | {recall_rerank:.3f} |"
    )
    assert n_codes == n, (n_codes, n)
    corpus.unpersist()
    cb.unpersist()
    codes.unpersist()


def run_ivfpq(spark, n: int) -> None:
    """IVFPQ composition: coarse pruning in front of the ADC scan.
    Reports probed-mass fraction (the scan-cost multiplier on top of
    PQ's 16 B/vec) and recall of the full retrieve+rerank deployment."""
    from batch_process_spark.operators.similarity import ivf_probe_sets

    corpus = corpus_df(spark, n).persist()
    corpus.count()
    queries = queries_df(spark)
    t0 = time.time()
    assigned_codes, cents, cb = pq.ivfpq_index(
        corpus, SUBDIM, k_code=256, n_centroids=32
    )
    assigned_codes = assigned_codes.persist()
    assigned_codes.count()
    cb = cb.persist()
    t_build = time.time() - t0
    cell_sizes = {
        r["centroid_id"]: r["count"]
        for r in assigned_codes.groupBy("centroid_id").count().collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(corpus, queries, k=K).collect()
    }
    print(f"[ivfpq] n={n:,} cells=32 build={t_build:.1f}s")
    print("| nprobe | probed fraction | wall (s) | recall@10 (IVFPQ->rerank) |")
    print("|---|---|---|---|")
    for nprobe in (2, 4, 8):
        per_q: dict = {}
        for r in ivf_probe_sets(cents, queries, k=K, nprobe=nprobe).collect():
            per_q.setdefault(r["query_id"], 0)
            per_q[r["query_id"]] += cell_sizes.get(r["centroid_id"], 0)
        frac = sum(per_q.values()) / (len(per_q) * n)
        t0 = time.time()
        got = {
            (r["query_id"], r["vec_id"])
            for r in pq.ivfpq_topk(
                assigned_codes, cents, cb, queries, SUBDIM, corpus,
                k=K, rerank_factor=20, nprobe=nprobe,
            ).collect()
        }
        wall = time.time() - t0
        rec = len(got & exact) / len(exact)
        print(f"| {nprobe} | {frac:.3f} | {wall:.1f} | {rec:.3f} |")
    corpus.unpersist()
    assigned_codes.unpersist()
    cb.unpersist()


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [65536, 262144]
    spark = get_spark("pqprobe", extra_conf={"spark.ui.enabled": "true"})
    print(
        "| N | k | R | train (s) | encode (s) | enc shuffle MB | B/vec | "
        "exact top-10 (s) | ADC top-R (s) | adc shuffle MB | B/vec | "
        "recall@10 (ADC) | recall@10 (ADC->rerank) |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        for k_code, rerank in ((64, 100), (256, 200)):
            run(spark, n, k_code, rerank)
    run_ivfpq(spark, sizes[-1])


if __name__ == "__main__":
    main()
