"""hubness_estimate vs the exact k-occurrence referee at 65k vectors.

q245's exact hubness audit is O(n²) and bounded to a 300-vector
sample; `operators.similarity.hubness_estimate` is the corpus-scale
path — it reads only an ANN searcher's top-k output. This probe
quantifies how much histogram fidelity the ANN substitution costs on
the ivfrecall clustered fixture (the worst case for a coarse
quantizer: boundary-straddling neighborhoods):

1. clustered corpus (ivfrecall.clustered_corpus) at N vectors;
2. EXACT k-NN for every vector: blocked numpy matmul inside
   mapInPandas (the corpus matrix rides to executors once,
   N x dim float64 — 33 MB at 65k x 64, a documented probe bound;
   at real corpus scale the exact referee is the thing you cannot
   run, which is the estimator's reason to exist);
3. ANN k-NN via ivf_index + ivf_topk, SWEPT over nprobe
   ("auto" — the serving default — then fixed 2 and 1, deliberately
   degraded so the probe shows how the histogram fails, not just that
   it succeeds at full recall);
4. hubness_estimate over each result set (k+1 requested,
   exclude_self, trimmed to k) and agreement metrics per config:
   - neighbor recall@k (mean per-query overlap — the recall-style row),
   - histogram total-variation distance,
   - hub-set overlap (top 1% vectors by k-occurrence),
   - antihub count agreement (k_occ = 0 bucket).

Usage: python scripts/hubnessprobe.py [n_vectors] [dim] [n_centroids]
Defaults: 65536 64 64. Prints markdown rows for BASELINE.md §5.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from batch_process_spark.operators.similarity import (
    hubness_estimate,
    ivf_index,
    ivf_index_stats,
    ivf_topk,
)
from batch_process_spark.session import get_spark
from scripts.ivfrecall import clustered_corpus

K = 10


def exact_topk(spark, corpus, ids, mat, k):
    """Exact cosine top-(k+1) for EVERY corpus vector: blocked numpy
    matmul per partition against the full (small) corpus matrix.
    Scoring mirrors ivf_topk: cosine rounded to 6 dp, ties to the
    lower vec_id."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    cn = (mat / np.clip(norms, 1e-300, None)).astype(np.float64)
    ids_arr = np.asarray(ids)
    kk = k + 1

    def knn(it):
        for pdf in it:
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qn = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-300, None)
            s = qn @ cn.T
            # top window wide enough that 6-dp ties at the k-boundary
            # resolve inside it; round only the candidates (rounding
            # the full block doubles the memory traffic)
            win = min(kk + 16, s.shape[1])
            part = np.argpartition(-s, win - 1, axis=1)[:, :win]
            out_q, out_n, out_r = [], [], []
            for row, qid in zip(range(s.shape[0]), pdf["query_id"].to_numpy()):
                cand = part[row]
                sc = np.round(s[row, cand], 6)
                order = cand[np.lexsort((ids_arr[cand], -sc))][:kk]
                out_q.extend([qid] * len(order))
                out_n.extend(ids_arr[order])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_n, "rank": out_r}
            )

    return (
        corpus.select(F.col("vec_id").alias("query_id"), "embedding")
        .repartition(64)  # ~1k-query blocks: bounds the per-task matmul
        .mapInPandas(knn, schema="query_id long, vec_id long, rank int")
    )


def k_occ_counts(topk, corpus_ids, k):
    """Per-vector k-occurrence (the estimator's intermediate) — used
    here for the hub-overlap diagnostic."""
    t = topk.filter(F.col("query_id") != F.col("vec_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("rank")
    t = t.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return (
        corpus_ids.join(
            t.groupBy("vec_id").agg(F.count(F.lit(1)).alias("k_occ")),
            "vec_id", "left",
        )
        .select("vec_id", F.coalesce("k_occ", F.lit(0)).alias("k_occ"))
    )


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 65536
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cent = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("hubnessprobe", shuffle_partitions=32)

    corpus = clustered_corpus(spark, n, dim).persist()
    rows = corpus.select("vec_id", "embedding").collect()  # probe-only: n x dim
    ids = [r["vec_id"] for r in rows]
    mat = np.stack([np.asarray(r["embedding"]) for r in rows])
    corpus_ids = corpus.select("vec_id").persist()
    corpus_ids.count()

    t0 = time.time()
    exact = exact_topk(spark, corpus, ids, mat, K).persist()
    exact.count()
    t_exact = time.time() - t0

    assigned, cents = ivf_index(corpus, n_centroids=n_cent)
    assigned = assigned.persist()
    stats = ivf_index_stats(assigned, cents)

    def neighbors(t):
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy("rank")
        return (
            t.filter(F.col("query_id") != F.col("vec_id"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= K)
            .select("query_id", "vec_id")
        )

    exact_nb = neighbors(exact).persist()
    exact_nb.count()
    h_exact = {
        r["k_occurrence"]: r["n_vectors"]
        for r in hubness_estimate(exact, corpus_ids=corpus_ids, k=K).collect()
    }
    top = max(1, n // 100)
    hub_e = {r["vec_id"] for r in k_occ_counts(exact, corpus_ids, K)
             .orderBy(F.desc("k_occ"), "vec_id").limit(top).collect()}
    mean_occ = sum(k * v for k, v in h_exact.items()) / n
    print(
        f"n={n} dim={dim} centroids={n_cent} k={K} "
        f"mean k_occ exact={mean_occ:.2f} "
        f"(slots conserved: {sum(k * v for k, v in h_exact.items())}) "
        f"wall exact referee {t_exact:.1f}s"
    )

    print("| nprobe | recall@10 | hist TV | hub overlap@1% "
          "| antihub exact/est | max k_occ exact/est | wall estimate (s) |")
    print("|---|---|---|---|---|---|---|")
    for nprobe in ("auto", 2, 1):
        t0 = time.time()
        ann = ivf_topk(
            assigned, cents,
            corpus.select(F.col("vec_id").alias("query_id"), "embedding"),
            k=K + 1, nprobe=nprobe, stats=stats,
        ).persist()
        ann.count()
        t_ann = time.time() - t0
        hits = exact_nb.intersect(neighbors(ann)).count()
        recall = hits / (n * K)
        h_ann = {
            r["k_occurrence"]: r["n_vectors"]
            for r in hubness_estimate(ann, corpus_ids=corpus_ids, k=K).collect()
        }
        buckets = sorted(set(h_exact) | set(h_ann))
        tv = 0.5 * sum(
            abs(h_exact.get(b, 0) - h_ann.get(b, 0)) / n for b in buckets
        )
        hub_a = {r["vec_id"] for r in k_occ_counts(ann, corpus_ids, K)
                 .orderBy(F.desc("k_occ"), "vec_id").limit(top).collect()}
        hub_overlap = len(hub_e & hub_a) / top
        print(
            f"| {nprobe} | {recall:.3f} | {tv:.4f} | {hub_overlap:.3f} "
            f"| {h_exact.get(0, 0):,}/{h_ann.get(0, 0):,} "
            f"| {max(h_exact)}/{max(h_ann)} "
            f"| {t_ann:.1f} |"
        )
        ann.unpersist()


if __name__ == "__main__":
    main()
