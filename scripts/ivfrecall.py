"""IVF recall under stress: nprobe sweep on a CLUSTERED corpus.

The §5 IVF table measured recall 1.00 everywhere — because the scaled
probe corpus is near-uniform (perturbed copies), every centroid cell
is self-contained and even nprobe=1 finds the true neighbors. That is
not evidence; an ANN method earns trust by showing WHERE it degrades.

This probe builds a deliberately clustered corpus (vectors drawn
around Gaussian cluster centers, generated DISTRIBUTED via mapInPandas
with per-partition seeds) and queries sampled near cluster BOUNDARIES
(midpoints of two centers + noise) — the worst case for a coarse
quantizer, where a query's true top-k straddles two or more KMeans
cells. Sweeps nprobe over 1/2/4/8 and reports recall@10 against exact
brute force, plus probed-fraction (the cost proxy: candidates scanned
/ corpus).

Usage: python scripts/ivfrecall.py [n_vectors] [dim]  (default 131072 64)
Prints a markdown table for BASELINE.md (IVF recall-under-stress).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from batch_process_spark.operators.similarity import brute_force_topk, ivf_index, ivf_topk
from batch_process_spark.session import get_spark

N_CLUSTERS = 50  # true generative clusters
N_CENTROIDS = 32  # KMeans cells (deliberately != true k: realistic mismatch)
N_QUERIES = 64
K = 10
SEED = 7


def clustered_corpus(spark, n: int, dim: int):
    """n vectors around N_CLUSTERS Gaussian centers, generated in
    parallel (per-partition seeds; nothing materializes on the driver)."""
    centers = np.random.default_rng(SEED).normal(size=(N_CLUSTERS, dim))

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(SEED + 1 + int(ids[0]))
            cl = ids % N_CLUSTERS
            vecs = centers[cl] + 0.15 * rng.normal(size=(len(ids), dim))
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
    )


def boundary_queries(spark, dim: int):
    """Queries at midpoints of adjacent cluster-center pairs + noise —
    their true neighbors live in (at least) two cells."""
    centers = np.random.default_rng(SEED).normal(size=(N_CLUSTERS, dim))
    rng = np.random.default_rng(SEED + 999)
    rows = []
    for qid in range(N_QUERIES):
        a, b = rng.choice(N_CLUSTERS, size=2, replace=False)
        mid = (centers[a] + centers[b]) / 2 + 0.1 * rng.normal(size=dim)
        rows.append((qid, [float(x) for x in mid]))
    return spark.createDataFrame(rows, "query_id long, embedding array<double>")


def uniform_corpus(spark, n: int, dim: int):
    """The §5-style near-uniform corpus (i.i.d. Gaussian vectors) —
    the EASY case, where even nprobe=1 recalls well; auto must not
    overspend here."""

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(SEED + 5000 + int(ids[0]))
            vecs = rng.normal(size=(len(ids), dim))
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
    )


def uniform_queries(spark, dim: int):
    rng = np.random.default_rng(SEED + 777)
    rows = [(qid, [float(x) for x in rng.normal(size=dim)]) for qid in range(N_QUERIES)]
    return spark.createDataFrame(rows, "query_id long, embedding array<double>")


def sweep(spark, corpus, queries, label: str) -> None:
    from batch_process_spark.operators.similarity import ivf_index_stats, ivf_probe_sets

    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(corpus, queries, k=K).collect()
    }
    t0 = time.time()
    assigned, cents = ivf_index(corpus, n_centroids=N_CENTROIDS)
    assigned = assigned.persist()
    assigned.count()
    t_build = time.time() - t0
    stats = ivf_index_stats(assigned, cents)
    cell_sizes = stats["cell_sizes"]
    total = stats["n_vectors"]
    print(
        f"[{label}] n={total:,} clusters={N_CLUSTERS} centroids={N_CENTROIDS} "
        f"queries={N_QUERIES} build={t_build:.1f}s "
        f"cells min/med/max={min(cell_sizes.values()):,}/"
        f"{sorted(cell_sizes.values())[len(cell_sizes)//2]:,}/{max(cell_sizes.values()):,} "
        f"mean_within_dist={stats['mean_within_dist']:.4f}"
    )
    print("| nprobe | recall@10 | probed fraction (measured) | query wall (s) |")
    print("|---|---|---|---|")
    for nprobe in (1, 2, 4, 8, "auto"):
        # measured probed fraction: sum of probed-cell masses / corpus,
        # averaged over queries (NOT the nprobe/n_centroids upper bound)
        probes = ivf_probe_sets(
            cents, queries, k=K, nprobe=nprobe, stats=stats
        ).collect()
        per_q: dict = {}
        for r in probes:
            per_q.setdefault(r["query_id"], 0)
            per_q[r["query_id"]] += cell_sizes.get(r["centroid_id"], 0)
        frac = sum(per_q.values()) / (len(per_q) * total)
        t0 = time.time()
        approx_rows = ivf_topk(
            assigned, cents, queries, k=K, nprobe=nprobe, stats=stats
        ).collect()
        wall = time.time() - t0
        approx = {(r["query_id"], r["vec_id"]) for r in approx_rows}
        recall = len(exact & approx) / max(len(exact), 1)
        print(f"| {nprobe} | {recall:.3f} | {frac:.3f} | {wall:.2f} |")
    assigned.unpersist()


def loose_corpus(spark, n: int, dim: int):
    """pqprobe's corpus shape: within-cluster spread EQUAL to the
    center scale, L2-normalized. PQ recall must be measured on
    CONTINUOUS variation — on this file's tight clustered_corpus
    (0.15 spread) every cluster member shares codes and ADC recall
    degenerates by construction (an indictment of the corpus, not the
    method; see scripts/pqprobe.py header). IVF coarse recall is
    corpus-agnostic, PQ fine ranking is not."""
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


def loose_boundary_queries(spark, dim: int):
    centers = np.random.default_rng(SEED).normal(size=(N_CLUSTERS, dim))
    rng = np.random.default_rng(SEED + 99)
    rows = []
    for qid in range(N_QUERIES):
        i, j = rng.choice(N_CLUSTERS, size=2, replace=False)
        v = (centers[i] + centers[j]) / 2 + 0.05 * rng.normal(size=dim)
        v /= np.linalg.norm(v)
        rows.append((qid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "query_id long, embedding array<double>")


def ivfpq_sweep(spark, corpus, queries, label: str, workdir: str) -> None:
    """IVFPQ recall: fixed nprobe vs nprobe="auto" running OFF THE
    STORED INDEX (ivf_write persists centroids+stats under _ivf_meta;
    ivf_read_index restores them — the serving path touches no float
    corpus at startup). The round-8 VERDICT ask: auto recall >= fixed-4
    at <= fixed-4's probed mass."""
    from batch_process_spark.operators import pq
    from batch_process_spark.operators.similarity import (
        ivf_index_stats,
        ivf_probe_sets,
        ivf_read_index,
        ivf_write,
    )

    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(corpus, queries, k=K).collect()
    }
    t0 = time.time()
    assigned_codes, cents, cb = pq.ivfpq_index(
        corpus, subdim=4, k_code=256, n_centroids=N_CENTROIDS
    )
    # stats on the float assignment (the only moment it exists), then
    # persist codes + meta; everything below reads the stored index
    float_assigned = corpus.join(
        assigned_codes.select("vec_id", "centroid_id"), "vec_id"
    )
    stats = ivf_index_stats(float_assigned, cents)
    path = workdir.rstrip("/") + "/ivfpq_codes"
    ivf_write(assigned_codes, path, centroids=cents, stats=stats)
    t_build = time.time() - t0
    codes_df, cents_l, stats_l = ivf_read_index(spark, path)
    cell_sizes = stats_l["cell_sizes"]
    total = stats_l["n_vectors"]
    print(
        f"[{label}] IVFPQ m=16 k=256 R={5*K} n={total:,} "
        f"centroids={N_CENTROIDS} build+write={t_build:.1f}s (search off stored index)"
    )
    print("| nprobe | recall@10 | probed fraction (measured) | query wall (s) |")
    print("|---|---|---|---|")
    for nprobe in (4, "auto"):
        probes = ivf_probe_sets(
            cents_l, queries, k=K, nprobe=nprobe, stats=stats_l
        ).collect()
        per_q: dict = {}
        for r in probes:
            per_q.setdefault(r["query_id"], 0)
            per_q[r["query_id"]] += cell_sizes.get(r["centroid_id"], 0)
        frac = sum(per_q.values()) / (len(per_q) * total)
        t0 = time.time()
        approx_rows = pq.ivfpq_topk(
            codes_df, cents_l, cb, queries, subdim=4, corpus=corpus,
            k=K, rerank_factor=5, nprobe=nprobe, stats=stats_l,
        ).collect()
        wall = time.time() - t0
        approx = {(r["query_id"], r["vec_id"]) for r in approx_rows}
        recall = len(exact & approx) / max(len(exact), 1)
        print(f"| {nprobe} | {recall:.3f} | {frac:.3f} | {wall:.2f} |")


def main() -> None:
    import tempfile

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 131_072
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("ivfrecall")
    corpus = clustered_corpus(spark, n, dim).persist()
    corpus.count()
    sweep(spark, corpus, boundary_queries(spark, dim), "adversarial: clustered corpus, boundary queries")
    corpus.unpersist()
    loose = loose_corpus(spark, n, dim).persist()
    loose.count()
    with tempfile.TemporaryDirectory() as td:
        ivfpq_sweep(
            spark, loose, loose_boundary_queries(spark, dim),
            "loose normalized corpus, boundary queries", td,
        )
    loose.unpersist()
    uni = uniform_corpus(spark, n, dim).persist()
    uni.count()
    sweep(spark, uni, uniform_queries(spark, dim), "uniform corpus, random queries")


if __name__ == "__main__":
    main()
