"""hubness_estimate: k-occurrence histogram from ANN top-k results —
the corpus-scale estimator behind q245's bounded exact referee.

Fixture: 4 tight orthogonal clusters (cosine ~0 between clusters) plus
ONE planted hub on the diagonal (cosine ~0.5 to everything) — with
cluster size 4 and k=4, every cluster vector's list is its 3 peers +
the hub, so the hub's k-occurrence must dominate the histogram. An
anti-hub (the negated diagonal, negative cosine to everything) lands
in nobody's list and must show up in the k_occurrence=0 bucket.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.similarity import (
    hubness_estimate,
    ivf_index,
    ivf_topk,
)

K = 4


def _fixture_vectors():
    rng = np.random.default_rng(5)
    rows = []
    for c in range(4):  # 4 clusters of 4 on orthogonal axes
        center = np.zeros(4)
        center[c] = 1.0
        for i in range(4):
            v = center + 0.01 * rng.normal(size=4)
            rows.append((c * 10 + i, v / np.linalg.norm(v)))
    hub = np.ones(4) / 2.0
    rows.append((100, hub))            # planted hub
    rows.append((200, -hub))           # planted anti-hub
    return rows


def _exact_histogram(rows, k=K):
    """Numpy referee mirroring the searcher's semantics: cosine rounded
    to 6 dp, ties to the lower vec_id, self excluded, top-k."""
    ids = [r[0] for r in rows]
    V = np.stack([np.asarray(r[1], dtype=float) for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = np.round(Vn @ Vn.T, 6)
    occ = {i: 0 for i in ids}
    for qi in range(len(ids)):
        order = sorted(
            (j for j in range(len(ids)) if j != qi),
            key=lambda j: (-S[qi, j], ids[j]),
        )[:k]
        for j in order:
            occ[ids[j]] += 1
    hist = {}
    for n in occ.values():
        hist[n] = hist.get(n, 0) + 1
    return occ, hist


def test_hubness_estimate_matches_exact_referee_and_finds_planted_hub(spark):
    rows = _fixture_vectors()
    occ, want_hist = _exact_histogram(rows)
    # the planted hub is in every other vector's list except the
    # anti-hub's (whose nearest are the least-negative cluster vectors)
    assert occ[100] == max(occ.values()) and occ[100] >= 16
    assert occ[200] == 0

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    ).persist()
    df.count()
    assigned, cents = ivf_index(df, n_centroids=3)
    # nprobe = all cells -> the ANN search is exact; ask for k+1 so each
    # query still contributes k neighbors after its self-match drops
    topk = ivf_topk(
        assigned, cents, df.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=K + 1, nprobe=len(cents),
    )
    got = {
        r["k_occurrence"]: r["n_vectors"]
        for r in hubness_estimate(
            topk, corpus_ids=df.select("vec_id"), k=K
        ).collect()
    }
    assert got == want_hist
    # total neighbor slots conserved: every query contributed exactly k
    assert sum(k_occ * n for k_occ, n in got.items()) == len(rows) * K
    # anti-hub visible only because corpus_ids backfills the 0 bucket
    assert got[0] >= 1
    no_backfill = {
        r["k_occurrence"]: r["n_vectors"]
        for r in hubness_estimate(topk, k=K).collect()
    }
    assert 0 not in no_backfill
    df.unpersist()


def test_hubness_estimate_k_trim_reranks_after_self_drop(spark):
    """Passing k+1 searcher rows with k= must trim each query back to k
    neighbors AFTER the self-match drops — queries whose self-match was
    rank 1 keep ranks 2..k+1, a query absent from its own list keeps
    its first k rows."""
    rows = [
        # query 1: self at rank 1 (the normal case)
        (1, 1, 1.0, 1), (1, 2, 0.9, 2), (1, 3, 0.8, 3),
        # query 2: self never returned (ANN miss) — 3 true neighbors
        (2, 5, 0.9, 1), (2, 6, 0.8, 2), (2, 7, 0.7, 3),
    ]
    topk = spark.createDataFrame(
        rows, "query_id long, vec_id long, score double, rank int"
    )
    got = {
        r["k_occurrence"]: r["n_vectors"]
        for r in hubness_estimate(topk, k=2).collect()
    }
    # q1 contributes {2,3}; q2 contributes {5,6} (7 trimmed) -> four
    # distinct vectors each with k_occ 1
    assert got == {1: 4}
