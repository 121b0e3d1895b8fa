"""Stored-index lifecycle probe: recluster recall recovery, delete
cost, compact read-wall — the three maintenance operations a 100 TB
index needs beyond append (round-10 additions).

1. **Recluster**: an index built on an in-distribution corpus receives
   4 append batches from a SHIFTED distribution (out-of-distribution
   growth — the drift case the persisted cell_sizes exist to detect).
   The OOD vectors pile into the few cells nearest the new region, so
   fixed-nprobe recall for queries over the NEW data collapses; the
   probe measures recall@10 vs exact brute force before and after
   ``ivf_recluster`` at the same nprobe, plus the skew signal and the
   rebuild wall.

2. **Delete**: purge 1,024 random ids from stored indexes at two
   sizes — wall, touched-vs-total cells, and the check that untouched
   cell directories are never rewritten (cost ∝ touched cells, not
   index size; at 100 TB a takedown touches only the cells holding the
   doomed ids).

3. **Compact**: after 8 small appends, the per-cell file count has
   accreted one file set per batch; measure a fixed probe query's wall
   before and after ``compact_index`` plus the file-count bound.

Usage: python scripts/lifeprobe.py [base_n] (default 65536)
Prints markdown rows for BASELINE.md §5x. Run on an idle machine.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pandas as pd

from batch_process_spark.operators.similarity import (
    brute_force_topk,
    compact_index,
    index_skew,
    ivf_append,
    ivf_delete,
    ivf_index,
    ivf_read_index,
    ivf_recluster,
    ivf_topk,
    ivf_write,
    read_index_meta,
)
from batch_process_spark.session import get_spark
from batch_process_spark.sinks.compact import parquet_files

SEED = 77
DIM = 64
N_CENTROIDS = 32
N_CLUSTERS = 20
N_QUERIES = 64
K = 10
OOD_BATCH = 4096


def region_corpus(spark, n: int, offset: float, id_base: int = 0,
                  spread: float = 0.15):
    """n vectors around N_CLUSTERS Gaussian centers, every center
    shifted by ``offset`` along the first axis — offset 0 is the
    in-distribution region, a large offset is the drifted region.
    ``spread`` controls within-cluster width: the drifted region uses
    a WIDE spread so its clouds straddle whatever Voronoi slices the
    far-away pre-drift centroids happen to cut through them (the
    fixed-nprobe recall killer); tight clouds would each fall into one
    slice and hide the damage."""
    centers = np.random.default_rng(SEED).normal(size=(N_CLUSTERS, DIM))
    centers[:, 0] += offset

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(SEED + 1 + int(ids[0]) + int(offset))
            cl = ids % N_CLUSTERS
            vecs = centers[cl] + spread * rng.normal(size=(len(ids), DIM))
            yield pd.DataFrame(
                {"vec_id": ids + id_base, "embedding": list(vecs)}
            )

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
    )


def region_queries(spark, offset: float, spread: float = 0.15):
    centers = np.random.default_rng(SEED).normal(size=(N_CLUSTERS, DIM))
    centers[:, 0] += offset
    rng = np.random.default_rng(SEED + 999)
    rows = []
    for qid in range(N_QUERIES):
        c = rng.integers(N_CLUSTERS)
        v = centers[c] + spread * rng.normal(size=DIM)
        rows.append((qid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "query_id long, embedding array<double>")


def recall_and_cost(spark, path: str, queries, exact: set, nprobe: int):
    """(recall@K, mean probed corpus fraction) at fixed nprobe."""
    from batch_process_spark.operators.similarity import ivf_probe_sets

    df, cents, stats = ivf_read_index(spark, path)
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(df, cents, queries, k=K, nprobe=nprobe, stats=stats).collect()
    }
    probes = ivf_probe_sets(cents, queries, k=K, nprobe=nprobe, stats=stats).collect()
    per_q: dict = {}
    for r in probes:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + stats["cell_sizes"].get(
            r["centroid_id"], 0
        )
    frac = sum(per_q.values()) / (len(per_q) * stats["n_vectors"])
    return len(exact & got) / max(len(exact), 1), frac


def recluster_probe(spark, base_n: int) -> None:
    print(f"\n## recluster: {base_n:,} in-distribution + 4 x {OOD_BATCH:,} OOD appends")
    base = region_corpus(spark, base_n, offset=0.0).persist()
    base.count()
    assigned, cents = ivf_index(base, n_centroids=N_CENTROIDS)
    with tempfile.TemporaryDirectory() as td:
        path = td + "/idx"
        ivf_write(assigned, path, centroids=cents)

        ood_frames = []
        for b in range(4):
            ood = region_corpus(
                spark, OOD_BATCH, offset=12.0, id_base=10_000_000 + b * OOD_BATCH,
                spread=1.0,
            ).persist()
            ood.count()
            ood_frames.append(ood)
            ivf_append(spark, path, ood)

        full = base
        for f in ood_frames:
            full = full.unionByName(f)
        queries = region_queries(spark, offset=12.0, spread=1.0)
        exact = {
            (r["query_id"], r["vec_id"])
            for r in brute_force_topk(full, queries, k=K).collect()
        }
        meta = read_index_meta(spark, path)
        skew_before = index_skew(meta["stats"])
        wd_before = meta["stats"]["mean_within_dist"]
        rec_before, frac_before = recall_and_cost(spark, path, queries, exact, nprobe=4)

        t0 = time.time()
        rep = ivf_recluster(spark, path, skew_threshold=1.2)
        wall = time.time() - t0
        assert rep["reclustered"], rep
        wd_after = read_index_meta(spark, path)["stats"]["mean_within_dist"]
        rec_after, frac_after = recall_and_cost(spark, path, queries, exact, nprobe=4)

        print("| index vecs | skew before/after | within-dist before/after | recall@10 np=4 before/after | probed frac before/after | recluster wall (s) |")
        print("|---|---|---|---|---|---|")
        print(
            f"| {base_n + 4 * OOD_BATCH:,} | {skew_before:.1f} / {rep['skew_after']:.1f} | "
            f"{wd_before:.4f} / {wd_after:.4f} | "
            f"{rec_before:.3f} / {rec_after:.3f} | {frac_before:.3f} / {frac_after:.3f} | {wall:.1f} |"
        )
    for f in ood_frames:
        f.unpersist()
    base.unpersist()


def _build_drifted_index(spark, base_n: int, path: str):
    """In-distribution base + 4 OOD appends (the recluster_probe setup);
    returns (queries, exact top-k set) for the OOD region."""
    base = region_corpus(spark, base_n, offset=0.0).persist()
    base.count()
    assigned, cents = ivf_index(base, n_centroids=N_CENTROIDS)
    ivf_write(assigned, path, centroids=cents)
    full = base
    for b in range(4):
        ood = region_corpus(
            spark, OOD_BATCH, offset=12.0, id_base=10_000_000 + b * OOD_BATCH,
            spread=1.0,
        ).persist()
        ood.count()
        ivf_append(spark, path, ood)
        full = full.unionByName(ood)
    queries = region_queries(spark, offset=12.0, spread=1.0)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(full, queries, k=K).collect()
    }
    return queries, exact


def sampled_probe(spark, base_n: int, train_sample: int = 16_384) -> None:
    """Full retrain vs bounded-sample retrain (ivf_recluster
    train_sample=): the KMeans fit is the one rebuild cost that scales
    with the corpus; training on a fixed sample caps it while the
    re-assign stays full-corpus argmin-exact. Same drifted index
    cloned to both variants, so the comparison is apples-to-apples at
    each size."""
    import shutil

    print(f"\n## sampled retrain: full vs train_sample={train_sample:,} "
          f"(drifted index, recall/probed-frac at nprobe=4)")
    print("| index vecs | retrain | recluster wall (s) | skew after | "
          "recall@10 | probed frac | files before -> after |")
    print("|---|---|---|---|---|---|---|")
    for n in (base_n, base_n * 4):
        with tempfile.TemporaryDirectory() as td:
            path_a = td + "/full"
            queries, exact = _build_drifted_index(spark, n, path_a)
            path_b = td + "/sampled"
            shutil.copytree(path_a, path_b)
            for label, ts, path in (
                ("full", None, path_a),
                (f"{train_sample // 1024}k sample", train_sample, path_b),
            ):
                files0 = len(parquet_files(path))
                t0 = time.time()
                rep = ivf_recluster(
                    spark, path, skew_threshold=1.2, train_sample=ts
                )
                wall = time.time() - t0
                assert rep["reclustered"], rep
                files1 = len(parquet_files(path))
                rec, frac = recall_and_cost(spark, path, queries, exact, nprobe=4)
                print(
                    f"| {n + 4 * OOD_BATCH:,} | {label} | {wall:.1f} | "
                    f"{rep['skew_after']:.2f} | {rec:.3f} | {frac:.3f} | "
                    f"{files0} -> {files1} |"
                )


def delete_probe(spark, sizes: list[int]) -> None:
    import os

    print("\n## delete: 1,024 ids (random scatter vs one content cluster)")
    print("| index vecs | id shape | cells touched / total | delete wall (s) | untouched dirs rewritten |")
    print("|---|---|---|---|---|")
    for n, shape in [(s, "random") for s in sizes] + [(sizes[0], "clustered")]:
        corpus = region_corpus(spark, n, offset=0.0).persist()
        corpus.count()
        assigned, cents = ivf_index(corpus, n_centroids=N_CENTROIDS)
        with tempfile.TemporaryDirectory() as td:
            path = td + "/idx"
            ivf_write(assigned, path, centroids=cents)
            rng = np.random.default_rng(SEED)
            if shape == "random":
                doomed = [int(i) for i in rng.choice(n, size=1024, replace=False)]
            else:
                # a takedown is usually one SOURCE: its docs are near each
                # other in embedding space, so they live in few cells and
                # the rewrite cost is locality-proportional
                doomed = [int(i) for i in range(0, n, N_CLUSTERS)][:1024]
            mtimes_before = {
                d: sorted(os.listdir(os.path.join(path, d)))
                for d in os.listdir(path)
                if d.startswith("centroid_id=")
            }
            t0 = time.time()
            rep = ivf_delete(spark, path, doomed)
            wall = time.time() - t0
            assert rep["n_deleted"] == 1024
            touched = rep["cells_rewritten"] + rep["cells_dropped"]
            untouched_rewritten = 0
            for d, files in mtimes_before.items():
                p = os.path.join(path, d)
                if os.path.isdir(p) and sorted(os.listdir(p)) != files:
                    untouched_rewritten += 1
            untouched_rewritten -= touched  # the touched ones legitimately changed
            df, _, stats = ivf_read_index(spark, path)
            assert stats["n_vectors"] == n - 1024
            print(
                f"| {n:,} | {shape} | {touched} / {N_CENTROIDS} | {wall:.1f} | "
                f"{max(untouched_rewritten, 0)} |"
            )
        corpus.unpersist()


def compact_probe(spark, base_n: int) -> None:
    print(f"\n## compact: {base_n:,} base + 8 x 1,024 appends")
    corpus = region_corpus(spark, base_n, offset=0.0).persist()
    corpus.count()
    assigned, cents = ivf_index(corpus, n_centroids=N_CENTROIDS)
    queries = region_queries(spark, offset=0.0)
    with tempfile.TemporaryDirectory() as td:
        path = td + "/idx"
        ivf_write(assigned, path, centroids=cents)
        for b in range(8):
            ivf_append(
                spark,
                path,
                region_corpus(spark, 1024, offset=0.0, id_base=20_000_000 + b * 2048),
            )
        files0 = len(parquet_files(path))

        def probe_wall() -> float:
            df, cents2, stats = ivf_read_index(spark, path)
            t0 = time.time()
            ivf_topk(df, cents2, queries, k=K, nprobe=4, stats=stats).collect()
            return time.time() - t0

        w_before = min(probe_wall() for _ in range(3))
        t0 = time.time()
        rep = compact_index(spark, path, min_files=4)
        c_wall = time.time() - t0
        files1 = len(parquet_files(path))
        w_after = min(probe_wall() for _ in range(3))
        print("| files before | files after | probe wall before (s) | after (s) | compact wall (s) |")
        print("|---|---|---|---|---|")
        print(f"| {files0} | {files1} | {w_before:.2f} | {w_after:.2f} | {c_wall:.1f} |")
    corpus.unpersist()


def main() -> None:
    base_n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 65_536
    sections = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else {
        "recluster", "delete", "compact",
    }
    spark = get_spark("lifeprobe")
    if "recluster" in sections:
        recluster_probe(spark, base_n)
    if "sampled" in sections:
        sampled_probe(spark, base_n)
    if "delete" in sections:
        delete_probe(spark, [base_n, base_n * 4])
    if "compact" in sections:
        compact_probe(spark, base_n)


if __name__ == "__main__":
    main()
