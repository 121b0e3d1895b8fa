"""Incremental-ingest cost: ivf_append / ivfpq_append per-batch wall
and shuffle vs INDEX size — the growing-corpus story's scale claim.

The append path is: map-only centroid assign (centroids ride the plan
as literals) + map-only PQ encode (codebook in the task closure) +
partitioned parquet append + one n_centroids-row stats job. Nothing
about it touches the existing index data, so per-batch cost must be
proportional to the BATCH, with shuffle ~0 (no wide stage at all) —
measured here by appending the SAME 4k-vector batch to indexes built
over 64k and 256k vectors.

Usage: python scripts/appendprobe.py [index_sizes...] (default 65536 262144)
Prints markdown rows for BASELINE.md §5.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from batch_process_spark.operators import pq
from batch_process_spark.operators.similarity import (
    ivf_index,
    ivf_index_stats,
    ivf_read_index,
    ivf_write,
)
from batch_process_spark.session import get_spark
from scripts.pqprobe import corpus_df
from scripts.scaleprobe import fmt_shuffle, shuffle_delta, shuffle_write_bytes

BATCH = 4096
N_CENTROIDS = 32


def new_batch(spark, dim: int = 64):
    rng = np.random.default_rng(123)
    vecs = rng.normal(size=(BATCH, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(10_000_000 + i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def main() -> None:
    from batch_process_spark.operators.similarity import ivf_append

    sizes = [int(float(s)) for s in sys.argv[1:]] or [65_536, 262_144]
    spark = get_spark("appendprobe", extra_conf={"spark.ui.enabled": "true"})
    port = int((spark.sparkContext.uiWebUrl or ":4040").rsplit(":", 1)[1])
    batch = new_batch(spark).persist()
    batch.count()

    print("| index | base vecs | append wall (s) | shuffle MB | B/appended-vec | stats n after |")
    print("|---|---|---|---|---|---|")
    for n in sizes:
        corpus = corpus_df(spark, n).persist()
        corpus.count()
        assigned, cents = ivf_index(corpus, n_centroids=N_CENTROIDS)

        with tempfile.TemporaryDirectory() as td:
            ivf_path = td + "/ivf"
            ivf_write(assigned, ivf_path, centroids=cents)
            sb0 = shuffle_write_bytes(port)
            t0 = time.time()
            ivf_append(spark, ivf_path, batch)
            wall = time.time() - t0
            shuf = fmt_shuffle(shuffle_delta(sb0, shuffle_write_bytes(port)), BATCH)
            _, _, stats = ivf_read_index(spark, ivf_path)
            print(f"| IVF | {n:,} | {wall:.2f} | {shuf} | {stats['n_vectors']:,} |")
            assert stats["n_vectors"] == n + BATCH

            pq_path = td + "/ivfpq"
            assigned_codes, cents2, cb = pq.ivfpq_index(
                corpus, subdim=4, k_code=64, n_centroids=N_CENTROIDS, iters=0
            )
            fa = corpus.join(assigned_codes.select("vec_id", "centroid_id"), "vec_id")
            pq.ivfpq_write(assigned_codes, pq_path, cents2, cb, subdim=4,
                           stats=ivf_index_stats(fa, cents2))
            sb0 = shuffle_write_bytes(port)
            t0 = time.time()
            pq.ivfpq_append(spark, pq_path, batch)
            wall = time.time() - t0
            shuf = fmt_shuffle(shuffle_delta(sb0, shuffle_write_bytes(port)), BATCH)
            _, _, _, _, stats = pq.ivfpq_read(spark, pq_path)
            print(f"| IVFPQ | {n:,} | {wall:.2f} | {shuf} | {stats['n_vectors']:,} |")
            assert stats["n_vectors"] == n + BATCH
        corpus.unpersist()


if __name__ == "__main__":
    main()
