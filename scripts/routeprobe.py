"""Scale probes for the round-7 graph additions: bounded-hop SSSP
(`operators/graph.py::sssp_bounded`, q186) and k-core peeling
(`kcore_peel`, q188) at millions of edges — the same discipline as the
CC probe (§5f): distributed generation, closed-form-verifiable
answers, zero rows to the driver, shuffle B/edge/round reported.

SSSP graph: a LAYERED DAG — W nodes per layer, L layers, each node
fans out to K pseudo-random nodes of the next layer at weight 1, plus
a weight-3 "decoy" duplicate to every target that a correct min must
never pick. Every walk from the seed (node 0) to a layer-i node uses
exactly i forward edges, so cost == layer for every reached node —
verified as a distributed mismatch COUNT. The frontier saturates a
full layer within a few rounds, so unlike a chain this drives real
per-round volume.

k-core graph: a W-cycle (2-core, survives k=2 peeling forever) with a
length-8 pendant chain hanging off every cycle node. Peeling k=2
removes exactly one chain level per round — the CASCADE shape — so
after 8 rounds precisely the cycle survives: 2W directed edges, every
degree exactly 2, checked distributed.

Usage: python scripts/routeprobe.py [W ...]  (default 40000 120000)
Prints markdown rows for BASELINE.md §5.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.operators.graph import kcore_peel, sssp_bounded
from batch_process_spark.session import get_spark
from scaleprobe import shuffle_write_bytes

SSSP_LAYERS = 8
SSSP_FANOUT = 4
SSSP_ROUNDS = 8
CHAIN_LEN = 8
KCORE_ROUNDS = 8


def layered_edges(spark, width: int):
    """Distributed layered-DAG gen: (L-1)*W*K weight-1 edges plus the
    same count of weight-3 decoys to identical targets."""
    base = (
        spark.range((SSSP_LAYERS - 1) * width)
        .select(
            F.col("id").alias("u"),
            (F.col("id") / width).cast("long").alias("layer"),
        )
        .select(
            "u",
            "layer",
            F.explode(
                F.sequence(F.lit(0), F.lit(SSSP_FANOUT - 1))
            ).alias("t"),
        )
        .select(
            "u",
            (
                (F.col("layer") + 1) * width
                + (F.col("u") * 7 + F.col("t") * 131) % width
            ).alias("v"),
        )
    )
    return base.select("u", "v", F.lit(1).cast("long").alias("w")).unionByName(
        base.select("u", "v", F.lit(3).cast("long").alias("w"))
    )


def probe_sssp(spark, width: int) -> dict:
    edges = layered_edges(spark, width).persist()
    n_edges = edges.count()  # materialize outside the metric window
    sb0 = shuffle_write_bytes()
    t0 = time.time()
    dist = sssp_bounded(
        edges, rounds=SSSP_ROUNDS, persist=lambda d: d.persist()
    ).persist()
    reached = dist.count()
    wall = time.time() - t0
    sb1 = shuffle_write_bytes()
    bad = dist.filter(
        F.col("cost") != (F.col("node") / width).cast("long")
    ).count()
    shuffle = None if (sb0 is None or sb1 is None) else sb1 - sb0
    spark.catalog.clearCache()  # drop the per-round frontier persists too
    return {
        "edges": n_edges,
        "reached": reached,
        "rounds": SSSP_ROUNDS,
        "wall_s": round(wall, 2),
        "mismatches": bad,
        "shuffle_mb": None if shuffle is None else round(shuffle / 2**20, 1),
        "b_per_edge_round": (
            None
            if shuffle is None
            else round(shuffle / max(n_edges, 1) / SSSP_ROUNDS, 1)
        ),
    }


def cycle_with_chains(spark, width: int):
    """W-cycle + a CHAIN_LEN pendant chain per cycle node, symmetric
    directed edges, generated distributed."""
    ring = spark.range(width).select(
        F.col("id").alias("u"), ((F.col("id") + 1) % width).alias("v")
    )
    # chain nodes numbered width + ring_node*CHAIN_LEN + pos
    chain = (
        spark.range(width * CHAIN_LEN)
        .select(
            (F.col("id") % width).alias("ring"),
            (F.col("id") / width).cast("long").alias("pos"),
            F.col("id"),
        )
        .select(
            F.when(
                F.col("pos") == 0, F.col("ring")
            ).otherwise(width + F.col("ring") * CHAIN_LEN + F.col("pos") - 1).alias("u"),
            (width + F.col("ring") * CHAIN_LEN + F.col("pos")).alias("v"),
        )
    )
    canon = ring.unionByName(chain)
    return canon.unionByName(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def probe_kcore(spark, width: int) -> dict:
    edges = cycle_with_chains(spark, width).persist()
    n_edges = edges.count()
    sb0 = shuffle_write_bytes()
    t0 = time.time()
    core = kcore_peel(edges, k=2, rounds=KCORE_ROUNDS)
    n_core = core.count()
    wall = time.time() - t0
    sb1 = shuffle_write_bytes()
    deg = core.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    bad = deg.filter(F.col("d") != 2).count() + (
        0 if n_core == 2 * width else 1
    )
    shuffle = None if (sb0 is None or sb1 is None) else sb1 - sb0
    edges.unpersist()
    return {
        "edges": n_edges,
        "core_edges": n_core,
        "rounds": KCORE_ROUNDS,
        "wall_s": round(wall, 2),
        "mismatches": bad,
        "shuffle_mb": None if shuffle is None else round(shuffle / 2**20, 1),
        "b_per_edge_round": (
            None
            if shuffle is None
            else round(shuffle / max(n_edges, 1) / KCORE_ROUNDS, 1)
        ),
    }


def main() -> None:
    widths = [int(float(a)) for a in sys.argv[1:]] or [40_000, 120_000]
    spark = get_spark("routeprobe", extra_conf={"spark.ui.enabled": "true"})
    print("sssp_bounded (layered DAG, fanout 4 + decoy weights, 8 rounds):")
    print("| edges | reached | rounds | wall (s) | mismatches | shuffle (MB) | B/edge/round |")
    print("|---|---|---|---|---|---|---|")
    for w in widths:
        r = probe_sssp(spark, w)
        assert r["mismatches"] == 0, f"WRONG DISTANCES at width {w}"
        print(
            f"| {r['edges']:,} | {r['reached']:,} | {r['rounds']} | {r['wall_s']} "
            f"| {r['mismatches']} | {r['shuffle_mb']} | {r['b_per_edge_round']} |"
        )
    print()
    print("kcore_peel (W-cycle + length-8 pendant chains, k=2, 8 cascading rounds):")
    print("| edges | core edges | rounds | wall (s) | mismatches | shuffle (MB) | B/edge/round |")
    print("|---|---|---|---|---|---|---|")
    for w in widths:
        r = probe_kcore(spark, w)
        assert r["mismatches"] == 0, f"WRONG CORE at width {w}"
        print(
            f"| {r['edges']:,} | {r['core_edges']:,} | {r['rounds']} | {r['wall_s']} "
            f"| {r['mismatches']} | {r['shuffle_mb']} | {r['b_per_edge_round']} |"
        )


if __name__ == "__main__":
    main()
