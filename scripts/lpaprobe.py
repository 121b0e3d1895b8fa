"""Label-propagation scale probe (q201's operator).

Proves ``operators/graph.py:label_propagation`` at real edge volume
with a closed-form-checkable community structure: N disjoint cliques
of size C over ``spark.range`` — generated distributed, no driver
materialization. In a clique round 1 ties everywhere (each label seen
once), so the min tie-break floods the clique's minimum id to every
node EXCEPT the minimum itself (whose neighbourhood excludes it);
round 2 is a 7-vs-1 majority that fixes that node too, and every
later round is a fixpoint no-op: after any rounds >= 2 the expected
community of node i is i - i % C, verified as a distributed mismatch
COUNT (zero rows hit the driver).

Reports per probe: edges (directed, both directions counted), rounds,
wall seconds, total shuffle write bytes, and shuffle B/edge/round —
the number the 100 TB claim rides on (each round is one shuffle-hash
state><edges join + one partial-agg (node,label) count + one codegen
argmax; B/edge/round should be a small constant independent of N).

Usage: python scripts/lpaprobe.py [n_edges ...]   (default 1e6 4e6)
Prints a markdown table row for BASELINE.md §5.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.operators.graph import label_propagation
from batch_process_spark.session import get_spark
from scaleprobe import shuffle_write_bytes

CLIQUE = 8  # directed edges per node = CLIQUE-1; edges = nodes * (CLIQUE-1)
ROUNDS = 4


def clique_edges(spark, n_edges: int):
    """~n_edges directed edges forming disjoint CLIQUE-node cliques
    (both directions present — the operator's symmetric contract)."""
    n_nodes = n_edges // (CLIQUE - 1)
    return (
        spark.range(n_nodes)
        .select(
            F.col("id").alias("u"),
            F.explode(F.sequence(F.lit(1), F.lit(CLIQUE - 1))).alias("__d"),
        )
        .select(
            "u",
            (F.col("u") - F.col("u") % CLIQUE + (F.col("u") + F.col("__d")) % CLIQUE).alias("v"),
        )
    )


def probe(spark, n_edges: int) -> dict:
    edges = clique_edges(spark, n_edges).persist()
    n_actual = edges.count()  # materialize OUTSIDE the metric window
    sb0 = shuffle_write_bytes()
    t0 = time.time()
    labels = label_propagation(edges, rounds=ROUNDS, checkpoint=True).persist()
    n_out = labels.count()
    wall = time.time() - t0
    sb1 = shuffle_write_bytes()
    bad = labels.filter(
        F.col("community") != (F.col("node") - F.col("node") % CLIQUE)
    ).count()
    edges.unpersist()
    labels.unpersist()
    shuffle = None if (sb0 is None or sb1 is None) else sb1 - sb0
    return {
        "edges": n_actual,
        "nodes": n_out,
        "wall_s": round(wall, 2),
        "mismatches": bad,
        "shuffle_mb": None if shuffle is None else round(shuffle / 2**20, 1),
        "b_per_edge_round": (
            None
            if shuffle is None
            else round(shuffle / max(n_actual, 1) / ROUNDS, 1)
        ),
    }


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = get_spark("lpaprobe", extra_conf={"spark.ui.enabled": "true"})
    print(
        f"| edges | rounds | wall (s) | mismatches | shuffle (MB) | B/edge/round |"
    )
    print("|---|---|---|---|---|---|")
    for n in sizes:
        r = probe(spark, n)
        assert r["mismatches"] == 0, f"WRONG COMMUNITIES at {n} edges"
        print(
            f"| {r['edges']:,} | {ROUNDS} | {r['wall_s']} | {r['mismatches']} "
            f"| {r['shuffle_mb']} | {r['b_per_edge_round']} |"
        )


if __name__ == "__main__":
    main()
