"""Distributed connected-components scale probe.

Proves the >DRIVER_UF_MAX_PAIRS branch of
``operators/graph.py:connected_components`` at real pair volume —
the driver union-find handles the common (LSH-pruned) case, but at
100 TB a pathological near-dup stream can exceed any driver heap, and
the fallback must actually converge with bounded shuffle traffic, not
just pass a 10-row pytest.

Graph shape: N chains of length L over ``spark.range`` — generated
distributed (no driver materialization anywhere), component structure
known in closed form (component(i) == i - i % L), diameter = L-1 so
rounds-to-converge is predictable (L-1 propagation rounds + 1
no-change round). Correctness is verified as a distributed COUNT of
label mismatches against the closed form — zero rows ever hit the
driver.

Reports per probe: pairs, label-propagation rounds, wall seconds,
total shuffle write bytes, and shuffle B/pair/round — the number the
100 TB claim rides on (each round is one edges><labels join + one
partial-agg min + one change-count join; B/pair/round should be a
small constant independent of N).

Usage: python scripts/graphprobe.py [n_pairs ...]   (default 1e6 1e7)
Prints a markdown table row for BASELINE.md §5f.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.operators.graph import connected_components
from batch_process_spark.session import get_spark
from scaleprobe import shuffle_write_bytes

CHAIN = 8  # diameter 7 -> 7 propagation rounds + 1 no-change round


def chain_pairs(spark, n_pairs: int):
    """~n_pairs edges forming chains of CHAIN nodes (distributed gen)."""
    n_nodes = n_pairs * CHAIN // (CHAIN - 1)
    return (
        spark.range(n_nodes)
        .filter((F.col("id") % CHAIN) != CHAIN - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )


def probe(spark, n_pairs: int) -> dict:
    pairs = chain_pairs(spark, n_pairs)
    rep: dict = {}
    sb0 = shuffle_write_bytes()
    t0 = time.time()
    # connected_components runs all propagation jobs eagerly (per-round
    # change counts), so when it returns the rounds' shuffles are on
    # the books — sample sb1 HERE so the correctness-check count below
    # is excluded from the metric. What sb1-sb0 still includes is the
    # one-time edges union+distinct build (~2 pair-sets); it is
    # amortized into the per-round figure and called out in the label,
    # so probes with different round counts stay comparable only via
    # the printed rounds column.
    cc = connected_components(pairs, strategy="distributed", report=rep)
    wall = time.time() - t0
    sb1 = shuffle_write_bytes()
    bad = cc.filter(
        F.col("component") != (F.col("node") - F.col("node") % CHAIN)
    ).count()
    n_actual = n_pairs  # closed form: chains emit exactly n_pairs-ish edges
    shuffle = None if (sb0 is None or sb1 is None) else sb1 - sb0
    return {
        "pairs": n_actual,
        "rounds": rep.get("rounds"),
        "wall_s": round(wall, 2),
        "mismatches": bad,
        "shuffle_mb": None if shuffle is None else round(shuffle / 2**20, 1),
        "b_per_pair_round": (
            None
            if shuffle is None or not rep.get("rounds")
            else round(shuffle / max(n_actual, 1) / rep["rounds"], 1)
        ),
    }


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("graphprobe", extra_conf={"spark.ui.enabled": "true"})
    print(
        "| pairs | rounds | wall (s) | mismatches | shuffle (MB) "
        "| B/pair/round (incl. amortized edge build) |"
    )
    print("|---|---|---|---|---|---|")
    for n in sizes:
        r = probe(spark, n)
        assert r["mismatches"] == 0, f"WRONG LABELS at {n} pairs"
        print(
            f"| {r['pairs']:,} | {r['rounds']} | {r['wall_s']} | {r['mismatches']} "
            f"| {r['shuffle_mb']} | {r['b_per_pair_round']} |"
        )


if __name__ == "__main__":
    main()
