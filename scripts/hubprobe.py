"""Hub-skewed graph probe: Zipf-degree graphs at >=4M edges.

The LPA/PageRank scale probes (lpaprobe.py, graphprobe.py) use uniform
chains/cliques — no task ever dominates. Real graphs (web, citation,
social) are Zipf: a handful of hub nodes carry a constant FRACTION of
all edges, and the per-round state><edges equi-join keys on the node
id, so every hub edge lands in ONE task. This probe:

1. generates a Zipf(~1) degree graph DISTRIBUTED (log-uniform target
   draw per edge: v = floor(exp(u01 * ln N)) — node 0 receives ~1/ln N
   of ALL edges regardless of graph size), symmetrized;
2. measures the join-key skew directly: max/mean rows per hash
   partition of the edge frame keyed like the join keys it;
3. runs label_propagation and pagerank UNSALTED and SALTED
   (salt_buckets=8, operators/skew.py salted_join wired into the
   state><edges join) and compares results — LPA labels exactly
   (mismatches must be 0: salting must not change semantics), ranks to
   1e-9 relative (salting reorders float addition);
4. reports wall seconds and the salted join's max/mean partition rows
   (the bounded-max-task-rows claim).

Usage: python scripts/hubprobe.py [n_edges]   (default 4e6)
Prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.operators.graph import label_propagation, pagerank
from batch_process_spark.operators.skew import with_salt
from batch_process_spark.session import get_spark

ROUNDS = 3
BUCKETS = 8
PARTS = 32


def zipf_edges(spark, n_edges: int):
    """~n_edges directed edges u -> v with Zipf-ish IN-degree on v
    (log-uniform inverse draw; node 0 is the dominant hub) and
    near-uniform u; symmetrized so every node has out-edges (the
    operators' contract) — symmetrization makes the hub's OUT-degree
    match its in-degree, skewing BOTH join keys."""
    half = n_edges // 2
    e = (
        spark.range(half)
        .select(
            (F.col("id") % (half // 8)).alias("u"),
            # deterministic per-edge uniform in [0,1): md5-derived
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast(
                    "double"
                )
                / F.lit(float(16**8))
            ).alias("__u01"),
        )
        .select(
            "u",
            (F.floor(F.exp(F.col("__u01") * F.log(F.lit(float(half // 8))))) - 1).alias("v"),
        )
        .select("u", (F.greatest(F.col("v"), F.lit(0))).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def partition_skew(df, key: str) -> tuple[int, float]:
    """(max, mean) rows per hash partition when shuffled on ``key`` —
    what the join's reduce tasks would each process."""
    cnt = (
        df.repartition(PARTS, F.col(key))
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    rows = [r["count"] for r in cnt]
    return max(rows), sum(rows) / len(rows)


def salted_partition_skew(df, key: str) -> tuple[int, float]:
    """Same measure for the salted join's key (key, salt)."""
    s = with_salt(df, BUCKETS)
    cnt = (
        s.repartition(PARTS, F.col(key), F.col("__salt"))
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    rows = [r["count"] for r in cnt]
    return max(rows), sum(rows) / len(rows)


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark("hubprobe", shuffle_partitions=PARTS)
    edges = zipf_edges(spark, n).persist()
    n_edges = edges.count()

    hub = edges.groupBy("v").count().orderBy(F.desc("count")).limit(1).collect()[0]
    mx, mean = partition_skew(edges, "v")
    smx, smean = salted_partition_skew(edges, "v")
    print(
        f"edges={n_edges:,} hub in-degree={hub['count']:,} "
        f"({hub['count'] / n_edges:.1%} of all edges) "
        f"join-partition rows max/mean: unsalted {mx:,}/{mean:,.0f} "
        f"(x{mx / mean:.1f}), salted({BUCKETS}) {smx:,}/{smean:,.0f} (x{smx / smean:.1f})"
    )

    results = {}
    for name, fn, kwargs in (
        ("lpa", label_propagation, dict(rounds=ROUNDS, checkpoint=True)),
        ("pagerank", pagerank, dict(iters=ROUNDS, checkpoint=True)),
    ):
        t0 = time.time()
        plain = fn(edges, **kwargs).persist()
        plain.count()
        t_plain = time.time() - t0
        t0 = time.time()
        salted = fn(edges, salt_buckets=BUCKETS, **kwargs).persist()
        salted.count()
        t_salted = time.time() - t0
        if name == "lpa":
            mismatches = (
                plain.join(salted.withColumnRenamed("community", "__s"), "node")
                .filter(F.col("community") != F.col("__s"))
                .count()
            )
            delta = f"mismatches={mismatches}"
            assert mismatches == 0, "salting changed LPA semantics"
        else:
            worst = (
                plain.join(salted.withColumnRenamed("rank", "__s"), "node")
                .select(
                    F.max(
                        F.abs(F.col("rank") - F.col("__s"))
                        / F.greatest(F.abs("rank"), F.lit(1e-300))
                    ).alias("m")
                )
                .collect()[0]["m"]
            )
            delta = f"max rel diff={worst:.2e}"
            assert worst < 1e-9, "salting changed PageRank beyond float reassociation"
        results[name] = (t_plain, t_salted, delta)
        plain.unpersist()
        salted.unpersist()

    print("| operator | rounds | unsalted wall (s) | salted wall (s) | result delta |")
    print("|---|---|---|---|---|")
    for name, (tp, ts, delta) in results.items():
        print(f"| {name} | {ROUNDS} | {tp:.1f} | {ts:.1f} | {delta} |")


if __name__ == "__main__":
    main()
