"""Skew hardening probe: one hot key = 20% of all rows.

Measures what `operators/skew.py` actually buys on a zipf-shaped
workload, for the two paths where a hot key hurts:

- JOIN: fact (hot key 20%) >< non-broadcastable dim. With AQE's
  skew-join splitter OFF (the worst case: a single over-large hash-agg
  or a runtime without AQE), a plain shuffle join lands every hot-key
  row in ONE task; `salted_join` spreads them across buckets. With AQE
  ON, the splitter handles it at runtime — salting is the insurance
  for what AQE cannot split.
- AGG (exact distinct payloads): groupBy(key).collect_set — partial
  aggregation can't collapse distinct payloads, so the hot group's
  whole payload crosses the shuffle into one task; `salted_agg`
  partial-dedups per (key, salt) first.

The bound that matters for "max task time" is max ROWS per post-shuffle
task (task time is linear in it for these kernels); it's measured
exactly via spark_partition_id, not sampled from timing noise.

Usage: python scripts/skewprobe.py [n_rows]   (default 5_000_000)
Prints a markdown table for BASELINE.md §5g.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.operators.skew import salted_agg, salted_join
from batch_process_spark.session import get_spark

N_COLD_KEYS = 1000
BUCKETS = 16


def skewed_fact(spark, n: int):
    """20% of rows on key 0, the rest ~uniform over N_COLD_KEYS keys."""
    return spark.range(n).select(
        F.when(F.col("id") % 5 == 0, 0)
        .otherwise(F.pmod(F.hash("id"), N_COLD_KEYS) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )


def max_partition_rows(df) -> int:
    return (
        df.groupBy(F.spark_partition_id().alias("__p"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark("skewprobe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # dim must shuffle
    fact = skewed_fact(spark, n).persist()
    fact.count()
    dim = spark.range(N_COLD_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    hot = n // 5
    print(f"n={n:,} hot_key_rows={hot:,} buckets={BUCKETS}")
    print("| path | variant | wall (s) | max rows/task |")
    print("|---|---|---|---|")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    plain = fact.join(dim, "k")
    print(f"| join | plain (AQE off) | {timed(plain):.2f} | {max_partition_rows(plain):,} |")
    salted = salted_join(fact, dim, ["k"], buckets=BUCKETS)
    print(f"| join | salted (AQE off) | {timed(salted):.2f} | {max_partition_rows(salted):,} |")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(f"| join | plain (AQE skew-join) | {timed(fact.join(dim, 'k')):.2f} | (runtime-split) |")

    # exact-distinct agg: payload can't partial-collapse
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    plain_agg = fact.groupBy("k").agg(F.size(F.collect_set("v")).alias("nd"))
    t_plain = timed(plain_agg)
    salted_agg_df = salted_agg(
        fact,
        ["k"],
        {"s": F.collect_set("v")},
        {"nd": F.size(F.array_distinct(F.flatten(F.collect_list("s"))))},
        buckets=BUCKETS,
    )
    t_salt = timed(salted_agg_df)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    print(f"| agg distinct | plain (AQE off) | {t_plain:.2f} | n/a |")
    print(f"| agg distinct | salted (AQE off) | {t_salt:.2f} | n/a |")
    # correctness cross-check while we're here
    a = {r["k"]: r["nd"] for r in plain_agg.collect()}
    b = {r["k"]: r["nd"] for r in salted_agg_df.collect()}
    assert a == b, "salted distinct disagrees with plain"
    print(f"(distinct counts agree over {len(a)} keys; hot key nd={a[0]:,})")


if __name__ == "__main__":
    main()
