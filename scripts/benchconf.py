"""A/B harness for bench-session confs: runs the bench query set
(min-of-N like bench.py) under a named conf overlay, prints the total.
Usage: python scripts/benchconf.py <variant> [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "coalesce1": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "coalesce1_p8": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.shuffle.partitions": "8",
    },
}


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from batch_process_spark.session import get_spark

    spark = get_spark(
        f"benchconf-{variant}", master="local[32]", shuffle_partitions=32,
        extra_conf=VARIANTS[variant],
    )
    qs = entrymod.queries()
    for name in BENCH_QUERIES:  # warmup (codegen) at sf0.001
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1)

    timings = {}
    for name in BENCH_QUERIES:
        runs = []
        for _ in range(trials):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        spark.sparkContext._jvm.System.gc()
    total = round(sum(timings.values()), 3)
    print(json.dumps({"variant": variant, "total": total, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
