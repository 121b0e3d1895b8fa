"""Evidence cell for the session default
``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true``
(VERDICT r13 "What's wrong" #1 / "Next round" #2).

The r13 claim (session.py comment, fee8715): with the conf OFF a
persisted frame materializes at the STATIC shuffle partition count, so
every downstream map stage over the cache inherits that width — the
memoized edge frame in the iterative graph queries landed at N-cores
partitions for tens of thousands of rows, paying N task launches per
power-iteration round. This probe makes the claim a committed
artifact: it runs the iterative-family queries in TWO FRESH SESSIONS
(conf on vs conf off, everything else the session default), 1 warm +
3 steady trials each through the noop sink, and reports wall times
plus the materialized partition count of the memoized edge frame.

Usage: python scripts/aqecacheprobe.py [out.json] [sf_dir] [query ...]
defaults: /tmp/aqecache.json /root/testdata/sf0.1 q169_pagerank q201_label_propagation
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import os as _os

_os.environ.setdefault("SPARK_GRAFT_LAYOUT_CACHE", "1")

CONF = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"


def run_side(value: str, sf_dir: str, names: list[str]) -> dict:
    from batch_process_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(f"aqecacheprobe-{value}", extra_conf={CONF: value})
    assert spark.conf.get(CONF) == value, "fresh session required per side"
    qs = entry.queries()
    side: dict = {"conf": value, "queries": {}}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"aqecacheprobe {name} {value} warm")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = round(time.time() - t0, 2)
        walls = []
        for i in range(3):
            spark.sparkContext.setJobDescription(
                f"aqecacheprobe {name} {value} trial {i}"
            )
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        side["queries"][name] = {"warm": warm, "steady": walls, "min": min(walls)}
        print(f"# {CONF}={value} {name}: warm {warm}s steady {walls}", file=sys.stderr)
    # materialized width of the cached RDDs still alive in this session
    # (the memoized edge frame among them): the conf's whole effect
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        side["cached_rdd_partitions"] = sorted(
            int(i.numPartitions()) for i in infos
        )
    except Exception as exc:  # noqa: BLE001
        side["cached_rdd_partitions"] = f"unavailable: {exc}"
    spark.stop()
    return side


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/aqecache.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or ["q169_pagerank", "q201_label_propagation"]

    report = {
        "sf_dir": sf_dir,
        "sides": [run_side("true", sf_dir, names), run_side("false", sf_dir, names)],
    }
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
