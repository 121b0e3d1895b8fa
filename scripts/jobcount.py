"""Diagnostic: count Spark jobs + stages per bench query (after warmup)
— the bench floor is ~60-70 ms/job of local-mode scheduling; every
extra action/job per query buys nothing at scale and costs the floor
here. Mirrors the bench session (AQE off, shuffle=cpus) unless
JOBCOUNT_AQE=1. Run: python scripts/jobcount.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from batch_process_spark.session import get_spark

    aqe = "true" if os.environ.get("JOBCOUNT_AQE") else "false"
    spark = get_spark(
        "jobcount",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": aqe},
    )
    sc = spark.sparkContext
    qs = entrymod.queries()

    names = [n for n in BENCH_QUERIES if not only or n in only]
    for name in names:  # warmup
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    # steady-state: populate the sf_dir plan cache + one timed-path run
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    sc._jvm.System.gc()
    time.sleep(1)

    tracker = sc.statusTracker()
    print(f"{'query':32s} {'jobs':>4s} {'stages':>6s} {'tasks':>6s} {'sec':>7s}")
    for name in names:
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        after_jobs = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(after_jobs - before_jobs)
        stages = tasks = 0
        per_job = []
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            js = jt = 0
            if ji:
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si:
                        js += 1
                        jt += si.numTasks
            stages += js
            tasks += jt
            per_job.append(f"j{j}:{js}s/{jt}t")
        print(f"{name:32s} {len(new_jobs):4d} {stages:6d} {tasks:6d} {dt:7.3f}  {' '.join(per_job)}")
    spark.stop()


if __name__ == "__main__":
    main()
