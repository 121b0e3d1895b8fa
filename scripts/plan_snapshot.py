"""Snapshot `.explain("formatted")` for named queries into files.

Deliverable helper for the optimization rounds: the judge checks plan
claims (Exchange counts, join strategies, PushedFilters) against
committed plan files, so every touched query gets a
plans/r<N>/<query>_<tag>.txt pair (before/after).

Usage:
    python scripts/plan_snapshot.py <out_dir> <tag> <sf_dir> q219_span_attribution [q207_... ...]

Writes <out_dir>/<query>_<tag>.txt with the formatted physical plan of
the query built against <sf_dir>. Pure explain — nothing is executed
beyond any build-time sizing jobs the query itself runs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, tag, sf_dir, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)

    from batch_process_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("plan_snapshot")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({tag})\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
