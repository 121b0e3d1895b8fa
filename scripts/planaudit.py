"""Whole-catalog physical-plan audit: explain EVERY ``queries()``
entry at the given sf dir and flag anti-patterns (guide §3.1/§7.2):

- SortMergeJoin (should be broadcast or shuffled-hash on this catalog)
- CartesianProduct / BroadcastNestedLoopJoin on non-trivial inputs
- BatchEvalPython (row-at-a-time Python boundary)
- Exchange count per query (shuffle audit)

The serving-path rerank cliff (BASELINE §5aj) was an SMJ that only
appeared past a size-estimate threshold; this sweep is the systematic
version of that discovery for the whole catalog at one sf.

Usage: python scripts/planaudit.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

FLAGS = {
    "smj": "SortMergeJoin",
    "cartesian": "CartesianProduct",
    "bnlj": "BroadcastNestedLoopJoin",
    "batcheval": "BatchEvalPython",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/planaudit.json"

    import __spark_entry__ as entrymod
    from batch_process_spark.session import get_spark

    spark = get_spark("planaudit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    qs = entrymod.queries()

    report = {}
    errs = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            errs[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        entry = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "bhj": plan.count("BroadcastHashJoin"),
            "shj": plan.count("ShuffledHashJoin"),
        }
        for key, pat in FLAGS.items():
            n = plan.count(pat)
            if n:
                entry[key] = n
        report[name] = entry

    flagged = {k: v for k, v in report.items() if any(f in v for f in FLAGS)}
    summary = {
        "sf_dir": sf_dir,
        "n": len(report),
        "errors": errs,
        "flagged": flagged,
        "max_exchanges": sorted(
            ((k, v["exchanges"]) for k, v in report.items()),
            key=lambda kv: -kv[1],
        )[:20],
    }
    with open(out, "w") as fh:
        json.dump({"summary": summary, "all": report}, fh, indent=1)
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
