"""Span-memo storage-level A/B at volume (VERDICT r11 item 3).

§5ad reported q219's 1M-doc trial spread at 30-80 s: GC/storage churn
of the ~1 GB deserialized occurrence cache interacting with the pair
join. This probe measures the variance band (4 timed trials after one
memo-building warm run) under a given storage level for the memoized
`_span_occ` frame, on the near-cap fixture spanskewprobe plants.

Usage:
    python scripts/spanmemoab.py <level> [n_docs] [path] [query]
      level: MEMORY_AND_DISK (serialized, new default) |
             MEMORY_AND_DISK_DESER (DataFrame.persist default, the old
             behavior) | NONE (persist with StorageLevel.NONE — the
             cache is a no-op, every trial recomputes)
Run each level in its OWN process (fresh JVM/heap) on an idle host.
Prints one markdown row: level | trials | min | max | max/min.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from batch_process_spark.session import get_spark

TRIALS = 4


def main() -> None:
    level = sys.argv[1] if len(sys.argv) > 1 else "MEMORY_AND_DISK"
    n = int(float(sys.argv[2])) if len(sys.argv) > 2 else 1_000_000
    path = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/spanskew_{n}"
    qname = sys.argv[4] if len(sys.argv) > 4 else "q219_span_attribution"

    import os
    spark = get_spark(
        "spanmemoab",
        extra_conf={"spark.batchprocess.spanMemoLevel": level},
    )
    if not os.path.isdir(f"{path}/documents.parquet"):
        from scripts.spanskewprobe import synth_nearcap

        synth_nearcap(spark, n, path)

    import __spark_entry__ as entry

    q = entry.queries()[qname]
    out = q(spark, path)
    out.write.format("noop").mode("overwrite").save()  # warm: builds memo
    walls = []
    for _ in range(TRIALS):
        t0 = time.time()
        q(spark, path).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    lo, hi = min(walls), max(walls)
    print(f"| {qname} n={n:,} | {level} | "
          f"{' '.join(f'{w:.1f}' for w in walls)} | "
          f"{lo:.1f} | {hi:.1f} | {hi / lo:.2f} |")


if __name__ == "__main__":
    main()
