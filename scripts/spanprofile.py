"""q222 volume-floor decomposition (round 10): where do the seconds go?

q222 = quality-score projection (regex counts) + q207 sliding-span
dedup (span assembly -> span-stats agg -> stats join -> per-doc agg)
+ a 5-bucket join-agg. The r9 cliff fix took the 1M-doc wall from
151 s to 84 s vs DuckDB's 15.5 s; this probe times each component in
isolation on the auditprobe corpus so the remaining gap is attributed,
not guessed:

  scan      — parquet scan + length sum (the IO floor)
  quality   — the q222 score projection only (regex CPU)
  spans     — span assembly + explode only (slice/join/md5 CPU)
  spanagg   — spans + the (h,doc_id) stats aggregation
  q207      — the full per-doc dup_frac frame
  q222      — the full calibration query

Usage: python scripts/spanprofile.py [n_docs] (default 1000000)
Run on an idle machine; reuses /tmp/auditprobe_<n> if present.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.session import get_spark
from scripts.auditprobe import synth


def timed(label: str, df, mode: str = "noop"):
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(f"| {label} | {wall:.1f} |")
    return wall


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("spanprofile")
    path = f"/tmp/auditprobe_{n}"
    if not os.path.exists(f"{path}/documents.parquet"):
        synth(spark, n, path)

    from batch_process_spark.queries import _t
    from batch_process_spark.queries_ext15 import (
        _span_frame,
        q207_sliding_span_dedup,
        q222_quality_dup_calibration,
    )
    from batch_process_spark.operators import text

    docs = _t(spark, path, "documents")

    print(f"## q222 decomposition at {n:,} docs (steady walls, noop sink)")
    print("| component | wall (s) |")
    print("|---|---|")

    timed("scan+length", docs.select(F.sum(F.length("text")).alias("s")))

    t = F.col("text")
    n_chars = F.length(t)
    punct = F.regexp_count(t, F.lit(r"[!-/:-@\[-`{-~]"))
    # NOTE: all-counts form (the round-10 fix). Swapping `digits` back
    # to length(regexp_replace(t, '[^0-9]', '')) reproduces the second
    # regex cliff: the whole projection de-optimizes ~42x.
    digits = F.regexp_count(t, F.lit(r"[0-9]"))
    n_tokens = text.token_count_ws(t)
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, digits / n_chars).otherwise(F.lit(0.0))
    score = F.greatest(
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(0.4))
        - F.least(digit_ratio * 2, F.lit(0.3))
        - F.when((n_tokens < 5) | (n_tokens > 100000), 0.3).otherwise(0.0),
        F.lit(0.0),
    )
    timed("quality-score", docs.select(F.sum(score).alias("s")))

    spans = _span_frame(docs)
    timed("span-assembly", spans.select(F.sum(F.col("h")).alias("s")))
    timed(
        "span+occ-agg",
        spans.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("c")).select(
            F.sum("c").alias("s")
        ),
    )
    timed("q207-full", q207_sliding_span_dedup(spark, path))
    timed("q222-full", q222_quality_dup_calibration(spark, path))


if __name__ == "__main__":
    main()
