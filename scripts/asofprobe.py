"""As-of join scale probe: the tag-union-window rewrite
(``operators/asof.py::asof_join`` — behind q39, q154, q183) at
millions of rows per side, against DuckDB's NATIVE ``ASOF JOIN``.

The 100 TB question: the rewrite claims ONE exchange on the by-key
carries both sides (no broadcast constraint, no per-key memory beyond
the window sort) — measure bytes/row over the unioned frame and
confirm exactness with a closed-form fixture: left rows sit at odd
seconds, right quotes at even seconds with value = their own epoch
second, so every left row's carried quote must equal its timestamp
minus one. Mismatches are counted distributed (zero rows to the
driver).

Usage: python scripts/asofprobe.py [n_per_side]
Default 2_000_000 rows per side (50k users x 40). Prints a markdown
row for BASELINE.md §5m.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.operators.asof import asof_join
from batch_process_spark.session import get_spark
from scripts.scaleprobe import fmt_shuffle, shuffle_delta, shuffle_write_bytes

PER_USER = 40


def sides(spark, n: int):
    base = spark.range(n).select(
        (F.col("id") / PER_USER).cast("long").alias("user_id"),
        (F.col("id") % PER_USER).alias("j"),
    )
    left = base.select(
        "user_id", F.timestamp_seconds(2 * F.col("j") + 1).alias("ts")
    )
    right = base.select(
        "user_id",
        F.timestamp_seconds(2 * F.col("j")).alias("ts"),
        (2 * F.col("j")).alias("px"),
    )
    return left, right


DUCK = f"""
WITH base AS (
  SELECT range // {PER_USER} AS user_id, range % {PER_USER} AS j FROM range({{n}})
),
l AS (SELECT user_id, to_timestamp(2 * j + 1) AS ts FROM base),
r AS (SELECT user_id, to_timestamp(2 * j) AS ts, 2 * j AS px FROM base)
SELECT count(*) AS n, sum(r.px) AS s
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("asofprobe", extra_conf={"spark.ui.enabled": "true"})
    con = duckdb.connect()

    def gc():
        try:
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
        except Exception:
            pass

    left, right = sides(spark, n)

    def build():
        return asof_join(left, right, on="ts", by="user_id", right_cols=["px"])

    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    cold = time.time() - t0
    gc()
    sb0 = shuffle_write_bytes()
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    t2a = time.time() - t0
    sb = shuffle_delta(sb0, shuffle_write_bytes())
    gc()
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    steady = min(t2a, time.time() - t0)

    # closed form: the carried quote is always the left second minus 1
    mism = (
        build()
        .filter(
            F.col("px_r").isNull()
            | (F.col("px_r") != F.col("ts").cast("long") - 1)
        )
        .count()
    )

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        dn, ds = con.execute(DUCK.format(n=n)).fetchone()
        best = min(best, time.time() - t0)
    # DuckDB twin sanity: every left row matched, checksum closed-form
    exp_s = sum(2 * j for j in range(PER_USER)) * (n // PER_USER)
    duck_ok = dn == n and ds == exp_s

    print()
    print("| op | input rows | cold (s) | steady (s) | DuckDB native ASOF (s) | ratio | shuffle MB | B/row | mismatches |")
    print("|---|---|---|---|---|---|---|---|---|")
    print(
        f"| asof_join tag-union-window | {n:,}/side | {cold:.2f} | {steady:.2f} "
        f"| {best:.2f} | {steady/best:.2f}x | {fmt_shuffle(sb, 2 * n)} | {mism} |"
        f"{'' if duck_ok else '  DUCK-MISMATCH'}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
