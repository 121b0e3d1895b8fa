"""Round-7 stat-family scale probes: the +1/-1 interval sweep (q175),
the equi-depth boundary pass exact-vs-approx (q177), and the rolling
exact-median window (q178) at millions of input rows.

The bench-scale catalog proves these CORRECT; this probe answers the
100 TB question for each family:

- **Interval sweep** (q175): the sweep claims ONE exchange on the
  partition key carries everything — measure bytes per interval over
  the unpivoted 2N points, and confirm the per-user window never
  degenerates (closed-form expected max-concurrency per user).
- **Equi-depth boundaries** (q177): the docstring promises "at 100 TB
  the boundary pass swaps to approx_percentile, same plan shape".
  Price that promise: Spark's exact ``percentile`` is an object
  aggregate whose partial state is EVERY VALUE in the partition — the
  single-row global agg ships the whole column to one reducer. Measure
  exact vs approx wall + shuffle at 10M rows and the boundary error
  the swap costs.
- **Rolling median** (q178): one exchange on the group key plus a
  per-partition sort and an O(w)-per-row exact percentile frame —
  bytes/row and wall at 5M rows, 100k groups.

Inputs are generated DISTRIBUTED (spark.range — no driver lists) with
closed-form expected outputs; correctness is a distributed mismatch
COUNT (zero rows to the driver). DuckDB twins run the identical
formulation on identically generated rows for single-node context.

Usage: python scripts/statprobe.py [n_intervals] [n_values] [n_rolling]
Defaults: 5_000_000 intervals, 10_000_000 values, 5_000_000 rows.
Prints markdown rows for BASELINE.md §5m.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import Window
from pyspark.sql import functions as F

from batch_process_spark.session import get_spark
from scripts.scaleprobe import fmt_shuffle, shuffle_delta, shuffle_write_bytes

SWEEP_PER_USER = 64  # intervals per user; > max stack depth (32)
ROLL_PER_USER = 50  # orders per customer in the rolling-median probe


def t_spark(build) -> float:
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def timed2(build, gc):
    """(cold s, steady s, steady shuffle bytes) — min-of-2 steady
    rejects GC-pause outliers; the shuffle delta brackets exactly one
    steady run (same discipline as scaleprobe.timed2)."""
    t1 = t_spark(build)
    gc()
    sb0 = shuffle_write_bytes()
    t2a = t_spark(build)
    sb = shuffle_delta(sb0, shuffle_write_bytes())
    gc()
    t2b = t_spark(build)
    return t1, min(t2a, t2b), sb


def t_duck(con, sql: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        con.execute(sql).fetchall()
        best = min(best, time.time() - t0)
    return best


# ---------------------------------------------------------------------------
# A. interval sweep (q175 shape)
# ---------------------------------------------------------------------------


def sweep_intervals(spark, n: int):
    """User u = id div 64 holds 64 unit-stepped intervals [j, j+d(u))
    with d(u) = 1 + u%32: a start-stacked ladder whose live count
    reaches exactly d(u) (64 >= 32 guarantees the stack fills), so the
    expected max-concurrency is closed-form per user."""
    return spark.range(n).select(
        (F.col("id") / SWEEP_PER_USER).cast("long").alias("user_id"),
        (F.col("id") % SWEEP_PER_USER).alias("j"),
    )


def sweep_result(iv):
    d = 1 + F.col("user_id") % 32
    iv2 = iv.select(
        "user_id",
        F.timestamp_seconds(F.col("j")).alias("s"),
        F.timestamp_seconds(F.col("j") + d).alias("e"),
    )
    pts = iv2.select(
        "user_id", F.col("s").alias("t"), F.lit(1).cast("long").alias("delta")
    ).unionByName(
        iv2.select("user_id", F.col("e").alias("t"), F.lit(-1).cast("long").alias("delta"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("live", F.sum("delta").over(w))
        .groupBy("user_id")
        .agg(F.max("live").alias("max_concurrent"))
    )


SWEEP_DUCK = f"""
WITH iv AS (
  SELECT range // {SWEEP_PER_USER} AS user_id,
         range % {SWEEP_PER_USER} AS j,
         1 + (range // {SWEEP_PER_USER}) % 32 AS d
  FROM range({{n}})
),
pts AS (
  SELECT user_id, j AS t, CAST(1 AS BIGINT) AS delta FROM iv
  UNION ALL
  SELECT user_id, j + d AS t, CAST(-1 AS BIGINT) AS delta FROM iv
),
swept AS (
  SELECT user_id,
         sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS live
  FROM pts
)
SELECT user_id, max(live) AS max_concurrent FROM swept GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# B. equi-depth boundary pass (q177 shape)
# ---------------------------------------------------------------------------


def equidepth_values(spark, n: int):
    # value = id as double: every decile boundary is closed-form and
    # both engines interpolate identically (the q43/q177 identity)
    return spark.range(n).select(F.col("id").cast("double").alias("v"))


QS = [i / 10.0 for i in range(1, 10)]


def exact_bounds(vals):
    return vals.agg(
        F.expr("percentile(v, array({}))".format(",".join(map(str, QS)))).alias("bounds")
    )


def approx_bounds(vals, accuracy: int = 10_000):
    return vals.agg(
        F.expr(
            "approx_percentile(v, array({}), {})".format(",".join(map(str, QS)), accuracy)
        ).alias("bounds")
    )


def assign_buckets(vals, bounds):
    bucket = F.aggregate(
        "bounds",
        F.lit(0).cast("long"),
        lambda acc, b: acc + (F.col("v") > b).cast("long"),
    )
    return (
        vals.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# C. rolling exact-median window (q178 shape)
# ---------------------------------------------------------------------------


def rolling_rows(spark, n: int):
    """User u = id div 50, in-user order j = id mod 50, cents = j:
    the 5-row rolling median of 0..49 is j-2 once the frame fills, so
    min_roll_med = 0.0 (the singleton first frame) and max_roll_med =
    47.0 (the last full frame {45..49}) for every user — closed-form."""
    return spark.range(n).select(
        (F.col("id") / ROLL_PER_USER).cast("long").alias("u"),
        (F.col("id") % ROLL_PER_USER).alias("j"),
    )


def rolling_result(rows):
    w = Window.partitionBy("u").orderBy("j").rowsBetween(-4, 0)
    med = F.expr("percentile(j, 0.5)").over(w)
    return (
        rows.select("u", med.alias("med"))
        .groupBy("u")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("min_med"),
            F.max("med").alias("max_med"),
        )
    )


ROLL_DUCK = f"""
WITH rows_ AS (
  SELECT range // {ROLL_PER_USER} AS u, range % {ROLL_PER_USER} AS j
  FROM range({{n}})
), m AS (
  SELECT u, median(j) OVER (PARTITION BY u ORDER BY j
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med
  FROM rows_
)
SELECT u, count(*) AS n, min(med) AS min_med, max(med) AS max_med
FROM m GROUP BY u
"""


def main():
    n_sweep = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_vals = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    n_roll = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000_000
    spark = get_spark("statprobe", extra_conf={"spark.ui.enabled": "true"})
    con = duckdb.connect()

    def gc():
        try:
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
        except Exception:
            pass

    rows_md = []

    # --- A. interval sweep -------------------------------------------------
    iv = sweep_intervals(spark, n_sweep)
    cold, steady, sb = timed2(lambda: sweep_result(iv), gc)
    mism = (
        sweep_result(iv)
        .filter(F.col("max_concurrent") != 1 + F.col("user_id") % 32)
        .count()
    )
    dt = t_duck(con, SWEEP_DUCK.format(n=n_sweep))
    rows_md.append(
        f"| interval sweep (q175) | {n_sweep:,} intervals | {cold:.2f} | {steady:.2f} "
        f"| {dt:.2f} | {steady/dt:.2f}x | {fmt_shuffle(sb, n_sweep)} | {mism} |"
    )
    print(rows_md[-1], flush=True)

    # --- B. equi-depth boundaries: exact vs approx -------------------------
    vals = equidepth_values(spark, n_vals)
    cold_e, steady_e, sb_e = timed2(lambda: exact_bounds(vals), gc)
    cold_a, steady_a, sb_a = timed2(lambda: approx_bounds(vals), gc)
    be = exact_bounds(vals).collect()[0][0]
    ba = approx_bounds(vals).collect()[0][0]
    max_err = max(abs(x - y) for x, y in zip(be, ba)) / n_vals
    # full assignment pass with the exact bounds, cross-checked vs DuckDB
    counts = {
        r["bucket"]: r["n"]
        for r in assign_buckets(vals, exact_bounds(vals)).collect()
    }
    dsql = f"""
    WITH v AS (SELECT CAST(range AS DOUBLE) AS v FROM range({n_vals})),
    b AS (SELECT quantile_cont(v, {QS}) AS bounds FROM v),
    assigned AS (
      SELECT len(list_filter(b.bounds, x -> v.v > x)) AS bucket FROM v CROSS JOIN b
    )
    SELECT bucket, count(*) AS n FROM assigned GROUP BY bucket
    """
    dcounts = dict(con.execute(dsql).fetchall())
    mism_b = sum(
        1
        for k in set(counts) | set(dcounts)
        if counts.get(k) != dcounts.get(k)
    )
    dt_b = t_duck(con, f"SELECT quantile_cont(v, {QS}) FROM (SELECT CAST(range AS DOUBLE) AS v FROM range({n_vals}))")
    rows_md.append(
        f"| equi-depth EXACT bounds (q177) | {n_vals:,} values | {cold_e:.2f} | {steady_e:.2f} "
        f"| {dt_b:.2f} | {steady_e/dt_b:.2f}x | {fmt_shuffle(sb_e, n_vals)} | {mism_b} |"
    )
    rows_md.append(
        f"| equi-depth APPROX bounds (acc 10k) | {n_vals:,} values | {cold_a:.2f} | {steady_a:.2f} "
        f"| — | — | {fmt_shuffle(sb_a, n_vals)} | max err {max_err:.2e}·N |"
    )
    print(rows_md[-2], flush=True)
    print(rows_md[-1], flush=True)

    # --- C. rolling median --------------------------------------------------
    rr = rolling_rows(spark, n_roll)
    cold_r, steady_r, sb_r = timed2(lambda: rolling_result(rr), gc)
    mism_r = (
        rolling_result(rr)
        .filter(
            (F.col("n") != ROLL_PER_USER)
            | (F.col("min_med") != 0.0)
            | (F.col("max_med") != float(ROLL_PER_USER - 3))
        )
        .count()
    )
    dt_r = t_duck(con, ROLL_DUCK.format(n=n_roll))
    rows_md.append(
        f"| rolling median (q178) | {n_roll:,} rows x 50/user | {cold_r:.2f} | {steady_r:.2f} "
        f"| {dt_r:.2f} | {steady_r/dt_r:.2f}x | {fmt_shuffle(sb_r, n_roll)} | {mism_r} |"
    )
    print(rows_md[-1], flush=True)

    print()
    print("| op | input rows | cold (s) | steady (s) | DuckDB (s) | ratio | shuffle MB | B/row | mismatches |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows_md:
        print(r)
    spark.stop()


if __name__ == "__main__":
    main()
