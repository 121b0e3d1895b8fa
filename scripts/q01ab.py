"""q01 money-sum A/B: DECIMAL(28,10) accumulation vs integer
micro-unit quantize-then-sum (round-10, VERDICT r9 item 6).

Both variants are order-independent (decimal addition is exact;
integer addition is exact). The question is per-row cost: the decimal
path pays a BigDecimal materialization per row in the double->decimal
cast; the quantized path is pure codegen primitives
(``floor(x * 1e6 + 0.5)`` -> long) with the exactness argument:

- the true values have <= 6 decimal digits (price 2dp, disc_price
  2+2 = 4dp, charge 4+2 = 6dp), so value x 1e6 is an integer and the
  double's ~1e-12 relative error can never sit at the .5 boundary —
  the quantization is EXACT, not approximate;
- the per-row longs sum inside DECIMAL(38,0) (long-backed compact
  until 18 digits), so no bigint overflow at any SF;
- the final /1e6 + 4dp rounding runs on the SAME exact integer sum in
  both engines (identical IEEE ops -> identical doubles -> lockstep).

The variant differs from the 10dp-decimal sum only through per-row
1e-10-scale representation noise in the 10dp path, so the two A
answers can in principle differ in the last 4dp digit; the A/B runs
each variant against ITS OWN DuckDB twin and compares hashes, which
is the gate that matters.

Usage: python scripts/q01ab.py [sf_dir] [reps]  (default sf0.1, 5)
Interleaved walls (duck A, spark A, spark B, duck B) x reps; prints a
markdown row for BASELINE.md. Idle machine only.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import duckdb
from pyspark.sql import functions as F

from batch_process_spark.queries import _t, round_half_up
from batch_process_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

ORACLE_A = """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(28,10))), 4) AS DOUBLE)      AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,10))), 4) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 4) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,10))), 4) AS DOUBLE) AS sum_charge,
           floor(avg(l_quantity) * 10000 + 0.5) / 10000                     AS avg_qty,
           floor(avg(l_extendedprice) * 10000 + 0.5) / 10000                AS avg_price,
           floor(avg(l_discount) * 10000 + 0.5) / 10000                     AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""

MICRO = "CAST(floor({x} * 1000000 + 0.5) AS BIGINT)"
UNQ = "CAST(floor(sum({m})::DOUBLE / 1000000 * 10000 + 0.5) / 10000 AS DOUBLE)"

ORACLE_B = f"""
    SELECT l_returnflag, l_linestatus,
           {UNQ.format(m=MICRO.format(x='l_quantity'))} AS sum_qty,
           {UNQ.format(m=MICRO.format(x='l_extendedprice'))} AS sum_base_price,
           {UNQ.format(m=MICRO.format(x='l_extendedprice * (1 - l_discount)'))} AS sum_disc_price,
           {UNQ.format(m=MICRO.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)'))} AS sum_charge,
           floor(avg(l_quantity) * 10000 + 0.5) / 10000                     AS avg_qty,
           floor(avg(l_extendedprice) * 10000 + 0.5) / 10000                AS avg_price,
           floor(avg(l_discount) * 10000 + 0.5) / 10000                     AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


def q01_b(spark, sf_dir: str):
    """The quantized variant: per-row long micro-units summed in
    DECIMAL(38,0) (exact + overflow-safe), unquantized in double."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    micro = lambda c: F.floor(c * 1_000_000 + F.lit(0.5)).cast("decimal(38,0)")
    unq = lambda c, name: (
        F.floor(F.sum(micro(c)).cast("double") / 1_000_000 * 10_000 + F.lit(0.5))
        / 10_000
    ).alias(name)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            unq(F.col("l_quantity"), "sum_qty"),
            unq(F.col("l_extendedprice"), "sum_base_price"),
            unq(disc_price, "sum_disc_price"),
            unq(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            round_half_up(F.avg("l_quantity")).alias("avg_qty"),
            round_half_up(F.avg("l_extendedprice")).alias("avg_price"),
            round_half_up(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)].reset_index(drop=True)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return [tuple(str(v) for v in row) for row in pdf.itertuples(index=False)]


def main() -> None:
    import __spark_entry__ as entry

    spark = get_spark("q01ab")
    con = duckdb.connect()
    import os

    p = f"{SF}/lineitem.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM {src}")
    q01_a = entry.queries()["q01_pricing_summary"]

    # correctness first: each variant vs its own duck twin
    for label, q, sql in (("A", q01_a, ORACLE_A), ("B", q01_b, ORACLE_B)):
        sp = canon(q(spark, SF).toPandas())
        du = canon(con.sql(sql).df())
        tag = "MATCH" if sp == du else "MISMATCH"
        print(f"variant {label}: spark-vs-duck {tag} ({len(sp)} rows)")
        if sp != du:
            for a, b in zip(sp, du):
                if a != b:
                    print("  spark:", a)
                    print("  duck :", b)
            return

    # interleaved walls
    walls: dict = {"duckA": [], "sparkA": [], "sparkB": [], "duckB": []}
    for q, _ in (("warm", None),):
        q01_a(spark, SF).write.format("noop").mode("overwrite").save()
        q01_b(spark, SF).write.format("noop").mode("overwrite").save()
    for _ in range(REPS):
        t = time.time(); con.sql(ORACLE_A).fetchall(); walls["duckA"].append(time.time() - t)
        t = time.time(); q01_a(spark, SF).write.format("noop").mode("overwrite").save(); walls["sparkA"].append(time.time() - t)
        t = time.time(); q01_b(spark, SF).write.format("noop").mode("overwrite").save(); walls["sparkB"].append(time.time() - t)
        t = time.time(); con.sql(ORACLE_B).fetchall(); walls["duckB"].append(time.time() - t)

    med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
    print("| variant | spark median (s) | duck median (s) | ratio |")
    print("|---|---|---|---|")
    print(f"| A decimal(28,10) | {med['sparkA']:.3f} | {med['duckA']:.3f} | {med['sparkA']/med['duckA']:.2f} |")
    print(f"| B micro-unit     | {med['sparkB']:.3f} | {med['duckB']:.3f} | {med['sparkB']/med['duckB']:.2f} |")
    print(f"spark B/A = {med['sparkB']/med['sparkA']:.2f}")


if __name__ == "__main__":
    main()
