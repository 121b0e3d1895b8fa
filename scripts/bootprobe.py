"""Scale probe for the Poisson-bootstrap shape (q187): the claim under
test is that the 100-replicate dimension rides a MAP-SIDE explode —
partial aggregation per (partition, replicate) means the one shuffle
carries ~(#partitions x reps) partial rows, NOT (#units x reps)
exploded rows. A wrong plan (agg without partial push-down, or a
repartition before the explode) would ship the exploded fact table and
show B/unit scaling ~100x higher.

Distributed generation: spark.range units with a deterministic value;
the probe runs the exact q187 draw/weight/aggregate pipeline (same
constants imported from the catalog module) and reports shuffle bytes
per UNIT — which must FALL as units grow (the fixed partial-row count
amortizes), the signature of map-side combine. Correctness cross-check:
rep 0's unweighted totals must equal the closed-form sum of the
generated values exactly.

Usage: python scripts/bootprobe.py [n_units ...] (default 1e7 5e7)
Prints markdown rows for BASELINE.md §5.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.queries_ext12 import (
    _BOOT_A,
    _BOOT_B,
    _BOOT_C,
    _BOOT_L,
    _BOOT_M,
    _BOOT_REPS,
    _boot_weight_col,
)
from batch_process_spark.session import get_spark
from scaleprobe import shuffle_write_bytes


def probe(spark, n_units: int) -> dict:
    units = spark.range(n_units).select(
        F.col("id").alias("o_custkey"), (F.col("id") % 1000).alias("cents")
    )
    sb0 = shuffle_write_bytes()
    t0 = time.time()
    drawn = units.select(
        "cents",
        "o_custkey",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))).alias("r"),
    ).select(
        "cents",
        "r",
        (
            (
                (
                    (F.col("o_custkey") % _BOOT_M) * F.lit(_BOOT_A)
                    + F.col("r").cast("long") * F.lit(_BOOT_B)
                    + F.lit(_BOOT_C)
                )
                % _BOOT_M
            )
            * F.lit(_BOOT_L)
            % _BOOT_M
        ).alias("m"),
    )
    w = _boot_weight_col(F.col("m"))
    reps = drawn.groupBy("r").agg(
        (F.sum(w * F.col("cents")).cast("double") / F.sum(w).cast("double")).alias(
            "mean_r"
        ),
        F.sum("cents").alias("tot"),
        F.count(F.lit(1)).alias("n"),
    )
    rows = reps.collect()
    wall = time.time() - t0
    sb1 = shuffle_write_bytes()
    # closed form: sum(id % 1000) over 0..n-1
    full, rem = divmod(n_units, 1000)
    want_tot = full * 499500 + rem * (rem - 1) // 2
    bad = sum(1 for r in rows if r.tot != want_tot or r.n != n_units)
    shuffle = None if (sb0 is None or sb1 is None) else sb1 - sb0
    means = [r.mean_r for r in rows]
    return {
        "units": n_units,
        "reps": len(rows),
        "wall_s": round(wall, 2),
        "mismatches": bad,
        "shuffle_kb": None if shuffle is None else round(shuffle / 1024, 1),
        "b_per_unit": None if shuffle is None else round(shuffle / n_units, 4),
        "mean_spread": round(max(means) - min(means), 4),
    }


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [10_000_000, 50_000_000]
    spark = get_spark("bootprobe", extra_conf={"spark.ui.enabled": "true"})
    print("| units | reps | wall (s) | mismatches | shuffle (KB) | B/unit | rep-mean spread |")
    print("|---|---|---|---|---|---|---|")
    for n in sizes:
        r = probe(spark, n)
        assert r["mismatches"] == 0, f"WRONG TOTALS at {n} units"
        print(
            f"| {r['units']:,} | {r['reps']} | {r['wall_s']} | {r['mismatches']} "
            f"| {r['shuffle_kb']} | {r['b_per_unit']} | {r['mean_spread']} |"
        )


if __name__ == "__main__":
    main()
