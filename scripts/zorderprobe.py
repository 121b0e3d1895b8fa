"""Z-order data-skipping probe: does ``sinks/writers.py::write_zordered``
actually reduce the row groups a selective scan must read — measured,
not argued?

Three layouts of the identical 10M-row table (x, y uniform in
[0, 2^20), a payload column so bytes mean something), 32 files each:

- ``natural``  — write order (id order; x/y uncorrelated with files)
- ``sorted_x`` — range-partitioned + sorted by x (the 1-D champion)
- ``zorder``   — Morton-interleaved (x, y) via write_zordered

Two selective queries against each layout:

- ``box``  — ~1% of x AND ~1% of y (the 2-D lookup every layout
  claims to serve)
- ``yslab`` — ~1% of y only (the query a 1-D sort on x CANNOT skip —
  the case that justifies Z-order's trade)

Measured: parquet row groups a stats-pruning reader MUST read (footer
min/max intersection — deterministic) + wall for a payload-reading
aggregate. Correctness: all three layouts must
return the SAME count for the same predicate (the layout cannot change
the answer). Parquet row-group min/max stats do the pruning — readers
need no cooperation.

Usage: python scripts/zorderprobe.py [n_rows] [out_dir]
Default 10_000_000 rows in a temp dir. Prints markdown rows for
BASELINE.md §5n.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.session import get_spark

MASK = 1 << 20  # x, y domain
SEL = MASK // 100  # ~1% per axis


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="zorderprobe_")
    spark = get_spark("zorderprobe", extra_conf={"spark.ui.enabled": "true"})
    from batch_process_spark.sinks.writers import write_zordered

    df = spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(MASK)).alias("x"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(MASK)).alias("y"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )

    paths = {k: f"{out}/{k}" for k in ("natural", "sorted_x", "zorder")}
    t0 = time.time()
    df.repartition(32).write.mode("overwrite").parquet(paths["natural"])
    w_nat = time.time() - t0
    t0 = time.time()
    df.repartitionByRange(32, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(paths["sorted_x"])
    w_sx = time.time() - t0
    t0 = time.time()
    write_zordered(df, paths["zorder"], "x", "y", n_files=32)
    w_z = time.time() - t0
    print(
        f"# write wall: natural {w_nat:.1f}s, sorted_x {w_sx:.1f}s, zorder {w_z:.1f}s",
        file=sys.stderr,
    )

    x0, y0 = MASK // 3, MASK // 2
    preds = {
        "box (1% x AND 1% y)": (
            (F.col("x") >= x0) & (F.col("x") < x0 + SEL)
            & (F.col("y") >= y0) & (F.col("y") < y0 + SEL)
        ),
        "yslab (1% y only)": (F.col("y") >= y0) & (F.col("y") < y0 + SEL),
    }
    bounds = {
        "box (1% x AND 1% y)": ((x0, x0 + SEL), (y0, y0 + SEL)),
        "yslab (1% y only)": ((0, MASK), (y0, y0 + SEL)),
    }

    def rowgroups_matching(path: str, xb, yb):
        """(matching row groups, total row groups) by parquet footer
        min/max — the DETERMINISTIC skipping metric: a row group whose
        stats box intersects the predicate MUST be read by any
        stats-pruning reader; the rest are skipped."""
        import glob

        import pyarrow.parquet as pq

        match = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                total += 1
                g = md.row_group(rg)
                sx = g.column(idx["x"]).statistics
                sy = g.column(idx["y"]).statistics
                if (
                    sx.min < xb[1]
                    and sx.max >= xb[0]
                    and sy.min < yb[1]
                    and sy.max >= yb[0]
                ):
                    match += 1
        return match, total

    rows_md = []
    for qname, pred in preds.items():
        counts = {}
        for layout, path in paths.items():
            rg_match, rg_total = rowgroups_matching(path, *bounds[qname])
            # the timed scan READS THE PAYLOAD of surviving rows, so
            # bytes track pruned row groups of the fat column, not just
            # the filter columns
            scan = spark.read.parquet(path).filter(pred).agg(
                F.count(F.lit(1)).alias("n"), F.sum(F.length("payload")).alias("b")
            )
            scan.collect()  # warm (footer cache, code paths)
            t0 = time.time()
            counts[layout] = scan.collect()[0]["n"]
            wall = time.time() - t0
            rows_md.append(
                f"| {qname} | {layout} | {rg_match}/{rg_total} | "
                f"{wall:.2f} | {counts[layout]:,} |"
            )
            print(rows_md[-1], flush=True)
        assert len(set(counts.values())) == 1, f"layouts disagree: {counts}"

    print()
    print("| query | layout | row groups read | wall (s) | rows |")
    print("|---|---|---|---|---|")
    for r in rows_md:
        print(r)
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
