"""q182 scale probe: one-pass sufficient-statistics correlation matrix
vs the naive per-pair corr() formulation.

The claim on q182's docstring is plan economics: k metrics need
k(k-1)/2 pairwise correlations, and calling ``corr()`` per pair scans
the fact table that many times, while the sufficient statistics (n,
per-metric sum/sum-of-squares, per-pair cross-sum — 15 columns for
k=4) fold in ONE map-side-combined aggregate over ONE scan. At 100 TB
a scan is the unit of cost, so the probe measures exactly that ratio
at >=10M generated rows (map-side range, no driver lists, no parquet
— both formulations read the identical frame).

Usage: python scripts/corrprobe.py [n_rows]   (default 10_000_000)
Prints a markdown row for BASELINE.md §5.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.session import get_spark

METRICS = ["qty", "price", "disc", "tax"]


def synth(spark, n: int):
    """Four integer metrics with genuine cross-correlations, all
    map-side: price tracks qty with noise, tax tracks disc."""
    return spark.range(n).select(
        (F.col("id") % 1000).alias("qty"),
        ((F.col("id") % 1000) * 3 + F.col("id") % 97).alias("price"),
        (F.col("id") % 13).alias("disc"),
        ((F.col("id") % 13) * 5 + F.col("id") % 7).alias("tax"),
    )


def one_pass(df):
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in METRICS:
        aggs.append(F.sum(F.col(a).cast("decimal(38,0)")).cast("double").alias(f"s_{a}"))
        aggs.append(
            F.sum(F.col(a).cast("decimal(38,0)") * F.col(a)).cast("double").alias(f"ss_{a}")
        )
    pairs = []
    for i, a in enumerate(METRICS):
        for b in METRICS[i + 1 :]:
            pairs.append((a, b))
            aggs.append(
                F.sum(F.col(a).cast("decimal(38,0)") * F.col(b))
                .cast("double")
                .alias(f"sp_{a}_{b}")
            )
    row = df.agg(*aggs).collect()[0]
    out = {}
    for a, b in pairs:
        n = row["n"]
        cov = n * row[f"sp_{a}_{b}"] - row[f"s_{a}"] * row[f"s_{b}"]
        va = n * row[f"ss_{a}"] - row[f"s_{a}"] ** 2
        vb = n * row[f"ss_{b}"] - row[f"s_{b}"] ** 2
        out[(a, b)] = cov / (va * vb) ** 0.5
    return out


def per_pair(df):
    out = {}
    for i, a in enumerate(METRICS):
        for b in METRICS[i + 1 :]:
            out[(a, b)] = df.agg(F.corr(a, b)).collect()[0][0]
    return out


def one_pass_long(df):
    """The decimal-free variant: quantifies the exactness surcharge.
    (Catalog q182 pays decimal on purpose — n*sum(x^2) passes int64 —
    but a probe should price that choice, not hide it.)"""
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in METRICS:
        aggs.append(F.sum(F.col(a)).cast("double").alias(f"s_{a}"))
        aggs.append(F.sum(F.col(a) * F.col(a)).cast("double").alias(f"ss_{a}"))
    for i, a in enumerate(METRICS):
        for b in METRICS[i + 1 :]:
            aggs.append(F.sum(F.col(a) * F.col(b)).cast("double").alias(f"sp_{a}_{b}"))
    df.agg(*aggs).collect()
    return None


def main():
    import shutil
    import tempfile

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("corrprobe")
    # A scan must COST something for the scan-count claim to be
    # measurable: spark.range is ~free, so stage the synth as parquet
    # and read it back (the shape every real corpus has).
    d = tempfile.mkdtemp(prefix="corrprobe_")
    synth(spark, n).write.mode("overwrite").parquet(d)
    df = spark.read.parquet(d)

    def best_of_2(fn):
        r1t = time.time(); r = fn(df); t1 = time.time() - r1t
        r2t = time.time(); fn(df); t2 = time.time() - r2t
        return r, min(t1, t2)

    one, t_one = best_of_2(one_pass)
    _, t_long = best_of_2(one_pass_long)
    six, t_six = best_of_2(per_pair)
    worst = max(abs(one[k] - six[k]) for k in one)
    print(f"max |one_pass - per_pair corr| = {worst:.2e} (agreement check)")
    print(
        f"| corr matrix k=4 (q182) | {n:,} parquet rows | one-pass decimal "
        f"{t_one:.2f} s / one-pass long {t_long:.2f} s (1 scan) vs per-pair "
        f"corr() {t_six:.2f} s (6 scans) | decimal exactness costs "
        f"{t_one / t_long:.1f}x over long sums; per-pair pays "
        f"{t_six / t_long:.1f}x the long one-pass; max corr delta {worst:.1e} |"
    )
    shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
