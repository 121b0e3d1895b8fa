"""q207 sliding-span dedup at scale: shuffle bytes per SPAN, wall vs
the DuckDB twin, and a closed-form distributed correctness check.

Corpus: n docs x 48 unique-per-doc words (cross-doc span collisions
impossible by construction), with every 10th doc pair planted as a
SHIFTED near-copy — doc i+1 = one pad word + doc i's full text — so
the expected output is closed-form:

- doc i   (i%10==0): 41 spans, all 41 shared with doc i+1 -> dup_frac 1.0
- doc i+1 (i%10==0): 42 spans, 41 shared                  -> dup_frac 41/42
- every other doc: 0 duplicated spans                     -> dup_frac 0.0

The check runs DISTRIBUTED (mismatch count, zero rows to the driver)
against the ENGINE's registered q207 (not a re-implementation). The
probe measures the two wide stages' combined shuffle: the span-hash
stats agg and the stats-to-spans join — the claim is bytes per SPAN
bounded by a constant (hash + count + join payload), independent of n.

Usage: python scripts/spanprobe.py [n_docs...]   (default 200000 400000)
Prints markdown rows for BASELINE.md §5.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from batch_process_spark.session import get_spark
from scripts.scaleprobe import fmt_shuffle, shuffle_delta, shuffle_write_bytes

WORDS = 48
SPAN = 8  # q207's _SPAN_WORDS


def synth(spark, n: int, path: str) -> None:
    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                base = " ".join(f"a{i}x{j}" for j in range(WORDS))
                if i % 10 == 1:
                    prev = i - 1
                    pbase = " ".join(f"a{prev}x{j}" for j in range(WORDS))
                    rows.append((int(i), f"zz{i} " + pbase))
                else:
                    rows.append((int(i), base))
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="doc_id long, text string")
        .write.mode("overwrite")
        .parquet(f"{path}/documents.parquet")
    )


def main() -> None:
    import __spark_entry__ as entry

    sizes = [int(s) for s in sys.argv[1:]] or [200_000, 400_000]
    spark = get_spark("spanprobe", extra_conf={"spark.ui.enabled": "true"})
    port = int((spark.sparkContext.uiWebUrl or ":4040").rsplit(":", 1)[1])
    q = entry.queries()["q207_sliding_span_dedup"]
    oracle = entry.oracle_sql()["q207_sliding_span_dedup"]
    print("| n_docs | spans | spark wall (s) | shuffle MB | B/span | duckdb wall (s) | mismatches |")
    print("|---|---|---|---|---|---|---|")
    for n in sizes:
        path = f"/tmp/spanprobe_{n}"
        synth(spark, n, path)
        n_spans = n * (WORDS - SPAN + 1) + (n // 10) * 1  # +1 span per padded doc

        t0 = time.time()
        out = q(spark, path)
        out.write.format("noop").mode("overwrite").save()
        _ = time.time() - t0  # cold (plan+scan) — steady below is the metric
        sb0 = shuffle_write_bytes(port)
        t0 = time.time()
        out = q(spark, path)
        # closed-form expectation, checked distributed; the last
        # i%10==0 doc only has its planted copy when doc i+1 exists
        # (n % 10 == 1 would otherwise assert spuriously)
        exp = F.when(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") + 1 < n), F.lit(1.0)
        ).when(
            F.col("doc_id") % 10 == 1,
            F.floor(F.lit(41.0) / 42 * 1000000 + 0.5) / 1000000,
        ).otherwise(F.lit(0.0))
        mism = out.filter(F.col("dup_frac") != exp).count()
        wall = time.time() - t0
        sb1 = shuffle_write_bytes(port)
        shuf = fmt_shuffle(shuffle_delta(sb0, sb1), n_spans)

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{path}/documents.parquet/*.parquet'"
        )
        t0 = time.time()
        con.sql(oracle).fetchall()
        duck = time.time() - t0

        print(f"| {n:,} | {n_spans:,} | {wall:.1f} | {shuf} | {duck:.1f} | {mism} |")
        assert mism == 0, mism


if __name__ == "__main__":
    main()
