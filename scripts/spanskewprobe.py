"""Adversarial near-cap skew probe for the span pair joins (q219/q247).

The df-cap (document frequency <= 10) bounds the pair joins' fan-out,
but the WORST admissible corpus sits exactly AT the cap: every span in
exactly df = 10 documents contributes df x (df-1) = 90 pair rows — the
maximum the filter lets through. This probe plants that corpus:
n/10 groups of 10 IDENTICAL documents (48 words, 41 distinct 8-word
spans each, no cross-group span collisions), so EVERY span survives
the cap filter at maximal fan-out:

    pair rows = n/10 groups x 41 spans x 90 = 36.9 x n

and verifies both queries' closed forms distributed:
  - q219: every doc attributed to the LOWEST other id in its group
    with shared_spans = 41 (n rows);
  - q247: every ordered in-group pair emitted with containment 1.0
    (9n rows, shared = n_spans = 41).

What the probe claims: wall and shuffle grow LINEARLY in n (the cap
turns the quadratic pair join into cap x span-instances), even when
every hash sits at the cap. If this ever goes superlinear, the fix is
salting the h-join or AQE skew splitting — note it here.

Usage: python scripts/spanskewprobe.py [sizes...] (default 200000 1000000)
Prints markdown rows for BASELINE.md §5; DuckDB twin runs at the
smallest size only (its pair stream is the same 36.9n rows).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from batch_process_spark.session import get_spark
from scripts.auditprobe import WORDS, _alpha
from scripts.scaleprobe import fmt_shuffle, shuffle_delta, shuffle_write_bytes

SPANS_PER_DOC = WORDS - 8 + 1  # 41
GROUP = 10  # = _ATTR_DF_CAP = _CONT_DF_CAP: every span exactly AT the cap


def synth_nearcap(spark, n: int, path: str) -> None:
    assert n % GROUP == 0

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                g = i // GROUP
                rows.append((i, " ".join(
                    f"g{_alpha(g)}x{_alpha(j)}" for j in range(WORDS)
                )))
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="doc_id long, text string")
        .write.mode("overwrite")
        .parquet(f"{path}/documents.parquet")
    )


def probe_q219(spark, q, n: int, path: str, port: int):
    out = q(spark, path)
    out.write.format("noop").mode("overwrite").save()  # warm codegen
    sb0 = shuffle_write_bytes(port)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    shuf = fmt_shuffle(shuffle_delta(sb0, shuffle_write_bytes(port)), n)
    base = (F.col("doc_a") / GROUP).cast("long") * GROUP
    want = F.when(F.col("doc_a") % GROUP == 0, base + 1).otherwise(base)
    bad = out.filter(
        (F.col("attributed_to") != want)
        | (F.col("shared_spans") != SPANS_PER_DOC)
    ).count()
    rows = out.count()
    ok = bad == 0 and rows == n
    return (f"| q219 | {n:,} | {wall:.1f} | {shuf} | "
            f"{bad}+{abs(rows - n)} |"), ok


def probe_q247(spark, q, n: int, path: str, port: int):
    out = q(spark, path)
    out.write.format("noop").mode("overwrite").save()
    sb0 = shuffle_write_bytes(port)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    shuf = fmt_shuffle(shuffle_delta(sb0, shuffle_write_bytes(port)), n)
    bad = out.filter(
        (F.col("containment") != 1.0)
        | (F.col("shared_spans") != SPANS_PER_DOC)
        | (F.col("n_spans") != SPANS_PER_DOC)
        | ((F.col("contained") / GROUP).cast("long")
           != (F.col("container") / GROUP).cast("long"))
    ).count()
    rows = out.count()
    ok = bad == 0 and rows == (GROUP - 1) * n
    return (f"| q247 | {n:,} | {wall:.1f} | {shuf} | "
            f"{bad}+{abs(rows - (GROUP - 1) * n)} |"), ok


def main() -> None:
    import __spark_entry__ as entry

    sizes = [int(float(s)) for s in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_spark("spanskewprobe", extra_conf={"spark.ui.enabled": "true"})
    port = int((spark.sparkContext.uiWebUrl or ":4040").rsplit(":", 1)[1])
    qs = entry.queries()
    oracles = entry.oracle_sql()
    print(f"near-cap corpus: groups of {GROUP} identical docs; every span "
          f"df = {GROUP} (AT the cap) -> {36.9:.1f} pair rows per doc")
    print("| query | n_docs | spark wall (s) | shuffle MB | B/doc | mismatches |")
    print("|---|---|---|---|---|---|")
    all_ok = True
    for n in sizes:
        path = f"/tmp/spanskew_{n}"
        synth_nearcap(spark, n, path)
        for name, probe in (
            ("q219_span_attribution", probe_q219),
            ("q247_span_containment", probe_q247),
        ):
            line, ok = probe(spark, qs[name], n, path, port)
            print(line)
            all_ok = all_ok and ok
    # DuckDB twins at the smallest size (same-host wall reference)
    n0 = sizes[0]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'/tmp/spanskew_{n0}/documents.parquet/*.parquet'")
    for name in ("q219_span_attribution", "q247_span_containment"):
        t0 = time.time()
        con.sql(oracles[name]).fetchall()
        print(f"|   duckdb {name.split('_')[0]} | {n0:,} | "
              f"{time.time() - t0:.1f} | | | |")
    con.close()
    assert all_ok, "closed-form mismatch — see rows above"


if __name__ == "__main__":
    main()
