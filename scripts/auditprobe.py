"""Round-8 audit queries at volume: q219 span attribution, q222
quality x dup calibration, q224 incremental-ingest delta — closed-form
planted fixtures, distributed mismatch checks (zero result rows pulled
to the driver for the big frames), and shuffle B/row columns (the
constant-per-row claim is the 100 TB argument).

One synthetic corpus serves all three. Docs have 48 alpha-only words
(no digits/punct -> quality score exactly 1.0 -> bucket 4), planted
per decade of doc_ids (n a multiple of 10, n >= 1000 so the punct
docs' span df blows past q219's attribution cap):

- i%10==0: unique words W(i)
- i%10==1: "zz<alpha(i)>" + full text of doc i-1  (shifted near-copy:
           42 spans, 41 shared with doc i-1)
- i%10==2: unique words
- i%10==3: EXACT copy of doc i-1's text            (corpus->batch dup)
- i%10==4: 48 x "!!!" (identical across decades -> quality bucket 1:
           punct cap 0.4 + short-doc penalty 0.3, since the WORD-regex
           token counter sees zero tokens in pure punctuation,
           span df = n/10 >> q219's cap -> excluded from attribution)
- i%10==5 and 7: identical decade-local text QQ(d)  (in-batch dup pair)
- i%10==6, 8, 9: unique words

Closed forms:
- q219: rows exactly for i%10 in {0,1,2,3,5,7}; partner = the planted
  twin; shared_spans = 41 everywhere. Punct docs attribute to NOTHING
  (cap). Checked distributed via an expected-partner expression.
- q222: bucket 4 = 9n/10 docs, avg dup_frac = (5 + 41/42)/9 (six of
  ten decade docs fully duplicated, the near-copy 41/42, three clean);
  bucket 1 = n/10 punct docs at dup_frac 1.0. 2-row closed-form.
- q224: batch (odd ids) classifies as dup_vs_corpus n/10 (i%10==3),
  dup_in_batch n/10 (i%10==7), novel 3n/10 (1, 5, 9). 3-row closed
  form. (Doc i%10==1's text is PREFIXED, so exact-hash ingest sees it
  as novel — the span-level q219/q207 see through the shift; that
  contrast is the point of having both.)

Usage: python scripts/auditprobe.py [n_docs...]  (default 200000 1000000)
Prints markdown rows for BASELINE.md §5.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from batch_process_spark.session import get_spark
from scripts.scaleprobe import fmt_shuffle, shuffle_delta, shuffle_write_bytes

WORDS = 48
SPAN = 8


def _alpha(i: int) -> str:
    s = ""
    i = int(i)
    while True:
        s = chr(ord("a") + i % 26) + s
        i //= 26
        if i == 0:
            return s


def synth(spark, n: int, path: str) -> None:
    assert n % 10 == 0 and n >= 1000

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                r = i % 10
                base = lambda k: " ".join(
                    f"w{_alpha(k)}x{_alpha(j)}" for j in range(WORDS)
                )
                if r == 1:
                    rows.append((i, f"zz{_alpha(i)} " + base(i - 1)))
                elif r == 3:
                    rows.append((i, base(i - 1)))
                elif r == 4:
                    rows.append((i, " ".join(["!!!"] * WORDS)))
                elif r in (5, 7):
                    d = i // 10
                    rows.append((i, " ".join(
                        f"qq{_alpha(d)}x{_alpha(j)}" for j in range(WORDS)
                    )))
                else:
                    rows.append((i, base(i)))
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
    out.write.format("noop").mode("overwrite").save()  # warm
    # timed window covers ONE steady execution (the noop save); the
    # closed-form checks re-execute the query and are kept OUTSIDE the
    # wall and shuffle deltas (earlier draft double-counted them)
    sb0 = shuffle_write_bytes(port)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    shuf = fmt_shuffle(shuffle_delta(sb0, shuffle_write_bytes(port)), n_spans(n))
    r = F.col("doc_a") % 10
    partner = (
        F.when(r == 0, F.col("doc_a") + 1)
        .when(r == 1, F.col("doc_a") - 1)
        .when(r == 2, F.col("doc_a") + 1)
        .when(r == 3, F.col("doc_a") - 1)
        .when(r == 5, F.col("doc_a") + 2)
        .when(r == 7, F.col("doc_a") - 2)
    )
    bad = out.filter(
        partner.isNull()
        | (F.col("attributed_to") != partner)
        | (F.col("shared_spans") != 41)
    ).count()
    n_rows = out.count()
    ok = bad == 0 and n_rows == 6 * n // 10
    return f"| q219 | {n:,} | {wall:.1f} | {shuf} | {bad}+{abs(n_rows - 6*n//10)} |", ok


def n_spans(n: int) -> int:
    # every doc has 41 spans except i%10==1 (42)
    return n * (WORDS - SPAN + 1) + n // 10


def probe_q222(spark, q, n: int, path: str, port: int):
    out = q(spark, path)
    out.write.format("noop").mode("overwrite").save()
    sb0 = shuffle_write_bytes(port)
    t0 = time.time()
    rows = {r["q_bucket"]: r for r in out.collect()}  # 2 rows, ONE execution
    wall = time.time() - t0
    shuf = fmt_shuffle(shuffle_delta(sb0, shuffle_write_bytes(port)), n)
    exp4 = math.floor((5 + 41 / 42) / 9 * 1_000_000 + 0.5) / 1_000_000
    ok = (
        set(rows) == {1, 4}
        and rows[4]["n_docs"] == 9 * n // 10
        and rows[1]["n_docs"] == n // 10
        and rows[1]["avg_dup_frac"] == 1.0
        and rows[4]["avg_dup_frac"] == exp4
    )
    return f"| q222 | {n:,} | {wall:.1f} | {shuf} | {0 if ok else rows} |", ok


def probe_q224(spark, q, n: int, path: str, port: int):
    out = q(spark, path)
    out.write.format("noop").mode("overwrite").save()
    sb0 = shuffle_write_bytes(port)
    t0 = time.time()
    rows = {r["ingest_class"]: r["n_docs"] for r in out.collect()}
    wall = time.time() - t0
    # per-row unit: batch docs (n/2)
    shuf = fmt_shuffle(shuffle_delta(sb0, shuffle_write_bytes(port)), n // 2)
    want = {"dup_vs_corpus": n // 10, "dup_in_batch": n // 10, "novel": 3 * n // 10}
    ok = rows == want
    return f"| q224 | {n:,} | {wall:.1f} | {shuf} | {0 if ok else rows} |", ok


def probe_q247(spark, q, n: int, path: str, port: int):
    """Planted containment closed form: per decade, doc 10d is fully
    contained in the prefix-copy 10d+1 (41/41 spans), the prefix-copy
    conversely holds 41/42 (~0.97619) of its spans in the base, the
    exact copy 10d+3 <-> 10d+2 and in-batch twins 10d+5 <-> 10d+7 are
    1.0 both ways; punct docs have 1 distinct span (below MIN_SPANS)
    and a df above the cap — never emitted. 6 rows per decade."""
    out = q(spark, path)
    out.write.format("noop").mode("overwrite").save()
    sb0 = shuffle_write_bytes(port)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    shuf = fmt_shuffle(shuffle_delta(sb0, shuffle_write_bytes(port)), n_spans(n))
    r = F.col("contained") % 10
    partner = (
        F.when(r == 0, F.col("contained") + 1)
        .when(r == 1, F.col("contained") - 1)
        .when(r == 2, F.col("contained") + 1)
        .when(r == 3, F.col("contained") - 1)
        .when(r == 5, F.col("contained") + 2)
        .when(r == 7, F.col("contained") - 2)
    )
    exp_cont = F.when(r == 1, F.lit(0.97619)).otherwise(F.lit(1.0))
    bad = out.filter(
        partner.isNull()
        | (F.col("container") != partner)
        | (F.col("containment") != exp_cont)
    ).count()
    n_rows = out.count()
    ok = bad == 0 and n_rows == 6 * n // 10
    return f"| q247 | {n:,} | {wall:.1f} | {shuf} | {bad}+{abs(n_rows - 6*n//10)} |", ok


def main() -> None:
    import __spark_entry__ as entry

    sizes = [int(float(s)) for s in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_spark("auditprobe", extra_conf={"spark.ui.enabled": "true"})
    port = int((spark.sparkContext.uiWebUrl or ":4040").rsplit(":", 1)[1])
    qs = entry.queries()
    oracles = entry.oracle_sql()
    print("| query | n_docs | spark wall (s) | shuffle MB | B/row | mismatches |")
    print("|---|---|---|---|---|---|")
    all_ok = True
    for n in sizes:
        path = f"/tmp/auditprobe_{n}"
        synth(spark, n, path)
        for name, probe in (
            ("q219_span_attribution", probe_q219),
            ("q222_quality_dup_calibration", probe_q222),
            ("q224_ingest_dedup_delta", probe_q224),
            ("q247_span_containment", probe_q247),
        ):
            line, ok = probe(spark, qs[name], n, path, port)
            print(line)
            all_ok = all_ok and ok
        # duckdb twin walls, for the same-host comparison column
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{path}/documents.parquet/*.parquet'"
        )
        for name in ("q219_span_attribution", "q222_quality_dup_calibration",
                     "q224_ingest_dedup_delta", "q247_span_containment"):
            t0 = time.time()
            con.sql(oracles[name]).fetchall()
            print(f"|   duckdb {name.split('_')[0]} | {n:,} | {time.time()-t0:.1f} | | | |")
        con.close()
    assert all_ok, "closed-form mismatch — see rows above"


if __name__ == "__main__":
    main()
