"""Round-7 operator scale probes: BM25, wedge/triangle counting, and
pointer-doubling hierarchy flattening at >=1M input rows.

The bench-scale catalog proves these CORRECT; this probe answers the
100 TB question the round-6 verdict asked for each family:

- **BM25** (q152 / ``operators/text.py::bm25_topk``): is the corpus
  stage really map-only — does shuffle stay at the per-(doc,term) hit
  granularity (bytes/doc constant, never token-granularity)?
- **Triangles** (q149/q166 / ``operators/graph.py::wedge_join``): how
  many bytes cross the shuffle per EDGE, and does the salted variant
  keep the same output while spreading hub cells?
- **Pointer doubling** (q164): ceil(log2(depth)) self-joins vs the
  naive depth-many parent-table joins — rounds AND wall, measured.

Inputs are generated DISTRIBUTED (spark.range — no driver lists) with
closed-form expected outputs; correctness is checked as a distributed
mismatch COUNT (zero rows to the driver). Shuffle write bytes come
from the REST status API (UI enabled for the probe session only).
DuckDB twins run the identical formulation on the identical generated
input for wall-clock context.

Usage: python scripts/opprobe.py [n_docs] [n_cliques] [n_nodes]
Defaults: 1_000_000 docs, 2_300 cliques (~1.0M edges), 4_000_000 nodes.
Prints markdown rows for BASELINE.md §5j.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_process_spark.operators.hierarchy import (
    flatten_per_level,
    flatten_pointer_doubling,
)
from batch_process_spark.operators.text import bm25_topk
from batch_process_spark.session import get_spark
from scripts.scaleprobe import fmt_shuffle, shuffle_delta, shuffle_write_bytes

CLIQUE = 30  # nodes per clique; C(30,2)=435 edges, C(30,3)=4060 triangles


def t_spark(build) -> float:
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def timed2(build, gc):
    """(cold s, steady s, steady shuffle bytes) — same discipline as
    scaleprobe.timed2: min-of-2 steady rejects GC-pause outliers, the
    shuffle delta brackets exactly one steady run."""
    t1 = t_spark(build)
    gc()
    sb0 = shuffle_write_bytes()
    t2a = t_spark(build)
    sb = shuffle_delta(sb0, shuffle_write_bytes())
    gc()
    t2b = t_spark(build)
    return t1, min(t2a, t2b), sb


# ---------------------------------------------------------------------------
# synthetic corpora (Spark + DuckDB build the IDENTICAL rows)
# ---------------------------------------------------------------------------


def synth_docs(spark, n: int):
    """Doc i: 'spark' x(i%4), 'table' x(i%3), 'hash' x(i%2), filler
    x(5 + i%7) — every BM25 code path (absent term, tf>1, varying dl)
    exercised, all generated map-side.

    doc_id is ``id * 2``, NOT ``id``: a bare alias of range's id lets
    Catalyst prove the per-doc aggregation's clustering requirement
    from range's own partitioning and elide the exchange entirely —
    0 shuffle bytes that a real (parquet-backed) corpus would never
    see. The expression breaks the alias so the probe measures the
    operator's true per-doc exchange."""
    rep = lambda w, m: F.expr(f"repeat('{w} ', CAST(id % {m} AS INT))")
    pad = F.expr("repeat('pad ', CAST(5 + id % 7 AS INT))")
    return spark.range(n).select(
        (F.col("id") * 2).alias("doc_id"),
        F.concat(rep("spark", 4), rep("table", 3), rep("hash", 2), pad).alias("text"),
    )


DOCS_SQL = """
SELECT range * 2 AS doc_id,
       repeat('spark ', CAST(range % 4 AS INT)) || repeat('table ', CAST(range % 3 AS INT))
       || repeat('hash ', CAST(range % 2 AS INT)) || repeat('pad ', CAST(5 + range % 7 AS INT)) AS text
FROM range({n})
"""

BM25_SQL = """
WITH docs AS ({docs}),
base AS (
  SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x != '')) AS dl FROM docs
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
t2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM docs),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM t2 WHERE token IN ('spark', 'table', 'hash') GROUP BY doc_id, token
),
df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * base.dl / stats.avgdl)) AS c
  FROM tf JOIN base ON tf.doc_id = base.doc_id CROSS JOIN stats JOIN df ON tf.token = df.token
)
SELECT doc_id, round(sum(c), 6) AS score FROM scored
GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20
"""


def synth_edges(spark, n_cliques: int):
    """Disjoint ``CLIQUE``-node cliques: clique g owns nodes
    [g*CLIQUE, (g+1)*CLIQUE); every in-clique pair is an edge. Each
    node closes exactly C(CLIQUE-1, 2) triangles — the closed form the
    mismatch count checks."""
    c = CLIQUE
    return (
        spark.range(n_cliques * c * c)
        .select(
            (F.col("id") / (c * c)).cast("long").alias("g"),
            ((F.col("id") / c) % c).cast("long").alias("i"),
            (F.col("id") % c).alias("j"),
        )
        .filter(F.col("i") < F.col("j"))
        .select(
            (F.col("g") * c + F.col("i")).alias("u"),
            (F.col("g") * c + F.col("j")).alias("v"),
        )
    )


EDGES_SQL = f"""
SELECT g.range * {CLIQUE} + i.range AS u, g.range * {CLIQUE} + j.range AS v
FROM range({{k}}) g, range({CLIQUE}) i, range({CLIQUE}) j
WHERE i.range < j.range
"""

TRI_SQL = """
WITH edges AS ({edges}),
tri AS (
  SELECT e1.u, e1.v, e2.v AS w
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT part, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest([u, v, w]) AS part FROM tri)
GROUP BY part
"""


def triangles_per_node(edges, salt_buckets: int = 1):
    # the probe measures the ENGINE's operator, not a re-implementation
    from batch_process_spark.operators.graph import triangles_per_node as _tpn

    return _tpn(edges, salt_buckets=salt_buckets, count_col="n")


def synth_parents(spark, n: int):
    """Binary hierarchy over nodes 1..n: parent(k) = k div 2, root 1
    (self-loop, dist 0). depth(k) = len(bin(k)) - 1 — the closed form
    the mismatch count checks, never used by either algorithm."""
    return spark.range(1, n + 1).select(
        F.col("id").alias("node"),
        F.when(F.col("id") == 1, F.lit(1))
        .otherwise(F.floor(F.col("id") / 2))
        .cast("long")
        .alias("parent"),
    )




def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_cliques = int(sys.argv[2]) if len(sys.argv) > 2 else 2_300
    n_nodes = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000
    spark = get_spark("opprobe", extra_conf={"spark.ui.enabled": "true"})
    con = duckdb.connect()

    def gc():
        try:
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
        except Exception:
            pass

    import contextlib

    @contextlib.contextmanager
    def no_broadcast():
        """The forced-shuffle pass: the session's 64 MB broadcast cap
        lets local-mode plans broadcast frames (4M-row hop tables,
        1M-row edge sets) that could NEVER broadcast at the 100 TB
        target — with it on, shuffle B/row reads 0 and answers nothing.
        Each op therefore measures twice: default conf (the plan AQE
        actually picks at this size, for wall/ratio) and broadcast
        disabled (the at-scale shuffle shape, for B/row)."""
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)

    def timed_both(build):
        """(cold, steady) under default conf + (steady, shuffle bytes)
        under forced shuffle."""
        t1, t2, _ = timed2(build, gc)
        with no_broadcast():
            _, t2s, sb = timed2(build, gc)
        return t1, t2, t2s, sb

    print("| op | input rows | Spark cold (s) | Spark steady (s) | steady no-bcast (s) | DuckDB (s) | ratio | shuffle MB | shuffle B/row | mismatches |")
    print("|---|---|---|---|---|---|---|---|---|---|")

    # ---- BM25 -------------------------------------------------------
    docs = synth_docs(spark, n_docs)
    t1, t2, t2s, sb = timed_both(
        lambda: bm25_topk(docs, ("spark", "table", "hash"))
    )
    t0 = time.time()
    con.sql(BM25_SQL.format(docs=DOCS_SQL.format(n=n_docs))).fetchall()
    d = time.time() - t0
    # sanity: top-20 present, scores finite (ranking itself is
    # oracle-proved at catalog scale by q152)
    top = bm25_topk(docs, ("spark", "table", "hash")).collect()
    ok = len(top) == 20 and all(r["score"] is not None for r in top)
    print(
        f"| bm25_topk | {n_docs} | {t1:.2f} | {t2:.2f} | {t2s:.2f} | {d:.2f} | "
        f"{min(t1, t2)/d:.2f}x | {fmt_shuffle(sb, n_docs)} | {0 if ok else 'TOP20-BROKEN'} |"
    )

    # ---- triangles --------------------------------------------------
    from math import comb

    edges = synth_edges(spark, n_cliques).persist()
    n_edges = edges.count()
    expect = comb(CLIQUE - 1, 2)

    for label, buckets in (("triangle_count", 1), ("triangle_count salted x8", 8)):
        t1, t2, t2s, sb = timed_both(lambda b=buckets: triangles_per_node(edges, b))
        mism = (
            triangles_per_node(edges, buckets)
            .filter(F.col("n") != expect)
            .count()
        )
        if buckets == 1:
            t0 = time.time()
            con.sql(TRI_SQL.format(edges=EDGES_SQL.format(k=n_cliques))).fetchall()
            d = time.time() - t0
            dcell, rcell = f"{d:.2f}", f"{min(t1, t2)/d:.2f}x"
        else:
            dcell, rcell = "—", "—"
        print(
            f"| {label} | {n_edges} | {t1:.2f} | {t2:.2f} | {t2s:.2f} | {dcell} | {rcell} | "
            f"{fmt_shuffle(sb, n_edges)} | {mism} |"
        )
    edges.unpersist()

    # ---- PageRank ---------------------------------------------------
    # symmetric regular graph (disjoint cliques): uniform rank is the
    # exact fixpoint, so rank * N rounds to 1.0 for EVERY node — the
    # closed form the mismatch count checks after 5 real iterations.
    from batch_process_spark.operators.graph import pagerank

    sym = synth_edges(spark, n_cliques)
    sym = sym.unionByName(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    n_dir_edges = sym.count()

    def pr():
        return pagerank(sym, iters=5)

    t1, t2, t2s, sb = timed_both(pr)
    nn = float(n_cliques * CLIQUE)
    mism = pr().filter(F.round(F.col("rank") * nn, 6) != 1.0).count()
    print(
        f"| pagerank 5 iters | {n_dir_edges} | {t1:.2f} | {t2:.2f} | {t2s:.2f} | — | — | "
        f"{fmt_shuffle(sb, n_dir_edges)} | {mism} |"
    )
    sym.unpersist()

    # ---- pointer doubling vs per-level ------------------------------
    depth_max = n_nodes.bit_length() - 1
    rounds = max(1, (depth_max - 1).bit_length())  # ceil(log2(depth))
    parents = synth_parents(spark, n_nodes).persist()
    parents.count()
    closed_root, closed_depth = F.lit(1), F.length(F.bin("node")) - 1

    def mismatches(df):
        return df.filter(
            (F.col("root") != closed_root) | (F.col("depth") != closed_depth)
        ).count()

    t1, t2, t2s, sb = timed_both(lambda: flatten_pointer_doubling(parents, rounds, checkpoint=True))
    m = mismatches(flatten_pointer_doubling(parents, rounds, checkpoint=True))
    t0 = time.time()
    con.sql(
        f"""WITH RECURSIVE walk(node, cur, depth) AS (
              SELECT range, range, CAST(0 AS BIGINT) FROM range(1, {n_nodes + 1})
              UNION ALL
              SELECT node, cur // 2, depth + 1 FROM walk WHERE cur > 1
            ) SELECT count(*) FROM walk WHERE cur <= 1"""
    ).fetchall()
    d = time.time() - t0
    print(
        f"| ptr_doubling ({rounds} rounds) | {n_nodes} | {t1:.2f} | {t2:.2f} | {t2s:.2f} | {d:.2f} | "
        f"{min(t1, t2)/d:.2f}x | {fmt_shuffle(sb, n_nodes)} | {m} |"
    )

    t1, t2, t2s, sb = timed_both(lambda: flatten_per_level(parents, depth_max))
    m = mismatches(flatten_per_level(parents, depth_max))
    print(
        f"| per_level ({depth_max} rounds) | {n_nodes} | {t1:.2f} | {t2:.2f} | {t2s:.2f} | — | — | "
        f"{fmt_shuffle(sb, n_nodes)} | {m} |"
    )
    parents.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
