"""Semantics tests for the part-10 query catalog (q137-q140):
time-series resampling. Oracle hash-matching covers values; these pin
the structural properties — dense spines, carry-forward correctness,
cross-grain conservation."""

from datetime import date, timedelta

from batch_process_spark.queries import QUERIES, _t
import batch_process_spark.queries_ext9  # noqa: F401  (registers q137+)

SF = "/root/testdata/sf0.001"


def test_q137_spine_is_dense_and_locf_correct(spark):
    """Per user: days form a contiguous range (no holes, no dups —
    the defining gap-fill property), days_since_last == 0 exactly on
    active days, and the carried value equals a pure-Python forward
    fill over the same rows."""
    rows = QUERIES["q137_gap_fill_daily"](spark, SF).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    gaps_seen = False
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        days = [date.fromisoformat(r["day"]) for r in rs]
        assert days == [days[0] + timedelta(days=i) for i in range(len(days))], uid
        carried = None
        last_active = None
        for r, d in zip(rs, days):
            assert (r["days_since_last"] == 0) == (r["active"] == 1)
            if r["active"] == 1:
                # >= 0, not > 0: a day whose only event has value 0.0
                # is legitimately active with zero cents
                assert r["day_cents"] >= 0
                carried, last_active = r["day_cents"], d
            else:
                gaps_seen = True
                assert r["day_cents"] == 0
            assert r["locf_cents"] == carried, (uid, r["day"])
            assert r["days_since_last"] == (d - last_active).days
    assert gaps_seen, "fixture produced no gaps — the fill path is unexercised"


def test_q138_grains_conserve_totals(spark):
    """Every grain partitions the same events: counts and cent totals
    must be identical across day, week, and month rollups, and week
    buckets must be Mondays / month buckets firsts-of-month."""
    rows = QUERIES["q138_calendar_rollup"](spark, SF).collect()
    by_grain: dict = {}
    for r in rows:
        g = by_grain.setdefault(r["grain"], {"n": 0, "cents": 0, "buckets": []})
        g["n"] += r["n_events"]
        g["cents"] += r["total_cents"]
        g["buckets"].append(r["bucket_start"])
    assert set(by_grain) == {"day", "week", "month"}
    totals = {(g["n"], g["cents"]) for g in by_grain.values()}
    assert len(totals) == 1, "grains disagree on the underlying events"
    for b in by_grain["week"]["buckets"]:
        assert date.fromisoformat(b[:10]).weekday() == 0, b  # Monday
    for b in by_grain["month"]["buckets"]:
        assert b[8:10] == "01", b
    assert len(by_grain["day"]["buckets"]) >= len(by_grain["week"]["buckets"]) >= len(
        by_grain["month"]["buckets"]
    )


def test_q139_matches_python_integer_pagerank(spark):
    """Pure-Python recompute of the integer PageRank: identical edge
    weights, identical (r*w)//out and (s*85)//100 arithmetic — the
    distributed iterations must agree EXACTLY (there are no floats to
    diverge on), and ranks must actually differentiate nations."""
    from pyspark.sql import functions as F

    from batch_process_spark.queries import _t

    got = {
        r["nation"]: r["rank_micro"]
        for r in QUERIES["q139_pagerank_trade"](spark, SF).collect()
    }

    li = _t(spark, SF, "lineitem")
    orders = _t(spark, SF, "orders")
    supp = _t(spark, SF, "supplier")
    cust = _t(spark, SF, "customer")
    nation = _t(spark, SF, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("src"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("dst"))
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, supp.s_nationkey == F.col("s_nk"))
        .join(n2, cust.c_nationkey == F.col("c_nk"))
        .groupBy("src", "dst")
        .agg(F.sum(cents).alias("w"))
        .collect()
    )
    out: dict = {}
    for e in edges:
        out[e["src"]] = out.get(e["src"], 0) + e["w"]
    nations = sorted({r["n_name"] for r in nation.select("n_name").collect()})
    n_nodes = len(nations)
    ranks = {n: 1_000_000 // n_nodes for n in nations}
    base = 1_000_000 * 15 // 100 // n_nodes
    for _ in range(3):
        sums = {n: 0 for n in nations}  # no-inbound nodes keep base rank
        for e in edges:
            sums[e["dst"]] += (ranks[e["src"]] * e["w"]) // out[e["src"]]
        ranks = {n: base + (s * 85) // 100 for n, s in sums.items()}
    assert got == ranks
    assert len(set(got.values())) > 1, "ranks failed to differentiate nations"


def test_q140_conserves_parts_and_elects_min_canonical(spark):
    """Entity resolution must not lose or double-count facts: part
    counts and retail cents sum exactly to the table totals; some
    entities must merge multiple names (non-vacuous); and within the
    result no canonical name may itself be within distance 2 of a
    SMALLER name (min-election sanity via brute-force recheck)."""
    from pyspark.sql import functions as F

    rows = QUERIES["q140_entity_resolution"](spark, SF).collect()
    parts = _t(spark, SF, "part")
    total_parts = parts.count()
    total_cents = parts.select(
        F.sum(F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long"))
    ).collect()[0][0]
    assert sum(r["n_parts"] for r in rows) == total_parts
    assert sum(r["retail_cents"] for r in rows) == total_cents
    assert any(r["n_names"] > 1 for r in rows), "no fuzzy merges — vacuous"
    assert sum(r["n_names"] for r in rows) == parts.select("p_name").distinct().count()

    # min-election recheck: if a canonical name had a SMALLER name
    # within distance 2, that name is in the same component and the
    # canonical could not be the minimum
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    all_names = sorted(r["p_name"] for r in parts.select("p_name").distinct().collect())
    for r in rows:
        c = r["canonical_name"]
        for s in all_names:
            if s >= c:
                break
            assert lev(s, c) > 2, (c, s, "canonical is not its component's minimum")


def test_q149_triangle_math_exact(spark):
    """Triangle counting on a hand-built graph with known answers: a
    4-clique (4 triangles, each node in 3) plus a pendant edge (no
    triangles) — validates canonical-order enumeration counts each
    triangle exactly once and per-node participation is right."""
    from pyspark.sql import functions as F

    # orders: one per edge of K4 {1,2,3,4} + pendant edge {4,9}
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)]
    rows = []
    for o, (a, b) in enumerate(edges):
        rows += [(o, a), (o, b)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    e = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
        .join(b, "o").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    e2 = e.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = e.join(e2, "v").select("u", "v", "w").join(
        e.select(F.col("u").alias("u"), F.col("v").alias("w")), ["u", "w"], "left_semi"
    )
    assert tri.count() == 4  # C(4,3) triangles in K4, none through node 9
    per = {
        r["p"]: r["n"]
        for r in tri.select(F.explode(F.array("u", "v", "w")).alias("p"))
        .groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {1: 3, 2: 3, 3: 3, 4: 3}  # node 9 absent
