"""grid_radius_join (operators/spatial.py) + the q162/q163 rewrites.

The load-bearing property for the grid join is COMPLETENESS across
cell boundaries: a qualifying pair whose points land in different grid
cells must still be found (that is exactly what the 3x3 neighbor
explode buys), and each qualifying pair must appear exactly once (no
dedup pass exists to hide double-matches). CUSUM's window rewrite and
the autocorrelation sums are checked against plain-Python recursions.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.spatial import grid_radius_join


def _pairs(spark, pts, radius):
    df = spark.createDataFrame(pts, "id long, y long, x long")
    out = grid_radius_join(df, df, "y", "x", radius=radius)
    got = out.filter(F.col("id") < F.col("id_r")).select("id", "id_r").collect()
    return sorted((r["id"], r["id_r"]) for r in got)


def _brute(pts, radius):
    r2 = radius * radius
    out = []
    for i, (ia, ya, xa) in enumerate(pts):
        for ib, yb, xb in pts[i + 1 :]:
            if (ya - yb) ** 2 + (xa - xb) ** 2 < r2:
                out.append((min(ia, ib), max(ia, ib)))
    return sorted(out)


def test_cross_cell_pair_found(spark):
    # radius 10 -> cells of side 10; points at x=9 and x=11 sit in
    # DIFFERENT cells but are 2 apart: only the neighbor explode finds them
    pts = [(1, 0, 9), (2, 0, 11)]
    assert _pairs(spark, pts, 10) == [(1, 2)]


def test_far_pair_excluded_and_boundary_strict(spark):
    # dist exactly == radius is excluded (strict <): (0,0) vs (0,10), r=10
    pts = [(1, 0, 0), (2, 0, 10), (3, 500, 500)]
    assert _pairs(spark, pts, 10) == []


def test_no_duplicate_candidates(spark):
    # two points in the SAME cell: the pair must appear exactly once even
    # though the right side is replicated to 9 cells
    df = spark.createDataFrame([(1, 3, 3), (2, 4, 4)], "id long, y long, x long")
    out = grid_radius_join(df, df, "y", "x", radius=10)
    rows = out.filter(F.col("id") < F.col("id_r")).collect()
    assert len(rows) == 1


def test_matches_brute_force_random(spark):
    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 400), rng.randrange(0, 400)) for i in range(120)]
    assert _pairs(spark, pts, 37) == _brute(pts, 37)


def test_q162_rewrite_equals_recursion(spark):
    # S_i = max(0, S_{i-1} + d_i)  ==  C_i - min(0, running_min(C_i))
    rng = random.Random(3)
    ds = [rng.randrange(-50, 51) for _ in range(200)]
    s, c, mn, best = 0, 0, 0, []
    for d in ds:
        s = max(0, s + d)
        c += d
        mn = min(mn, c)
        best.append((s, c - min(0, mn)))
    assert all(a == b for a, b in best)


def test_q163_autocorr_matches_definition(spark):
    # exact-integer computational formula == definition-form Pearson r
    rng = random.Random(11)
    xs = [rng.randrange(0, 1000) for _ in range(40)]
    pairs = list(zip(xs[1:], xs[:-1]))
    n = len(pairs)
    sx = sum(a for a, _ in pairs)
    sy = sum(b for _, b in pairs)
    sxy = sum(a * b for a, b in pairs)
    sxx = sum(a * a for a, _ in pairs)
    syy = sum(b * b for _, b in pairs)
    num = n * sxy - sx * sy
    den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    got = num / den
    mx = sx / n
    my = sy / n
    ref = sum((a - mx) * (b - my) for a, b in pairs) / math.sqrt(
        sum((a - mx) ** 2 for a, _ in pairs) * sum((b - my) ** 2 for _, b in pairs)
    )
    assert got == pytest.approx(ref, abs=1e-12)


def test_q164_pointer_doubling_resolves_all_depths(spark):
    # depth up to 4 at a 5-digit key: 3 doubling rounds (2^3=8) must
    # resolve every node to a single-digit root with depth = digits-1
    import batch_process_spark.queries_ext10 as x

    out = {
        r["p_partkey"]: (r["root"], r["depth"])
        for r in x.q164_hierarchy_flatten(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(out) > 0
    for k, (root, depth) in out.items():
        s = str(k)
        assert root == int(s[0])
        assert depth == len(s) - 1


def test_q165_split_leakage_nonvacuous(spark):
    # the naive per-doc split must actually leak pairs on real data and
    # the group split must leak ZERO — if n_pairs or naive_cross is 0
    # the query proves nothing
    import batch_process_spark.queries_ext10 as x

    rows = {
        r["strategy"]: r
        for r in x.q165_leakage_safe_split(spark, "/root/testdata/sf0.01").collect()
    }
    assert rows["naive_by_doc"]["n_pairs"] > 0
    assert rows["naive_by_doc"]["cross_split_pairs"] > 0
    assert rows["group_by_fingerprint"]["cross_split_pairs"] == 0
    for r in rows.values():
        assert r["n_train"] > 0 and r["n_eval"] > 0


def test_q166_coefficient_bounds_and_triangle_consistency(spark):
    # coefficient in [0, 1e6]; a node with n_tri > 0 needs degree >= 2
    # and coefficient > 0
    import batch_process_spark.queries_ext10 as x

    rows = x.q166_clustering_coefficient(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["coef_micro"] <= 1_000_000
        assert r["degree"] >= 2
        if r["n_tri"] > 0:
            assert r["coef_micro"] > 0


def test_q167_benford_totals_and_digit_domain(spark):
    import batch_process_spark.queries_ext10 as x

    rows = x.q167_benford_audit(spark, "/root/testdata/sf0.01").collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set("123456789")
    # observed ppm-x-total sums to exactly total * 1e6 == sum(n) * 1e6
    total = sum(r["n"] for r in rows)
    assert sum(r["observed_ppm_x_total"] for r in rows) == total * 1_000_000
    for r in rows:
        assert r["expected_ppm_x_total"] > 0


def test_udtf_sentence_split_multi_sentence(spark):
    from batch_process_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM sentence_split('Hello there. How are you? Fine!')"
    ).collect()
    assert [(r["idx"], r["sentence"], r["n_tokens"]) for r in rows] == [
        (0, "Hello there.", 2),
        (1, "How are you?", 3),
        (2, "Fine!", 1),
    ]


def test_udtf_token_windows_stride_and_tail(spark):
    from batch_process_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    text = " ".join(f"t{i}" for i in range(20))  # 20 tokens, width 16 stride 8
    rows = spark.sql(
        f"SELECT * FROM token_windows('{text}', 16, 8)"
    ).collect()
    got = [(r["idx"], r["n_tokens"]) for r in rows]
    assert got == [(0, 16), (1, 12), (2, 4)]  # starts 0, 8, 16
    assert rows[2]["window"] == "t16 t17 t18 t19"
    # NULL text and degenerate stride/width emit nothing (a zero or
    # negative width used to yield one empty-window row per stride)
    assert spark.sql("SELECT * FROM token_windows(CAST(NULL AS STRING), 16, 8)").count() == 0
    assert spark.sql("SELECT * FROM token_windows('a b', 4, 0)").count() == 0
    assert spark.sql("SELECT * FROM token_windows('a b', 0, 1)").count() == 0
    assert spark.sql("SELECT * FROM token_windows('a b', -3, 1)").count() == 0


def test_residual_distance_is_long_typed(spark):
    """INT-typed coordinates with a radius past 23170 would wrap the
    int32 square (ANSI off) and ADMIT far pairs; the residual must
    compute in long. Points ~59k apart, radius 30k, int columns."""
    from batch_process_spark.operators.spatial import grid_radius_join

    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 59000)], "id int, y int, x int"
    ).select("id", F.col("y").cast("int"), F.col("x").cast("int"))
    joined = grid_radius_join(pts, pts, "y", "x", radius=30000)
    out = joined.filter(F.col("id") < F.col("id_r")).collect()
    assert out == []  # 59000 > 30000: the wrapped square would admit it
