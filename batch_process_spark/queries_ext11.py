"""Query catalog part 12 (q178-q185): ordered-window robust statistics
(rolling median, winsorized means), inequality/concentration metrics
(per-group Gini), nearest-neighbor-within-radius on the planar grid,
a one-pass pairwise correlation matrix, batch last-touch revenue
attribution via the as-of join, the Kaplan-Meier survival curve, and
CUPED-adjusted A/B lift — all exact integer arithmetic until one
final, identically-phrased double expression, per the catalog's
determinism discipline.

Reference parity: the reference's statistics surface stops at
per-group describe()-style summaries (``batch_process/analyze.py``);
everything here is "beyond the reference" in SURVEY §2's sense —
the robust/ordered statistics and attribution shapes a production
pipeline needs at the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_process_spark.queries import _q, _t
from batch_process_spark.queries_ext10 import _GRID_R, _LATTICE_SQL, customer_lattice

# ---------------------------------------------------------------------------
# q178: per-customer rolling 5-order median of order value
# ---------------------------------------------------------------------------


@_q(
    "q178_rolling_median",
    """
    WITH o AS (
      SELECT o_custkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderdate, o_orderkey
      FROM orders
    ), m AS (
      SELECT o_custkey,
             median(cents) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med
      FROM o
    )
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           min(med) AS min_roll_med, max(med) AS max_roll_med
    FROM m GROUP BY o_custkey
    """,
)
def q178_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-order median of order value per customer — the robust
    moving-centre statistic (a moving MEAN chases outliers; ops
    dashboards and anomaly baselines want the median). Spark has no
    ``median`` window function, but the exact ``percentile`` aggregate
    IS window-capable: one shuffle on ``o_custkey``, one ordered
    ROWS-frame window, no single-task WindowExec (the partition key
    carries the parallelism at any SF). Medians over integer-cents
    windows land on exact .0/.5 doubles in BOTH engines (Spark
    ``percentile`` and DuckDB ``median`` share the linear-interpolation
    definition — the q43/q177-proven identity), so the per-customer
    min/max fold compares bit-for-bit with no rounding step."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "o_orderdate",
        "o_orderkey",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    med = F.expr("percentile(cents, 0.5)").over(w)
    return (
        o.select("o_custkey", med.alias("med"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("med").alias("min_roll_med"),
            F.max("med").alias("max_roll_med"),
        )
    )


# ---------------------------------------------------------------------------
# q179: per-nation Gini coefficient of customer spend
# ---------------------------------------------------------------------------


@_q(
    "q179_gini_spend",
    """
    WITH osum AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ), spend AS (
      SELECT c.c_custkey, c.c_nationkey, coalesce(o.cents, 0) AS cents
      FROM customer c LEFT JOIN osum o ON o.o_custkey = c.c_custkey
    ), ranked AS (
      SELECT c_nationkey, cents,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY cents, c_custkey) AS BIGINT) AS i
      FROM spend
    ), agg AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(CAST(i AS DECIMAL(38,0)) * cents) AS DOUBLE) AS s_ix,
             CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s_x
      FROM ranked GROUP BY c_nationkey
    )
    SELECT c_nationkey, n_customers,
           CASE WHEN s_x = 0 THEN NULL
                ELSE floor(((2.0 * s_ix) / (n_customers * s_x)
                            - (n_customers + 1.0) / n_customers) * 1000000 + 0.5)
                     / 1000000
           END AS gini
    FROM agg
    """,
)
def q179_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer lifetime spend — the
    standard concentration metric (0 = everyone spends alike, ->1 = one
    whale), via the rank formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n
    over ascending-sorted x. Customers with no orders count as zero
    spend (a LEFT join — dropping them silently inflates equality).
    Orders pre-aggregate to per-customer sums BEFORE the join (map-side
    combine; the join input shrinks from |orders| to |buying
    customers|, and the planner is free to pick broadcast vs shuffle
    from real stats — no manual broadcast on an SF-scaling side), then
    one window ranked by (cents, custkey) — a total order, so
    row_number is deterministic — and a 25-group agg. Rank-weighted sums ride DECIMAL(38,0): i*x reaches
    ~n*max_spend and the sum adds another factor of n, past int64 at
    warehouse scale (the q163 overflow discipline). Both engines
    convert the same exact decimal to double and phrase the final Gini
    identically, so the 6-dp round cannot diverge."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    osum = orders.groupBy("o_custkey").agg(F.sum("cents").cast("long").alias("ocents"))
    spend = cust.join(osum, cust.c_custkey == osum.o_custkey, "left").select(
        "c_custkey",
        "c_nationkey",
        F.coalesce(F.col("ocents"), F.lit(0)).alias("cents"),
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    ranked = spend.select(
        "c_nationkey",
        "cents",
        F.row_number().over(w).cast("long").alias("i"),
    )
    agg = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("s_ix"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("double").alias("s_x"),
    )
    n = F.col("n_customers")
    gini = F.when(
        F.col("s_x") != 0,
        F.floor(
            ((2.0 * F.col("s_ix")) / (n * F.col("s_x")) - (n + 1.0) / n) * 1000000
            + F.lit(0.5)
        )
        / 1000000,
    )
    return agg.select("c_nationkey", "n_customers", gini.alias("gini"))


# ---------------------------------------------------------------------------
# q180: winsorized account-balance statistics per market segment
# ---------------------------------------------------------------------------


@_q(
    "q180_winsorized_stats",
    """
    WITH c AS (
      SELECT c_mktsegment, c_custkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), ranked AS (
      SELECT c_mktsegment, cents,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY cents, c_custkey) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
      FROM c
    ), th AS (
      SELECT c_mktsegment, cents, n,
             max(CASE WHEN rn = CAST(ceil(0.1 * n) AS BIGINT) THEN cents END)
               OVER (PARTITION BY c_mktsegment) AS lo,
             max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN cents END)
               OVER (PARTITION BY c_mktsegment) AS hi
      FROM ranked
    ), clipped AS (
      SELECT c_mktsegment, n,
             CASE WHEN cents < lo THEN lo
                  WHEN cents > hi THEN hi
                  ELSE cents END AS w,
             CASE WHEN cents < lo THEN 1 ELSE 0 END AS is_lo,
             CASE WHEN cents > hi THEN 1 ELSE 0 END AS is_hi
      FROM th
    )
    SELECT c_mktsegment, max(n) AS n,
           CAST(sum(is_lo) AS BIGINT) AS n_clipped_lo,
           CAST(sum(is_hi) AS BIGINT) AS n_clipped_hi,
           floor(CAST(sum(w) AS DOUBLE) / max(n) * 0.01 * 1000000 + 0.5)
             / 1000000 AS winsorized_mean
    FROM clipped GROUP BY c_mktsegment
    """,
)
def q180_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of account balance per market segment — clamp at
    the nearest-rank 10th/90th percentiles, then average: the robust
    location estimate that, unlike trimming, keeps n constant.
    Nearest-rank (value at row_number ceil(q*n) under the total order
    (cents, custkey)) rather than interpolated percentiles ON PURPOSE:
    the thresholds stay INTEGER cents, so the clamp and the sum are
    exact int64 end to end — the only double is the final
    identically-phrased mean. The thresholds propagate back as a
    SECOND window over the SAME partitioning (stacked Window nodes
    share one exchange+sort — no self-join, no second scan: one
    shuffle on the segment + the 5-group agg is the whole plan,
    guarded by the single-scan test); at 100 TB the rank window swaps
    to approx thresholds, same shape (the q177 equi-depth note)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    wseg = Window.partitionBy("c_mktsegment")
    ranked = c.select(
        "c_mktsegment",
        "cents",
        F.row_number().over(wseg.orderBy("cents", "c_custkey")).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wseg).cast("long").alias("n"),
    )
    th = ranked.select(
        "c_mktsegment",
        "cents",
        "n",
        F.max(
            F.when(F.col("rn") == F.ceil(0.1 * F.col("n")).cast("long"), F.col("cents"))
        )
        .over(wseg)
        .alias("lo"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.9 * F.col("n")).cast("long"), F.col("cents"))
        )
        .over(wseg)
        .alias("hi"),
    )
    clipped = th.select(
        "c_mktsegment",
        "n",
        F.when(F.col("cents") < F.col("lo"), F.col("lo"))
        .when(F.col("cents") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("cents"))
        .alias("w"),
        (F.col("cents") < F.col("lo")).cast("int").alias("is_lo"),
        (F.col("cents") > F.col("hi")).cast("int").alias("is_hi"),
    )
    return clipped.groupBy("c_mktsegment").agg(
        F.max("n").alias("n"),
        F.sum("is_lo").cast("long").alias("n_clipped_lo"),
        F.sum("is_hi").cast("long").alias("n_clipped_hi"),
        (
            F.floor(
                F.sum("w").cast("double") / F.max("n") * 0.01 * 1000000 + F.lit(0.5)
            )
            / 1000000
        ).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# q181: nearest neighbor within radius on the planar grid
# ---------------------------------------------------------------------------

_NN_R = _GRID_R  # q161's centi-degree radius; the shared md5 lattice


@_q(
    "q181_nn_within_radius",
    f"""
    WITH p AS ({_LATTICE_SQL}
    ), pairs AS (
      SELECT a.c_custkey AS cust, b.c_custkey AS nn,
             CAST((a.y - b.y) * (a.y - b.y)
                + (a.x - b.x) * (a.x - b.x) AS BIGINT) AS dist2
      FROM p a JOIN p b
        ON a.c_custkey <> b.c_custkey
       AND (a.y - b.y) * (a.y - b.y) + (a.x - b.x) * (a.x - b.x)
           < {_NN_R * _NN_R}
    )
    SELECT cust, nn, dist2 FROM (
      SELECT cust, nn, dist2,
             row_number() OVER (PARTITION BY cust ORDER BY dist2, nn) AS rk
      FROM pairs
    ) WHERE rk = 1
    """,
)
def q181_nn_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest neighbor per point, bounded by radius — the "closest
    depot/store/cell-tower" query. Unbounded exact NN needs expanding
    ring searches; bounding by a radius R keeps the grid join EXACT
    (every candidate within R lies in the 3x3 cell neighborhood,
    ``operators/spatial.py``) and is the semantics production actually
    wants ("nearest within 1.5 degrees, else nobody"). One hash
    equi-join on the cell id (never all-pairs; candidates bounded by
    cell density, hot cells salt via the q161 opt-in), then an argmin
    per point: a (dist2, nn) row_number window partitioned by the
    point key — deterministic because the order is total, and never
    single-task because the point key partitions it. The oracle
    brute-forces both directions of the same predicate."""
    from batch_process_spark.operators.spatial import grid_radius_join

    p = customer_lattice(_t(spark, sf_dir, "customer"))
    joined = grid_radius_join(p, p, "y", "x", radius=_NN_R)
    dy = F.col("y") - F.col("y_r")
    dx = F.col("x") - F.col("x_r")
    pairs = joined.filter(F.col("c_custkey") != F.col("c_custkey_r")).select(
        F.col("c_custkey").alias("cust"),
        F.col("c_custkey_r").alias("nn"),
        (dy * dy + dx * dx).cast("long").alias("dist2"),
    )
    w = Window.partitionBy("cust").orderBy("dist2", "nn")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


# ---------------------------------------------------------------------------
# q182: one-pass pairwise correlation matrix over lineitem metrics
# ---------------------------------------------------------------------------

#: (label, integer-scaled expression) — quantity in centi-units, price
#: in cents, discount/tax in basis points: exact int64 inputs.
_Q182_METRICS = [
    ("quantity", "l_quantity", 100),
    ("price", "l_extendedprice", 100),
    ("discount", "l_discount", 10000),
    ("tax", "l_tax", 10000),
]


def _q182_oracle() -> str:
    scaled = ", ".join(
        f"CAST(floor({col} * {s} + 0.5) AS BIGINT) AS {lbl}"
        for lbl, col, s in _Q182_METRICS
    )
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for lbl, _, _ in _Q182_METRICS:
        sums.append(f"CAST(sum(CAST({lbl} AS DECIMAL(38,0))) AS DOUBLE) AS s_{lbl}")
        sums.append(
            f"CAST(sum(CAST({lbl} AS DECIMAL(38,0)) * {lbl}) AS DOUBLE) AS ss_{lbl}"
        )
    pairs = []
    names = [lbl for lbl, _, _ in _Q182_METRICS]
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            sums.append(
                f"CAST(sum(CAST({a} AS DECIMAL(38,0)) * {b}) AS DOUBLE) AS sp_{a}_{b}"
            )
            pairs.append(
                f"SELECT '{a}' AS metric_a, '{b}' AS metric_b, n, "
                f"floor((n * sp_{a}_{b} - s_{a} * s_{b}) "
                f"/ sqrt((n * ss_{a} - s_{a} * s_{a}) * (n * ss_{b} - s_{b} * s_{b})) "
                f"* 1000000 + 0.5) / 1000000 AS corr FROM agg"
            )
    return (
        f"WITH m AS (SELECT {scaled} FROM lineitem), "
        f"agg AS (SELECT {', '.join(sums)} FROM m) " + " UNION ALL ".join(pairs)
    )


@_q("q182_corr_matrix", _q182_oracle())
def q182_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over four lineitem metrics in
    ONE scan — the feature-triage pass every modeling pipeline runs.
    Calling ``corr()`` per pair scans k(k-1)/2 times; the sufficient
    statistics (n, per-metric sum + sum-of-squares, per-pair
    cross-sum) fold into a SINGLE map-side-combined aggregate, and all
    6 correlations derive from that one 15-column row (k scans -> 1;
    at 100 TB this is the difference between one pass and six). Sums
    ride DECIMAL(38,0) — n*sum(x^2) overflows int64 already at sf0.1 —
    a priced choice: BASELINE §5l measures the decimal surcharge at
    3.5x over long sums (deployments whose metrics provably fit int64
    should sum as long — one scan AND codegen), while the per-pair
    corr() formulation pays 1.5x the long one-pass even on local NVMe
    where scans are nearly free. The decimals convert ONCE to double;
    both engines phrase the final
    covariance/variance expression identically from the same exact
    decimals, so the 6-dp round compares bit-for-bit. The 6 output
    rows unfold from the agg row via an explode over the pair labels
    (driver-free, still one job)."""
    li = _t(spark, sf_dir, "lineitem")
    m = li.select(
        *[
            F.floor(F.col(col) * s + F.lit(0.5)).cast("long").alias(lbl)
            for lbl, col, s in _Q182_METRICS
        ]
    )
    names = [lbl for lbl, _, _ in _Q182_METRICS]
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in names:
        aggs.append(
            F.sum(F.col(a).cast("decimal(38,0)")).cast("double").alias(f"s_{a}")
        )
        aggs.append(
            F.sum(F.col(a).cast("decimal(38,0)") * F.col(a))
            .cast("double")
            .alias(f"ss_{a}")
        )
    pair_names = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            pair_names.append((a, b))
            aggs.append(
                F.sum(F.col(a).cast("decimal(38,0)") * F.col(b))
                .cast("double")
                .alias(f"sp_{a}_{b}")
            )
    agg = m.agg(*aggs)
    n = F.col("n")
    rows = []
    for a, b in pair_names:
        cov = n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        va = n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vb = n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        rows.append(
            F.struct(
                F.lit(a).alias("metric_a"),
                F.lit(b).alias("metric_b"),
                (F.floor(cov / F.sqrt(va * vb) * 1000000 + F.lit(0.5)) / 1000000).alias(
                    "corr"
                ),
            )
        )
    return agg.select("n", F.explode(F.array(*rows)).alias("p")).select(
        "p.metric_a", "p.metric_b", "n", "p.corr"
    )


# ---------------------------------------------------------------------------
# q183: batch last-touch revenue attribution (as-of join)
# ---------------------------------------------------------------------------

_ATTR_WINDOW_S = 24 * 3600  # last-touch lookback, seconds


@_q(
    "q183_last_touch_attribution",
    f"""
    WITH touches AS (
      SELECT user_id, ts, max(event_id) AS tid
      FROM events WHERE event_type <> 'purchase'
      GROUP BY user_id, ts
    ), t2 AS (
      SELECT t.user_id, t.ts, e.event_type
      FROM touches t JOIN events e ON e.event_id = t.tid
    ), purch AS (
      SELECT event_id, user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), att AS (
      SELECT p.cents,
             coalesce(
               (SELECT t.event_type FROM t2 t
                 WHERE t.user_id = p.user_id AND t.ts <= p.ts
                   AND t.ts >= p.ts - INTERVAL {_ATTR_WINDOW_S} SECOND
                 ORDER BY t.ts DESC LIMIT 1),
               'unattributed') AS att_type
      FROM purch p
    )
    SELECT att_type, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM att GROUP BY att_type
    """,
)
def q183_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution in batch: every purchase credits
    the user's most recent non-purchase event within a 24 h lookback,
    else 'unattributed' — the batch twin of q101's streaming
    click-attribution join. Composition: touches dedup to one per
    (user, ts) keeping the max event_id (a struct-max — deterministic
    without a window), then ``operators/asof.py::asof_join`` — tag,
    union, one shuffle on user_id, last-seen carried forward by an
    ordered window; the nearest-prior join Spark lacks natively. The
    lookback bound is a residual filter on the carried touch
    timestamp. The oracle is an INDEPENDENT formulation (correlated
    top-1 subquery), so the window rewrite is checked against the
    definition, not against itself. Same-timestamp touch-and-purchase
    attributes (merge_asof backward semantics, pinned by the asof
    operator's tie contract)."""
    from batch_process_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "event_type")).alias("m"))
        .select("user_id", "ts", F.col("m.event_type").alias("touch_type"))
        .withColumn("touch_ts", F.col("ts"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    joined = asof_join(
        purch, touches, on="ts", by="user_id", right_cols=["touch_type", "touch_ts"]
    )
    # Full-precision bound: ts carries microseconds, and the oracle
    # compares `t.ts >= p.ts - INTERVAL 86400 SECOND` at full precision
    # — a cast-to-long diff would truncate both sides to whole seconds
    # and admit touches in the (86400, 86401) band the oracle rejects.
    in_window = F.col("touch_ts_r").isNotNull() & (
        F.col("touch_ts_r") >= F.col("ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_S} SECOND")
    )
    att = joined.select(
        F.when(in_window, F.col("touch_type_r"))
        .otherwise(F.lit("unattributed"))
        .alias("att_type"),
        "cents",
    )
    return att.groupBy("att_type").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# q184: Kaplan-Meier survival curve (exact rational products)
# ---------------------------------------------------------------------------

_KM_HORIZON_DAYS = 1  # no activity in the final day => observed churn


@_q(
    "q184_survival_km",
    f"""
    WITH RECURSIVE u AS (
      SELECT user_id,
             date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS dur,
             CAST(max(ts) AS DATE) AS last_day
      FROM events GROUP BY user_id
    ), ce AS (SELECT max(CAST(ts AS DATE)) AS end_day FROM events),
    b AS (
      SELECT dur,
             CAST(sum(CASE WHEN u.last_day <= ce.end_day - {_KM_HORIZON_DAYS}
                           THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN u.last_day <= ce.end_day - {_KM_HORIZON_DAYS}
                           THEN 0 ELSE 1 END) AS BIGINT) AS c
      FROM u CROSS JOIN ce GROUP BY dur
    ), rk AS (
      SELECT dur, d, c, CAST(row_number() OVER (ORDER BY dur) AS BIGINT) AS rk FROM b
    ), n0 AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM rk),
    km AS (
      SELECT rk.rk, rk.dur, rk.d, rk.c, n0.n AS n_risk,
             CAST(n0.n - rk.d AS HUGEINT) AS num, CAST(n0.n AS HUGEINT) AS den
      FROM rk CROSS JOIN n0 WHERE rk.rk = 1
      UNION ALL
      SELECT r.rk, r.dur, r.d, r.c, km.n_risk - km.d - km.c,
             km.num * (km.n_risk - km.d - km.c - r.d),
             km.den * (km.n_risk - km.d - km.c)
      FROM km JOIN rk r ON r.rk = km.rk + 1
    )
    SELECT dur AS duration_days, n_risk AS n_at_risk,
           d AS n_churned, c AS n_censored,
           floor(CAST(num AS DOUBLE) * 1000000 / CAST(den AS DOUBLE) + 0.5)
             / 1000000 AS survival
    FROM km
    """,
)
def q184_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes — THE
    right-censoring-aware churn statistic (a naive "fraction still
    active after t days" silently treats users the corpus simply
    stops observing as churned). Lifetime = days between a user's
    first and last event; churn is OBSERVED only when the last
    activity predates the corpus end by the horizon, else the user is
    censored at their observed duration. S(t) = prod_{s<=t}
    (1 - d_s/n_s) stays EXACT: numerator/denominator ride
    decimal(38,0) products folded over the (tiny, <=#distinct
    durations) bucket array — no running exp(sum(ln)) float seam, no
    libm-parity risk (the q167 Benford lesson), and the only doubles
    are the final identically-phrased division. Scale shape: one
    user-key shuffle for lifetimes, a <=31-row bucket aggregate
    collected into ONE row, and the whole curve folds in a single
    array expression — the fact-table pass is the lifetime agg,
    everything after is constant-size. The 38-digit product bound is
    sum_j log10(n_at_risk_j) <= 38 — the risk set SHRINKS every
    bucket, so real curves use far less (measured: 6.4 digits at
    sf0.01, 12.6 at sf0.1), but a deep curve over huge cohorts CAN
    exceed it, and ANSI-off decimal overflow is a silent NULL — so
    the division is guarded by assert_true and FAILS LOUDLY instead
    (bucket coarser or drop to the log-space approximation then;
    the HUGEINT oracle errors on overflow too, at ~1.7e38). The
    oracle is an INDEPENDENT recursive-CTE formulation over HUGEINT."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    end = ev.agg(F.max(F.col("ts").cast("date")).alias("end_day"))
    flagged = u.crossJoin(F.broadcast(end)).select(
        F.datediff(F.col("last_ts").cast("date"), F.col("first_ts").cast("date")).alias(
            "dur"
        ),
        (
            F.col("last_ts").cast("date")
            <= F.date_sub(F.col("end_day"), _KM_HORIZON_DAYS)
        )
        .cast("long")
        .alias("churn"),
    )
    b = flagged.groupBy("dur").agg(
        F.sum("churn").alias("d"),
        F.sum(F.lit(1) - F.col("churn")).alias("c"),
    )
    one = b.agg(F.sort_array(F.collect_list(F.struct("dur", "d", "c"))).alias("bs"))
    # Prefix-sum the risk set, then fold the exact decimal products —
    # all array expressions over the single collected row (B <= 31).
    curve = one.select(
        F.expr(
            """
            transform(bs, (x, i) -> named_struct(
              'duration_days', x.dur,
              'n_at_risk',
                 aggregate(bs, 0L, (a, y) -> a + y.d + y.c)
               - aggregate(slice(bs, 1, i), 0L, (a, y) -> a + y.d + y.c),
              'n_churned', x.d,
              'n_censored', x.c))
            """
        ).alias("arr")
    ).select(
        F.expr(
            """
            transform(arr, (x, i) -> named_struct(
              'duration_days', x.duration_days,
              'n_at_risk', x.n_at_risk,
              'n_churned', x.n_churned,
              'n_censored', x.n_censored,
              'num',
                aggregate(slice(arr, 1, i + 1),
                          cast(1 as decimal(38,0)),
                          (a, y) -> cast(a * cast(y.n_at_risk - y.n_churned
                                                  as decimal(38,0))
                                    as decimal(38,0))),
              'den',
                aggregate(slice(arr, 1, i + 1),
                          cast(1 as decimal(38,0)),
                          (a, y) -> cast(a * cast(y.n_at_risk
                                                  as decimal(38,0))
                                    as decimal(38,0)))))
            """
        ).alias("arr2")
    )
    # ANSI-off decimal overflow is a silent NULL: guard the exact
    # products LOUDLY before dividing (assert_true returns NULL on
    # success, so the `if` is just a sequencing idiom).
    out = curve.select(F.explode("arr2").alias("r")).select(
        "r.duration_days",
        "r.n_at_risk",
        "r.n_churned",
        "r.n_censored",
        F.expr(
            """
            if(isnull(assert_true(
                 r.num is not null and r.den is not null,
                 'q184: Kaplan-Meier decimal(38,0) product overflowed — '
                 || 'sum(log10(n_at_risk)) exceeds 38 digits; coarsen the '
                 || 'duration buckets or use the log-space approximation')),
               floor(cast(r.num as double) * 1000000
                     / cast(r.den as double) + 0.5) / 1000000,
               cast(null as double))
            """
        ).alias("survival"),
    )
    return out


# ---------------------------------------------------------------------------
# q185: CUPED-adjusted A/B lift (variance-reduced experiment readout)
# ---------------------------------------------------------------------------

_CUPED_CUTOFF = "2024-01-16"  # pre-period < cutoff <= post-period


def _q185_oracle() -> str:
    return f"""
    WITH peru AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(coalesce(sum(CASE WHEN ts < DATE '{_CUPED_CUTOFF}'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
                  AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN ts >= DATE '{_CUPED_CUTOFF}'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ), arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dsx,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dsy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS dsxx,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS dsyy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS dsxy
      FROM peru GROUP BY arm
    ), pooled AS (
      SELECT CAST(sum(n_users) AS BIGINT) AS n,
             CAST(sum(dsx) AS DOUBLE) AS sx, CAST(sum(dsy) AS DOUBLE) AS sy,
             CAST(sum(dsxx) AS DOUBLE) AS sxx,
             CAST(sum(dsyy) AS DOUBLE) AS syy,
             CAST(sum(dsxy) AS DOUBLE) AS sxy
      FROM arms
    )
    SELECT a.arm, a.n_users,
           floor(CAST(a.dsy AS DOUBLE) / a.n_users * 0.01 * 1000000 + 0.5)
             / 1000000 AS mean_post,
           floor((CAST(a.dsy AS DOUBLE) / a.n_users
                  - ((p.n * p.sxy - p.sx * p.sy) / (p.n * p.sxx - p.sx * p.sx))
                    * (CAST(a.dsx AS DOUBLE) / a.n_users - p.sx / p.n))
                 * 0.01 * 1000000 + 0.5) / 1000000 AS mean_post_cuped,
           floor(((p.n * p.sxy - p.sx * p.sy) * (p.n * p.sxy - p.sx * p.sy))
                 / ((p.n * p.sxx - p.sx * p.sx) * (p.n * p.syy - p.sy * p.sy))
                 * 1000000 + 0.5) / 1000000 AS var_reduction
    FROM arms a CROSS JOIN pooled p
    """


@_q("q185_cuped_lift", _q185_oracle())
def q185_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout — the variance-reduction
    technique every large experimentation platform runs (Deng et al.,
    WSDM'13, public): the post-period metric y adjusts by the
    pre-period covariate x, y' = y - theta (x - mean(x)) with theta =
    cov(x,y)/var(x) POOLED across arms (per-arm theta would bias the
    lift), shrinking variance by the squared correlation rho^2 —
    reported as var_reduction. Arms assign deterministically
    (user_id % 2 — the hash-split q92 family). Everything derives
    from sufficient statistics: ONE user-key shuffle builds per-user
    (x, y) cents, the arm aggregate carries all six sums, and the
    pooled row FOLDS OVER THE 2 ARM ROWS (sums are additive) — the
    fact table is scanned exactly once, plan-guarded; every adjusted
    mean is algebra over those sums — decimal(38,0) exact
    (x*y passes int64 at warehouse scale), doubles only in the final
    identically-phrased expressions. Users missing either period
    count with 0 in it (dropping them biases both mean and theta).
    Scale shape: the fact pass is the per-user agg; arms/pooled are
    constant-size."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    cutoff = F.lit(_CUPED_CUTOFF).cast("date")
    peru = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < cutoff, cents)), F.lit(0))
        .cast("long")
        .alias("x"),
        F.coalesce(F.sum(F.when(F.col("ts") >= cutoff, cents)), F.lit(0))
        .cast("long")
        .alias("y"),
    ).select((F.col("user_id") % 2).cast("long").alias("arm"), "x", "y")
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    # The arm aggregate carries ALL the sufficient statistics (as exact
    # decimals); the pooled row is a fold over the 2 arm rows — sums
    # are additive, so the fact table is scanned exactly ONCE.
    arms = peru.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(dx).cast("decimal(38,0)").alias("dsx"),
        F.sum(dy).cast("decimal(38,0)").alias("dsy"),
        F.sum((dx * F.col("x")).cast("decimal(38,0)")).cast("decimal(38,0)").alias("dsxx"),
        F.sum((dy * F.col("y")).cast("decimal(38,0)")).cast("decimal(38,0)").alias("dsyy"),
        F.sum((dx * F.col("y")).cast("decimal(38,0)")).cast("decimal(38,0)").alias("dsxy"),
    )
    # Pooled sums ride an UNPARTITIONED window over the arm frame —
    # normally the single-task scale-killer, but here the window input
    # is the aggregate's own 2-row output (bounded by the arm domain,
    # not the corpus), and a separate arms.agg() branch would re-scan
    # the fact table because Spark does not CSE self-referencing
    # lineage (the operators/hierarchy.py plan-doubling note).
    wall = Window.partitionBy()
    j = arms.select(
        "arm",
        "n_users",
        "dsx",
        "dsy",
        F.sum("n_users").over(wall).cast("long").alias("n"),
        F.sum("dsx").over(wall).cast("double").alias("psx"),
        F.sum("dsy").over(wall).cast("double").alias("psy"),
        F.sum("dsxx").over(wall).cast("double").alias("sxx"),
        F.sum("dsyy").over(wall).cast("double").alias("syy"),
        F.sum("dsxy").over(wall).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("psx"), F.col("psy")
    cov = n * F.col("sxy") - sx * sy
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    theta = cov / vx
    a_sy = F.col("dsy").cast("double")
    a_sx = F.col("dsx").cast("double")
    mean_post = F.floor(a_sy / F.col("n_users") * 0.01 * 1000000 + F.lit(0.5)) / 1000000
    mean_cuped = (
        F.floor(
            (a_sy / F.col("n_users") - theta * (a_sx / F.col("n_users") - sx / n))
            * 0.01
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    var_red = F.floor((cov * cov) / (vx * vy) * 1000000 + F.lit(0.5)) / 1000000
    return j.select(
        "arm",
        "n_users",
        mean_post.alias("mean_post"),
        mean_cuped.alias("mean_post_cuped"),
        var_red.alias("var_reduction"),
    )
