"""Approximate / sketch operators — the sublinear-memory analytics a
100 TB engine reaches for when exact answers don't pay their way.

All built on Spark's native sketch aggregates (HLL++, GK quantiles,
count-min-backed frequent items), which merge across partitions —
the whole point at scale: fixed-size state per partition, one tiny
shuffle. Exact twins exist in the engine for oracle checking; the
sketches themselves are verified by ε-bounds against exact results
in tests (cross-engine hash-matching is meaningless for
implementation-defined approximations).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, cols: Sequence[str], keys: Sequence[str] = (), rsd: float = 0.02) -> DataFrame:
    """HLL++ distinct counts (relative error ``rsd``), optionally per
    group. State: ~1.5KB per counter regardless of cardinality."""
    aggs = [F.approx_count_distinct(c, rsd=rsd).alias(f"approx_distinct_{c}") for c in cols]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000, keys: Sequence[str] = (),
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles; error <= 1/accuracy."""
    probs = F.array(*[F.lit(p) for p in probabilities])
    agg = F.percentile_approx(col, probs, accuracy).alias("quantiles")
    out = df.groupBy(*keys).agg(agg) if keys else df.agg(agg)
    for i, p in enumerate(probabilities):
        out = out.withColumn(f"p{int(p * 100)}", F.element_at("quantiles", i + 1))
    return out.drop("quantiles")


def frequent_items(df: DataFrame, col: str, min_share: float = 0.01, k: int = 20) -> DataFrame:
    """Heavy hitters: exact counts of the top-k items above a support
    share. (Spark's freqItems sketch gives candidates without counts;
    at scale the two-pass exact-count-of-candidates pattern below is
    the standard rewrite and stays one shuffle over candidate rows.)"""
    total = df.count()
    counts = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.round(F.col("cnt") / F.lit(total), 6))
        .filter(F.col("share") >= min_share)
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(k)
    )
    return counts


def seeded_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Deterministic Bernoulli sample (stable across reruns/retries —
    rand(seed) is per-partition deterministic)."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(df: DataFrame, key: str, fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum sampling fractions (e.g. downsample hot classes)."""
    return df.sampleBy(key, fractions=fractions, seed=seed)


# ---------------------------------------------------------------------------
# Deterministic, engine-portable sketches (md5 hash family)
#
# The native aggregates above are implementation-defined (Spark's HLL++
# register layout, GK compaction order), so their outputs can't be
# hash-matched against another engine. The constructions below build the
# SAME sketch from explicit md5-derived hashes — every register /
# counter / bit is reproducible in ANSI SQL, which makes the full
# value-hash oracle applicable to approximate answers too. The scale
# shape is the whole point: each one reduces an unbounded input to a
# fixed-size table (registers / counters / bit positions) via one
# partial-aggregated shuffle, and merges by max / sum / union — the
# mergeability that lets 1000 executors sketch 100 TB independently.
# ---------------------------------------------------------------------------

# 48 hash bits feed the rho (leading-zero) computation; registers hold
# rho in [1, 49] (49 = all-zero hash tail), empty registers are rho 0.
# Exact-integer forms throughout: the harmonic denominator SUM(2^-M)
# is scaled by 2^49 into SUM(1 << (49 - M)) — a BIGINT
# (<= 2^p * 2^49 << 2^63) — so cross-engine float drift can't appear
# below the single final division.
HLL_W_BITS = 48
_HLL_SCALE = HLL_W_BITS + 1  # rho max; 2^-M terms scaled to ints by 2^49


def hll_alpha_num(p: int) -> float:
    """alpha_m * m^2 * 2^49 — the numerator of the HLL estimate with the
    harmonic denominator kept as the exact integer SUM(2^(49-M)).
    One double constant; written as the same literal into the SQL
    oracle so both engines perform the identical single division."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m * float(1 << _HLL_SCALE)


def hll_hash_cols(key: Column | str, p: int = 8) -> tuple[Column, Column]:
    """The per-row HLL pieces: (bucket = first p hash bits, rho =
    leading zeros of the next 48 bits + 1), from md5(key). Pure map
    expressions — compose them under any grouping (plain groupBy,
    rollup, grouping sets) before the max-aggregate."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(key)
    hex_chars = p // 4  # p must be a multiple of 4 (hex-aligned buckets)
    bucket = F.conv(F.substring(h, 1, hex_chars), 16, 10).cast("long")
    w = F.conv(F.substring(h, hex_chars + 1, HLL_W_BITS // 4), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    return bucket, rho


def hll_register_table(
    df: DataFrame, key: Column | str, group_cols: Sequence[str] = (), p: int = 8
) -> DataFrame:
    """Explicit HyperLogLog registers: md5(key) -> (bucket = first p
    bits, rho = leading zeros of the next 48 bits + 1), max-aggregated
    per (group, bucket). Map-only expressions into one partial-agg
    shuffle of <= groups * 2^p rows; registers from disjoint data
    merge with MAX, so per-source (or per-executor) tables union
    losslessly — build once, answer distinct-count questions later."""
    bucket, rho = hll_hash_cols(key, p)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: Sequence[str], p: int = 8) -> DataFrame:
    """Cardinality estimate from a register table, empty buckets
    included implicitly: a group with z missing buckets contributes
    z * 2^49 to the harmonic sum (rho = 0), so no grid join is needed.
    Small-range linear counting (E <= 2.5m, V > 0) uses m * ln(m/V) —
    quantized to an integer like every ln in this engine."""
    m = 1 << p
    num = hll_alpha_num(p)
    agg = registers.groupBy(*group_cols).agg(
        F.expr(f"sum(shiftleft(cast(1 as bigint), {_HLL_SCALE} - max_rho))").alias("s_seen"),
        F.count(F.lit(1)).alias("n_seen"),
    )
    zeros = m - F.col("n_seen")  # buckets never hit: rho 0 -> term 2^49
    s = F.col("s_seen") + zeros.cast("long") * F.lit(1 << _HLL_SCALE).cast("long")
    raw = F.lit(num) / s.cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols, F.floor(est + F.lit(0.5)).cast("long").alias("hll_estimate")
    )


def cms_counter_table(
    token_counts: DataFrame, token_col: str = "token", cnt_col: str = "cnt",
    depth: int = 4, width: int = 512,
) -> DataFrame:
    """Count-Min sketch counters from a (token, count) table: depth
    salted md5 rows x width buckets, counts summed per cell. The
    counter table is depth*width rows regardless of vocabulary size;
    cells from disjoint corpora merge by SUM. Build from the reduced
    per-token counts (not raw occurrences) so the explode factor
    applies after the map-side-combined token shuffle."""
    salts = F.array(*[F.lit(i) for i in range(depth)])
    exploded = token_counts.select(
        F.col(cnt_col).alias("cnt"),
        F.explode(salts).alias("row_salt"),
        F.col(token_col).alias("token"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    # concat, NOT concat_ws: a NULL token must hash to
                    # NULL (the SQL || twin propagates NULL), never to
                    # the salt-only string
                    F.concat(F.col("row_salt").cast("string"), F.lit(":"), F.col("token"))
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long") % width
    )
    return (
        exploded.select("row_salt", bucket.alias("bucket"), "cnt")
        .groupBy("row_salt", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cell"))
    )


def cms_lookup(
    candidates: DataFrame, counters: DataFrame, token_col: str = "token",
    depth: int = 4, width: int = 512,
) -> DataFrame:
    """Point-estimate candidate tokens against a counter table:
    min over the depth cells each token hashes to (classic CMS upper
    bound — never under exact). Counters broadcast (depth*width rows);
    candidates explode by depth only."""
    salts = F.array(*[F.lit(i) for i in range(depth)])
    probed = candidates.select(
        token_col, F.explode(salts).alias("row_salt")
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("row_salt").cast("string"), F.lit(":"), F.col(token_col)
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long") % width,
    )
    return (
        probed.join(F.broadcast(counters), ["row_salt", "bucket"])
        .groupBy(token_col)
        .agg(F.min("cell").cast("long").alias("cms_estimate"))
    )


def dd_bucket_table(
    df: DataFrame, value_col: str, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Base-2 DDSketch bucket counts over a positive BIGINT column:
    bucket key = (bit_length, top-5-bits) — the value's octave and a
    16-way sub-bucket, pure integer shifts any engine computes
    identically. <= 64 x 16 counters per group, merging by SUM;
    ``rep`` is the bucket lower bound (within 1/16 of any member)."""
    return (
        df.selectExpr(
            *group_cols,
            f"length(bin({value_col})) AS b",
            f"{value_col} >> greatest(length(bin({value_col})) - 5, 0) AS high",
        )
        .groupBy(*group_cols, "b", "high")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .selectExpr(*group_cols, "b", "high", "cnt", "high << greatest(b - 5, 0) AS rep")
    )


def dd_quantile_readout(
    buckets: DataFrame, group_cols: Sequence[str], pcts: Sequence[int]
) -> DataFrame:
    """Quantile estimates from a DD bucket table: a cumulative-count
    walk over the tiny counter table (partitioned window — never a
    sort of the data). ``pcts`` are integer percentiles; ranks use
    exact integer ceil((n*p)/100)."""
    from pyspark.sql import Window

    w_cum = Window.partitionBy(*group_cols).orderBy("b", "high")
    w_all = Window.partitionBy(*group_cols)
    cum = buckets.select(
        *group_cols,
        "rep",
        F.sum("cnt").over(w_cum).alias("cs"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_rows")]
    for p in pcts:
        r = F.expr(f"(n * {p} + 99) div 100")
        aggs.append(
            F.min(F.when(F.col("cs") >= r, F.col("rep"))).cast("long").alias(f"p{p}")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def bloom_bit_positions(
    keys: DataFrame, key_col: str, k: int = 3, m_bits: int = 256
) -> DataFrame:
    """The distinct bit positions a key set lights in a Bloom filter of
    ``m_bits`` bits with ``k`` md5-salted hash functions. At scale this
    IS the runtime-filter build side: <= m_bits rows shipped to every
    executor instead of the key set itself (Spark's AQE runtime bloom
    filter — spark.sql.optimizer.runtime.bloomFilter.enabled — is the
    planner-automatic form of the same pruning)."""
    salts = F.array(*[F.lit(i) for i in range(k)])
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("__salt").cast("string"),
                        F.lit(":"),
                        F.col(key_col).cast("string"),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long") % m_bits
    )
    return (
        keys.select(F.col(key_col), F.explode(salts).alias("__salt"))
        .select(pos.alias("pos"))
        .distinct()
    )


def bloom_probe(
    probe: DataFrame, bits: DataFrame, key_col: str, k: int = 3, m_bits: int = 256
) -> DataFrame:
    """Filter ``probe`` to rows whose key passes the Bloom filter (all
    k positions set). The bit set rides in as a single broadcast row
    (sorted array<long>), so the probe side stays map-only — no
    shuffle, no explode of the big side. False positives are possible
    (by design); false negatives are not."""
    bits_row = bits.agg(F.sort_array(F.collect_set("pos")).alias("__bits"))
    out = probe.crossJoin(F.broadcast(bits_row))
    key = F.col(key_col).cast("string")
    checks = [
        F.array_contains(
            F.col("__bits"),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(str(i) + ":"), key.cast("string"))), 1, 8
                ),
                16, 10,
            ).cast("long")
            % m_bits,
        )
        for i in range(k)
    ]
    passed = checks[0]
    for c in checks[1:]:
        passed = passed & c
    return out.filter(passed).drop("__bits")


def bottom_k_sample(
    df: DataFrame,
    keys,
    k: int,
    id_col: str,
    salt: int = 0,
    hash_col=None,
) -> DataFrame:
    """Deterministic FIXED-SIZE uniform sample per group: keep the k
    rows whose ``xxhash64(id, salt)`` is smallest — consistent
    (bottom-k) sampling, the distributed answer to reservoir sampling:

    - deterministic across retries/partitioning (no rand());
    - uniform when the hash is (ids are arbitrary, the hash whitens);
    - MERGEABLE: bottom-k of a union == bottom-k of the merged
      bottom-k's, so shards/micro-batches sample independently and
      merge — the property rand()-reservoirs lack;
    - sample membership is STABLE under corpus growth: a kept row is
      evicted only when a smaller-hash row arrives, never reshuffled.

    ``stratified_sample`` (rate-based) keeps a FRACTION per group; this
    keeps a COUNT per group — the training-data "n examples per source"
    contract. Ties cannot occur (xxhash64 over distinct ids collides
    with probability ~2^-64; the id itself breaks any residual tie
    deterministically).

    ``hash_col``: override the ordering hash with any deterministic
    Column (e.g. md5 of the stringified id for engine-portable
    ordering an external oracle can reproduce; xxhash64 stays the fast
    JVM-side default).
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    h = hash_col if hash_col is not None else F.xxhash64(F.col(id_col), F.lit(salt))
    w = Window.partitionBy(*keys).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
