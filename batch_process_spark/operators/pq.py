"""Product quantization (PQ) — codebook training, encoding, and
asymmetric-distance (ADC) search over embedding columns.

The missing piece between q159's scalar quantization (4x smaller,
still O(d) floats per distance) and the IVF coarse index
(`similarity.py`): PQ splits each d-dim vector into ``m`` subvectors
and replaces each with the id of its nearest per-subspace centroid —
64 float32 = 256 B becomes ``m`` small codes (4 B at m=4/k<=256), a
64x storage cut, and query-time distances become ``m`` table lookups
instead of d multiplies (Jegou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — public literature). IVF + PQ
is the standard trillion-vector layout (FAISS IVFPQ): the coarse
index prunes partitions, PQ makes the residual scan cheap.

Everything here is deterministic so a SQL oracle can replay it
bit-for-bit (the q103 kmeans discipline): codebook init is the ``k``
LOWEST vector ids' subvectors, Lloyd iterations are a fixed count,
argmin ties break to the lowest centroid id, and float32 elements are
cast to double before any arithmetic (exact).

100 TB shape:

- training joins the corpus' position-exploded frame to a (m x k x
  subdim)-row codebook frame — NOT broadcast-hinted: AQE broadcasts
  it while it fits and degrades to a shuffle join for huge m*k rather
  than OOMing (same rationale as q103);
- centroid recompute is a (sub, cid, spos) partial agg — the exchange
  carries codebook-sized partials per task, never raw vectors;
- encoding is the same assign step: one partial-agg exchange of
  (vec_id, sub) groups, output m rows (one small code each) per
  vector;
- ADC scoring joins the codes frame to a BROADCAST query LUT
  (queries x m x k rows — bounded by the query batch, independent of
  corpus size) and partial-aggs to (query, vec) sums: the corpus side
  is map-side until the final (query_id, vec_id) exchange, which
  carries one 8-byte partial per (query, vector). A serving deployment
  would inline the LUT as a literal map and skip even that exchange;
  the join form is kept here because the oracle mirrors it row-for-row.

Reference parity: beyond the reference's surface (its analytics stop
at pandas group-bys, `utils/adapters/df_helpers.py`); this belongs to
the north-star similarity-search family (SURVEY §7 M6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_subvectors(
    df: DataFrame,
    subdim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Position-explode ``vec_col`` into (id, sub, spos, v) rows.

    ``sub`` = subspace index (pos // subdim), ``spos`` = position
    within the subspace. Elements are cast float->double up front so
    every downstream sum sees the exact same doubles as the oracle.
    """
    return df.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("pos", "vf"),
    ).select(
        id_col,
        (F.col("pos") / subdim).cast("int").alias("sub"),
        (F.col("pos") % subdim).alias("spos"),
        F.col("vf").cast("double").alias("v"),
    )


def _assign(dims: DataFrame, codebook: DataFrame, keep_dist: bool = False) -> DataFrame:
    """Nearest centroid per (vector, subspace); ties -> lowest cid.

    One partial-agg exchange on (id, sub, cid); the argmin window
    partitions by (id, sub) — k rows per group, never global.
    """
    id_col = dims.columns[0]
    dist = (
        dims.join(codebook, ["sub", "spos"])
        .groupBy(id_col, "sub", "cid")
        .agg(F.sum((F.col("v") - F.col("c")) ** 2).alias("dist"))
    )
    w = Window.partitionBy(id_col, "sub").orderBy("dist", "cid")
    picked = dist.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    cols = [id_col, "sub", "cid"] + (["dist"] if keep_dist else [])
    return picked.select(*cols)


def pq_train(
    df: DataFrame,
    subdim: int,
    k: int = 4,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks: (sub, cid, spos, c) rows.

    Deterministic Lloyd: init = the ``k`` lowest ACTUAL ids' subvectors
    (ordered limit, not an id-range filter — ids need not start at 0;
    the q103 convention), then ``iters`` assign+recompute rounds. A
    subspace cluster that loses all members simply disappears from the
    recompute — deterministically in any engine, so the oracle agrees.
    ``cid`` stays the init vector's id (stable, oracle-friendly); a
    storage layer wanting dense byte codes can dense-rank it after.
    """
    dims = explode_subvectors(df, subdim, id_col, vec_col)
    init = df.select(id_col).orderBy(id_col).limit(k)
    codebook = dims.join(init, id_col).select(
        "sub", F.col(id_col).alias("cid"), "spos", F.col("v").alias("c")
    )
    for _ in range(iters):
        assigned = _assign(dims, codebook)
        codebook = (
            dims.join(assigned, [id_col, "sub"])
            .groupBy("sub", "cid", "spos")
            .agg(F.avg("v").alias("c"))
        )
    return codebook


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    subdim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_dist: bool = False,
) -> DataFrame:
    """Encode vectors against a trained codebook: (id, sub, cid) rows,
    plus the per-subspace squared reconstruction error with
    ``keep_dist`` (summing it over ``sub`` gives the vector's total
    PQ reconstruction error — the compression-quality metric)."""
    dims = explode_subvectors(df, subdim, id_col, vec_col)
    return _assign(dims, codebook, keep_dist=keep_dist)


def pq_adc_scores(
    queries: DataFrame,
    codebook: DataFrame,
    codes: DataFrame,
    subdim: int,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance scores: (query_id, vec_id, adc) where
    ``adc`` approximates ||q - x||^2 as the sum over subspaces of the
    exact squared distance from q's subvector to x's assigned
    centroid (query side exact, corpus side quantized — "asymmetric").

    The LUT (queries x m x k rows) is built with one tiny agg and
    BROADCAST into the codes join; the corpus-side partial agg reduces
    to one 8-byte sum per (query, vector) before the exchange.
    """
    qdims = explode_subvectors(queries, subdim, query_id_col, vec_col)
    lut = (
        qdims.join(codebook, ["sub", "spos"])
        .groupBy(query_id_col, "sub", "cid")
        .agg(F.sum((F.col("v") - F.col("c")) ** 2).alias("l"))
    )
    return (
        codes.join(F.broadcast(lut), ["sub", "cid"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("l").alias("adc"))
    )
