"""Spatial (planar grid) join operators.

The 2-D twin of ``operators/joins.py::interval_join``: a radius join
``dist(a, b) < r`` has no equi-key, so a naive formulation falls back
to BroadcastNestedLoopJoin — all-pairs and a non-starter at scale. The
standard rewrite tiles the plane into cells of side >= r: every point
within radius r of point P lies in P's cell or one of its 8 neighbors,
so candidate generation becomes a hash equi-join on the cell id with
the exact distance predicate as a residual filter.

The reference has no spatial surface; this extends the engine the same
way the interval/as-of joins do (SURVEY §2 "beyond the reference"
joins), because geo-bucketed joins are a staple of the large-scale
pipelines this engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    y_col: str,
    x_col: str,
    radius: int,
    suffix: str = "_r",
    salt_buckets: int = 1,
) -> DataFrame:
    """All (left, right) pairs with squared planar distance
    ``(dy^2 + dx^2) < radius^2``, via grid bucketing.

    Coordinates must be integers (exact arithmetic end to end — no
    floating-point seam between engines); ``radius`` is in the same
    integer unit and doubles as the cell side, so the neighbor fan-out
    is exactly 3x3. The RIGHT side replicates 9x (explode over the
    neighbor offsets — O(1) per row); the LEFT side maps to its own
    cell only, so each qualifying pair joins on exactly one cell id and
    needs no post-join dedup. Replicate the SMALLER input as ``right``.

    Scale shape: one hash equi-join on (cell_y, cell_x) — both sides
    shuffle once on the cell id; density skew (urban hot cells) is the
    known hot spot. ``salt_buckets > 1`` opts into hot-cell salting
    (composes operators/skew.py's scheme onto the composite cell key):
    the left side salts deterministically, the right side replicates
    ``salt_buckets``x further (on top of its 3x3 neighbor fan-out), and
    the join key becomes (cell_y, cell_x, salt) — a hot cell's left
    rows spread over ``salt_buckets`` tasks, bounding the max task at
    ~1/buckets of the unsalted hot task. Results are identical: each
    qualifying pair still meets on exactly one (cell, salt). Leave at 1
    when AQE skew-split is on — the runtime splitter handles it without
    inflating the right side. The residual distance filter is map-side
    codegen. Right-side columns are renamed with ``suffix`` on
    collision. Distance semantics are planar (no wraparound at the
    modulus seam): the caller defines the torus/plane contract.
    """
    r2 = radius * radius
    common = [c for c in right.columns if c in set(left.columns)]
    ren = right
    for c in common:
        ren = ren.withColumnRenamed(c, c + suffix)
    ry, rx = y_col + suffix if y_col in common else y_col, (
        x_col + suffix if x_col in common else x_col
    )
    offs = F.expr("explode(array(-1, 0, 1))")
    rt = (
        ren.withColumn("__oy", offs)
        .withColumn("__ox", offs)
        .withColumn("__cy", F.floor(F.col(ry) / radius) + F.col("__oy"))
        .withColumn("__cx", F.floor(F.col(rx) / radius) + F.col("__ox"))
    )
    lt = left.withColumn("__cy", F.floor(F.col(y_col) / radius)).withColumn(
        "__cx", F.floor(F.col(x_col) / radius)
    )
    keys = ["__cy", "__cx"]
    drop = ["__cy", "__cx", "__oy", "__ox"]
    if salt_buckets > 1:
        from batch_process_spark.operators.skew import with_salt

        lt = with_salt(lt, salt_buckets)
        rt = rt.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        )
        keys.append("__salt")
        drop.append("__salt")
    # Squares computed in LONG: with int-typed coordinate columns the
    # int32 square wraps silently past |delta| ~ 46341 (ANSI off) and,
    # since true pairs always satisfy sum < r^2, the wrap can only ADD
    # false-positive pairs. Casting the deltas keeps the residual exact
    # for any radius the 3x3 neighborhood can produce.
    dy = (F.col(y_col) - F.col(ry)).cast("long")
    dx = (F.col(x_col) - F.col(rx)).cast("long")
    return (
        lt.join(rt, keys)
        .filter(dy * dy + dx * dx < F.lit(r2))
        .drop(*drop)
    )
