"""Connected components over candidate pairs — the last mile of
near-duplicate removal: MinHash/SimHash/cosine stages emit PAIRS, but
dropping duplicates needs CLUSTERS (a-b and b-c must collapse to one
surviving document even though (a, c) was never emitted as a pair).

Iterative min-label propagation: every node starts labeled with its own
id; each round takes the min of its neighbors' labels; converges in
O(component diameter) rounds (near-dup clusters are shallow — a handful
of rounds). Each round is one shuffle join + partial-agg ``min``; the
frame is checkpointed per round so the plan/lineage stays flat. This is
the classic large-graph CC formulation (HashToMin family) — no driver-
side graph state, scales with executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: Below this many pairs the component structure fits trivially in
#: driver memory and a local union-find beats the distributed loop by
#: an order of magnitude (each propagation round costs several shuffle
#: stages of fixed scheduling overhead). Near-dup pair streams are
#: small relative to the corpus by construction — LSH already pruned
#: the candidate space — so this is the common case even at large SF.
DRIVER_UF_MAX_PAIRS = 5_000_000


def _driver_union_find(rows) -> dict:
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:  # union by min id so the component id is the min
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    strategy: str = "auto",
    report: dict | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the smallest node id in the component.

    ``strategy``: 'driver' = collect + union-find (exact, fast, bounded
    by DRIVER_UF_MAX_PAIRS of memory), 'distributed' = iterative
    min-label propagation (unbounded scale, O(diameter) shuffle
    rounds), 'auto' = driver below the threshold else distributed.
    Raises if the distributed loop needs more than ``max_iter`` rounds.

    ``report`` (optional dict): filled with probe telemetry —
    ``{"strategy": <taken>, "rounds": <label-propagation rounds>}``
    (rounds=0 on the driver path). The scale probe reads it; callers
    that don't pass one pay nothing.
    """
    if strategy not in ("auto", "driver", "distributed"):
        raise ValueError(f"strategy must be auto|driver|distributed, got {strategy!r}")
    spark = pairs.sparkSession
    # NULL ids cannot participate in connectivity. The distributed
    # path's equi-joins would drop them implicitly; filter them HERE so
    # the driver path agrees instead of crashing union-find on a
    # None-vs-int comparison — same answer from either strategy.
    p = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .persist()
    )
    # The pair count only arbitrates 'auto'; forcing EITHER strategy
    # must not pay a full count job (at real scale that is a whole
    # extra pass over the pair stream before any useful work).
    if strategy == "auto":
        n_pairs = p.count()
    if strategy == "driver" or (strategy == "auto" and n_pairs <= DRIVER_UF_MAX_PAIRS):
        if report is not None:
            report.update(strategy="driver", rounds=0)
        comp = _driver_union_find((r["src"], r["dst"]) for r in p.toLocalIterator())
        p.unpersist()
        # node ids come from BOTH columns: type the output at their
        # widest (an int id_a with bigint id_b must not truncate)
        widths = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}
        ta, tb = dict(pairs.dtypes)[id_a], dict(pairs.dtypes)[id_b]
        if ta in widths and tb in widths:
            id_type = ta if widths[ta] >= widths[tb] else tb
        else:
            id_type = ta  # non-integral ids: both sides must already agree
        return spark.createDataFrame(
            list(comp.items()), f"node {id_type}, component {id_type}"
        )
    e = p
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    # localCheckpoint (eager) per round: each round references `labels`
    # twice, so without lineage truncation the plan doubles per round
    # and the driver OOMs on even modest component diameters. The
    # checkpointed blocks are released by the ContextCleaner once the
    # frame is unreferenced, so nothing stays pinned after the caller
    # drops the result.
    labels = (
        edges.select("src").distinct().withColumn("component", F.col("src"))
        .localCheckpoint()
    )
    if report is not None:
        report.update(strategy="distributed", rounds=0)
    try:
        for _round in range(1, max_iter + 1):
            nbr_min = (
                edges.join(
                    labels.select(
                        F.col("src").alias("dst"), F.col("component").alias("__nbr")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("__nbr").alias("__min_nbr"))
            )
            new_labels = (
                labels.join(nbr_min, "src", "left")
                .select(
                    "src",
                    F.least(
                        F.col("component"), F.coalesce("__min_nbr", F.col("component"))
                    ).alias("component"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.join(
                    labels.select("src", F.col("component").alias("__old")), "src"
                )
                .filter(F.col("component") != F.col("__old"))
                .count()
            )
            labels = new_labels
            if report is not None:
                report["rounds"] = _round
            if changed == 0:
                return labels.select(F.col("src").alias("node"), "component")
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    finally:
        edges.unpersist()
        p.unpersist()


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster view of a near-dup pair stream: (node, component,
    cluster_size). The min-id node per component is the canonical
    survivor; everything else is a duplicate to drop."""
    cc = connected_components(pairs, id_a, id_b)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select("node", "component", "cluster_size")


def cluster_savings_report(per_cluster: DataFrame) -> DataFrame:
    """Roll a per-cluster frame (cluster_size, bytes_removed) into the
    dedup savings report: per cluster size, the cluster count, the
    documents a min-id-survivor policy removes, and the bytes
    reclaimed — shared by q220 and the ``dedup_report`` pipeline
    stage so the accounting cannot drift between them."""
    return per_cluster.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("cluster_size") - 1).cast("long").alias("docs_removed"),
        F.sum("bytes_removed").cast("long").alias("bytes_removed"),
    )


def wedge_join(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    w_col: str = "w",
    salt_buckets: int = 1,
) -> DataFrame:
    """Median-centered wedge enumeration over a CANONICAL edge set
    (``u < v`` on every row): self-join on the middle vertex, yielding
    (u, v, w) with u < v < w. Contract: exactly the wedges whose
    CENTER vertex is the median-id endpoint, each once — which is
    exactly one wedge per unordered vertex triple that a triangle
    check needs (close it against the canonical (u, w) edge, as
    ``triangle_count`` does). This is NOT a full per-center wedge
    enumeration: a wedge centered on its smallest or largest vertex
    (edges (1,2),(1,3) -> wedge 2—1—3) is never emitted, by design —
    a node's TOTAL wedge count is C(deg, 2) off the degree table (how
    q166 builds its clustering-coefficient denominator), never an
    explode.

    Hub skew is the known hot spot: the middle-vertex key's join fan-in
    is the vertex DEGREE, so one celebrity node owns a quadratic task.
    ``salt_buckets > 1`` opts into hot-key salting (the
    operators/skew.py scheme applied to the middle vertex): the
    in-edge side salts deterministically, the out-edge side replicates
    ``salt_buckets``x, the join runs on (v, salt) — a hub's wedge
    output spreads over ``salt_buckets`` tasks (pairs per task drop
    from d^2 to ~d^2/buckets). Output is identical: each wedge still
    meets on exactly one (v, salt). Leave at 1 under AQE skew-split,
    which splits oversized partitions at runtime without inflating the
    out-edge side.
    """
    e2 = edges.select(
        F.col(u_col).alias(v_col), F.col(v_col).alias(w_col)
    )
    if salt_buckets > 1:
        from batch_process_spark.operators.skew import salted_join

        return salted_join(edges, e2, on=[v_col], buckets=salt_buckets).select(
            u_col, v_col, w_col
        )
    return edges.join(e2, v_col).select(u_col, v_col, w_col)


def copurchase_edges(
    items: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Canonical co-occurrence edge set: distinct (group, item) pairs
    self-joined on the group, one ``u < v`` row per unordered item
    pair that shares a group — the shared first stage of the triangle
    (q149), clustering-coefficient (q166), and PageRank (q169)
    queries, factored here so the cap/canonicalization cannot drift
    between them. One shuffle on the group key; the final distinct
    dedups pairs co-occurring in many groups. Group size is the scale
    knob: pairs per group are quadratic in its item count, so cap or
    salt pathological baskets upstream."""
    d = items.select(F.col(group_col).alias("__o"), F.col(item_col).alias("u")).distinct()
    b = d.select(F.col("__o"), F.col("u").alias("v"))
    return d.join(b, "__o").filter(F.col("u") < F.col("v")).select("u", "v").distinct()


def triangles_per_node(
    edges: DataFrame, salt_buckets: int = 1, count_col: str = "n_tri"
) -> DataFrame:
    """Per-node triangle participation over a CANONICAL (u < v) edge
    set: wedge enumeration (middle-vertex self-join, hub salting via
    ``salt_buckets``), closure LEFT SEMI back against the edge set —
    each triangle u < v < w once — then per-corner counts via explode.
    Every stage is edge-granularity; no adjacency matrix."""
    wedges = wedge_join(edges, salt_buckets=salt_buckets)
    tri = wedges.join(
        edges.select(F.col("u"), F.col("v").alias("w")), ["u", "w"], "left_semi"
    )
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias(count_col))
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    u_col: str = "u",
    v_col: str = "v",
    checkpoint: bool = False,
    salt_buckets: int | None = None,
) -> DataFrame:
    """PageRank by power iteration over a DIRECTED edge list — returns
    (node, rank) for every node with at least one out-edge. Callers
    with undirected/dangling-node graphs symmetrize first (every node
    then has out-edges and no rank mass leaks — the q169 shape).

    Scale shape: each round is one shuffle-hash state><edges equi-join
    at edge granularity plus one per-destination partial-agg sum and
    one shuffle-hash merge back onto the node table; the rank vector
    never broadcasts (the fact-scale regime — for schema-bounded
    graphs where it does fit, see the q139 broadcast-vector variant).
    Lineage grows LINEARLY in rounds (state joins the fixed edge
    frame, never itself); ``checkpoint=True`` still bounds plan depth
    via eager localCheckpoint per round for long runs at true scale.
    Node count rides a 1-row broadcast crossJoin — no eager job."""
    deg = (
        edges.groupBy(u_col)
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .select(F.col(u_col).alias("node"), "outdeg")
    )
    n = deg.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    state = deg.crossJoin(F.broadcast(n)).select(
        "node", "outdeg", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(iters):
        if checkpoint:
            state = state.localCheckpoint(eager=True)
        if salt_buckets:
            # Hub-skew hardening: the state><edges join keys on u, so a
            # node with a dominant out-degree (web-graph hubs) lands all
            # its edges in ONE task. Salt the edge (fact) side, explode
            # the node-sized state across the buckets (skew.salted_join)
            # — max task rows drop to ~1/buckets of the hub's degree for
            # a buckets-fold replication of the small state frame.
            from batch_process_spark.operators import skew

            e2 = edges.select(F.col(u_col).alias("__jk"), F.col(v_col))
            st = state.select(F.col("node").alias("__jk"), "rank", "outdeg")
            joined = skew.salted_join(e2, st.hint("shuffle_hash"), on=["__jk"], buckets=salt_buckets)
        else:
            joined = state.join(edges.hint("shuffle_hash"), state.node == edges[u_col])
        contrib = (
            joined.select(
                F.col(v_col).alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        state = (
            deg.join(contrib.hint("shuffle_hash"), "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                "outdeg",
                (
                    F.lit(1 - damping) / F.col("n_nodes")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return state.select("node", "rank")


def sssp_bounded(
    edges: DataFrame,
    rounds: int = 4,
    u_col: str = "u",
    v_col: str = "v",
    w_col: str = "w",
    seed: DataFrame | None = None,
    persist=None,
) -> DataFrame:
    """Bounded-hop cheapest path: Bellman-Ford over a weighted
    DIRECTED edge list (symmetrize first for undirected graphs). The
    returned frame holds, for every reached node, the exact minimum
    cost over all walks of at most ``rounds`` edges from the seed —
    the bounded-radius routing semantics (with non-negative weights
    the min-cost walk is a path, so this equals k-bounded SSSP).

    ``seed`` is a (node, cost) frame; ``None`` seeds from the smallest
    ``u`` in the edge set at cost 0 (a deterministic default that
    needs no caller-side action). Seed nodes need NOT exist in the
    edge set: every seed row is echoed back in the result at (at most)
    its seed cost — "you can reach where you start" — so a typo'd or
    stale seed frame yields rows for nodes absent from the graph.
    Callers that want graph-members only should semi-join their seed
    against the node set first (``seed.join(edges.select(u), "node",
    "left_semi")``); the operator does not do it implicitly because
    the echo is the correct semantics for routing ("cost from HERE"
    is 0 even for an isolated depot). ``persist`` is an optional
    ``DataFrame -> DataFrame`` hook (e.g. ``.persist()`` or a memo)
    applied to each round's frontier so round k never recomputes
    rounds 1..k-1.

    Scale shape — the Pregel SSSP rewrite, ``rounds`` unrolled
    supersteps, q151's accumulate-then-reduce discipline: the edge
    frame hash-partitions on ``u`` once and never moves; round k's
    frontier is "best cost over walks of EXACTLY k edges" — one
    equi-join at frontier granularity + one per-destination
    partial-agg ``min``, so the frontier is NODE-bounded (never
    path-bounded) and the rounds reduce to the answer with one final
    ``min`` over their union. Deliberately NOT the delta variant
    (anti-join each round's frontier against the running best): that
    formulation joins a persisted union against its own lineage,
    which the local AQE planner miscompiles into a zip of unequal
    partition counts ("Can't zip RDDs", hit under test — the
    accumulate shape has no join against accumulated state at all,
    and its extra traffic is bounded by reached-nodes x rounds).
    Lineage grows linearly in rounds (each frontier joins the fixed
    edge frame, never itself).
    """
    keep = persist if persist is not None else (lambda df: df)
    e = edges.select(
        F.col(u_col).alias("__su"), F.col(v_col).alias("__sv"), F.col(w_col).alias("__sw")
    )
    if seed is None:
        seed = e.groupBy().agg(F.min("__su").alias("node")).select(
            "node", F.lit(0).cast("long").alias("cost")
        )
    frontier = keep(seed.select("node", F.col("cost").cast("long").alias("cost")))
    acc = frontier
    for _ in range(rounds):
        frontier = keep(
            frontier.join(e.hint("shuffle_hash"), frontier.node == e.__su)
            .select(F.col("__sv").alias("node"), (F.col("cost") + F.col("__sw")).alias("cost"))
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        acc = acc.unionByName(frontier)
    return acc.groupBy("node").agg(F.min("cost").alias("cost"))


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    u_col: str = "u",
    v_col: str = "v",
    checkpoint: bool = True,
) -> DataFrame:
    """Iterated degree peel toward the k-core over a SYMMETRIC edge
    set (every undirected edge present in both directions, so
    ``groupBy(u).count()`` IS the node degree): each round drops every
    node of degree < ``k`` and the edges touching it. Runs EXACTLY
    ``rounds`` peels — deterministic bounded semantics that an oracle
    can restate as ``rounds`` unrolled SQL stages; when the peel
    reaches a fixpoint earlier the remaining rounds are no-ops and the
    result is the true k-core. Returns the surviving edge frame
    (callers derive nodes/degrees with one more ``groupBy``).

    Scale shape: each round is one partial-agg degree count (shuffle
    on ``u``) plus two left-semi joins that reuse the same hash
    partitioning on ``u`` then ``v``; edge count is monotonically
    non-increasing, so per-round cost shrinks.

    ``checkpoint=True`` (the default, and unlike the other iterative
    operators here NOT optional at real round counts) cuts the logical
    lineage per round with an eager ``localCheckpoint``: a peel
    round's plan references its predecessor THREE times — the edge
    frame itself plus both semi-join sides — so the logical tree is
    3^rounds copies of the base plan and Catalyst analysis goes
    combinatorial long before execution starts (measured: 8 rounds at
    a few thousand edges hangs the driver; ``persist`` alone does NOT
    help, it caches the physical result but leaves the logical tree
    intact). The checkpoint costs one small eager job per round —
    exactly the per-superstep barrier a Pregel system runs anyway.
    ``checkpoint=False`` is for single-digit-round unit fixtures that
    must stay job-free.
    """
    e = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    for _ in range(rounds):
        ok = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .filter(F.col("__deg") >= k)
            .select("u")
        )
        e = e.join(ok.hint("shuffle_hash"), "u", "left_semi").join(
            ok.select(F.col("u").alias("v")).hint("shuffle_hash"), "v", "left_semi"
        )
        if checkpoint:
            e = e.localCheckpoint(eager=True)
    return e


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    u_col: str = "u",
    v_col: str = "v",
    checkpoint: bool = False,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Synchronous label propagation (community detection) over a
    SYMMETRIC edge set (every undirected edge present in both
    directions). Labels initialize to the node id; each round EVERY
    node simultaneously adopts the most frequent label among its
    neighbours, ties broken by the SMALLEST label — the fully
    deterministic variant (classic LPA breaks ties randomly and is
    irreproducible across engines; min-tie-break makes the whole run
    restatable as ``rounds`` unrolled SQL stages for an oracle).
    Exactly ``rounds`` supersteps — bounded semantics like
    ``kcore_peel``; at a fixpoint the remaining rounds are no-ops.
    Returns (node, community).

    Distinct from ``connected_components`` (which min-floods labels and
    converges to one label per component): frequency adoption lets
    dense regions KEEP their own label against a sparse bridge, so a
    barbell splits into two communities where CC reports one.

    Scale shape: each round is one shuffle-hash state><edges equi-join
    at edge granularity, one partial-agg (node, label) count — the
    frame is node x distinct-neighbour-labels, collapsing fast as
    communities form — and one per-node argmax folded into a single
    codegen ``max(struct(count, -label))``; no object aggregate, no
    window, B/edge/round constant. Lineage grows linearly in rounds
    (state joins the fixed edge frame, never itself);
    ``checkpoint=True`` bounds plan depth via eager localCheckpoint
    per round for long runs at true scale, as in ``pagerank``.
    Labels must be non-negative for the ``-label`` struct trick; node
    ids here are keys, which are."""
    labels = (
        edges.select(F.col(u_col).alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
    )
    for _ in range(rounds):
        l = labels.select(F.col("node").alias("__vn"), "lab")
        if salt_buckets:
            # hub-skew hardening (see pagerank): the join keys on v, so
            # a dominant IN-degree node floods one task; salt the edge
            # side, explode the node-sized label frame per bucket
            from batch_process_spark.operators import skew

            e2 = edges.select(F.col(u_col), F.col(v_col).alias("__vn"))
            joined = skew.salted_join(e2, l.hint("shuffle_hash"), on=["__vn"], buckets=salt_buckets)
        else:
            joined = edges.join(l.hint("shuffle_hash"), edges[v_col] == l.__vn)
        cnt = (
            joined.groupBy(F.col(u_col).alias("node"), F.col("lab"))
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        labels = (
            cnt.groupBy("node")
            .agg(F.max(F.struct(F.col("__c"), (-F.col("lab")).alias("__nl"))).alias("__m"))
            .select("node", (-F.col("__m.__nl")).alias("lab"))
        )
        # checkpoint AFTER each round's work (kcore_peel's placement):
        # a start-of-loop cut would eagerly checkpoint the initial
        # distinct-labels frame (one wasted job) and leave the FINAL
        # round's plan uncut.
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("lab").alias("community"))
