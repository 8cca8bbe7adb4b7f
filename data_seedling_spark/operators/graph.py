"""Iterative graph algorithms on DataFrames: connected components.

The dedup post-step: near-dup *pairs* (from MinHash-LSH or exact
Jaccard) form a graph whose connected components are the duplicate
*clusters*; one canonical document (min id) survives per cluster.

Implementation is iterative min-label propagation — the standard
DataFrame-native formulation (HashToMin flavor of Rastogi et al. 2013,
"Finding Connected Components in Map-Reduce"): each node repeatedly
adopts the smallest label among itself and its neighbors until a pass
changes nothing. Convergence in O(diameter) rounds; each round is one
join + one aggregate on (node, label) pairs — shuffle weight O(edges).

Scale notes: ``localCheckpoint`` cuts the lineage every round (an
iterative plan otherwise grows by one join per round and chokes the
optimizer); the convergence probe rides the same action via
``observe`` rather than a second count job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _state(df: DataFrame, broadcast_state: bool) -> DataFrame:
    """Per-round node-state frame for an iterative join (r14, guide
    §3.1): with ``broadcast_state`` the O(nodes) state ships to every
    task and the O(edges) side is never shuffled inside the loop —
    the right trade whenever the state fits Spark's broadcast limits
    (8 GB / 512M rows; a (long, long) state row is ~16 bytes, so up
    to ~10^8 nodes). Beyond that pass ``broadcast_state=False``: the
    planner falls back to shuffle joins against the persisted edge
    list, which scales without a cap."""
    return F.broadcast(df) if broadcast_state else df


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges`` is undirected input (each pair listed once is enough).
    """
    # persist: the symmetrised edge list feeds every iteration (and is
    # built from the edges subtree twice) — without this the upstream
    # pair-generation pipeline re-runs once per round per side
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist()
    )

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("neighbor_component"))
        )
        obs = Observation()
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("neighbor_component"), F.col("component"))
                    < F.col("component")
                ).cast("long").alias("_changed"),
            )
            .observe(obs, F.sum("_changed").alias("n_changed"))
            .drop("_changed")
        )
        labels = updated.localCheckpoint()  # materialises → observation valid
        if int(obs.get["n_changed"] or 0) == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "iterations (graph diameter exceeds the budget); raise "
        "max_iterations — silently returning partial labels would split "
        "true components"
    )


def dedup_clusters(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b"
) -> DataFrame:
    """Cluster near-dup pairs and pick the canonical (min-id) member:
    (doc_id, cluster_id, is_canonical)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) via the alternating large-star/small-star
    algorithm (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond") — the scale-preferred alternative to min-label
    propagation: converges in O(log² n) rounds REGARDLESS of graph
    diameter (label propagation needs O(diameter) rounds, which a
    100 TB web-graph chain topology turns into hundreds).

    Each round is two grouped-min + join passes over the edge list:

    - large-star: every node u links its LARGER neighbors to
      ``m(u) = min(Γ(u) ∪ {u})``,
    - small-star: every node u links its smaller-or-equal neighbors
      (and itself) to ``m(u)``.

    Both phases strictly decrease the potential Σ parent-distance, and
    at the fixed point the edges form stars ``(node, root)`` with root
    = the component's min id — identical output contract to
    :func:`connected_components`, so the same oracle verifies both.
    Convergence is detected by an order-independent edge-set signature
    (count + bit_xor of xxhash64 — sound because the frame is
    distinct) on the checkpointed frame — one metadata-sized action
    per round.
    """
    e = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .where(F.col("x") != F.col("y"))
        .distinct()
        .localCheckpoint()
    )

    def signature(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(F.least("x", "y"), F.greatest("x", "y"))).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def star(frame: DataFrame, large: bool) -> DataFrame:
        sym = frame.unionByName(
            frame.select(F.col("y").alias("x"), F.col("x").alias("y"))
        )
        mins = sym.groupBy("x").agg(
            F.least(F.min("y"), F.first("x")).alias("m")
        )
        joined = sym.join(mins, "x")
        if large:
            out = joined.where(F.col("y") > F.col("x")).select(
                F.col("y").alias("x"), F.col("m").alias("y")
            )
        else:
            out = joined.where(F.col("y") <= F.col("x")).select(
                F.col("y").alias("x"), F.col("m").alias("y")
            ).unionByName(joined.select("x", F.col("m").alias("y")))
        return out.where(F.col("x") != F.col("y")).distinct()

    sig = signature(e)
    for _ in range(max_iterations):
        e = star(star(e, large=True), large=False).localCheckpoint()
        new_sig = signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in "
            f"{max_iterations} rounds"
        )
    # fixed point: edges are (node, root). Components = edge targets
    # for non-roots, self for roots and isolated-in-input nodes.
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    return (
        nodes.join(e.withColumnRenamed("x", "node"), "node", "left")
        .select("node", F.coalesce(F.col("y"), F.col("node")).alias("component"))
    )


def bfs_hops(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    source: DataFrame | None = None,
    checkpoint: bool = True,
    broadcast_state: bool = True,
) -> DataFrame:
    """Frontier BFS: (node, hops) shortest hop-distance from a source
    over an undirected edge list, out to ``max_hops`` levels (fixed
    depth so the round count is engine-independent, same contract as
    the k-core peel). ``source`` is a 1-row (node) frame; None means
    the globally smallest node id (computed IN the plan — no driver
    action).

    Each level is one edge join keyed on the frontier + one anti-join
    against the visited set, so per-level shuffle weight is O(frontier
    boundary), never O(paths): the anti-join is what keeps a dense
    graph from re-expanding nodes the way a naive path-recursive
    formulation does. ``localCheckpoint`` per level cuts the iterative
    lineage, as in :func:`connected_components` — and it is NOT
    optional for performance either: each level's frontier/visited
    frame is referenced twice by the next level (anti-join + union),
    so without eager materialization the level-k plan re-executes
    every earlier level's subtree multiple times — measured 15.5 s vs
    4.0 s at sf0.1 for the 3-level co-purchase run. ``checkpoint=
    False`` exists only for plan-inspection tooling.
    """

    def _cut(df: DataFrame) -> DataFrame:
        return df.localCheckpoint() if checkpoint else df

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .persist()
    )
    if source is None:
        source = sym.agg(F.min("a").alias("node"))
    visited = _cut(source.select("node", F.lit(0).alias("hops")))
    frontier = visited
    for level in range(1, max_hops + 1):
        # Frontier and visited are O(nodes) while sym is O(edges):
        # broadcast the state frames so the edge list is NEVER
        # shuffled per level (guide §3.1 — the big side stays put;
        # previously both joins sort-merge-shuffled the edges every
        # level). The only remaining per-level exchange is the
        # boundary distinct.
        nxt = _cut(
            sym.join(_state(frontier, broadcast_state), sym.a == frontier.node)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(
                _state(visited.select("node"), broadcast_state),
                "node",
                "left_anti",
            )
            .withColumn("hops", F.lit(level))
        )
        if checkpoint and nxt.isEmpty():
            break
        visited = _cut(visited.unionByName(nxt))
        frontier = nxt
    if checkpoint:
        sym.unpersist()
    return visited


def bellman_ford(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    rounds: int = 3,
    source: DataFrame | None = None,
    broadcast_state: bool = True,
) -> DataFrame:
    """Bounded Bellman-Ford: cheapest path cost from a source over an
    undirected weighted edge list, relaxed for a fixed number of
    rounds (paths of ≤ ``rounds`` edges — fixed so the trajectory is
    engine-independent, same contract as :func:`bfs_hops`).

    Each round relaxes EVERY edge against the current tentative costs
    — one join keyed on the edge source + one (node, min cost)
    aggregate, both map-side combinable; nothing enumerates paths, so
    a dense graph costs O(edges) per round, not O(walks).
    ``localCheckpoint`` per round keeps the plan flat. Unreached nodes
    simply don't appear (no infinity sentinel to disagree on).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), F.col(weight).alias("w"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"), F.col(weight).alias("w"))
        )
        .persist()
    )
    if source is None:
        source = sym.agg(F.min("a").alias("node"))
    dist = source.select("node", F.lit(0).cast("long").alias("cost")).localCheckpoint()
    for _ in range(rounds):
        # dist is O(reached nodes), sym O(edges): broadcast the state
        # so relaxation never shuffles the edge list (guide §3.1); the
        # per-round exchange is only the map-side-combined MIN.
        relaxed = (
            sym.join(_state(dist, broadcast_state), sym.a == dist.node)
            .select(F.col("b").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
            .unionByName(dist.select("node", "cost"))
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint()
        )
        dist = relaxed
    sym.unpersist()
    return dist


def label_propagation_communities(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
    broadcast_state: bool = True,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), fixed round count for engine-independence: every node
    starts as its own label and repeatedly adopts the most frequent
    label among its neighbors (ties → smallest label — fully
    deterministic, unlike the randomized original).

    Per round: one edge⋈labels join + a (node, label) count + a
    per-node argmax (rank window partitioned by node — bounded by
    degree, never corpus-wide). Shuffle weight O(edges) per round,
    state O(nodes); ``localCheckpoint`` keeps the iterative plan flat.
    The community census downstream is a plain group-by.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("node").orderBy(F.col("_c").desc(), F.col("label"))
    for _ in range(rounds):
        # labels is O(nodes): broadcast it so the edge list is never
        # shuffled per round (guide §3.1).
        neigh = (
            sym.join(_state(labels, broadcast_state), sym.b == labels.node)
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count("*").alias("_c"))
        )
        labels = (
            neigh.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    sym.unpersist()
    return labels


def pagerank_integer(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    rounds: int = 3,
    scale: int = 10**12,
    broadcast_state: bool = True,
) -> DataFrame:
    """Bounded PageRank in exact integer microunits — the
    hash-comparable twin of the classic damped iteration.

    Float PageRank sums per-node contributions in nondeterministic
    order, so no two engines (or two shuffles) agree bit-for-bit.
    Here ranks live on an integer grid: every node starts at ``scale``
    (10^12 microunits), a round sends each neighbor
    ``div(85 · r, 100 · deg)`` (Spark IntegralDivide — exact), and the
    update is ``15% · scale + Σ contributions`` — integer sums are
    order-independent, so the whole trajectory is reproducible in
    unrolled SQL CTEs and across cluster sizes. Overflow headroom:
    total mass stays ≈ N·scale, so ``85·r`` fits int64 up to ~10^5
    nodes at 10^12 scale (drop ``scale`` a decade per decade of nodes
    beyond that).

    Same scale posture as :func:`bellman_ford`: per round one join on
    the edge source + one map-side-combinable integer SUM;
    ``localCheckpoint`` keeps the plan flat. Isolated nodes don't
    appear in an edge list; every listed node has deg ≥ 1.
    """
    # r14 optimization: persist the (small, pre-union) edge input once —
    # the symmetrized view scans it twice and deg/sym_den each scan the
    # view — rather than persisting the 2×-size symmetrized frame (an
    # A/B showed double-persisting sym AND sym_den pays the cache write
    # twice and reads slower than recomputing the union off the cached
    # input).
    edges = edges.persist()
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("_deg"))
    # The per-edge denominator 100·deg(a) is loop-invariant — join it
    # into the persisted edge list ONCE instead of re-aggregating and
    # re-joining deg every round, and broadcast the O(nodes) rank state
    # so the O(edges) side is never shuffled inside the loop (guide
    # §2.4/§3.1). Per round: one broadcast join + one map-side-combined
    # integer SUM; the arithmetic (and therefore the exact integer
    # trajectory) is unchanged.
    sym_den = sym.join(deg, "a").select(
        "a", "b", (F.lit(100).cast("long") * F.col("_deg")).alias("_den")
    ).persist()
    base = scale * 15 // 100
    ranks = deg.select(
        F.col("a").alias("node"), F.lit(scale).cast("long").alias("r")
    ).localCheckpoint()
    for _ in range(rounds):
        contrib = sym_den.join(
            _state(ranks, broadcast_state), sym_den.a == ranks.node
        ).select(
            F.col("b").alias("node"),
            F.call_function(
                "div", F.lit(85).cast("long") * F.col("r"), F.col("_den")
            ).alias("c"),
        )
        ranks = (
            contrib.groupBy("node")
            .agg((F.lit(base).cast("long") + F.sum("c")).alias("r"))
            .localCheckpoint()
        )
    sym_den.unpersist()
    edges.unpersist()
    return ranks


def pagerank_weighted(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    rounds: int = 3,
    scale: int = 10**12,
    max_weight: int = 100,
    broadcast_state: bool = True,
) -> DataFrame:
    """Edge-weighted integer PageRank: a round sends each neighbor
    ``div(85 · r · w, 100 · wdeg)`` where ``wdeg`` is the node's total
    outgoing weight — the co-purchase ranker's natural upgrade (an
    edge seen in 40 baskets pulls 40× the mass of a one-off pairing).

    Same exact-integer contract as :func:`pagerank_integer` (every
    term integer-divides on the microunit grid; sums are
    order-independent, so the trajectory is engine-reproducible).
    Weights clamp to ``max_weight`` BEFORE the walk for int64
    headroom: the product ``85·r·w`` stays < 2^63 while ranks remain
    under ~1000× ``scale`` — and a clamp is also the right semantics
    at corpus scale, where one bot basket pair shouldn't own the
    random walk (same posture as the basket cap upstream).
    """
    # Persist the pre-union input once (see :func:`pagerank_integer`);
    # the symmetrized view and deg recompute cheaply off the cache.
    edges = edges.persist()
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"),
        F.least(F.col(weight), F.lit(max_weight)).cast("long").alias("_w"),
    ).unionByName(
        edges.select(
            F.col(dst).alias("a"), F.col(src).alias("b"),
            F.least(F.col(weight), F.lit(max_weight))
            .cast("long").alias("_w"),
        )
    )
    deg = sym.groupBy("a").agg(F.sum("_w").alias("_wd"))
    # Loop-invariant denominator folded into the persisted edges once +
    # broadcast rank state — same restructure (and same exact integer
    # trajectory) as :func:`pagerank_integer`.
    sym_den = sym.join(deg, "a").select(
        "a", "b", "_w",
        (F.lit(100).cast("long") * F.col("_wd")).alias("_den"),
    ).persist()
    base = scale * 15 // 100
    ranks = deg.select(
        F.col("a").alias("node"), F.lit(scale).cast("long").alias("r")
    ).localCheckpoint()
    for _ in range(rounds):
        contrib = sym_den.join(
            _state(ranks, broadcast_state), sym_den.a == ranks.node
        ).select(
            F.col("b").alias("node"),
            F.call_function(
                "div",
                F.lit(85).cast("long") * F.col("r") * F.col("_w"),
                F.col("_den"),
            ).alias("c"),
        )
        ranks = (
            contrib.groupBy("node")
            .agg((F.lit(base).cast("long") + F.sum("c")).alias("r"))
            .localCheckpoint()
        )
    sym_den.unpersist()
    edges.unpersist()
    return ranks


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "u",
    dst: str = "v",
    rounds: int = 3,
    scale: int = 10**12,
    broadcast_state: bool = True,
) -> DataFrame:
    """Personalized PageRank: the 15% restart mass teleports to the
    ``seeds`` node set instead of uniformly — "importance relative to
    THESE products", the similar-items / recommendations walk
    (Haveliwala 2002, topic-sensitive PageRank).

    Integer contract as :func:`pagerank_integer`; the only change is
    the update: seeds get ``15%·scale`` restart plus their inbound
    mass, non-seeds keep inbound mass only (their rank decays to
    pure walk-through traffic). Ranks start at ``scale`` ON THE SEEDS
    and 0 elsewhere, so round k's support is exactly the k-hop
    neighborhood — at 100 TB the frames stay proportional to the
    walk's reach, not the graph. The restart is applied as a UNION of
    seed base rows into the contribution aggregate (one
    map-side-combinable integer SUM per round — no outer join; the
    SQL oracle's FULL OUTER formulation is the same arithmetic).
    """
    # Persist the pre-union input once (see :func:`pagerank_integer`).
    edges = edges.persist()
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("_deg"))
    # Same restructure as :func:`pagerank_integer`: loop-invariant
    # 100·deg(a) folded into the persisted edges, O(reached nodes)
    # rank state broadcast per round.
    sym_den = sym.join(deg, "a").select(
        "a", "b", (F.lit(100).cast("long") * F.col("_deg")).alias("_den")
    ).persist()
    seed_nodes = seeds.select(
        F.col(seeds.columns[0]).alias("node")
    ).persist()
    base = scale * 15 // 100
    seed_base = seed_nodes.select(
        "node", F.lit(base).cast("long").alias("c")
    )
    ranks = seed_nodes.select(
        "node", F.lit(scale).cast("long").alias("r")
    ).localCheckpoint()
    for _ in range(rounds):
        contrib = sym_den.join(
            _state(ranks, broadcast_state), sym_den.a == ranks.node
        ).select(
            F.col("b").alias("node"),
            F.call_function(
                "div", F.lit(85).cast("long") * F.col("r"), F.col("_den")
            ).alias("c"),
        )
        ranks = (
            contrib.unionByName(seed_base)
            .groupBy("node")
            .agg(F.sum("c").alias("r"))
            .localCheckpoint()
        )
    sym_den.unpersist()
    edges.unpersist()
    seed_nodes.unpersist()
    return ranks
