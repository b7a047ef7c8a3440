"""Graph analytics over DataFrames — weighted PageRank by power iteration.

Complements the connected-components operator in ``operators/dedup.py``
(near-dup clustering) with the other workhorse graph primitive a corpus
pipeline needs: ranking nodes of a derived co-occurrence graph (entities
sharing documents, event types sharing users, domains sharing links) by
stationary importance. Brin & Page 1998; damped power iteration with a
fixed iteration count keeps the computation deterministic and oracle-
replayable (an unrolled CTE per iteration).

Scale shape: each iteration is one join of the edge list against the
current rank vector plus one groupBy(dst) — shuffles sized by |edges|,
state sized by |nodes|. No collect anywhere: the node count (for the
teleport term) rides a broadcast one-row aggregate. Danging-mass
redistribution is skipped because every caller derives symmetric
co-occurrence edges (an edge implies out-weight on both endpoints);
isolated nodes keep the teleport floor (1−d)/N.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_mcp_spark.operators.partition import bcast_if_fits, pin_counted


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """(node, pr) after ``iters`` damped power iterations from uniform.

    ``edges`` is a weighted directed edge list; pass both directions for an
    undirected graph. pr_{t+1}(v) = (1−d)/N + d·Σ_u pr_t(u)·w(u,v)/W(u),
    W(u) = Σ_v w(u,v)."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).cast("double").alias("w")
    )
    # Iteration-invariant tables and each iteration's rank vector are
    # localCheckpoint()ed (the same lineage-truncation the connected-
    # components fixpoint in operators/dedup.py uses): without it every
    # iteration's lineage re-derives edges/nodes from the source relation
    # and the final plan re-scans the input O(iters²) times (measured: 44
    # scans / 121 exchanges for 3 iterations on the co-occurrence suite
    # entry vs 3 materializations checkpointed). Checkpointed state is
    # |nodes| + |edges| rows — the working set any Pregel-style runtime
    # keeps resident.
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = nodes.agg(F.count("*").alias("n"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # fraction of u's rank flowing along each edge — iteration-invariant
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("f"))
        .localCheckpoint(eager=True)
    )
    pr = nodes.join(F.broadcast(n_total)).select("node", (F.lit(1.0) / F.col("n")).alias("pr"))
    # With the iteration-invariant tables (nodes, frac, n_total) checkpointed
    # as leaves above, each iteration references the previous rank vector
    # exactly ONCE — the lineage is a linear chain, so no per-iteration
    # checkpoint is needed: the whole power iteration plans as one action and
    # the nodes/frac/n_total exchanges are REUSED across iterations instead
    # of being re-executed by a checkpoint job per round (r13 optimization;
    # the O(iters²) rescan the old per-round checkpoint guarded against only
    # occurs when the INVARIANTS are un-checkpointed lineage).
    for _ in range(iters):
        contrib = (
            frac.join(pr, frac.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("f")).alias("inflow"))
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .join(F.broadcast(n_total))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr


def cooccurrence_edges(
    pairs: DataFrame, item_col: str = "item", group_col: str = "grp"
) -> DataFrame:
    """Symmetric co-occurrence edge list from (group, item) membership:
    weight(a, b) = number of distinct groups containing both. The self-join
    is blocked on the group key (each group contributes |items|² pairs —
    bounded by per-group cardinality, never corpus-quadratic; cap pathological
    groups upstream with a HAVING on group size)."""
    m = pairs.select(F.col(group_col).alias("g"), F.col(item_col).alias("a")).distinct()
    other = m.select(F.col("g"), F.col("a").alias("b"))
    return (
        m.join(other, "g")
        .where(F.col("a") != F.col("b"))
        .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
        .agg(F.count("*").alias("w"))
    )


def co_membership_counts(
    pairs: DataFrame, item_col: str = "item", group_col: str = "grp"
) -> DataFrame:
    """Weighted canonical co-occurrence: (a, b, c_ab) for a < b, c_ab =
    number of distinct groups containing both items. THE one copy of the
    group-blocked membership self-join (each group contributes
    C(|items|, 2) pairs — bounded by per-group cardinality, never
    corpus-quadratic); ``undirected_edges`` and the item-similarity
    entries derive from it, so a future group-size cap lands once."""
    m = pairs.select(F.col(group_col).alias("g"), F.col(item_col).alias("a")).distinct()
    other = m.select("g", F.col("a").alias("b"))
    return (
        m.join(other, "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
    )


def membership_counts(
    pairs: DataFrame, item_col: str = "item", group_col: str = "grp"
) -> DataFrame:
    """(item, c) = number of distinct groups containing the item."""
    return (
        pairs.select(F.col(group_col).alias("g"), F.col(item_col).alias("a"))
        .distinct()
        .groupBy("a")
        .agg(F.count("*").alias("c"))
    )


def undirected_edges(pairs: DataFrame, item_col: str = "item", group_col: str = "grp") -> DataFrame:
    """Distinct undirected edges (a < b) from (group, item) membership —
    the canonical-orientation input triangle counting needs."""
    return co_membership_counts(pairs, item_col, group_col).select("a", "b")


def triangle_count(edges: DataFrame, materialize: bool = True) -> DataFrame:
    """Count triangles over a canonical (a < b) edge list: one row
    (n_edges, n_triangles).

    The edge list participates four times (both wedge sides, the closing
    join, the edge count); ``materialize=True`` localCheckpoints it so the
    upstream derivation runs once instead of four times — at scale the
    edge list would be a materialized table anyway.

    Degree-oriented compact-forward counting (Latapy 2008 / Cohen 2009,
    public): each edge is re-oriented from its lower-(degree, id) endpoint
    to the higher one, wedges are pairs of out-edges at their common
    source, and each candidate closes against the canonical edge list.
    Every triangle has exactly one vertex that out-points to the other two
    under a total order, so it is generated once. The payoff is the wedge
    count: Σ C(out-degree, 2) with out-degree ≤ O(√m) under degree
    orientation versus Σ C(degree, 2) unoriented — on the dense co-order
    graph this is the difference between 148 M and ~35 M wedge rows, and
    on power-law graphs it is the difference between quadratic-in-hub and
    near-linear. The degree table is |V|-sized (AQE broadcasts it while it
    fits)."""
    e = edges.select("a", "b")
    n_e = -1
    if materialize:
        # pin_counted + measured broadcast gates (r14): the checkpoint leaf
        # has no stats, so the four e references planned sort-merge joins
        # and AQE sank both-side shuffles; with the measured count the
        # degree attachments and the wedge-closing probe hint broadcast
        # only while they fit the session threshold (measured A/B: 0.94 to
        # 0.85 s, 17 to 16 jobs; the same treatment on the single-action
        # pagerank/LPA/BFS iteratives measured WORSE and was reverted —
        # there AQE already reuses the materialized shuffles across rounds)
        e, n_e = pin_counted(e)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    # |deg| <= 2|e| distinct endpoints bounds the derived frames
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    if n_e >= 0:
        da = bcast_if_fits(da, 2 * n_e)
        db = bcast_if_fits(db, 2 * n_e)
    # orient lower (deg, id) -> higher (deg, id); ties by id are strict
    fwd_ab = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oe = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd_ab, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(fwd_ab, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    o1 = oe.select("src", F.col("dst").alias("d1"))
    o2 = oe.select("src", F.col("dst").alias("d2"))
    # each unordered out-neighbor pair once, re-canonicalized by id so it
    # can close against the (a < b) edge list
    wedges = (
        o1.join(o2, "src")
        .where(F.col("d1") < F.col("d2"))
        .select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    )
    # inner join, not semi: distinct wedges may share (a, b) — each is a
    # different apex, hence a different triangle; e is distinct so at most
    # one match per wedge row
    tri = wedges.join(bcast_if_fits(e, n_e) if n_e >= 0 else e, ["a", "b"])
    return e.agg(F.count("*").alias("n_edges")).crossJoin(
        tri.agg(F.count("*").alias("n_triangles"))
    )


def label_propagation(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Synchronous label propagation communities (Raghavan 2007, public)
    over an undirected (a, b) edge list: (node, label) after ``iters``
    rounds. Deterministic: labels start as node ids and each round every
    node adopts the most frequent label among its neighbors, ties broken
    by smallest label — a pure function of the graph, so unrolled SQL
    replays it. Each round is one edge-keyed shuffle plus a node-keyed
    argmax; localCheckpoint per round keeps lineage O(1) (the CC fixpoint
    discipline)."""
    if not 1 <= iters <= 16:
        raise ValueError(f"label_propagation: iters must be in [1, 16], got {iters}")
    e = edges.select("a", "b").localCheckpoint(eager=True)
    # Symmetrized ONCE up front so each round joins the label vector a single
    # time: the old per-direction double join referenced `labels` twice per
    # round, which is what forced a per-round localCheckpoint (subplan
    # doubling). With one reference per round the lineage is a linear chain —
    # the whole propagation plans as one action and the edge exchange is
    # reused across rounds (r13 optimization). nb multiset is identical:
    # e⋈labels(b)→(a,l) ∪ e⋈labels(a)→(b,l) ≡ (e ∪ swap(e))⋈labels(b)→(a,l).
    e_sym = (
        e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        nb = e_sym.join(labels.withColumnRenamed("node", "b"), "b").select(
            F.col("a").alias("node"), "label"
        )
        cnt = nb.groupBy("node", "label").agg(F.count("*").alias("c"))
        w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label").asc())
        labels = (
            cnt.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "label")
        )
    return labels


def bfs_levels(
    edges: DataFrame,
    source,
    max_hops: int = 3,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """BFS levels from ``source`` over a canonical (a < b) undirected edge
    list: (node, level) for every node within ``max_hops``, level = hop
    count of the FIRST visit (the shortest unweighted path length).

    Distributed frontier expansion: each hop is one equi-join of the
    (small) frontier against the adjacency list plus an anti-join against
    the visited set — no path enumeration, so state is |reached| rows
    however dense the graph. Iterative, so each hop's output is
    localCheckpoint-ed (lineage truncation — the same rule PageRank and CC
    follow); early-exits when a frontier empties."""
    adj = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # seed unconditionally (an isolated source still reports itself at
    # level 0 — deriving the seed from the adjacency list would lose it)
    visited = (
        edges.sparkSession.range(1)
        .select(
            F.lit(source).cast(adj.schema["src"].dataType).alias("node"),
            F.lit(0).cast("int").alias("level"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for lvl in range(1, max_hops + 1):
        nxt = (
            adj.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(lvl).cast("int").alias("level"))
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def personalized_pagerank(
    edges: DataFrame,
    seeds: Sequence,
    damping: float = 0.85,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Personalized PageRank: teleport mass returns to the SEED set instead
    of all nodes — "importance relative to this basket", the random-walk
    recommendation primitive (Haveliwala 2002 topic-sensitive PageRank).
    Same checkpointed power iteration as :func:`pagerank`; init and
    teleport are the uniform-over-seeds vector."""
    seeds = list(seeds)
    if not seeds:
        raise ValueError("seeds must be non-empty")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).cast("double").alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("f"))
        .localCheckpoint(eager=True)
    )
    seed_mass = F.when(F.col("node").isin(seeds), F.lit(1.0 / len(seeds))).otherwise(F.lit(0.0))
    pr = nodes.select("node", seed_mass.alias("pr"))
    # linear lineage (pr referenced once per round) — no per-iteration
    # checkpoint; see pagerank above (r13 optimization)
    for _ in range(iters):
        contrib = (
            frac.join(pr, frac.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("f")).alias("inflow"))
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    (1.0 - damping) * seed_mass
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr
