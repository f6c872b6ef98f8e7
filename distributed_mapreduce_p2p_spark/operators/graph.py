"""Distributed graph operators: triangle counting and PageRank.

The reference's graph-shaped work is its P2P overlay bookkeeping
(gossip membership, `p2p/gossip.go`), which SURVEY.md §2.10 declares
runtime-subsumed; these operators instead cover the *analytics*
graph workloads a data-curation pipeline runs on derived relation
graphs (co-occurrence graphs, transition graphs, similarity graphs
from the dedup family).

Scale design:

- ``triangle_count`` uses the degree-ordered orientation (Cohen's
  MapReduce triangle algorithm; also Suri & Vassilvitskii WWW'11):
  orient every undirected edge from its lower-(degree, id) endpoint
  to the higher one. Every out-degree is then O(sqrt(m)), so the
  wedge join produces at most O(m^{3/2}) candidate rows regardless
  of skew — a star node with degree 10^6 contributes ZERO wedges
  instead of 10^12. Three hash joins, no collect, no cartesian.
- ``pagerank_fixedpoint`` is PageRank in *fixed-point integer
  arithmetic* (rank mass scaled by 10^12 and divided with integer
  DIV). Floating-point PageRank is order-of-addition dependent, so
  two runs (or two engines) disagree in the last ulps; the integer
  formulation makes every iteration exactly reproducible on any
  partitioning/engine — the property that matters for an
  oracle-checked, resumable 100 TB job. Contribution flow:
  contrib(u->v) = r(u) DIV outdeg(u); r'(v) = (15*(SCALE DIV N))
  DIV 100 + (85 * sum(contrib)) DIV 100. Dangling-node mass is
  dropped (the classic MapReduce formulation), documented, and
  identical in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12  # fixed-point rank scale; 85*SCALE < 2^63 with margin


def canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set, canonicalized: (a < b), self-loops
    dropped, duplicates removed. One shuffle (the distinct)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count via degree-ordered orientation.

    Returns a 1-row DataFrame ``(n_nodes, n_edges, n_triangles)``
    (all BIGINT). Each triangle {x,y,z} is counted exactly once: the
    orientation is a total order (degree, then id), so the triangle
    has exactly one source-of-two-out-edges under it.
    """
    # The (often expensively derived) edge relation is referenced by
    # the degree, orientation, wedge, and closing-edge subplans;
    # materialize it once instead of recomputing the upstream
    # pipeline per reference (the multi-pass analog of caching the
    # loop-invariant relation in iterative algorithms).
    e = canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient a--b toward the higher (deg, id): out-degree <= O(sqrt m).
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        e.join(da, e.a == F.col("da.node"))
        .join(db, e.b == F.col("db.node"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | ((F.col("da.deg") == F.col("db.deg")) & (e.a < e.b)),
                F.struct(e.a.alias("u"), e.b.alias("v")),
            )
            .otherwise(F.struct(e.b.alias("u"), e.a.alias("v")))
            .alias("edge")
        )
        .select("edge.u", "edge.v")
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
    )
    tri = wedges.join(
        e3, (F.col("x") == F.col("e3.u")) & (F.col("z") == F.col("e3.v"))
    )
    counts = (
        e.agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
        )
        .crossJoin(deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
        .crossJoin(tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
    )
    return counts.select("n_nodes", "n_edges", "n_triangles")


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list.

    Returns ``(node, rank_fp)`` with rank_fp = rank * 10^12 as
    BIGINT — bit-exact on any engine/partitioning (see module doc).
    The iteration loop truncates lineage with ``localCheckpoint``
    every ``checkpoint_every`` rounds so a 50-iteration run doesn't
    accumulate a 150-join plan (same pattern as
    dedup.py::dedup_clusters).
    """
    # Materialize the loop-invariant edge relation once: every
    # iteration (plus nodes/outdeg) re-references it, and without
    # this the upstream edge derivation re-executes per reference.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outd = e.groupBy(F.col("u")).agg(
        F.count(F.lit(1)).alias("od")
    ).localCheckpoint(eager=True)
    # N is one tiny scalar: computed once, embedded as a literal so
    # every iteration's expression is a constant (no scalar-subquery
    # re-evaluation per round).
    n_nodes = nodes.count()
    r0 = SCALE // n_nodes
    base = (15 * r0) // 100
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("r"))
    for it in range(iters):
        contrib = (
            e.join(ranks, e.u == ranks.node)
            .join(outd, "u")
            .select(F.col("v"), F.expr("r DIV od").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.v, "left")
            .select(
                "node",
                (
                    F.lit(base) + F.expr("(85 * coalesce(s, 0)) DIV 100")
                )
                .cast("long")
                .alias("r"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("rank_fp"))


def bfs_levels(
    edges: DataFrame, src_node: int, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Breadth-first levels (unweighted shortest hop counts) from
    ``src_node`` over an undirected edge list: ``(node, level)`` for
    every REACHED node. Frontier-expansion loop — each round is one
    equi-join + anti-join (the iterative driver-loop class, like
    PageRank/CC), bounded by the graph diameter; the frontier and
    level table are checkpointed per round so round N's plan does not
    nest N joins. At 100 TB both joins shuffle on the node key, and
    state is the visited set — the standard distributed BFS shape."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    levels = spark.createDataFrame(
        [(int(src_node), 0)], "node: long, level: long"
    ).localCheckpoint(eager=True)
    frontier = levels
    depth = 0
    while True:
        depth += 1
        nxt = (
            frontier.join(e, frontier.node == e.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(levels.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(depth).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels = levels.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return levels


def sssp_costs(
    edges: DataFrame,
    src_node: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Single-source shortest-path COSTS over an undirected weighted
    edge list (integer weights): ``(node, cost)`` for every reached
    node — distributed Bellman-Ford. Each round relaxes every edge
    out of the current distance table (one equi-join), min-combines
    candidate distances with the incumbent (one groupBy), and stops
    at fixpoint (no row improved). Converges in at most |V|-1 rounds
    on non-negative weights; each round is checkpointed so round N's
    plan does not nest N joins (same discipline as bfs_levels /
    pagerank_fixedpoint above).

    Integer weights keep the relaxation exactly reproducible on any
    partitioning/engine (the pagerank_fixedpoint argument): min() of
    bigints has no accumulation-order sensitivity, so an oracle can
    replay it with a recursive CTE bit-for-bit. At 100 TB the edge
    list shuffles once per round on the node key and the distance
    table is the only growing state — the standard iterative
    frontier-relaxation shape (Pregel-style SSSP without the
    framework).
    """
    e = (
        edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v"),
            F.col(weight).cast("long").alias("w"),
        )
        .unionAll(
            edges.select(
                F.col(dst).alias("u"), F.col(src).alias("v"),
                F.col(weight).cast("long").alias("w"),
            )
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(src_node), 0)], "node: long, cost: long"
    ).localCheckpoint(eager=True)
    while True:
        relaxed = (
            dist.join(e, dist.node == e.u)
            .select(F.col("v").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
            .unionByName(dist)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
        at_fixpoint = (
            relaxed.join(
                dist.select("node", F.col("cost").alias("old_cost")),
                "node",
                "left",
            )
            .where(
                F.col("old_cost").isNull()
                | (F.col("cost") < F.col("old_cost"))
            )
            .isEmpty()
        )
        dist = relaxed
        if at_fixpoint:
            return dist
