"""Iterative graph ranking over edge DataFrames (north-star adjacency:
supplier/customer importance, dedup-cluster authority).

Complements ``operators.dedup.canonical_components`` (min-label
propagation): PageRank is the *weighted* iterative shape — per-iteration
contribution scatter (join on src) + gather (groupBy dst) — with the same
lineage-truncation discipline every iterative DataFrame algorithm needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list, pure DataFrame ops.

    Per iteration: contributions scatter along edges (one equi-join on
    ``src``) and gather at destinations (one hash agg on ``dst``) — two
    shuffles on uniform keys, each carrying one double per edge/node.
    ``localCheckpoint`` truncates lineage each round so iteration i costs
    O(1) plans, not O(i) re-derivations (on a cluster with an HDFS
    checkpoint dir, ``checkpoint()`` drops in for executor-failure
    durability; the plan shape is identical).

    Uses the un-normalized convention (rank mass sums to the node count,
    invariant-tested): r(v) = (1-d) + d·Σ r(u)/out_deg(u). Callers must
    pass an edge list where every node has at least one out-edge (e.g.
    add reverse edges for bipartite graphs) — otherwise dangling mass
    drains the sum invariant.
    """
    # Materialize the edge list once: every iteration's scatter join reads
    # it, and without this the whole upstream derivation (joins, distinct)
    # re-executes per round — measured 4× on the trade graph at sf0.1.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint(eager=True)
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    for _ in range(iters):
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("gathered"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("gathered"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_stats(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected edge list (one row per edge, ``a < b``, no self-loops).

    Uses the degree-orientation trick (Cohen's MapReduce triangle
    algorithm; also GraphX's "canonical orientation"): every edge is
    directed from its lower-(degree, id) endpoint to the higher one, which
    makes the orientation acyclic and bounds every node's out-degree by
    O(√m). Each triangle {u,v,w} then appears exactly once as the wedge
    u→v, u→w (v before w in the total order) closed by the edge v→w.

    Scale: the wedge-generation self-join is keyed on the wedge apex
    ``src`` — its fan-out is Σ out_deg(u)², the quantity degree
    orientation minimizes (a raw id-ordering would square the max degree
    of hub nodes instead). The closing step is an equi-join of wedges
    against oriented edges on (v, w). Three shuffles total (degree agg,
    wedge self-join, closing join), every one on uniform-ish keys; no
    node ever sees more than its own O(√m)-bounded out-neighborhood.

    Returns ONE row: n_nodes, n_edges, n_wedges (open+closed, orientation-
    independent: Σ d(d−1)/2), n_triangles, clustering_coeff
    (= 3·triangles / wedges, the standard global transitivity ratio).
    """
    # The edge list feeds five consumers (two degree legs, two orientation
    # joins, the edge count) and is usually derived from an expensive
    # upstream (co-occurrence mining); materialize it ONCE — without this
    # the whole upstream pipeline re-executes per consumer (measured: an
    # 18× lineitem re-scan on the co-purchase graph). Same discipline as
    # `pagerank`; on a cluster `checkpoint()` drops in.
    e = edges.select(F.col(a).alias("pa"), F.col(b).alias("pb")).localCheckpoint(
        eager=True
    )
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionByName(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=True)
    )
    da, db_ = deg.alias("da"), deg.alias("db")
    withdeg = (
        e.join(da, F.col("pa") == F.col("da.node"))
        .join(db_, F.col("pb") == F.col("db.node"))
        .select(
            "pa", "pb", F.col("da.d").alias("dpa"), F.col("db.d").alias("dpb")
        )
    )
    # Orient low → high in (degree, id) order.
    lo_first = (F.col("dpa") < F.col("dpb")) | (
        (F.col("dpa") == F.col("dpb")) & (F.col("pa") < F.col("pb"))
    )
    oriented = withdeg.select(
        F.when(lo_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(lo_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        F.when(lo_first, F.col("dpb")).otherwise(F.col("dpa")).alias("ddeg"),
    ).localCheckpoint(eager=True)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(o2, "src").where(
        (F.col("o1.ddeg") < F.col("o2.ddeg"))
        | (
            (F.col("o1.ddeg") == F.col("o2.ddeg"))
            & (F.col("o1.dst") < F.col("o2.dst"))
        )
    ).select(F.col("o1.dst").alias("v"), F.col("o2.dst").alias("w"))
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).agg(
        F.count("*").alias("n_triangles")
    )
    summary = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("bigint").alias("n_wedges"),
    )
    n_edges = e.agg(F.count("*").cast("bigint").alias("n_edges"))
    return (
        n_edges.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.round(
                F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                    3.0 * F.col("n_triangles") / F.col("n_wedges")
                ),
                6,
            ).alias("clustering_coeff"),
        )
    )
