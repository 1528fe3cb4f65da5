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
