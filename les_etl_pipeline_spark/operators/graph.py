"""Graph operators over edge-list DataFrames.

Connected components (dedup clustering) lives in operators/dedup.py;
this module holds the rank-propagation family. Same iterative posture:
one shuffle per iteration, localCheckpoint lineage cuts, driver touches
nothing but the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    symmetric: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list (columns: src, dst).

    Deterministic for a fixed iteration count — no convergence test, so
    the result is a pure function of the graph (an engine-portable
    oracle can unroll the same iterations). ``symmetric`` mirrors each
    edge (undirected graph); with it every node has out-degree >= 1, so
    no dangling-mass term is needed and the plan stays a pure join+agg.
    With ``symmetric=False`` the vertex set is src ∪ dst and each
    iteration redistributes the dangling mass (rank parked on sink
    nodes) uniformly — the standard correction, computed as a 1-row
    aggregate broadcast, never a driver collect. Each iteration is one
    join + one groupBy on the vertex id; the rank vector is checkpointed
    per iteration to cut lineage. Returns (node, rank); ranks sum to 1
    either way.
    """
    e = edges.select(F.col(edges.columns[0]).alias("src"), F.col(edges.columns[1]).alias("dst"))
    if symmetric:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint()

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # scalar cardinality, driver-side by design
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out = e.join(deg, "src").localCheckpoint()  # (src, dst, deg) — loop-invariant

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            out.join(ranks, out.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        joined = nodes.join(contrib, "node", "left")
        inflow = F.coalesce("inflow", F.lit(0.0))
        if not symmetric:
            # Mass parked on sinks (no out-edges) this iteration, spread
            # uniformly. 1-row aggregate, broadcast to every partition.
            dangling = ranks.join(
                deg, ranks.node == deg.src, "left_anti"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
            joined = joined.crossJoin(F.broadcast(dangling))
            inflow = inflow + F.col("_dangling") / n
        ranks = (
            joined.select(
                "node",
                (F.lit(base) + F.lit(damping) * inflow).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def bfs_distances(
    edges: DataFrame, source, max_hops: int = 4, symmetric: bool = True
) -> DataFrame:
    """Hop-bounded BFS shortest-path distances from ``source``:
    (node, dist) for every node reachable within ``max_hops``.

    Same iterative posture as pagerank: each hop is ONE equi-join of the
    current frontier with the (checkpointed, loop-invariant) edge table
    plus a min-aggregate; the frontier is only the nodes FIRST reached at
    this hop, so expanded work shrinks as the search saturates. The
    driver touches nothing but the loop counter — distances never leave
    the cluster. Hop-bounded by construction (deterministic output, no
    convergence test), which is also the honest 100 TB posture: a
    k-hop neighborhood query, not an unbounded traversal."""
    e = edges.select(
        F.col(edges.columns[0]).alias("src"), F.col(edges.columns[1]).alias("dst")
    )
    if symmetric:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint()
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0)], ["node", "dist"])
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"), F.lit(hop).alias("dist"))
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
        frontier = dist.where(F.col("dist") == hop)
        if frontier.isEmpty():
            break
    return dist
