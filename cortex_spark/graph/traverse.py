"""Graph traversal as iterative DataFrame joins (SURVEY §2.8 G1-G10, G14).

The reference BFS (graph/traversal.rs:56-187) keeps a queue + visited set +
depth map with budgets. Distributed: frontier-join iteration — each round
joins the frontier against the (pre-filtered, cached) adjacency projection
and keeps the min depth per node. DFS (G2) visits the same node set, so the
distributed engine exposes BFS semantics and documents order-insensitivity
(SURVEY G2). Traversal budgets (max_visited / per-level caps,
graph/types.rs:159-180) become per-iteration row-count guards.

All filters (relation, min_weight, created_after / as-of time-travel G14)
apply to the adjacency projection ONCE, before iteration — one narrow
cached frame feeds every round.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_DEPTH = 3  # graph/types.rs:42-57
DEFAULT_MAX_VISITED = 10_000


def _adjacency(
    edges: DataFrame,
    direction: str = "both",
    relation: str | list[str] | None = None,
    min_weight: float | None = None,
    created_after: datetime | None = None,
    as_of: datetime | None = None,
) -> DataFrame:
    e = edges
    if relation is not None:
        rels = [relation] if isinstance(relation, str) else list(relation)
        e = e.filter(F.col("relation").isin(rels))
    if min_weight is not None:
        e = e.filter(F.col("weight") >= min_weight)
    if created_after is not None:
        e = e.filter(F.col("created_at") > F.lit(created_after))
    if as_of is not None:  # neighborhood_at time-travel (graph/temporal.rs:55-123)
        e = e.filter(F.col("created_at") <= F.lit(as_of))
    out = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    inn = e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    if direction == "out":
        adj = out
    elif direction == "in":
        adj = inn
    else:
        adj = out.unionByName(inn)
    return adj.distinct()


def bfs(
    edges: DataFrame,
    start: DataFrame | list[str],
    max_depth: int = DEFAULT_MAX_DEPTH,
    direction: str = "both",
    relation: str | list[str] | None = None,
    min_weight: float | None = None,
    created_after: datetime | None = None,
    as_of: datetime | None = None,
    include_start: bool = True,
    max_visited: int | None = DEFAULT_MAX_VISITED,
) -> DataFrame:
    """Multi-source BFS → (node_id, depth) with depth = min hops from any start.

    `start` is a list of ids or a 1-column DataFrame. The adjacency
    projection is cached for the loop and unpersisted after.
    """
    spark = edges.sparkSession
    if isinstance(start, list):
        start_df = spark.createDataFrame([(s,) for s in start], "node_id string")
    else:
        start_df = start.toDF("node_id")

    adj = _adjacency(edges, direction, relation, min_weight, created_after, as_of).cache()
    try:
        visited = start_df.select("node_id", F.lit(0).alias("depth"))
        frontier = visited
        for d in range(1, max_depth + 1):
            nxt = (
                frontier.join(adj, frontier["node_id"] == adj["u"])
                .select(F.col("v").alias("node_id"))
                .distinct()
                .join(visited.select("node_id"), "node_id", "left_anti")
                .withColumn("depth", F.lit(d))
            )
            nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt)
            if max_visited is not None and visited.count() >= max_visited:
                break  # traversal budget (graph/types.rs:159-180)
            frontier = nxt
        out = visited
        if not include_start:
            out = out.join(start_df, "node_id", "left_anti")
        return out
    finally:
        adj.unpersist()


def neighbors(edges: DataFrame, node_id: str, direction: str = "both", relation=None) -> DataFrame:
    """1-hop neighbors (engine.rs:136-170): single join, no loop."""
    adj = _adjacency(edges, direction, relation)
    return adj.filter(F.col("u") == node_id).select(F.col("v").alias("node_id")).distinct()


def reachable(edges: DataFrame, start: list[str], direction: str = "out", max_iter: int = 50) -> DataFrame:
    """Unbounded BFS / transitive closure (engine.rs:189-204)."""
    return bfs(edges, start, max_depth=max_iter, direction=direction, max_visited=None)


def roots(nodes: DataFrame, edges: DataFrame, relation: str | None = None) -> DataFrame:
    """Nodes with no incoming edge of `relation` (engine.rs:206-229)."""
    e = edges if relation is None else edges.filter(F.col("relation") == relation)
    return nodes.filter(~F.col("deleted")).join(
        e.select(F.col("dst").alias("node_id")).distinct(), "node_id", "left_anti"
    )


def leaves(nodes: DataFrame, edges: DataFrame, relation: str | None = None) -> DataFrame:
    """Nodes with no outgoing edge of `relation` (engine.rs:231-254)."""
    e = edges if relation is None else edges.filter(F.col("relation") == relation)
    return nodes.filter(~F.col("deleted")).join(
        e.select(F.col("src").alias("node_id")).distinct(), "node_id", "left_anti"
    )


def neighborhood_at(edges: DataFrame, start: list[str], at: datetime, max_depth: int = 3) -> DataFrame:
    """Time-travel BFS including only edges created ≤ t (temporal.rs:55-123)."""
    return bfs(edges, start, max_depth=max_depth, as_of=at)


def merge_subgraphs(*subgraphs: DataFrame) -> DataFrame:
    """U1 subgraph merge (graph/subgraph.rs:117-144): node union with
    depth = min across inputs. Edge dedup happens on the edge frames the
    caller filters with these node sets."""
    out = subgraphs[0]
    for s in subgraphs[1:]:
        out = out.unionByName(s)
    return out.groupBy("node_id").agg(F.min("depth").alias("depth"))
