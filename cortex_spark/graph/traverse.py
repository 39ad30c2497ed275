"""Graph traversal as iterative DataFrame joins (SURVEY §2.8 G1-G10, G14).

The reference BFS (graph/traversal.rs:56-187) keeps a queue + visited set +
depth map with budgets. Distributed: frontier-join iteration — each round
joins the frontier against the (pre-filtered, cached) adjacency projection
and keeps the min depth per node. DFS (G2, traversal.rs:190-315) is
reproduced EXACTLY (visit order, visited-at-push claim semantics) by
distributed pruning to the reachable ball + a driver-side stack replay —
legitimate because the reference bounds every traversal at 10k visited
nodes. Traversal budgets (max_visited / per-level caps,
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


def dfs(
    edges: DataFrame,
    start: list[str],
    max_depth: int = DEFAULT_MAX_DEPTH,
    direction: str = "both",
    relation: str | list[str] | None = None,
    min_weight: float | None = None,
    created_after: datetime | None = None,
    include_start: bool = True,
    limit: int | None = None,
    max_visited: int = DEFAULT_MAX_VISITED,
) -> tuple[DataFrame, bool]:
    """Exact reference DFS (traversal.rs:190-315), including visit ORDER and
    the visited-at-push semantics that make its node set genuinely differ
    from BFS (a node claimed via a deep branch is never re-reached via a
    shallower one). Returns ((node_id, depth, visit_order), truncated).

    The reference caps every traversal at max_visited=10k nodes
    (graph/types.rs:159-180), so the bounded subgraph is driver-report-sized
    by contract: the distributed part prunes the edge table to the BFS-
    reachable ball (superset of the DFS result), and the stack replay runs
    on the collected adjacency. Neighbor order: outgoing before incoming,
    each sorted by (created_at, edge_id) — the deterministic analogue of the
    reference's UUIDv7-time-ordered edge-index iteration.
    """
    # distributed pruning: DFS can only visit nodes within max_depth hops
    ball = bfs(edges, start, max_depth, direction, relation, min_weight,
               created_after, max_visited=max_visited * 4)
    e = edges
    if relation is not None:
        rels = [relation] if isinstance(relation, str) else list(relation)
        e = e.filter(F.col("relation").isin(rels))
    if min_weight is not None:
        e = e.filter(F.col("weight") >= min_weight)
    if created_after is not None:
        e = e.filter(F.col("created_at") > F.lit(created_after))

    out_adj: dict[str, list[str]] = {}
    in_adj: dict[str, list[str]] = {}
    ball_rows = ball.count()
    ball_truncated = ball_rows >= max_visited * 4
    if not ball_truncated:
        # the ball is complete within max_depth, so the induced subgraph
        # holds every edge the replay can touch — one collect
        ball_ids = ball.select("node_id")
        induced = (
            e.join(ball_ids.withColumnRenamed("node_id", "src"), "src", "left_semi")
            .join(ball_ids.withColumnRenamed("node_id", "dst"), "dst", "left_semi")
            .select("src", "dst", "edge_id", "created_at")
            .orderBy("created_at", "edge_id")
            .collect()
        )
        for r in induced:  # already in (created_at, edge_id) order
            out_adj.setdefault(r["src"], []).append(r["dst"])
            in_adj.setdefault(r["dst"], []).append(r["src"])
        fetched: set[str] | None = None  # adjacency fully known
    else:
        # BFS budget hit before covering the ball: the induced subgraph is
        # NOT a superset of the reference DFS's reach (a deep chain behind
        # the first neighbor could be missing while 40k siblings fill the
        # budget). Fall back to lazy batched adjacency fetches during the
        # replay — slower, but the visit set/order stay reference-exact.
        fetched = set()

    def fetch_adjacency(need: list[str]) -> None:
        rows = (
            e.filter(F.col("src").isin(need) | F.col("dst").isin(need))
            .select("src", "dst", "edge_id", "created_at")
            .orderBy("created_at", "edge_id")
            .collect()
        )
        need_set = set(need)
        for r in rows:
            if r["src"] in need_set:
                out_adj.setdefault(r["src"], []).append(r["dst"])
            if r["dst"] in need_set:
                in_adj.setdefault(r["dst"], []).append(r["src"])
        fetched.update(need_set)

    visited: set[str] = set()
    stack: list[tuple[str, int]] = []
    for s in reversed(start):  # traversal.rs:202-205
        stack.append((s, 0))
        visited.add(s)
    result: list[tuple[str, int, int]] = []
    visit_order = 0
    truncated = False
    visited_count = 0
    while stack:
        cur, depth = stack.pop()
        if visited_count >= max_visited:
            truncated = True
            break
        visited_count += 1
        include = include_start or depth > 0
        if include:
            result.append((cur, depth, visit_order))
            visit_order += 1
            if limit is not None and len(result) >= limit:
                truncated = True
                break
        if depth >= max_depth:
            continue
        if fetched is not None and cur not in fetched:
            # lazy mode: batch the current node with the nearest unfetched
            # stack entries so one Spark round serves many expansions
            batch = [cur] + [n for n, _ in stack[-64:] if n not in fetched and n != cur]
            fetch_adjacency(list(dict.fromkeys(batch)))
        nbrs: list[str] = []
        if direction in ("out", "both"):
            nbrs += out_adj.get(cur, [])
        if direction in ("in", "both"):
            nbrs += in_adj.get(cur, [])
        # dedupe parallel edges (first occurrence wins — the reference pushes
        # such a neighbor twice but the second pop only re-inserts identical
        # (node, depth) into its result map; only its budget counter differs)
        seen_local: set[str] = set()
        fresh = [n for n in nbrs if n not in visited and not (n in seen_local or seen_local.add(n))]
        # push in reverse so iteration order matches recursion (rs:296-303);
        # mark visited at PUSH time (claims the node for this branch)
        for n in reversed(fresh):
            visited.add(n)
            stack.append((n, depth + 1))
    spark = edges.sparkSession
    df = spark.createDataFrame(
        result or [], "node_id string, depth int, visit_order int"
    )
    return df, truncated


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
    return nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).join(
        e.select(F.col("dst").alias("node_id")).distinct(), "node_id", "left_anti"
    )


def leaves(nodes: DataFrame, edges: DataFrame, relation: str | None = None) -> DataFrame:
    """Nodes with no outgoing edge of `relation` (engine.rs:231-254)."""
    e = edges if relation is None else edges.filter(F.col("relation") == relation)
    return nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).join(
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
