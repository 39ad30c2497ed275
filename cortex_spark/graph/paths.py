"""Shortest paths as iterative relaxation joins (SURVEY §2.8 G4-G5).

- shortest_path_unweighted: BFS with parent tracking, path reconstruction
  (reference graph/paths.rs:57-110,297-325).
- dijkstra: Bellman-Ford-style relaxation (distributed analogue of
  paths.rs:113-198): cost of an edge = 1 − weight (higher weight = lower
  cost, paths.rs:178); the reference also reports path weight = Π edge
  weights (paths.rs:345-355), computed here as exp(Σ log w).

Both keep per-node `struct(cost, path)` state and converge when no row
improves — each iteration is one join + one min-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edges_proj(edges: DataFrame, directed: bool) -> DataFrame:
    e = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("weight").cast("double").alias("w")
    )
    if directed:
        return e
    return e.unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"), F.col("weight").cast("double").alias("w"))
    )


def shortest_path_unweighted(
    edges: DataFrame, source: str, target: str, max_depth: int = 25, directed: bool = True
) -> list[str] | None:
    """Hop-minimal path source→target as a list of node ids (None if no path).

    Deterministic tie-break: lexicographically smallest path among equal-hop
    paths (the reference's order depends on adjacency iteration order, which
    is not reproducible — documented in SURVEY §7)."""
    spark = edges.sparkSession
    adj = _edges_proj(edges, directed).cache()
    try:
        state = spark.createDataFrame([(source, [source])], "node_id string, path array<string>")
        for _ in range(max_depth):
            if not state.filter(F.col("node_id") == target).isEmpty():
                break
            grown = (
                state.join(adj, state["node_id"] == adj["u"])
                .select(F.col("v").alias("node_id"), F.concat(F.col("path"), F.array(F.col("v"))).alias("path"))
            )
            # keep one (shortest, lexicographically-min) path per node; drop
            # nodes already settled in earlier rounds (they were shorter)
            settled = state.select("node_id")
            grown = grown.join(settled, "node_id", "left_anti")
            grown = grown.groupBy("node_id").agg(F.min("path").alias("path"))
            grown = grown.localCheckpoint(eager=True)
            if grown.isEmpty():
                break
            state = state.unionByName(grown)
        hit = state.filter(F.col("node_id") == target).select("path").first()
        return list(hit["path"]) if hit else None
    finally:
        adj.unpersist()


def weighted_traverse(
    edges: DataFrame,
    start: list[str],
    max_depth: int = 3,
    min_weight: float | None = None,
    directed: bool = False,
) -> DataFrame:
    """Greedy best-first / max-weight traversal (G3, traversal.rs:318-450):
    each node keeps the MAXIMUM product-weight path from any start (start
    weight 1.0). Distributed as iterative max-aggregate relaxation —
    the visit ORDER of the reference's max-heap is not reproducible
    distributed, but the (node, best_weight) result set is identical.
    Returns (node_id, path_weight, depth)."""
    spark = edges.sparkSession
    adj = _edges_proj(edges, directed)
    if min_weight is not None:
        adj = adj.filter(F.col("w") >= min_weight)
    adj = adj.cache()
    try:
        state = spark.createDataFrame(
            [(s, 1.0, 0) for s in start], "node_id string, path_weight double, depth int"
        )
        frontier = state
        for d in range(1, max_depth + 1):
            grown = (
                frontier.join(adj, frontier["node_id"] == adj["u"])
                .select(
                    F.col("v").alias("node_id"),
                    (F.col("path_weight") * F.col("w")).alias("path_weight"),
                    F.lit(d).alias("depth"),
                )
            )
            merged = (
                state.unionByName(grown)
                .groupBy("node_id")
                .agg(F.max(F.struct(F.col("path_weight"), (-F.col("depth")).alias("nd"))).alias("s"))
                .select("node_id", F.col("s.path_weight").alias("path_weight"), (-F.col("s.nd")).cast("int").alias("depth"))
            )
            merged = merged.localCheckpoint(eager=True)
            # early exit when no node improved
            improved = merged.join(
                state.select("node_id", F.col("path_weight").alias("old")), "node_id", "left"
            ).filter(F.col("old").isNull() | (F.col("path_weight") > F.col("old")))
            if improved.isEmpty():
                state = merged
                break
            state = merged
            frontier = improved.select("node_id", "path_weight", "depth")
        return state
    finally:
        adj.unpersist()


def yen_k_shortest(
    edges: DataFrame, source: str, target: str, k: int = 3, directed: bool = True, max_depth: int = 25
) -> list[list[str]]:
    """Yen's k-shortest loopless paths (G6, paths.rs:201-294): driver-side
    spur loop over shortest_path_unweighted — the reference also runs this
    as a sequential algorithm; each inner call is a distributed BFS.
    Candidates sorted (length asc, path lexicographic) for determinism."""
    first = shortest_path_unweighted(edges, source, target, max_depth, directed)
    if first is None:
        return []
    paths = [first]
    candidates: list[list[str]] = []
    for _ in range(1, k):
        prev = paths[-1]
        for i in range(len(prev) - 1):
            root = prev[: i + 1]
            spur = prev[i]
            # remove edges used by known paths sharing this root prefix
            banned = set()
            for p in paths:
                if p[: i + 1] == root and len(p) > i + 1:
                    banned.add((p[i], p[i + 1]))
            if not directed:
                # an undirected hop u-v may be STORED as (v, u): ban both
                # orientations or the projection re-creates the banned hop
                # and the spur search just rediscovers the same path
                banned |= {(v, u) for u, v in banned}
            banned_df = edges.sparkSession.createDataFrame(
                [(u, v) for u, v in banned] or [("", "")], "bsrc string, bdst string"
            )
            pruned = edges.join(
                banned_df,
                (edges["src"] == F.col("bsrc")) & (edges["dst"] == F.col("bdst")),
                "left_anti",
            )
            # exclude root nodes (except spur) from the spur path
            root_nodes = set(root[:-1])
            if root_nodes:
                pruned = pruned.filter(
                    ~F.col("src").isin(list(root_nodes)) & ~F.col("dst").isin(list(root_nodes))
                )
            spur_path = shortest_path_unweighted(pruned, spur, target, max_depth, directed)
            if spur_path:
                cand = root[:-1] + spur_path
                if cand not in paths and cand not in candidates:
                    candidates.append(cand)
        if not candidates:
            break
        candidates.sort(key=lambda p: (len(p), p))
        paths.append(candidates.pop(0))
    return paths


def dijkstra(
    edges: DataFrame, source: str, target: str | None = None, max_iter: int = 30, directed: bool = True
) -> DataFrame:
    """Min-cost distances from source; cost = Σ(1−w), path_weight = Πw.

    Returns (node_id, cost, path_weight, path). Bellman-Ford relaxation:
    converges in ≤ |V| rounds, early-exits when no distance improves.
    """
    spark = edges.sparkSession
    adj = _edges_proj(edges, directed).withColumn("ecost", F.lit(1.0) - F.col("w")).cache()
    try:
        state = spark.createDataFrame(
            [(source, 0.0, 0.0, [source])],
            "node_id string, cost double, neg_log_w double, path array<string>",
        )
        for _ in range(max_iter):
            relaxed = (
                state.join(adj, state["node_id"] == adj["u"])
                .select(
                    F.col("v").alias("node_id"),
                    (state["cost"] + adj["ecost"]).alias("cost"),
                    (F.col("neg_log_w") - F.log(F.greatest(F.col("w"), F.lit(1e-12)))).alias("neg_log_w"),
                    F.concat(F.col("path"), F.array(F.col("v"))).alias("path"),
                )
            )
            merged = (
                state.unionByName(relaxed)
                .groupBy("node_id")
                .agg(F.min(F.struct("cost", "neg_log_w", "path")).alias("s"))
                .select("node_id", F.col("s.cost").alias("cost"), F.col("s.neg_log_w").alias("neg_log_w"), F.col("s.path").alias("path"))
            )
            merged = merged.localCheckpoint(eager=True)
            improved = (
                merged.join(state.select("node_id", F.col("cost").alias("old")), "node_id", "left")
                .filter(F.col("old").isNull() | (F.col("cost") < F.col("old")))
            )
            state = merged
            if improved.isEmpty():
                break
        out = state.select(
            "node_id", "cost", F.exp(-F.col("neg_log_w")).alias("path_weight"), "path"
        )
        return out.filter(F.col("node_id") == target) if target else out
    finally:
        adj.unpersist()
