"""Adjacency cache for fast repeated traversals (graph/cache.rs:18-250).

The reference keeps in-memory out/in adjacency maps, invalidated on any
write and rebuilt lazily on the next read. Spark-first analogue: the
(u, v, relation, weight) adjacency projection is `.persist()`-ed once and
shared by every traversal in the session; `invalidate()` (call after any
edge write) unpersists it so the next read rebuilds from the new edge
table. One projection per direction, built lazily, exactly the reference's
valid-flag lifecycle — but the cache is a distributed DataFrame, so it
scales with the cluster instead of driver RAM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AdjacencyCache:
    def __init__(self, edges: DataFrame) -> None:
        self._edges = edges
        self._cached: dict[str, DataFrame] = {}
        self._valid = False
        self.builds = 0

    def is_valid(self) -> bool:
        return self._valid

    def set_edges(self, edges: DataFrame) -> None:
        """Point the cache at a new edge table (a write) — invalidates."""
        self._edges = edges
        self.invalidate()

    def invalidate(self) -> None:
        for df in self._cached.values():
            df.unpersist()
        self._cached.clear()
        self._valid = False

    def adjacency(self, direction: str = "both") -> DataFrame:
        """(u, v, relation, weight) rows for the direction, persisted; lazy
        rebuild after invalidation (cache.rs valid-flag semantics)."""
        if direction not in self._cached:
            e = self._edges.select("src", "dst", "relation", "weight")
            out = e.select(
                F.col("src").alias("u"), F.col("dst").alias("v"), "relation", "weight"
            )
            inn = e.select(
                F.col("dst").alias("u"), F.col("src").alias("v"), "relation", "weight"
            )
            adj = {"out": out, "in": inn}.get(direction)
            if adj is None:
                adj = out.unionByName(inn)
            self._cached[direction] = adj.persist()
            self.builds += 1
            self._valid = True
        return self._cached[direction]

    def neighbors(self, node_id: str, direction: str = "both", relation: str | None = None) -> DataFrame:
        """Cached 1-hop lookup (engine.rs:136-170 through the cache)."""
        adj = self.adjacency(direction)
        if relation is not None:
            adj = adj.filter(F.col("relation") == relation)
        return adj.filter(F.col("u") == node_id).select(F.col("v").alias("node_id")).distinct()
