"""Graph stats (SURVEY §2.5 A1/A2): node/edge counts + per-kind/relation
histograms (reference cortex.proto:277-283, redb_storage.rs:736-758)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stats(nodes: DataFrame, edges: DataFrame) -> dict:
    """One-pass aggregates; count_nodes-by-kind uses the same scan Catalyst
    would prune to the kind partition (F2)."""
    by_kind = {
        r["kind"]: r["n"]
        for r in nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    by_relation = {
        r["relation"]: r["n"]
        for r in edges.groupBy("relation").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "node_count": sum(by_kind.values()),
        "edge_count": sum(by_relation.values()),
        "nodes_by_kind": by_kind,
        "edges_by_relation": by_relation,
    }


def count_nodes(nodes: DataFrame, kinds: list[str] | None = None, include_deleted: bool = False) -> int:
    """A2: optimized count (redb_storage.rs:736-758 → partition-pruned scan)."""
    df = nodes if include_deleted else nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
    if kinds:
        df = df.filter(F.col("kind").isin(kinds))
    return df.count()
