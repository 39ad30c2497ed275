"""Mutation hooks / change feed: batch CDC over node+edge snapshots.

The reference fans out post-write callbacks (hooks/mod.rs:9-70) into an SSE
event stream (http/routes.rs:116, wiring serve.rs:162-169): subscribers see
{node_created, node_updated, node_deleted, edge_created, edge_deleted}.
The batch analogue is an Iceberg-CDC-style *changes table*: diff two
snapshots of the node/edge tables (successive pipeline runs / checkpoint
stages) into one change row per mutation, and let "hooks" be consumers of
that DataFrame instead of callbacks.

Diff semantics:
- node_created   id in new only
- node_deleted   tombstone flipped false→true (soft delete, like the
                 reference's delete_node) or id vanished (hard delete)
- node_updated   id in both, updated_at advanced, not a delete
- edge_created / edge_deleted   by edge_id presence (edges are immutable in
                 the pipeline; weight changes surface as delete+create)

One full-outer join per table; at 100 TB this is exactly the two-snapshot
incremental-scan join Iceberg CDC materializes, expressed on plain parquet.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COLS = ["op", "target_id", "ts"]


def node_changes(old: DataFrame, new: DataFrame) -> DataFrame:
    """(op, target_id, ts) rows for every node mutation between snapshots."""
    o = old.select(
        F.col("node_id"),
        F.col("updated_at").alias("o_upd"),
        F.col("deleted").alias("o_del"),
    )
    n = new.select(
        F.col("node_id"),
        F.col("updated_at").alias("n_upd"),
        F.col("deleted").alias("n_del"),
    )
    j = o.join(n, "node_id", "full_outer")
    op = (
        F.when(F.col("o_upd").isNull(), F.lit("node_created"))
        .when(F.col("n_upd").isNull(), F.lit("node_deleted"))  # hard delete
        .when(~F.col("o_del") & F.col("n_del"), F.lit("node_deleted"))  # tombstone
        .when(F.col("n_upd") > F.col("o_upd"), F.lit("node_updated"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select("op", F.col("node_id").alias("target_id"), F.coalesce("n_upd", "o_upd").alias("ts"))
    )


def edge_changes(old: DataFrame, new: DataFrame) -> DataFrame:
    o = old.select(F.col("edge_id"), F.col("updated_at").alias("o_upd"))
    n = new.select(F.col("edge_id"), F.col("updated_at").alias("n_upd"))
    j = o.join(n, "edge_id", "full_outer")
    op = (
        F.when(F.col("o_upd").isNull(), F.lit("edge_created"))
        .when(F.col("n_upd").isNull(), F.lit("edge_deleted"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select("op", F.col("edge_id").alias("target_id"), F.coalesce("n_upd", "o_upd").alias("ts"))
    )


def snapshot_changes(
    old_nodes: DataFrame, new_nodes: DataFrame, old_edges: DataFrame, new_edges: DataFrame
) -> DataFrame:
    return node_changes(old_nodes, new_nodes).unionByName(edge_changes(old_edges, new_edges))


class HookRegistry:
    """Batch analogue of HookManager (hooks/mod.rs:9-70): consumers register
    per-op callbacks; dispatch() hands each the matching change slice. The
    callback receives a DataFrame (the whole batch of that op), not a row —
    fan-out stays distributed."""

    def __init__(self) -> None:
        self._hooks: dict[str, list[Callable[[DataFrame], None]]] = {}

    def register(self, op: str, fn: Callable[[DataFrame], None]) -> None:
        self._hooks.setdefault(op, []).append(fn)

    def dispatch(self, changes: DataFrame) -> dict[str, int]:
        """Returns per-op row counts (the SSE 'events emitted' analogue)."""
        counts: dict[str, int] = {}
        present = [r["op"] for r in changes.select("op").distinct().collect()]
        for op in sorted(present):
            slice_df = changes.filter(F.col("op") == op)
            counts[op] = slice_df.count()
            for fn in self._hooks.get(op, []):
                fn(slice_df)
        return counts
