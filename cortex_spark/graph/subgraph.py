"""Subgraph operators: topological sort + cycle detection (G11/G13).

Reference: Kahn's algorithm on a subgraph (graph/subgraph.rs:72-114), DFS
cycle finding (graph/engine.rs:256-280,371-401). Distributed: iterative
in-degree peeling — each round removes all zero-in-degree nodes (one layer),
assigning them the same topo layer index. Nodes remaining when no layer can
be peeled are exactly the cycle participants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topo_layers(
    nodes: DataFrame, edges: DataFrame, max_iterations: int = 100
) -> tuple[DataFrame, DataFrame]:
    """Returns (layers, cyclic) — layers = (node_id, layer) for the acyclic
    part (layer = Kahn wave index; any linearization sorted by layer is a
    valid topo order); cyclic = node ids on or downstream of a cycle.

    The reference returns None for cyclic subgraphs (subgraph.rs:104-110);
    callers can reproduce that by checking `cyclic.isEmpty()`.
    """
    spark = nodes.sparkSession
    remaining_nodes = nodes.select("node_id").distinct().localCheckpoint(eager=True)
    remaining_edges = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    layers = spark.createDataFrame([], "node_id string, layer int")
    for layer in range(max_iterations):
        with_in = remaining_edges.select(F.col("dst").alias("node_id")).distinct()
        zero_in = remaining_nodes.join(with_in, "node_id", "left_anti")
        zero_in = zero_in.localCheckpoint(eager=True)
        if zero_in.isEmpty():
            break
        layers = layers.unionByName(zero_in.withColumn("layer", F.lit(layer)))
        remaining_nodes = remaining_nodes.join(zero_in, "node_id", "left_anti").localCheckpoint(eager=True)
        remaining_edges = remaining_edges.join(
            zero_in.withColumnRenamed("node_id", "src"), "src", "left_anti"
        ).localCheckpoint(eager=True)
        if remaining_nodes.isEmpty():
            break
    else:
        # iteration cap reached while still making progress: the graph is
        # DEEPER than max_iterations, not cyclic — refuse to misreport
        if not remaining_nodes.isEmpty():
            raise ValueError(
                f"topo_layers exceeded max_iterations={max_iterations} while still "
                "peeling zero-in-degree nodes; raise max_iterations for this depth"
            )
    return layers, remaining_nodes


def has_cycle(nodes: DataFrame, edges: DataFrame) -> bool:
    """Cycle existence (engine.rs:256-280 use case)."""
    _, cyclic = topo_layers(nodes, edges)
    return not cyclic.isEmpty()


def topo_sort(nodes: DataFrame, edges: DataFrame) -> list[str] | None:
    """Full deterministic linearization (layer asc, node_id asc), or None if
    the graph is cyclic — exact reference contract (subgraph.rs:72-114).
    Collects to the driver: use only on subgraph-scale inputs, like the
    reference does."""
    layers, cyclic = topo_layers(nodes, edges)
    if not cyclic.isEmpty():
        return None
    return [
        r["node_id"]
        for r in layers.orderBy(F.asc("layer"), F.asc("node_id")).collect()
    ]
