"""Degree aggregates (SURVEY §2.5 A3): two-phase, skew-safe.

degree = |out| + |in| (engine.rs:51); most_connected = top-N by degree
(engine.rs:303-326). Each side aggregates independently before the union —
partial (map-side) aggregation handles hot entities; the final top-N is a
TakeOrdered, no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree(edges: DataFrame) -> DataFrame:
    out_d = edges.groupBy(F.col("src").alias("node_id")).agg(F.count(F.lit(1)).alias("d"))
    in_d = edges.groupBy(F.col("dst").alias("node_id")).agg(F.count(F.lit(1)).alias("d"))
    return out_d.unionByName(in_d).groupBy("node_id").agg(F.sum("d").alias("degree"))


def most_connected(nodes: DataFrame, edges: DataFrame, n: int = 10) -> DataFrame:
    """Top-N live nodes by degree, deterministic tie-break on node_id."""
    return (
        degree(edges)
        .join(nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).select("node_id", "kind", "title"), "node_id")
        .orderBy(F.desc("degree"), F.asc("node_id"))
        .limit(n)
    )
