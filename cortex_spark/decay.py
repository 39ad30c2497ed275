"""Batch decay / reinforce / retention jobs (SURVEY §2.9 D1-D4).

Each job is a full-table column-math pass — at 100 B edges this is one scan
plus two broadcast joins for endpoint importances (nodes' (id, importance)
projection is tiny relative to edges and explicitly broadcast).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cortex_spark.functions.scoring import (
    DAILY_DECAY_RATE,
    DELETE_THRESHOLD,
    IMPORTANCE_SHIELD,
    PRUNE_THRESHOLD,
    decay_weight_col,
)


def apply_decay(
    edges: DataFrame,
    nodes: DataFrame,
    now: datetime,
    daily_rate: float = DAILY_DECAY_RATE,
    shield: float = IMPORTANCE_SHIELD,
    delete_threshold: float = DELETE_THRESHOLD,
    prune_threshold: float = PRUNE_THRESHOLD,
    exempt_manual: bool = True,
) -> tuple[DataFrame, dict]:
    """Edge decay sweep (decay.rs:21-101): returns (surviving edges, metrics).

    Manual-provenance edges are exempt by default (decay.rs:36-40); decayed
    weight < delete_threshold drops the edge; weights in
    [delete, prune) count as 'pruned' in metrics.
    """
    imp = nodes.select(F.col("node_id"), F.col("importance"))
    e = (
        edges.join(
            F.broadcast(imp.select(F.col("node_id").alias("src"), F.col("importance").alias("src_imp"))),
            "src",
            "left",
        )
        .join(
            F.broadcast(imp.select(F.col("node_id").alias("dst"), F.col("importance").alias("dst_imp"))),
            "dst",
            "left",
        )
    )
    now_lit = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
    decayed = decay_weight_col(
        F.col("weight").cast("double"),
        F.col("updated_at"),
        now_lit,
        F.col("src_imp").cast("double"),
        F.col("dst_imp").cast("double"),
        daily_rate,
        shield,
    )
    is_exempt = F.lit(exempt_manual) & (F.col("provenance.ptype") == "manual")
    e = e.withColumn("new_weight", F.when(is_exempt, F.col("weight").cast("double")).otherwise(decayed))

    survivors = (
        e.filter(F.col("new_weight") >= delete_threshold)
        .withColumn("weight", F.col("new_weight").cast("float"))
        .drop("new_weight", "src_imp", "dst_imp")
    )
    counts = e.agg(
        F.sum(F.when(F.col("new_weight") < delete_threshold, 1).otherwise(0)).alias("deleted"),
        F.sum(
            F.when(
                (F.col("new_weight") >= delete_threshold) & (F.col("new_weight") < prune_threshold), 1
            ).otherwise(0)
        ).alias("pruned"),
    ).first()
    return survivors, {"deleted": int(counts["deleted"] or 0), "pruned": int(counts["pruned"] or 0)}


def reinforce(edges: DataFrame, nodes: DataFrame, node_ids: list[str], now: datetime) -> tuple[DataFrame, DataFrame]:
    """Touch nodes: reset updated_at on all their edges, bump access_count
    (decay.rs:104-135). Returns (edges', nodes')."""
    now_lit = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
    hit = F.col("src").isin(node_ids) | F.col("dst").isin(node_ids)
    edges2 = edges.withColumn("updated_at", F.when(hit, now_lit).otherwise(F.col("updated_at")))
    nhit = F.col("node_id").isin(node_ids)
    nodes2 = nodes.withColumn(
        "access_count", F.when(nhit, F.col("access_count") + 1).otherwise(F.col("access_count"))
    ).withColumn("last_accessed_at", F.when(nhit, now_lit).otherwise(F.col("last_accessed_at"))).withColumn(
        "updated_at", F.when(nhit, now_lit).otherwise(F.col("updated_at"))
    )
    return edges2, nodes2


def retention_sweep(
    nodes: DataFrame,
    edges: DataFrame,
    now: datetime,
    ttl_days_by_kind: dict[str, int] | None = None,
    default_ttl_days: int | None = None,
    grace_days: int = 30,
    protect_linked: bool = True,
) -> DataFrame:
    """Delete-eligible node ids (policies/retention.rs:17-166): age > ttl AND
    days_since_access > grace AND (not protected OR no live inbound edges)."""
    now_lit = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
    age_days = (now_lit.cast("double") - F.col("created_at").cast("double")) / 86400.0
    idle_days = (now_lit.cast("double") - F.greatest(F.col("last_accessed_at"), F.col("created_at")).cast("double")) / 86400.0

    ttl = None
    for k, d in (ttl_days_by_kind or {}).items():
        ttl = F.when(F.col("kind") == k, F.lit(d)) if ttl is None else ttl.when(F.col("kind") == k, F.lit(d))
    ttl = (ttl.otherwise(F.lit(default_ttl_days)) if ttl is not None else F.lit(default_ttl_days)).cast("double")

    cand = nodes.filter(~F.col("deleted")).filter(ttl.isNotNull() & (age_days > ttl) & (idle_days > grace_days))
    if protect_linked:
        live = nodes.filter(~F.col("deleted")).select(F.col("node_id").alias("src"))
        live_inbound = edges.join(live, "src").select(F.col("dst").alias("node_id")).distinct()
        cand = cand.join(live_inbound, "node_id", "left_anti")
    return cand.select("node_id")
