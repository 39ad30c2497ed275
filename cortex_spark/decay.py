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

    # manual edges are exempt from the whole sweep (decay.rs:36-40), the
    # delete filter included — a manual edge stored below the threshold
    # must survive, not be silently swept
    survivors = (
        e.filter((F.col("new_weight") >= delete_threshold) | is_exempt)
        .withColumn("weight", F.col("new_weight").cast("float"))
        .drop("new_weight", "src_imp", "dst_imp")
    )
    counts = e.agg(
        F.sum(
            F.when((F.col("new_weight") < delete_threshold) & ~is_exempt, 1).otherwise(0)
        ).alias("deleted"),
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
    min_score_by_kind: dict[str, float] | None = None,
) -> DataFrame:
    """Delete-eligible node ids (policies/retention.rs:120-166): age > ttl AND
    (min_score unset OR decayed relevance < min_score) AND days_since_access
    > grace AND (not protected OR no live inbound edges).

    The min_score gate uses apply_score_decay with raw=1.0 and full recency
    bias — i.e. the pure temporal·echo relevance factor (retention.rs:137-144).
    """
    from cortex_spark.functions.scoring import score_decay_col

    now_lit = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
    age_days = (now_lit.cast("double") - F.col("created_at").cast("double")) / 86400.0
    idle_days = (now_lit.cast("double") - F.greatest(F.col("last_accessed_at"), F.col("created_at")).cast("double")) / 86400.0

    ttl = None
    for k, d in (ttl_days_by_kind or {}).items():
        ttl = F.when(F.col("kind") == k, F.lit(d)) if ttl is None else ttl.when(F.col("kind") == k, F.lit(d))
    ttl = (ttl.otherwise(F.lit(default_ttl_days)) if ttl is not None else F.lit(default_ttl_days)).cast("double")

    cand = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).filter(ttl.isNotNull() & (age_days > ttl) & (idle_days > grace_days))
    if min_score_by_kind:
        relevance = score_decay_col(
            F.lit(1.0), F.col("kind"), F.col("last_accessed_at"), F.col("access_count"),
            now_lit, recency_bias=1.0,
        )
        ms = None
        for k, s in min_score_by_kind.items():
            ms = F.when(F.col("kind") == k, F.lit(s)) if ms is None else ms.when(F.col("kind") == k, F.lit(s))
        ms = ms.otherwise(F.lit(None).cast("double"))
        cand = cand.filter(ms.isNull() | (relevance < ms))
    if protect_linked:
        live = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).select(F.col("node_id").alias("src"))
        live_inbound = edges.join(live, "src").select(F.col("dst").alias("node_id")).distinct()
        cand = cand.join(live_inbound, "node_id", "left_anti")
    return cand.select("node_id")


def eviction_candidates(
    nodes: DataFrame,
    limit: int,
    strategy: str = "oldest_lowest_importance",
    live_count: int | None = None,
    two_phase: bool | None = None,
) -> DataFrame:
    """Max-node-cap eviction (retention.rs:231-288, wiring :288-295): when the
    live node count exceeds `limit`, return the `count - limit` ids to evict.
    Eviction is IMMEDIATE — not gated on grace/protection (retention.rs:231).

    Strategy 'oldest_lowest_importance': sort (importance asc, created_at
    asc), take the excess. The reference's sort is not further tie-broken
    (Vec::sort is stable over scan order, which is not reproducible
    distributed) — node_id asc is added as the deterministic tie-break.

    Scale path (`two_phase=True`, auto above 1M excess): an exact
    importance-histogram cutoff — one groupBy over ≤4096 bucket keys, a
    driver-side cumulative sum, then everything in strictly-lower buckets
    evicts with NO sort and only the single boundary bucket (≈ n/4096
    rows) is sorted for the remainder. Bit-identical to the global sort
    because the sort key (importance, created_at, node_id) is total and
    bucket boundaries respect importance order (pytest-asserted).
    """
    if strategy != "oldest_lowest_importance":
        raise ValueError(f"Unknown eviction strategy: {strategy}")  # retention.rs:283-286
    live = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
    n = live_count if live_count is not None else live.count()
    excess = n - limit
    if excess <= 0:
        return nodes.sparkSession.createDataFrame([], "node_id string")
    if two_phase is None:
        two_phase = excess > 1_000_000
    order = [F.asc("importance"), F.asc("created_at"), F.asc("node_id")]
    if not two_phase:
        return live.orderBy(*order).limit(excess).select("node_id")

    B = 4096
    imp = F.col("importance")
    bucket = F.when(imp.isNull(), F.lit(-1)).otherwise(
        F.least(F.greatest(F.floor(imp * B), F.lit(0)), F.lit(B - 1))
    )
    hist = sorted(
        (r["b"], r["c"])
        for r in live.groupBy(bucket.alias("b")).agg(F.count(F.lit(1)).alias("c")).collect()
    )
    cum = 0
    boundary = None
    full_below: list[int] = []
    for b, c in hist:
        if cum + c <= excess:
            full_below.append(b)
            cum += c
            if cum == excess:
                break
        else:
            boundary = b
            break
    parts = []
    if full_below:
        parts.append(live.filter(bucket.isin(full_below)).select("node_id"))
    if boundary is not None and excess - cum > 0:
        parts.append(
            live.filter(bucket == boundary)
            .orderBy(*order)
            .limit(excess - cum)
            .select("node_id")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def purge_expired(nodes: DataFrame, now: datetime, grace_days: int = 30) -> DataFrame:
    """Hard-delete candidates (retention.rs:249-272): soft-deleted nodes whose
    updated_at predates now − grace (grace 0 falls back to 30). Returns the
    ids to drop; callers anti-join the node table against it."""
    grace = grace_days if grace_days > 0 else 30
    now_lit = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
    cutoff = now_lit.cast("double") - F.lit(grace * 86400.0)
    return (
        nodes.filter(F.col("deleted"))
        .filter(F.col("updated_at").cast("double") < cutoff)
        .select("node_id")
    )


def apply_retention(
    nodes: DataFrame,
    edges: DataFrame,
    now: datetime,
    max_nodes: int | None = None,
    eviction_strategy: str = "oldest_lowest_importance",
    **sweep_kwargs,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full retention pass (retention.rs sweep :178-248): TTL sweep, then
    max-node eviction over the survivors. Returns (nodes', edges', deleted_ids).

    Outbound edges of deleted nodes are dropped (cleanup_outbound_edges,
    retention.rs:168-176); deletion is a soft tombstone like the reference's.
    """
    doomed = retention_sweep(nodes, edges, now, **sweep_kwargs)
    if max_nodes is not None:
        after = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).join(doomed, "node_id", "left_anti")
        evicted = eviction_candidates(after, max_nodes, eviction_strategy)
        doomed = doomed.unionByName(evicted).distinct()
    doomed = doomed.localCheckpoint(eager=True)
    now_lit = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
    nodes2 = (
        nodes.join(doomed.withColumnRenamed("node_id", "d_id"), nodes["node_id"] == F.col("d_id"), "left")
        .withColumn("deleted", F.when(F.col("d_id").isNotNull(), F.lit(True)).otherwise(F.col("deleted")))
        .withColumn("updated_at", F.when(F.col("d_id").isNotNull(), now_lit).otherwise(F.col("updated_at")))
        .drop("d_id")
    )
    edges2 = edges.join(doomed.withColumnRenamed("node_id", "src"), "src", "left_anti")
    return nodes2, edges2, doomed
