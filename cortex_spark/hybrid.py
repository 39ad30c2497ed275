"""Hybrid retrieval: α·cosine + (1−α)·graph-proximity (SURVEY §2.4 J12).

Re-expresses vector/hybrid.rs:113-225:
1. embed the query text (same deterministic encoder as the pipeline),
2. vector candidates = cosine against all live node embeddings, top 3·limit
   (the reference over-fetches 3×, hybrid.rs:118-127) — a broadcast of ONE
   query vector, so this is a narrow scan, not a join,
3. graph proximity: multi-source BFS from the anchors (depth ≤ 3),
   proximity = 1/(1+depth) to the NEAREST anchor (hybrid.rs:207-221),
4. combined = w·cos + (1−w)·prox (hybrid.rs:163-164, w=0.7 default),
5. optional query-time score decay (vector/scoring.rs) then top-limit.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cortex_spark.embed import encode_py
from cortex_spark.functions.scoring import hybrid_score_col, score_decay_col
from cortex_spark.functions.similarity import cosine_col
from cortex_spark.graph.traverse import bfs

DEFAULT_VECTOR_WEIGHT = 0.7  # hybrid.rs:34-45
DEFAULT_MAX_ANCHOR_DEPTH = 3


def vector_search(
    nodes: DataFrame,
    query_text: str,
    k: int = 10,
    embed_dim: int = 384,
    embed_seed: int = 42,
    kinds: list[str] | None = None,
    exclude_ids: list[str] | None = None,
    source_agent: str | None = None,
) -> DataFrame:
    """Brute-force top-k cosine for one query vector (VectorFilter F4 applied
    pre-score). The query vector is a literal array — no shuffle, one scan +
    TakeOrdered."""
    qvec = F.array(*[F.lit(float(x)) for x in encode_py(query_text, embed_dim, embed_seed)])
    df = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).filter(F.col("embedding").isNotNull())
    if kinds:
        df = df.filter(F.col("kind").isin(kinds))
    if exclude_ids:
        df = df.filter(~F.col("node_id").isin(exclude_ids))
    if source_agent:
        df = df.filter(F.col("source_agent") == source_agent)
    return (
        df.withColumn("vector_score", cosine_col(F.col("embedding"), qvec))
        .orderBy(F.desc("vector_score"), F.asc("node_id"))
        .limit(k)
    )


def search_threshold(nodes: DataFrame, query_text: str, threshold: float, embed_dim: int = 384, embed_seed: int = 42) -> DataFrame:
    """All nodes with cosine ≥ threshold (index.rs:375-387)."""
    qvec = F.array(*[F.lit(float(x)) for x in encode_py(query_text, embed_dim, embed_seed)])
    return (
        nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
        .filter(F.col("embedding").isNotNull())
        .withColumn("vector_score", cosine_col(F.col("embedding"), qvec))
        .filter(F.col("vector_score") >= threshold)
    )


def hybrid_search(
    nodes: DataFrame,
    edges: DataFrame,
    query_text: str,
    anchors: list[str] | None = None,
    limit: int = 10,
    vector_weight: float = DEFAULT_VECTOR_WEIGHT,
    max_anchor_depth: int = DEFAULT_MAX_ANCHOR_DEPTH,
    recency_bias: float = 0.0,
    now: datetime | None = None,
    embed_dim: int = 384,
    embed_seed: int = 42,
) -> DataFrame:
    """Returns (node_id, kind, title, vector_score, graph_score, combined_score)."""
    cands = vector_search(nodes, query_text, k=limit * 3, embed_dim=embed_dim, embed_seed=embed_seed)
    if not anchors:
        out = cands.withColumn("graph_score", F.lit(0.0)).withColumn(
            "combined_score", F.col("vector_score")
        )
    else:
        depths = bfs(edges, anchors, max_depth=max_anchor_depth, direction="both", include_start=False)
        prox = depths.select(
            "node_id", (F.lit(1.0) / (F.lit(1.0) + F.col("depth"))).alias("graph_score")
        )
        out = cands.join(prox, "node_id", "left").withColumn(
            "graph_score", F.coalesce(F.col("graph_score"), F.lit(0.0))
        )
        out = out.withColumn(
            "combined_score", hybrid_score_col(F.col("vector_score"), F.col("graph_score"), vector_weight)
        )
    if recency_bias > 0.0:
        now = now or datetime(2026, 1, 1, tzinfo=timezone.utc)
        now_lit = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
        out = out.withColumn(
            "combined_score",
            score_decay_col(
                F.col("combined_score"), F.col("kind"), F.col("last_accessed_at"),
                F.col("access_count"), now_lit, recency_bias,
            ),
        )
    return (
        out.orderBy(F.desc("combined_score"), F.asc("node_id"))
        .limit(limit)
        .select("node_id", "kind", "title", "vector_score", "graph_score", "combined_score")
    )
