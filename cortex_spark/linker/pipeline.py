"""Auto-link stage: nodes → new edges (the KG triple-emission job).

Distributed re-expression of the reference auto-link cycle
(auto_linker.rs:185-364, §3.3 of SURVEY):

    live nodes → LSH candidate pairs (J1) → symmetrize (each node scans its
    neighbors) → join node attributes → rule pass (J2-J10, single scan) →
    anti-join existing edges (J11) → first-rule-wins per (src,dst,relation)
    → per-node cap (W7) → edge rows with provenance

Shuffle budget: one shuffle for the LSH self-join, two broadcast-or-shuffle
joins to attach node attrs (narrow projection only), one window per cap.
The attribute projection is kept minimal (8 columns) so the pair frame
stays small at 10^12-node scale.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cortex_spark.linker.lsh import brute_force_pairs, candidate_topk
from cortex_spark.linker.rules import LinkerConfig, apply_link_rules

ATTR_COLS = ["kind", "title", "tags", "source_agent", "source_session", "created_at"]


def _attach_attrs(ordered_pairs: DataFrame, nodes: DataFrame, include_body: bool = False) -> DataFrame:
    """Attach per-side node attributes to the pair frame.

    The negation flag is evaluated ONCE per node here (`neg`), not per pair —
    the contradiction rule's regex over title+body would otherwise run
    2 × |pairs| × k times over full body text (the round-1 hot spot). `body`
    itself rides along only when a config rule dereferences JSON body fields;
    the default rule set never ships it through the pair frame.
    """
    from cortex_spark.functions.text import has_negation_col

    cols = ATTR_COLS + (["body"] if include_body else [])
    attrs = nodes.select(
        F.col("node_id"),
        *[F.col(c) for c in cols],
        has_negation_col(F.col("title"), F.col("body")).alias("neg"),
    )
    a = attrs.select(
        F.col("node_id").alias("a_id"), *[F.col(c).alias(f"a_{c}") for c in [*cols, "neg"]]
    )
    b = attrs.select(
        F.col("node_id").alias("b_id"), *[F.col(c).alias(f"b_{c}") for c in [*cols, "neg"]]
    )
    return ordered_pairs.join(a, "a_id").join(b, "b_id")


PROPOSAL_VALUE_COLS = ["weight", "ptype", "detail", "pscore", "priority", "score"]


def first_rule_wins(proposed: DataFrame) -> DataFrame:
    """Lowest-priority proposal per (src, dst, relation) via min_by hash-agg
    (J11 proposal-order semantics, redb_storage.rs:812-827). Equivalent to a
    row_number-over-priority window but with map-side partial aggregation —
    at 10^10 proposals the combine happens before the shuffle."""
    picked = proposed.groupBy("src", "dst", "relation").agg(
        F.min_by(F.struct(*PROPOSAL_VALUE_COLS), F.col("priority")).alias("p")
    )
    return picked.select("src", "dst", "relation", *[F.col(f"p.{c}").alias(c) for c in PROPOSAL_VALUE_COLS])


def symmetrize(pairs: DataFrame) -> DataFrame:
    """Canonical (a<b) pairs → both orientations (each node scans neighbors,
    auto_linker.rs:215-243)."""
    swapped = pairs.select(
        F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"), F.col("score")
    )
    return pairs.unionByName(swapped)


def ann_candidates(
    nodes: DataFrame,
    config: LinkerConfig | None = None,
    use_lsh: bool = True,
    lsh_kwargs: dict | None = None,
) -> DataFrame:
    """Per-node top-k neighbor scan (the reference's HNSW `search(embedding,
    100)`, auto_linker.rs:220-221), deterministic tie-break on neighbor id.
    LSH path: bucketed-GEMM candidate_topk. Exact path: all-pairs + window.

    Compute once (and `.localCheckpoint()`) to share between the linker and
    the dedup scanner — both consume the same candidate structure.
    """
    cfg = config or LinkerConfig()
    live = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).filter(F.col("embedding").isNotNull())
    if use_lsh:
        return candidate_topk(live, k=cfg.ann_k, **(lsh_kwargs or {}))
    ordered = symmetrize(brute_force_pairs(live))
    w_ann = Window.partitionBy("a_id").orderBy(F.desc("score"), F.asc("b_id"))
    return (
        ordered.withColumn("ann_rn", F.row_number().over(w_ann))
        .filter(F.col("ann_rn") <= cfg.ann_k)
        .drop("ann_rn")
    )


def link_nodes(
    nodes: DataFrame,
    config: LinkerConfig | None = None,
    run_ts: datetime | None = None,
    existing_edges: DataFrame | None = None,
    use_lsh: bool = True,
    lsh_kwargs: dict | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Produce the edge (triple) DataFrame for the given node table.

    Pass `existing_edges` for incremental runs — proposals already present
    as (src, dst, relation) are dropped (J11, redb_storage.rs:812-827).
    Pass `candidates` (from ann_candidates) to reuse a precomputed
    candidate structure across linker + dedup.
    """
    cfg = config or LinkerConfig()
    run_ts = run_ts or datetime(2026, 1, 1, tzinfo=timezone.utc)
    live = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).filter(F.col("embedding").isNotNull())
    ordered = candidates if candidates is not None else ann_candidates(nodes, cfg, use_lsh, lsh_kwargs)
    needs_body = any(
        r.condition in ("body_field_contains", "body_field_ref") for r in cfg.config_rules
    )
    with_attrs = _attach_attrs(ordered, live, include_body=needs_body)
    proposed = apply_link_rules(with_attrs, cfg)

    if existing_edges is not None:
        proposed = proposed.join(
            existing_edges.select("src", "dst", "relation"), ["src", "dst", "relation"], "left_anti"
        )

    # first rule wins per (src, dst, relation) — proposal order semantics.
    # Hash-aggregate min_by instead of a row_number window: partial (map-side)
    # aggregation shrinks the shuffle and skips the sort; priorities are
    # unique per rule so the pick is deterministic.
    # One exchange for the whole tail (guide §2.4): hash-partitioning by src
    # alone satisfies the clustering the (src,dst,relation) aggregation AND
    # the per-src cap window both require, so the explicit repartition below
    # replaces two back-to-back shuffles (agg by 3 keys, then window by src)
    # with one. Proposals per src are bounded by ann_k x rules, so no
    # hot-key hazard; AQE still coalesces the partition count.
    deduped = first_rule_wins(proposed.repartition("src"))
    # per-node cap in candidate-score order (auto_linker.rs:259-264); tie-break
    # (dst, priority) makes the distributed order deterministic (SURVEY §7).
    w_cap = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"), F.asc("priority"))
    deduped = (
        deduped.withColumn("cap_rn", F.row_number().over(w_cap))
        .filter(F.col("cap_rn") <= cfg.max_edges_per_node)
        .drop("cap_rn")
    )

    ts = F.to_timestamp(F.lit(run_ts.strftime("%Y-%m-%d %H:%M:%S")))
    return deduped.select(
        F.sha2(F.concat_ws("\x00", "src", "dst", "relation"), 256).substr(1, 32).alias("edge_id"),
        "src",
        "dst",
        "relation",
        F.col("weight").cast("float").alias("weight"),
        F.struct(
            F.col("ptype").alias("ptype"),
            F.col("detail").alias("detail"),
            F.col("pscore").alias("score"),
        ).alias("provenance"),
        ts.alias("created_at"),
        ts.alias("updated_at"),
    )
