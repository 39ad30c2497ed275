"""Prompt versioning on the graph: resolver + auto-rollback monitor.

The reference builds a prompt subsystem ON TOP of the same node/edge tables
(prompt/model.rs:1-72): a prompt version is a kind='prompt' node whose body
is JSON {slug, type, branch, version, sections, metadata, override_sections};
version chains are `supersedes` edges (new → old), branches `branched_from`,
inheritance `inherits_from`, skills attach via `used_by`.

Re-expressed here as DataFrame ops over the standard tables:

- resolver (prompt/resolver.rs): HEAD = the version of a slug+branch that no
  sibling supersedes (resolver.rs:23-80, single forward-edge pass);
  resolve() merges inherited sections ancestor-first with a cycle guard
  (resolver.rs:82-168, cycle test :914).
- rollback monitor (prompt/rollback.rs): per-deployment Welford running
  stats over observations, σ/absolute/consecutive-negative triggers,
  rollback event node + rolled_back/rolled_back_to edges, exponential
  cooldown, quarantine after 3 rollbacks (rollback.rs:244-434,553-726).

The observation scan is one window pass (running means = Welford means);
prompt tables are tiny relative to the corpus, so driver-side loops over
*versions* (not observations) mirror the reference's own sequential walks.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prompt_cols(nodes: DataFrame) -> DataFrame:
    """kind='prompt' nodes with slug/branch/version parsed from body JSON
    (model.rs:8-31; branch default 'main', version default 1)."""
    return nodes.filter(F.col("kind") == "prompt").select(
        "node_id",
        "title",
        "body",
        "tags",
        "created_at",
        F.get_json_object("body", "$.slug").alias("slug"),
        F.coalesce(F.get_json_object("body", "$.branch"), F.lit("main")).alias("branch"),
        F.coalesce(F.get_json_object("body", "$.version").cast("int"), F.lit(1)).alias("version"),
        F.get_json_object("body", "$.type").alias("prompt_type"),
    )


def superseded_set(prompts: DataFrame, edges: DataFrame) -> DataFrame:
    """node_ids superseded by a sibling prompt version (resolver.rs:23-38:
    one forward pass over outgoing `supersedes` edges of prompt nodes)."""
    srcs = prompts.select(F.col("node_id").alias("src"))
    return (
        edges.filter(F.col("relation") == "supersedes")
        .join(srcs, "src", "left_semi")
        .select(F.col("dst").alias("node_id"))
        .distinct()
    )


def heads(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """HEAD per (slug, branch): the version no sibling superseded
    (resolver.rs:67-80, list_all_prompts :278-311). Deterministic tie-break
    (version desc, created_at desc, node_id) if a chain is malformed."""
    p = prompt_cols(nodes)
    cand = p.join(superseded_set(p, edges), "node_id", "left_anti")
    w = Window.partitionBy("slug", "branch").orderBy(
        F.desc("version"), F.desc("created_at"), F.asc("node_id")
    )
    return cand.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")


def list_versions(nodes: DataFrame, edges: DataFrame, slug: str, branch: str = "main") -> DataFrame:
    """Version history, oldest first, with is_head (resolver.rs:323-347)."""
    p = prompt_cols(nodes).filter((F.col("slug") == slug) & (F.col("branch") == branch))
    sup = superseded_set(prompt_cols(nodes), edges)
    return (
        p.join(sup.withColumn("is_sup", F.lit(True)), "node_id", "left")
        .withColumn("is_head", F.coalesce(~F.col("is_sup"), F.lit(True)))
        .drop("is_sup")
        .orderBy(F.asc("created_at"), F.asc("version"))
        .select("node_id", "slug", "version", "branch", "created_at", "is_head")
    )


def resolve_prompt(nodes: DataFrame, edges: DataFrame, slug: str, branch: str = "main") -> dict | None:
    """Fully resolved HEAD: sections merged along the `inherits_from` chain
    (ancestor base, descendant overrides win — resolver.rs:82-168), lineage
    deepest-first, skills from `used_by` edges. Cycle guard: a repeated node
    terminates the walk (resolver.rs cycle test :914-975)."""
    head_row = heads(nodes, edges).filter(
        (F.col("slug") == slug) & (F.col("branch") == branch)
    ).first()
    if head_row is None:
        return None
    # walk the inheritance chain driver-side (chains are a handful of nodes,
    # exactly like the reference's sequential resolver); max 10 hops past the
    # head + cycle guard (resolver.rs:93-112)
    inh = {
        r["src"]: r["dst"]
        for r in edges.filter(F.col("relation") == "inherits_from").select("src", "dst").collect()
    }
    bodies = {r["node_id"]: r["body"] for r in prompt_cols(nodes).select("node_id", "body").collect()}
    chain, seen, cur = [head_row["node_id"]], {head_row["node_id"]}, head_row["node_id"]
    for _ in range(10):
        cur = inh.get(cur)
        if cur is None or cur in seen or cur not in bodies:
            break
        seen.add(cur)
        chain.append(cur)
    merged: dict = {}
    lineage: list[str] = []
    for nid in reversed(chain):  # ancestors first; descendants override
        b = json.loads(bodies[nid])
        lineage.append(b.get("slug", ""))
        merged.update(b.get("sections", {}))
        merged.update(b.get("override_sections", {}))
    # skills are reported by their body SLUG, not node id (resolver.rs:138-152)
    skill_ids = {
        r["src"]
        for r in edges.filter((F.col("relation") == "used_by") & (F.col("dst") == head_row["node_id"]))
        .select("src")
        .collect()
    }
    skills = [
        json.loads(bodies[sid]).get("slug", "") for sid in skill_ids if sid in bodies
    ]
    return {
        "node_id": head_row["node_id"],
        "slug": slug,
        "branch": branch,
        "version": head_row["version"],
        "content": merged,
        "lineage": lineage,
        "skills": sorted(skills),
    }


# ── rollback monitor ─────────────────────────────────────────────────────────


@dataclass
class RollbackConfig:
    """Defaults mirror rollback.rs:50-66."""

    monitoring_window: int = 20
    min_samples_before_check: int = 5
    correction_rate_rollback: float = 3.0
    absolute_correction_increase: float = 0.25
    sentiment_rollback: float = 2.0
    consecutive_negative_limit: int = 3
    cooldown_base_hours: int = 1
    max_rollbacks_before_quarantine: int = 3


def compute_baseline_stats(obs: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    """(mean_c, std_c, mean_s, std_s); empty → the reference's priors; stddev
    floored at 0.01 (rollback.rs:811-829; population variance)."""
    if not obs:
        return (0.15, 0.05, 0.7, 0.1)
    n = float(len(obs))
    mean_c = sum(c for c, _ in obs) / n
    mean_s = sum(s for _, s in obs) / n
    var_c = sum((c - mean_c) ** 2 for c, _ in obs) / n
    var_s = sum((s - mean_s) ** 2 for _, s in obs) / n
    return (mean_c, max(math.sqrt(var_c), 0.01), mean_s, max(math.sqrt(var_s), 0.01))


def monitor_observations(
    obs: DataFrame,
    baseline: tuple[float, float, float, float],
    config: RollbackConfig | None = None,
) -> DataFrame:
    """Batch re-expression of process_observation (rollback.rs:244-434).

    obs: (seq int, correction_rate double, sentiment double, obs_score
    double) ordered by seq. Returns one row per observation with the running
    stats and the FIRST trigger (if any): running means via window avg ≡
    Welford online means; triggers checked only for min_samples ≤ n <
    monitoring_window; per-row priority consecutive_negative >
    correction_sigma > sentiment_sigma > absolute_increase
    (rollback.rs:395-433 check order)."""
    cfg = config or RollbackConfig()
    base_c, std_c, base_s, std_s = baseline
    w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n = F.row_number().over(Window.orderBy("seq"))
    mean_c = F.avg("correction_rate").over(w)
    mean_s = F.avg("sentiment").over(w)
    # consecutive negatives: rows since the last non-negative observation
    neg = (F.col("obs_score") < 0.4).cast("int")
    grp = F.sum(1 - neg).over(w)  # increments on each non-negative → group id
    consec = F.sum(neg).over(Window.partitionBy(grp).orderBy("seq").rowsBetween(Window.unboundedPreceding, Window.currentRow))

    c_sigma = F.when(F.lit(std_c) > 1e-6, (mean_c - base_c) / F.lit(std_c)).otherwise(F.lit(0.0))
    s_sigma = F.when(F.lit(std_s) > 1e-6, (F.lit(base_s) - mean_s) / F.lit(std_s)).otherwise(F.lit(0.0))
    c_inc = mean_c - F.lit(base_c)

    in_window = (n >= cfg.min_samples_before_check) & (n < cfg.monitoring_window)
    trigger = F.when(~in_window, F.lit(None).cast("string"))
    trigger = (
        trigger.when(consec >= cfg.consecutive_negative_limit, F.lit("consecutive_negative"))
        .when(c_sigma > cfg.correction_rate_rollback, F.lit("correction_rate_sigma"))
        .when(s_sigma > cfg.sentiment_rollback, F.lit("sentiment_sigma"))
        .when(c_inc > cfg.absolute_correction_increase, F.lit("absolute_correction_increase"))
    )
    return obs.select(
        "seq",
        n.alias("n"),
        mean_c.alias("mean_correction"),
        mean_s.alias("mean_sentiment"),
        consec.alias("consecutive_negative"),
        c_sigma.alias("correction_sigma"),
        s_sigma.alias("sentiment_sigma"),
        F.when(n >= cfg.monitoring_window, F.lit("stable")).otherwise(F.lit("monitoring")).alias("status"),
        trigger.alias("trigger"),
    )


def first_trigger(monitored: DataFrame) -> dict | None:
    """The rollback decision: the reference rolls back at the FIRST
    triggering observation (processing stops there)."""
    row = monitored.filter(F.col("trigger").isNotNull()).orderBy("seq").first()
    return row.asDict() if row else None


def execute_rollback(
    nodes: DataFrame,
    edges: DataFrame,
    slug: str,
    branch: str,
    trigger: str,
    now: datetime,
    prior_rollbacks: int = 0,
    config: RollbackConfig | None = None,
    agent_name: str | None = None,
) -> tuple[DataFrame, DataFrame, dict]:
    """Roll the HEAD of slug+branch back to its predecessor
    (rollback.rs:553-726). Returns (nodes', edges', result):

    - rollback event node (kind=event, tag 'rollback', JSON body with
      trigger/cooldown/quarantine),
    - event --rolled_back--> from_version and --rolled_back_to--> to_version,
    - from_version tagged 'auto-rolled-back' (+ 'quarantined' at the cap),
    - agent `uses` edges onto the rolled-back version depressed to 0.1,
    - cooldown = base · 2^(count−1), capped at 168 h.
    """
    cfg = config or RollbackConfig()
    spark = nodes.sparkSession
    head_row = heads(nodes, edges).filter(
        (F.col("slug") == slug) & (F.col("branch") == branch)
    ).first()
    if head_row is None:
        raise ValueError(f"no HEAD for {slug}/{branch}")
    from_id, from_version = head_row["node_id"], head_row["version"]
    prev = (
        edges.filter((F.col("relation") == "supersedes") & (F.col("src") == from_id))
        .select("dst")
        .first()
    )
    if prev is None:
        raise ValueError(f"Cannot rollback {slug}/{branch} v{from_version}: no previous version found")
    to_id = prev["dst"]
    to_row = prompt_cols(nodes).filter(F.col("node_id") == to_id).first()
    to_version = to_row["version"] if to_row else from_version - 1

    count = prior_rollbacks + 1
    cooldown_hours = min(cfg.cooldown_base_hours * (1 << min(count - 1, 7)), 168)
    quarantined = count >= cfg.max_rollbacks_before_quarantine
    ts = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))

    rb_id = f"rollback-{slug}-{branch}-v{from_version}"
    body = json.dumps(
        {
            "event_type": "rollback", "slug": slug, "branch": branch,
            "from_version": from_version, "to_version": to_version,
            "trigger": trigger, "rollback_count": count,
            "cooldown_hours": cooldown_hours, "is_quarantined": quarantined,
        },
        sort_keys=True,
    )
    ev = spark.createDataFrame(
        [(rb_id, "event", f"rollback:{slug}/{branch}/v{from_version}->v{to_version}", body, ["rollback"])],
        "node_id string, kind string, title string, body string, tags array<string>",
    )
    # idempotent: a re-run drops its own prior event row before re-appending
    new_nodes = nodes.join(ev.select("node_id"), "node_id", "left_anti")
    # tag the rolled-back version (idempotent append)
    add_tags = F.array(*( [F.lit("auto-rolled-back")] + ([F.lit("quarantined")] if quarantined else []) ))
    new_nodes = new_nodes.withColumn(
        "tags",
        F.when(
            F.col("node_id") == from_id,
            F.concat(F.col("tags"), F.array_except(add_tags, F.col("tags"))),
        ).otherwise(F.col("tags")),
    )
    ev_full = ev.select(
        "node_id", "kind", "title", "body",
        F.lit(None).cast("map<string,string>").alias("metadata"),
        "tags",
        F.lit(None).cast("array<float>").alias("embedding"),
        F.lit("rollback_monitor").alias("source_agent"),
        F.lit(None).cast("string").alias("source_session"),
        F.lit(None).cast("string").alias("source_channel"),
        F.lit(1.0).cast("float").alias("importance"),
        F.lit(0).cast("bigint").alias("access_count"),
        ts.alias("last_accessed_at"), ts.alias("created_at"), ts.alias("updated_at"),
        F.lit(False).alias("deleted"),
    )
    new_nodes = new_nodes.unionByName(ev_full.select(*new_nodes.columns))

    def _edge(src: str, dst: str, rel: str, weight: float) -> tuple:
        return (
            f"{src}-{dst}-{rel}", src, dst, rel, float(weight),
            ("auto_structural", "rollback_monitor", None),
        )

    rb_edges = spark.createDataFrame(
        [_edge(rb_id, from_id, "rolled_back", 1.0), _edge(rb_id, to_id, "rolled_back_to", 1.0)],
        "edge_id string, src string, dst string, relation string, weight float, "
        "provenance struct<ptype:string, detail:string, score:float>",
    ).select("*", ts.alias("created_at"), ts.alias("updated_at"))
    # depress agent `uses` edges onto the rolled-back version (rollback.rs:696-711)
    uses_hit = (F.col("relation") == "uses") & (F.col("dst") == from_id) & (
        (F.lit(agent_name).isNull()) | (F.col("src") == agent_name)
    )
    new_edges = edges.withColumn(
        "weight", F.when(uses_hit, F.lit(0.1).cast("float")).otherwise(F.col("weight"))
    ).unionByName(rb_edges.select(*edges.columns))

    result = {
        "rollback_node_id": rb_id, "from_node_id": from_id, "from_version": from_version,
        "to_node_id": to_id, "to_version": to_version, "trigger": trigger,
        "cooldown_hours": cooldown_hours, "is_quarantined": quarantined, "rollback_count": count,
    }
    return new_nodes, new_edges, result


# ── version/branch builders (resolver.rs:180-277) ───────────────────────────


def _prompt_node_rows(
    spark,
    slug: str,
    branch: str,
    version: int,
    sections: dict,
    author: str,
    now: datetime,
    overrides: dict | None = None,
    prompt_type: str = "persona",
) -> DataFrame:
    """One node row in the standard NODES shape (build_node, resolver.rs:349+:
    branch/version are embedded in the body JSON so they round-trip)."""
    node_id = f"prompt-{slug}-{branch}-v{version}"
    body = json.dumps(
        {"slug": slug, "type": prompt_type, "branch": branch, "version": version,
         "sections": sections, "override_sections": overrides or {}},
        sort_keys=True,
    )
    ts = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
    return spark.createDataFrame(
        [(node_id, "prompt", slug, body)],
        "node_id string, kind string, title string, body string",
    ).select(
        "node_id", "kind", "title", "body",
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.array().cast("array<string>").alias("tags"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.lit(author).alias("source_agent"),
        F.lit(None).cast("string").alias("source_session"),
        F.lit(None).cast("string").alias("source_channel"),
        F.lit(0.5).cast("float").alias("importance"),
        F.lit(0).cast("bigint").alias("access_count"),
        ts.alias("last_accessed_at"), ts.alias("created_at"), ts.alias("updated_at"),
        F.lit(False).alias("deleted"),
    )


def _manual_edge(spark, src: str, dst: str, relation: str, author: str, now: datetime) -> DataFrame:
    ts = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
    return spark.createDataFrame(
        [(f"{src}-{dst}-{relation}", src, dst, relation, 1.0, ("manual", author, None))],
        "edge_id string, src string, dst string, relation string, weight float, "
        "provenance struct<ptype:string, detail:string, score:float>",
    ).select("*", ts.alias("created_at"), ts.alias("updated_at"))


def create_prompt(
    nodes: DataFrame, edges: DataFrame, slug: str, sections: dict, author: str,
    now: datetime, branch: str = "main", prompt_type: str = "persona",
) -> tuple[DataFrame, DataFrame, str]:
    """First version of a new prompt (resolver.rs:180-197): rejects an
    existing slug+branch. Returns (nodes', edges', node_id)."""
    existing = prompt_cols(nodes).filter((F.col("slug") == slug) & (F.col("branch") == branch))
    if not existing.isEmpty():
        raise ValueError(
            f"Prompt '{slug}' on branch '{branch}' already exists. Use create_version to add a new version."
        )
    row = _prompt_node_rows(nodes.sparkSession, slug, branch, 1, sections, author, now, prompt_type=prompt_type)
    node_id = row.first()["node_id"]
    return nodes.unionByName(row.select(*nodes.columns)), edges, node_id


def create_version(
    nodes: DataFrame, edges: DataFrame, slug: str, sections: dict, author: str,
    now: datetime, branch: str = "main",
) -> tuple[DataFrame, DataFrame, str]:
    """New version = node at HEAD.version+1 plus a Manual `supersedes` edge
    new → old (resolver.rs:199-234). Returns (nodes', edges', node_id)."""
    head_row = heads(nodes, edges).filter(
        (F.col("slug") == slug) & (F.col("branch") == branch)
    ).first()
    if head_row is None:
        raise ValueError(f"Prompt '{slug}' on branch '{branch}' not found")
    v = head_row["version"] + 1
    spark = nodes.sparkSession
    row = _prompt_node_rows(spark, slug, branch, v, sections, author, now)
    node_id = row.first()["node_id"]
    e = _manual_edge(spark, node_id, head_row["node_id"], "supersedes", author, now)
    return (
        nodes.unionByName(row.select(*nodes.columns)),
        edges.unionByName(e.select(*edges.columns)),
        node_id,
    )


def create_branch(
    nodes: DataFrame, edges: DataFrame, slug: str, from_branch: str, new_branch: str,
    author: str, now: datetime, base_version: int | None = None,
) -> tuple[DataFrame, DataFrame, str]:
    """Fork onto a new branch at v1 with a Manual `branched_from` edge to the
    base version (resolver.rs:236-277)."""
    p = prompt_cols(nodes).filter((F.col("slug") == slug) & (F.col("branch") == from_branch))
    if base_version is not None:
        base = p.filter(F.col("version") == base_version).first()
        if base is None:
            raise ValueError(f"Version {base_version} of '{slug}@{from_branch}' not found")
    else:
        base = heads(nodes, edges).filter(
            (F.col("slug") == slug) & (F.col("branch") == from_branch)
        ).first()
        if base is None:
            raise ValueError(f"Prompt '{slug}' on branch '{from_branch}' not found")
    spark = nodes.sparkSession
    sections = json.loads(base["body"]).get("sections", {})
    row = _prompt_node_rows(spark, slug, new_branch, 1, sections, author, now)
    node_id = row.first()["node_id"]
    e = _manual_edge(spark, node_id, base["node_id"], "branched_from", author, now)
    return (
        nodes.unionByName(row.select(*nodes.columns)),
        edges.unionByName(e.select(*edges.columns)),
        node_id,
    )
