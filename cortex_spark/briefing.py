"""Briefing report (SURVEY §3.4): ordered ranked sections with seen-set
exclusion, re-expressed as a DAG of filtered/ranked DataFrames with ordered
anti-joins (reference briefing/engine.rs:139-289).

Ranking per section (A5, engine.rs:77-91,329-338): importance ≥ 0.3,
sort (importance desc, access_count desc), top 10 per section, global 50.
Sections (in exclusion order): identity (agent's own nodes), goals,
patterns (2-hop applies_to/instance_of neighborhood), unresolved
contradictions (contradicts-edge endpoints), recent events (48 h window),
then auto-discovered sections — one per non-default kind, ordered by
Σ importance (A6, engine.rs:725-768).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cortex_spark.graph.traverse import bfs
from cortex_spark.schemas import DEFAULT_KINDS

MIN_IMPORTANCE = 0.3
PER_SECTION = 10
GLOBAL_CAP = 50
RECENT_HOURS = 48


RANK_ORDER = (F.desc("importance"), F.desc("access_count"), F.asc("node_id"))


def _rank(df: DataFrame, limit: int = PER_SECTION) -> DataFrame:
    return (
        df.filter(F.col("importance") >= MIN_IMPORTANCE)
        .orderBy(*RANK_ORDER)
        .limit(limit)
    )


def generate_briefing(
    nodes: DataFrame,
    edges: DataFrame,
    agent: str,
    now: datetime,
) -> DataFrame:
    """Returns (section, section_rank, node_id, kind, title, importance)."""
    spark = nodes.sparkSession
    live = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
    # created_at rides along so the active_context allocation cut can re-sort
    base_cols = ["node_id", "kind", "title", "body", "importance", "access_count", "created_at"]

    sections: list[tuple[str, DataFrame]] = []
    agent_nodes = live.filter(F.col("source_agent") == agent)
    sections.append(("identity", _rank(agent_nodes.filter(F.col("kind").isin("agent", "preference")).select(*base_cols))))
    sections.append(("goals", _rank(agent_nodes.filter(F.col("kind") == "goal").select(*base_cols))))

    # patterns: pattern nodes + their 2-hop applies_to/instance_of neighborhood
    pattern_ids = agent_nodes.filter(F.col("kind") == "pattern").select("node_id")
    if not pattern_ids.isEmpty():
        hood = bfs(edges, pattern_ids, max_depth=2, relation=["applies_to", "instance_of"])
        patt = live.join(hood.select("node_id"), "node_id").select(*base_cols)
    else:
        patt = agent_nodes.filter(F.col("kind") == "pattern").select(*base_cols)
    sections.append(("patterns", _rank(patt)))

    contra_ids = (
        edges.filter(F.col("relation") == "contradicts")
        .select(F.explode(F.array("src", "dst")).alias("node_id"))
        .distinct()
    )
    sections.append(("contradictions", _rank(live.join(contra_ids, "node_id").select(*base_cols))))

    cutoff = F.lit((now - timedelta(hours=RECENT_HOURS)).strftime("%Y-%m-%d %H:%M:%S"))
    sections.append(
        ("recent_events", _rank(agent_nodes.filter((F.col("kind") == "event") & (F.col("created_at") >= F.to_timestamp(cutoff))).select(*base_cols)))
    )

    # active context (engine.rs:446-549): most recent activity for the agent,
    # any kind — anchored on the newest nodes rather than a 48 h wall
    sections.append(
        (
            "active_context",
            agent_nodes.filter(F.col("importance") >= MIN_IMPORTANCE)
            .orderBy(F.desc("created_at"), F.asc("node_id"))
            .limit(PER_SECTION)
            .select(*base_cols),
        )
    )

    # auto-discovered: novel kinds ordered by Σ importance (A6)
    novel = (
        live.filter(~F.col("kind").isin(DEFAULT_KINDS))
        .groupBy("kind")
        .agg(F.sum("importance").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("kind"))
        .collect()
    )
    for row in novel:
        sections.append((f"more_{row['kind']}", _rank(live.filter(F.col("kind") == row["kind"]).select(*base_cols))))

    # ordered seen-set exclusion (U2, engine.rs:154-250) + global cap
    seen = spark.createDataFrame([], "node_id string")
    out = None
    remaining = GLOBAL_CAP
    for idx, (name, sec) in enumerate(sections):
        if remaining <= 0:
            break
        # the global-cap cut is taken in the section's own rank order —
        # a bare limit() after the anti-join would be non-deterministic
        order = (F.desc("created_at"), F.asc("node_id")) if name == "active_context" else RANK_ORDER
        picked = sec.join(seen, "node_id", "left_anti").orderBy(*order).limit(remaining)
        picked = picked.localCheckpoint(eager=True)
        n = picked.count()
        if n == 0:
            continue
        remaining -= n
        seen = seen.unionByName(picked.select("node_id")).localCheckpoint(eager=True)
        labeled = picked.withColumn("section", F.lit(name)).withColumn("section_idx", F.lit(idx))
        out = labeled if out is None else out.unionByName(labeled)
    if out is None:
        return spark.createDataFrame(
            [],
            "node_id string, kind string, title string, body string, importance float, "
            "access_count bigint, section string, section_idx int, section_rank int",
        )
    from pyspark.sql import Window

    w = Window.partitionBy("section").orderBy(F.desc("importance"), F.desc("access_count"), F.asc("node_id"))
    return out.withColumn("section_rank", F.row_number().over(w)).select(
        "section", "section_idx", "section_rank", "node_id", "kind", "title", "body", "importance"
    )


class BriefingCache:
    """briefing/cache.rs:1-49 re-expressed for batch: cached report rows
    keyed by agent, valid only while the graph version matches and the TTL
    holds. Version plays the role of the reference's `graph_version`
    counter (any config-hash / snapshot id works); entries store collected
    report rows, driver-report-sized by contract (≤ sections × PER_SECTION)."""

    def __init__(self, ttl_secs: float = 300.0, clock=None) -> None:
        import time

        self._ttl = ttl_secs
        self._clock = clock or time.monotonic
        self._entries: dict[str, tuple[list, float, int]] = {}
        self.hits = 0
        self.misses = 0

    def get(self, agent: str, current_version: int):
        e = self._entries.get(agent)
        if e is not None:
            rows, at, version = e
            if version == current_version and self._clock() - at < self._ttl:
                self.hits += 1
                return rows
        self.misses += 1
        return None

    def put(self, agent: str, rows: list, version: int) -> None:
        self._entries[agent] = (rows, self._clock(), version)

    def invalidate(self, agent: str) -> None:
        self._entries.pop(agent, None)

    def get_or_generate(self, nodes: DataFrame, edges: DataFrame, agent: str, version: int, now) -> list:
        cached = self.get(agent, version)
        if cached is not None:
            return cached
        rows = generate_briefing(nodes, edges, agent, now).collect()
        self.put(agent, rows, version)
        return rows


def _section_title(section: str) -> str:
    from cortex_spark.functions.text import pluralize_section

    if section.startswith("more_"):
        # auto-discovered sections are named by pluralised kind (A6)
        return pluralize_section(section[5:])
    return section.replace("_", " ").title()


def _collect_sections(report) -> list[tuple[str, list]]:
    order_cols = ["section_idx", "section_rank"] if "section_idx" in report.columns else ["section", "section_rank"]
    rows = report.orderBy(*order_cols).collect()
    sections: list[tuple[str, list]] = []
    for r in rows:
        if not sections or sections[-1][0] != r["section"]:
            sections.append((r["section"], []))
        sections[-1][1].append(r)
    return sections


def render_briefing_markdown(report, agent: str = "", max_chars: int = 8000) -> str:
    """Markdown render of a generate_briefing() frame, format-faithful to
    MarkdownRenderer (briefing/renderer.rs:70-101): header with agent +
    generated stamp, '## Section' blocks, '- **title**: body-preview(200)'
    bullets, whole output char-truncated with ' [truncated]'."""
    from cortex_spark.functions.text import body_preview, truncate_annotated

    out: list[str] = [f"# Briefing: {agent}\n_Generated: run_\n\n"]
    for section, rows in _collect_sections(report):
        out.append(f"## {_section_title(section)}\n\n")
        for r in rows:
            preview = body_preview(r["body"] or "", 200) if "body" in report.columns else ""
            out.append(f"- **{r['title']}**: {preview}\n")
        out.append("\n")
    return truncate_annotated("".join(out), max_chars)


def render_briefing_compact(report, agent: str = "", max_chars: int = 8000) -> str:
    """Compact render (CompactRenderer, renderer.rs:79-86,103-110): titles
    only — '# agent' header, '## Section' + '- title' lines, same global
    char truncation."""
    from cortex_spark.functions.text import truncate_annotated

    out: list[str] = [f"# {agent}\n"]
    for section, rows in _collect_sections(report):
        out.append(f"## {_section_title(section)}\n")
        for r in rows:
            out.append(f"- {r['title']}\n")
    return truncate_annotated("".join(out), max_chars)
