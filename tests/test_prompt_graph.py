"""Prompt versioning on the graph: resolver, version history, rollback
monitor triggers + graph artifacts (reference prompt/resolver.rs and
prompt/rollback.rs)."""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_edge, make_node


def _prompt(node_id, slug, version, branch="main", sections=None, overrides=None,
            created="2026-01-01 00:00:00", tags=None):
    body = json.dumps(
        {"slug": slug, "type": "persona", "branch": branch, "version": version,
         "sections": sections or {}, "override_sections": overrides or {}}
    )
    return make_node(node_id, kind="prompt", title=slug, body=body, created_at=created, tags=tags)


@pytest.fixture()
def prompt_graph(nodes_df_factory, edges_df_factory):
    nodes = nodes_df_factory(
        [
            _prompt("p1", "coder", 1, sections={"intro": "v1 intro", "rules": "base rules"}),
            _prompt("p2", "coder", 2, sections={"intro": "v2 intro"}, created="2026-01-02 00:00:00"),
            _prompt("p3", "coder", 3, sections={"intro": "v3 intro"}, created="2026-01-03 00:00:00"),
            _prompt("base", "persona-base", 1, sections={"tone": "neutral", "rules": "root rules"}),
            _prompt("dev1", "coder", 1, branch="dev", created="2026-01-04 00:00:00"),
            make_node("skillA", kind="prompt", title="skillA",
                      body=json.dumps({"slug": "skillA", "type": "skill", "version": 1})),
            make_node("agent1", kind="agent", title="kai"),
        ]
    )
    edges = edges_df_factory(
        [
            make_edge("p2", "p1", "supersedes"),  # chain v3 → v2 → v1
            make_edge("p3", "p2", "supersedes"),
            make_edge("p3", "base", "inherits_from"),
            make_edge("skillA", "p3", "used_by"),
            make_edge("agent1", "p3", "uses", weight=0.9),
        ]
    )
    return nodes, edges


def test_heads_and_versions(spark, prompt_graph):
    from cortex_spark.prompt_graph import heads, list_versions

    nodes, edges = prompt_graph
    h = {(r["slug"], r["branch"]): r["node_id"] for r in heads(nodes, edges).collect()}
    assert h[("coder", "main")] == "p3"  # v1/v2 superseded
    assert h[("coder", "dev")] == "dev1"
    assert h[("persona-base", "main")] == "base"
    hist = list_versions(nodes, edges, "coder", "main").collect()
    assert [(r["version"], r["is_head"]) for r in hist] == [(1, False), (2, False), (3, True)]


def test_resolve_inheritance_and_skills(spark, prompt_graph):
    from cortex_spark.prompt_graph import resolve_prompt

    nodes, edges = prompt_graph
    r = resolve_prompt(nodes, edges, "coder", "main")
    assert r["version"] == 3 and r["node_id"] == "p3"
    # ancestor base, descendant overrides (resolver.rs:82-168)
    assert r["content"] == {"tone": "neutral", "rules": "root rules", "intro": "v3 intro"}
    assert r["lineage"] == ["persona-base", "coder"]
    assert r["skills"] == ["skillA"]
    assert resolve_prompt(nodes, edges, "nope") is None


def test_resolve_cycle_guard(spark, nodes_df_factory, edges_df_factory):
    from cortex_spark.prompt_graph import resolve_prompt

    nodes = nodes_df_factory(
        [_prompt("a", "a", 1, sections={"x": "1"}), _prompt("b", "b", 1, sections={"y": "2"})]
    )
    edges = edges_df_factory(
        [make_edge("a", "b", "inherits_from"), make_edge("b", "a", "inherits_from")]
    )
    r = resolve_prompt(nodes, edges, "a")  # must terminate (resolver.rs:914)
    assert r is not None and r["content"] == {"y": "2", "x": "1"}


def test_baseline_stats(spark):
    from cortex_spark.prompt_graph import compute_baseline_stats

    assert compute_baseline_stats([]) == (0.15, 0.05, 0.7, 0.1)
    m_c, s_c, m_s, s_s = compute_baseline_stats([(0.1, 0.8), (0.2, 0.6)])
    assert abs(m_c - 0.15) < 1e-9 and abs(m_s - 0.7) < 1e-9
    assert abs(s_c - 0.05) < 1e-9 and abs(s_s - 0.1) < 1e-9
    # stddev floor 0.01 (rollback.rs:826)
    assert compute_baseline_stats([(0.1, 0.5), (0.1, 0.5)])[1] == 0.01


def _obs_df(spark, rows):
    return spark.createDataFrame(
        [(i, c, s, o) for i, (c, s, o) in enumerate(rows)],
        "seq int, correction_rate double, sentiment double, obs_score double",
    )


def test_monitor_consecutive_negative_trigger(spark):
    from cortex_spark.prompt_graph import first_trigger, monitor_observations

    # 3 consecutive obs_score < 0.4 → rollback, but only once n ≥ min_samples(5)
    rows = [(0.1, 0.8, 0.9)] * 4 + [(0.1, 0.8, 0.1), (0.1, 0.8, 0.2), (0.1, 0.8, 0.3)]
    mon = monitor_observations(_obs_df(spark, rows), (0.15, 0.05, 0.7, 0.1))
    t = first_trigger(mon)
    assert t is not None and t["trigger"] == "consecutive_negative" and t["n"] == 7


def test_monitor_sigma_and_absolute_triggers(spark):
    from cortex_spark.prompt_graph import RollbackConfig, first_trigger, monitor_observations

    base = (0.15, 0.05, 0.7, 0.1)
    # mean correction 0.5 → (0.5-0.15)/0.05 = 7σ > 3 at n=5
    rows = [(0.5, 0.7, 0.9)] * 6
    t = first_trigger(monitor_observations(_obs_df(spark, rows), base))
    assert t["trigger"] == "correction_rate_sigma" and t["n"] == 5
    # sentiment collapse: (0.7-0.2)/0.1 = 5σ > 2
    rows = [(0.15, 0.2, 0.9)] * 6
    t = first_trigger(monitor_observations(_obs_df(spark, rows), base))
    assert t["trigger"] == "sentiment_sigma"
    # absolute increase fires only when σ thresholds are disabled-high
    cfg = RollbackConfig(correction_rate_rollback=1e9, sentiment_rollback=1e9)
    rows = [(0.45, 0.7, 0.9)] * 6  # +0.30 > 0.25 abs, σ check off
    t = first_trigger(monitor_observations(_obs_df(spark, rows), base, cfg))
    assert t["trigger"] == "absolute_correction_increase"
    # no trigger before min_samples; stable at the window end
    rows = [(0.5, 0.2, 0.1)] * 3
    assert first_trigger(monitor_observations(_obs_df(spark, rows), base)) is None
    rows = [(0.15, 0.7, 0.9)] * 25
    mon = monitor_observations(_obs_df(spark, rows), base)
    assert mon.filter("n >= 20").select("status").distinct().collect()[0]["status"] == "stable"
    assert first_trigger(mon) is None


def test_execute_rollback_graph_artifacts(spark, prompt_graph):
    from cortex_spark.prompt_graph import execute_rollback

    nodes, edges = prompt_graph
    n2, e2, res = execute_rollback(
        nodes, edges, "coder", "main", "correction_rate_sigma", now=datetime(2026, 2, 1)
    )
    assert res["from_version"] == 3 and res["to_version"] == 2
    assert res["cooldown_hours"] == 1 and not res["is_quarantined"]
    # event node + rolled_back / rolled_back_to edges
    ev = n2.filter(F.col("node_id") == res["rollback_node_id"]).first()
    assert ev["kind"] == "event" and "rollback" in ev["tags"]
    rels = {(r["relation"], r["dst"]) for r in e2.filter(F.col("src") == res["rollback_node_id"]).collect()}
    assert rels == {("rolled_back", "p3"), ("rolled_back_to", "p2")}
    # rolled-back version tagged; agent `uses` edge depressed to 0.1
    assert "auto-rolled-back" in n2.filter(F.col("node_id") == "p3").first()["tags"]
    uses_w = e2.filter((F.col("relation") == "uses") & (F.col("dst") == "p3")).first()["weight"]
    assert abs(uses_w - 0.1) < 1e-6
    # cooldown doubles, capped at 168 h; quarantine at the 3rd rollback
    _, _, r2 = execute_rollback(nodes, edges, "coder", "main", "x", datetime(2026, 2, 1), prior_rollbacks=1)
    assert r2["cooldown_hours"] == 2
    _, _, r3 = execute_rollback(nodes, edges, "coder", "main", "x", datetime(2026, 2, 1), prior_rollbacks=2)
    assert r3["cooldown_hours"] == 4 and r3["is_quarantined"]
    _, _, r9 = execute_rollback(nodes, edges, "coder", "main", "x", datetime(2026, 2, 1), prior_rollbacks=9)
    assert r9["cooldown_hours"] == 128
    _, _, r12 = execute_rollback(nodes, edges, "coder", "main", "x", datetime(2026, 2, 1), prior_rollbacks=12)
    assert r12["cooldown_hours"] == 128  # 1 << min(count-1, 7), capped 168


def test_rollback_requires_previous_version(spark, nodes_df_factory, edges_df_factory):
    from cortex_spark.prompt_graph import execute_rollback

    nodes = nodes_df_factory([_prompt("only", "solo", 1)])
    edges = edges_df_factory([])
    with pytest.raises(ValueError, match="no previous version"):
        execute_rollback(nodes, edges, "solo", "main", "x", datetime(2026, 2, 1))


def test_create_prompt_version_branch_lifecycle(spark, nodes_df_factory, edges_df_factory):
    from cortex_spark.prompt_graph import (
        create_branch, create_prompt, create_version, heads, list_versions, resolve_prompt,
    )

    nodes = nodes_df_factory([])
    edges = edges_df_factory([])
    t = datetime(2026, 1, 1)
    nodes, edges, v1 = create_prompt(nodes, edges, "writer", {"intro": "v1"}, "kai", t)
    with pytest.raises(ValueError, match="already exists"):
        create_prompt(nodes, edges, "writer", {}, "kai", t)
    nodes, edges, v2 = create_version(nodes, edges, "writer", {"intro": "v2"}, "kai", datetime(2026, 1, 2))
    nodes, edges, d1 = create_branch(nodes, edges, "writer", "main", "dev", "kai", datetime(2026, 1, 3))

    h = {(r["slug"], r["branch"]): r["version"] for r in heads(nodes, edges).collect()}
    assert h[("writer", "main")] == 2 and h[("writer", "dev")] == 1
    hist = list_versions(nodes, edges, "writer", "main").collect()
    assert [(r["version"], r["is_head"]) for r in hist] == [(1, False), (2, True)]
    # branch inherits the base content; supersedes edge is Manual provenance
    assert resolve_prompt(nodes, edges, "writer", "dev")["content"] == {"intro": "v2"}
    sup = edges.filter("relation = 'supersedes'").first()
    assert sup["src"] == v2 and sup["provenance"]["ptype"] == "manual"
    assert edges.filter("relation = 'branched_from'").first()["src"] == d1
    with pytest.raises(ValueError, match="not found"):
        create_version(nodes, edges, "ghost", {}, "kai", t)
    with pytest.raises(ValueError, match="Version 9"):
        create_branch(nodes, edges, "writer", "main", "x", "kai", t, base_version=9)
