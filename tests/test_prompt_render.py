"""Prompt-selection math (D6), briefing renderer, reinforce (D2),
subgraph merge (U1)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cortex_spark.functions.text import body_preview, pluralize_section, truncate_annotated
from tests.conftest import make_edge, make_node


def test_prompt_scoring_formulas(spark):
    from cortex_spark.prompt import (
        context_fit_col,
        observation_score_col,
        score_variant_col,
        update_edge_weight_col,
    )

    df = spark.createDataFrame(
        [
            ({"sentiment": 1.0, "energy": -0.5}, {"sentiment": 0.8, "energy": 0.4}),
            ({}, {"sentiment": 0.8}),
            (None, {"sentiment": 0.8}),
        ],
        "w map<string,double>, s map<string,double>",
    )
    fits = [r["f"] for r in df.select(context_fit_col(F.col("w"), F.col("s")).alias("f")).collect()]
    # (1.0*0.8 + (-0.5)*0.4) / (1.0+0.5) = 0.6/1.5 = 0.4
    assert fits[0] == pytest.approx(0.4, abs=1e-6)
    assert fits[1] is None and fits[2] is None  # empty/null weights → None

    sv = spark.createDataFrame([(0.7,)], "ew double").select(
        score_variant_col(F.col("ew"), F.lit(None).cast("map<string,double>"), F.lit(None).cast("map<string,double>")).alias("s")
    ).first()["s"]
    assert sv == pytest.approx(0.7)  # falls back to edge_weight

    obs = spark.createDataFrame([(0.8, 2, "success"), (0.8, 20, "failure")], "sent double, corr int, out string")
    got = [r["o"] for r in obs.select(observation_score_col(F.col("sent"), F.col("corr"), F.col("out")).alias("o")).collect()]
    assert got[0] == pytest.approx(0.5 * 0.8 + 0.3 * 0.8 + 0.2 * 1.0, abs=1e-6)
    assert got[1] == pytest.approx(0.5 * 0.8 + 0.0 + 0.0, abs=1e-6)  # penalty saturates

    upd = spark.createDataFrame([(0.5, 1.0)], "w double, o double").select(
        update_edge_weight_col(F.col("w"), F.col("o")).alias("u")
    ).first()["u"]
    assert upd == pytest.approx(0.55, abs=1e-6)  # EMA α=0.1


def test_select_variant_deterministic(spark):
    from cortex_spark.prompt import select_variant

    rows = [("p1", f"v{i}", 0.4 + i * 0.1, {"sentiment": 1.0}) for i in range(3)]
    df = spark.createDataFrame(rows, "prompt_id string, variant_id string, edge_weight double, context_weights map<string,double>")
    a = select_variant(df, {"sentiment": 0.9}, epsilon=0.0).first()
    assert a["variant_id"] == "v2" and not a["explore"]  # greedy = best blend
    b1 = select_variant(df, {"sentiment": 0.9}, epsilon=1.0, seed=7).first()
    b2 = select_variant(df, {"sentiment": 0.9}, epsilon=1.0, seed=7).first()
    assert b1["explore"] and b1["variant_id"] == b2["variant_id"]  # deterministic explore


def test_truncate_and_pluralize():
    assert truncate_annotated("x" * 50, 100) == "x" * 50
    t = truncate_annotated("x" * 200, 100)
    # reference quirk: SUFFIX_LEN=14 but the suffix is 12 chars → len = max-2
    # (renderer.rs:33-36); parity kept
    assert len(t) == 98 and t.endswith(" [truncated]")
    assert truncate_annotated("x" * 200, 10) == "x" * 10  # no room for suffix
    assert body_preview("abcdef", 5) == "ab..."
    assert pluralize_section("fact") == "Facts"
    assert pluralize_section("observation") == "Observations"
    assert pluralize_section("process") == "Processes"
    assert pluralize_section("category") == "Categories"


def test_render_briefing(spark, nodes_df_factory, edges_df_factory):
    from cortex_spark.briefing import generate_briefing, render_briefing_markdown

    nodes = nodes_df_factory(
        [
            make_node("g1", kind="goal", title="Ship the thing", importance=0.9, source_agent="kai"),
            make_node("f1", kind="custom-kind", title="A novel thing", importance=0.8, source_agent="kai"),
        ]
    )
    edges = edges_df_factory([])
    rep = generate_briefing(nodes, edges, "kai", now=datetime(2026, 2, 1))
    md = render_briefing_markdown(rep)
    assert md.startswith("# Briefing")
    assert "## Goals" in md and "Ship the thing" in md
    # the custom-kind node is claimed by active_context before the
    # auto-discovered section can (ordered seen-set exclusion, U2)
    assert "A novel thing" in md
    # auto-discovered pluralisation kicks in when a non-agent node exists
    nodes2 = nodes_df_factory(
        [make_node("x1", kind="custom-kind", title="Other agent novel", importance=0.8, source_agent="zoe")]
    )
    rep2 = generate_briefing(nodes2, edges, "kai", now=datetime(2026, 2, 1))
    md2 = render_briefing_markdown(rep2)
    assert "## Custom Kinds" in md2


def test_reinforce(spark, nodes_df_factory, edges_df_factory):
    from cortex_spark.decay import reinforce

    nodes = nodes_df_factory([make_node("a", access_count=3), make_node("b")])
    edges = edges_df_factory([make_edge("a", "b", updated_at="2025-01-01 00:00:00"), make_edge("b", "x", updated_at="2025-01-01 00:00:00")])
    e2, n2 = reinforce(edges, nodes, ["a"], now=datetime(2026, 2, 1))
    upd = {(r["src"], r["dst"]): str(r["updated_at"]) for r in e2.collect()}
    assert upd[("a", "b")].startswith("2026-02-01")  # touched
    assert upd[("b", "x")].startswith("2025-01-01")  # untouched
    a = n2.filter("node_id='a'").first()
    assert a["access_count"] == 4 and str(a["last_accessed_at"]).startswith("2026-02-01")


def test_merge_subgraphs(spark):
    from cortex_spark.graph.traverse import merge_subgraphs

    s1 = spark.createDataFrame([("a", 0), ("b", 2)], "node_id string, depth int")
    s2 = spark.createDataFrame([("b", 1), ("c", 3)], "node_id string, depth int")
    got = {r["node_id"]: r["depth"] for r in merge_subgraphs(s1, s2).collect()}
    assert got == {"a": 0, "b": 1, "c": 3}
