"""Query-DSL parse/compile matrix, mirroring the reference test list
(query/mod.rs:859-1222): grammar, durations, compile restrictions, errors."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from cortex_spark.query_dsl import (
    CompileError,
    NodeFilter,
    ParseError,
    apply_node_filter,
    compile_column,
    compile_filter,
    parse,
    query,
)
from tests.conftest import make_node

NOW = datetime(2026, 3, 1, tzinfo=timezone.utc)


def nf(q: str) -> NodeFilter:
    return compile_filter(parse(q, now=NOW))


def test_kind_list():
    f = nf("kind:decision,fact")
    assert f.kinds == ["decision", "fact"]


def test_or_same_field_merges():
    assert nf("kind:a OR kind:b").kinds == ["a", "b"]
    assert nf("(kind:a OR kind:b) OR kind:c").kinds == ["a", "b", "c"]
    assert nf("tags:x OR tags:y").tags == ["x", "y"]


def test_or_cross_field_rejected():
    with pytest.raises(CompileError):
        nf("kind:a OR agent:kai")


def test_not_only_deleted():
    f = nf("NOT deleted:true")
    assert f.deleted_only is False
    with pytest.raises(CompileError):
        nf("NOT kind:a")


def test_importance_ops():
    assert nf("importance>0.7").min_importance == pytest.approx(0.7)
    assert nf("importance>=0.7").min_importance == pytest.approx(0.7)
    assert nf("importance=0.7").min_importance == pytest.approx(0.7)
    with pytest.raises(CompileError):
        nf("importance<0.7")
    with pytest.raises(CompileError):
        nf("importance<=0.7")


def test_duration_literals():
    f = nf("created_after:7d")
    assert f.created_after == NOW - timedelta(days=7)
    assert nf("created_after:24h").created_after == NOW - timedelta(hours=24)
    assert nf("created_after:30m").created_after == NOW - timedelta(minutes=30)


def test_iso_date():
    f = nf("created_before:2026-01-15T00:00:00Z")
    assert f.created_before == datetime(2026, 1, 15, tzinfo=timezone.utc)


def test_limit_and_composite():
    f = nf("kind:fact AND importance>0.5 AND limit:5")
    assert f.kinds == ["fact"] and f.min_importance == pytest.approx(0.5) and f.limit == 5


def test_parse_errors():
    with pytest.raises(ParseError):
        parse("")
    with pytest.raises(ParseError):
        parse("unknownfield:x")
    with pytest.raises(ParseError):
        parse("kind:")
    with pytest.raises(ParseError):
        parse("kind:a AND")
    with pytest.raises(ParseError):
        parse("(kind:a")
    with pytest.raises(ParseError):
        parse("deleted:maybe")
    with pytest.raises(ParseError):
        parse("created_after:notaduration")
    with pytest.raises(ParseError):
        parse("kind:a ??")


def test_spark_native_mode_more_expressive(spark, nodes_df_factory):
    nodes = nodes_df_factory(
        [
            make_node("n1", kind="fact", importance=0.9),
            make_node("n2", kind="decision", source_agent="kai", importance=0.2),
            make_node("n3", kind="goal", importance=0.2),
            make_node("n4", kind="fact", deleted=True),
        ]
    )
    # cross-field OR works in Column mode (rejected by NodeFilter mode)
    got = {r["node_id"] for r in query(nodes, "kind:decision OR importance>0.5", now=NOW).collect()}
    assert got == {"n1", "n2"}
    # importance< works natively too
    got2 = {r["node_id"] for r in query(nodes, "importance<0.5", now=NOW).collect()}
    assert got2 == {"n2", "n3"}


def test_apply_node_filter_ordering_and_limit(spark, nodes_df_factory):
    nodes = nodes_df_factory(
        [
            make_node("n1", created_at="2026-01-01 00:00:00"),
            make_node("n2", created_at="2026-01-03 00:00:00"),
            make_node("n3", created_at="2026-01-02 00:00:00"),
            make_node("gone", created_at="2026-01-04 00:00:00", deleted=True),
        ]
    )
    f = NodeFilter(limit=2)
    got = [r["node_id"] for r in apply_node_filter(nodes, f).collect()]
    assert got == ["n2", "n3"]  # created_at DESC, deleted excluded
    f2 = NodeFilter(limit=2, offset=1)
    assert [r["node_id"] for r in apply_node_filter(nodes, f2).collect()] == ["n3", "n1"]
