"""Write gate (F6): the 4 checks vs reference semantics (gate/mod.rs)."""

from __future__ import annotations

import numpy as np

from cortex_spark.gate import FieldSchema, KindSchema, apply_gate
from tests.conftest import make_node


def _gate(spark, nodes_df_factory, rows, existing_rows=None, schemas=None):
    inc = nodes_df_factory(rows)
    ex = nodes_df_factory(existing_rows) if existing_rows else None
    passed, rejected = apply_gate(inc, ex, schemas)
    rej = {r["node_id"]: (r["gate_check"], r["gate_reason"]) for r in rejected.collect()}
    ok = {r["node_id"] for r in passed.collect()}
    return ok, rej


GOOD = dict(title="A perfectly good title", body="The system performs nominally in production today.")


def test_substance_checks(spark, nodes_df_factory):
    ok, rej = _gate(
        spark,
        nodes_df_factory,
        [
            make_node("good", **GOOD),
            make_node("short_title", title="tiny", body="x" * 40),
            make_node("short_body", title="A long enough title", body="too short"),
            make_node("same", title="Identical text here ok", body="Identical text here ok"),
            make_node("url", title="A long enough title", body="https://example.com/only-a-url"),
            make_node("oneword", title="A long enough title", body="  singleword          padddddddd".split()[0] + "                    "),
            make_node("stamp", title="A long enough title", body="1700000000123"),
            make_node("bad_decision", kind="decision", title="A long enough title", body="vague text with no action at all"),
            make_node("good_decision", kind="decision", title="A long enough title", body="We decided to adopt the new engine."),
        ],
    )
    assert "good" in ok and "good_decision" in ok
    for nid in ("short_title", "short_body", "same", "url", "stamp", "bad_decision"):
        assert rej[nid][0] == "substance", (nid, rej.get(nid))


def test_specificity_checks(spark, nodes_df_factory):
    ok, rej = _gate(
        spark,
        nodes_df_factory,
        [
            make_node("pronoun", title="the new cache layer", body="He said the cache is ready for production use."),
            make_node("resolved", title="Marcus reviewed caching", body="He said the cache is ready for production use."),
            make_node("temporal", title="Deploy done yesterday", body="The deployment finished without any error at all."),
            make_node("thin_imp", importance=0.95, **GOOD),
            make_node("needs_tags", importance=0.75, title="A perfectly good title", body="some body " * 12),
            make_node("tagged", importance=0.75, tags=["infra"], title="A perfectly good title", body="some body " * 12),
        ],
    )
    assert rej["pronoun"][0] == "specificity"
    assert "resolved" in ok
    assert rej["temporal"][0] == "specificity"
    assert rej["thin_imp"][0] == "specificity"  # 0.95 importance, body < 100
    assert rej["needs_tags"][0] == "specificity"
    assert "tagged" in ok


def test_schema_check(spark, nodes_df_factory):
    schemas = {
        "fact": KindSchema(
            required_fields=["confidence"],
            fields={"confidence": FieldSchema(field_type="number", min=0.0, max=1.0)},
        )
    }
    ok, rej = _gate(
        spark,
        nodes_df_factory,
        [
            make_node("missing", metadata={}, **GOOD),
            make_node("bad_range", metadata={"confidence": "1.5"}, **GOOD),
            make_node("valid", metadata={"confidence": "0.8"}, **GOOD),
            make_node("not_number", metadata={"confidence": "high"}, **GOOD),
        ],
        schemas=schemas,
    )
    assert rej["missing"][0] == "schema"
    assert rej["bad_range"][0] == "schema"
    assert rej["not_number"][0] == "schema"
    assert "valid" in ok


def test_conflict_check(spark, nodes_df_factory):
    rng = np.random.default_rng(3)
    v = rng.standard_normal(32)
    v = [float(x) for x in v / np.linalg.norm(v)]
    v_near = np.array(v) + 0.01 * rng.standard_normal(32)
    v_near = [float(x) for x in v_near / np.linalg.norm(np.array(v_near))]
    other = rng.standard_normal(32)
    other = [float(x) for x in other / np.linalg.norm(other)]

    ok, rej = _gate(
        spark,
        nodes_df_factory,
        [
            make_node("dup", embedding=v_near, **GOOD),
            make_node("fresh", embedding=other, **GOOD),
        ],
        existing_rows=[make_node("ex1", embedding=v, **GOOD)],
    )
    assert rej["dup"][0] == "conflict"
    assert "fresh" in ok
