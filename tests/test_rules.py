"""Link-rule parity: the Spark rule pass vs a pure-Python oracle that
transliterates the reference semantics (rules.rs:130-380,
auto_linker.rs:401-443). The oracle is per-pair loops — the spec; the Spark
engine must match it exactly on controlled pairs."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cortex_spark.linker.rules import LinkerConfig, apply_link_rules

PAIR_SCHEMA = (
    "a_id string, b_id string, score double, "
    "a_kind string, a_title string, a_body string, a_tags array<string>, "
    "a_source_agent string, a_source_session string, a_created_at timestamp, "
    "b_kind string, b_title string, b_body string, b_tags array<string>, "
    "b_source_agent string, b_source_session string, b_created_at timestamp"
)


def ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def mkpair(
    a_id="a", b_id="b", score=0.5,
    a_kind="fact", b_kind="fact", a_title="t a", b_title="t b",
    a_body="", b_body="", a_tags=(), b_tags=(),
    a_agent="x", b_agent="y", a_session=None, b_session=None,
    a_created="2026-01-01 10:00:00", b_created="2026-01-01 10:00:00",
):
    return (
        a_id, b_id, float(score),
        a_kind, a_title, a_body, list(a_tags), a_agent, a_session, ts(a_created),
        b_kind, b_title, b_body, list(b_tags), b_agent, b_session, ts(b_created),
    )


NEGATION = ["not", "never", "no longer", "stopped", "removed", "deprecated", "replaced", "obsolete"]


def oracle(pair) -> list[tuple[str, str, str, float]]:
    """(src, dst, relation, weight) list per reference rule order."""
    (a_id, b_id, score, a_kind, a_title, a_body, a_tags, a_agent, a_sess, a_created,
     b_kind, b_title, b_body, b_tags, b_agent, b_sess, b_created) = pair
    out = []
    if score >= 0.75:
        out.append((a_id, b_id, "related_to", score))
    if a_agent == b_agent:
        out.append((a_id, b_id, "related_to", 0.3))
    if abs((a_created - b_created).total_seconds()) <= 1800:
        out.append((a_id, b_id, "related_to", 0.4))
    shared = len(set(a_tags) & set(b_tags))
    if shared >= 2:
        out.append((a_id, b_id, "related_to", min(0.5 * (1 + (shared - 2) * 0.1), 1.0)))
    if a_kind == "decision" and b_kind == "event" and a_sess is not None and a_sess == b_sess and a_created < b_created:
        out.append((a_id, b_id, "led_to", 0.6))
    if a_kind == "observation" and b_kind == "pattern" and score >= 0.7:
        out.append((a_id, b_id, "instance_of", 0.7))
    if a_kind == "fact" and b_kind == "fact" and a_created > b_created:
        wa = set(a_title.lower().split())
        wb = set(b_title.lower().split())
        if not wa and not wb:
            j = 1.0
        elif not wa or not wb:
            j = 0.0
        else:
            j = len(wa & wb) / len(wa | wb)
        if j >= 0.9:
            out.append((a_id, b_id, "supersedes", 0.9))
    at = f"{a_title} {a_body}".lower()
    bt = f"{b_title} {b_body}".lower()
    a_neg = any(w in at for w in NEGATION)
    b_neg = any(w in bt for w in NEGATION)
    if score >= 0.80 and a_neg != b_neg:
        out.append((a_id, b_id, "contradicts", score))
    # first-rule-wins per (src,dst,relation)
    seen = set()
    dedup = []
    for e in out:
        key = (e[0], e[1], e[2])
        if key not in seen:
            seen.add(key)
            dedup.append(e)
    return dedup


PAIRS = [
    mkpair("a1", "b1", score=0.76),  # similarity fires
    mkpair("a2", "b2", score=0.74),  # below threshold
    mkpair("a3", "b3", a_agent="s", b_agent="s"),  # same agent
    mkpair("a4", "b4", a_created="2026-01-01 10:00:00", b_created="2026-01-01 10:29:59"),  # temporal in
    mkpair("a5", "b5", a_created="2026-01-01 10:00:00", b_created="2026-01-01 10:31:00"),  # temporal out
    mkpair("a6", "b6", a_tags=("t1", "t2", "t3"), b_tags=("t2", "t3", "t4")),  # 2 shared
    mkpair("a7", "b7", a_tags=("t1", "t2", "t3", "t4"), b_tags=("t1", "t2", "t3", "t4", "t5")),  # 4 shared → w=0.6
    mkpair("a8", "b8", a_kind="decision", b_kind="event", a_session="s1", b_session="s1",
           a_created="2026-01-01 09:00:00", b_created="2026-01-01 11:00:00"),  # led_to
    mkpair("a9", "b9", a_kind="decision", b_kind="event", a_session=None, b_session=None,
           a_created="2026-01-01 09:00:00", b_created="2026-01-01 11:00:00"),  # null session → no led_to
    mkpair("aa", "ba", a_kind="observation", b_kind="pattern", score=0.71),  # instance_of
    mkpair("ab", "bb", a_kind="observation", b_kind="pattern", score=0.69),  # below
    mkpair("ac", "bc", a_kind="fact", b_kind="fact", a_title="alpha beta gamma", b_title="alpha beta gamma",
           a_created="2026-01-02 10:00:00", b_created="2026-01-01 10:00:00"),  # supersedes
    mkpair("ad", "bd", a_kind="fact", b_kind="fact", a_title="alpha beta gamma", b_title="alpha beta delta",
           a_created="2026-01-02 10:00:00", b_created="2026-01-01 10:00:00"),  # jaccard 0.5 → no
    mkpair("ae", "be", score=0.85, a_body="x is deprecated now", b_body="x is great"),  # contradiction
    mkpair("af", "bf", score=0.85, a_body="x is deprecated", b_body="y was removed"),  # both neg → no
    mkpair("ag", "bg", score=0.79, a_body="x is deprecated now", b_body="x is great"),  # below 0.80
    # similarity + same_agent both → only similarity's related_to survives
    mkpair("ah", "bh", score=0.9, a_agent="s", b_agent="s"),
]


def test_rules_match_oracle(spark):
    df = spark.createDataFrame(PAIRS, PAIR_SCHEMA)
    got = apply_link_rules(df, LinkerConfig())
    got_set = {
        (r["src"], r["dst"], r["relation"], round(r["weight"], 6))
        for r in got.select("src", "dst", "relation", "weight").collect()
    }
    # apply first-rule-wins the way linker.pipeline does (window on priority)
    from pyspark.sql import Window

    w = Window.partitionBy("src", "dst", "relation").orderBy("priority")
    got_first = apply_link_rules(df, LinkerConfig()).withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    got_set = {
        (r["src"], r["dst"], r["relation"], round(r["weight"], 6))
        for r in got_first.select("src", "dst", "relation", "weight").collect()
    }
    exp_set = set()
    for p in PAIRS:
        for e in oracle(p):
            exp_set.add((e[0], e[1], e[2], round(e[3], 6)))
    assert got_set == exp_set


def test_temporal_rule_fires_for_all_pairs_in_window(spark):
    # reference nuance: temporal proximity needs NO similarity gate beyond
    # being an ANN candidate — a pair 0 seconds apart always proposes w=0.4
    df = spark.createDataFrame([mkpair("x", "y", score=0.0)], PAIR_SCHEMA)
    got = apply_link_rules(df, LinkerConfig()).select("relation", "weight").collect()
    assert ("related_to", 0.4) in {(r["relation"], round(r["weight"], 2)) for r in got}


def test_threshold_invariant_validated():
    with pytest.raises(ValueError):
        LinkerConfig(auto_link_threshold=0.9, contradiction_threshold=0.8)


def test_config_rules_replace_legacy(spark):
    from cortex_spark.linker.rules import ConfigRule

    cfg = LinkerConfig(
        config_rules=[ConfigRule(name="r1", relation="uses", condition="min_similarity", threshold=0.5, weight=0.8)]
    )
    df = spark.createDataFrame([mkpair("x", "y", score=0.6, a_agent="s", b_agent="s")], PAIR_SCHEMA)
    got = apply_link_rules(df, cfg).select("relation", "detail").collect()
    rels = {(r["relation"], r["detail"]) for r in got}
    # legacy same_agent suppressed when config rules exist (config.rs:121-125)
    assert ("uses", "r1") in rels
    assert not any(d == "same_agent" for _, d in rels)


def test_bidirectional_config_rule(spark):
    from cortex_spark.linker.rules import ConfigRule

    cfg = LinkerConfig(
        config_rules=[ConfigRule(name="r2", relation="uses", condition="always", bidirectional=True)],
    )
    df = spark.createDataFrame([mkpair("x", "y", score=0.1)], PAIR_SCHEMA)
    got = {(r["src"], r["dst"]) for r in apply_link_rules(df, cfg).filter("relation='uses'").collect()}
    assert got == {("x", "y"), ("y", "x")}
