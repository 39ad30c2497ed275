"""Scalar kernels: cosine/jaccard conventions, decay & scoring formulas to
1e-6 (mirrors reference unit tests in rules.rs, decay.rs:160-483,
scoring.rs:116-276)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cortex_spark.embed import encode_py
from cortex_spark.functions.scoring import decay_weight_col, score_decay_col
from cortex_spark.functions.similarity import cosine_col, jaccard_words_col


def _one(spark, df, col):
    return df.select(col.alias("x")).first()["x"]


def test_cosine_matches_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = _one(spark, df, cosine_col(F.col("a"), F.col("b")))
    exp = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(got - exp) < 1e-9


def test_cosine_zero_norm_is_zero(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    assert _one(spark, df, cosine_col(F.col("a"), F.col("b"))) == 0.0


def test_jaccard_reference_conventions(spark):
    # rules.rs:271-289: both empty → 1.0, one empty → 0.0
    rows = [("", "", 1.0), ("a b", "", 0.0), ("a b c", "b c d", 2 / 4), ("Same words", "same WORDS", 1.0)]
    df = spark.createDataFrame([(a, b) for a, b, _ in rows], "a string, b string")
    got = [r["j"] for r in df.select(jaccard_words_col(F.col("a"), F.col("b")).alias("j")).collect()]
    for (_, _, exp), g in zip(rows, got):
        assert abs(g - exp) < 1e-9


def test_embed_deterministic_and_normalized():
    v1 = encode_py("hello world", dim=64, seed=42)
    v2 = encode_py("hello world", dim=64, seed=42)
    assert v1 == v2
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-5
    # different seed → different vector
    assert encode_py("hello world", dim=64, seed=43) != v1
    # identical token multiset → identical vector regardless of case
    assert encode_py("A b", dim=64) == encode_py("a B", dim=64)


def test_decay_formula_spot_values(spark):
    # decay.rs:72-99: w' = w * exp(-rate*(1-maxImp*shield)*days)
    df = spark.createDataFrame(
        [(0.8, "2026-01-01 00:00:00", "2026-01-11 00:00:00", 0.5, 0.9)],
        "w double, upd string, now string, ia double, ib double",
    )
    got = _one(
        spark,
        df,
        decay_weight_col(
            F.col("w"), F.to_timestamp("upd"), F.to_timestamp("now"), F.col("ia"), F.col("ib")
        ),
    )
    eff = 0.01 * (1 - 0.9 * 0.8)
    exp = 0.8 * math.exp(-eff * 10.0)
    assert abs(got - exp) < 1e-9


def test_decay_no_time_no_change(spark):
    df = spark.createDataFrame(
        [(0.8, "2026-01-11 00:00:00", "2026-01-01 00:00:00", 0.0, 0.0)],
        "w double, upd string, now string, ia double, ib double",
    )
    got = _one(
        spark, df,
        decay_weight_col(F.col("w"), F.to_timestamp("upd"), F.to_timestamp("now"), F.col("ia"), F.col("ib")),
    )
    assert got == 0.8


def test_score_decay_spot_values(spark):
    # scoring.rs:84-114: final = raw(1-rb) + raw*temporal*echo*rb
    # kind=event rate 0.05; 10 days idle; access_count=4 → echo=1.2
    df = spark.createDataFrame(
        [(0.9, "event", "2026-01-01 00:00:00", 4, "2026-01-11 00:00:00")],
        "raw double, kind string, la string, ac bigint, now string",
    )
    got = _one(
        spark, df,
        score_decay_col(F.col("raw"), F.col("kind"), F.to_timestamp("la"), F.col("ac"), F.to_timestamp("now"), 0.15),
    )
    temporal = max(math.exp(-0.05 * 10), 0.1)
    echo = min(1 + 4 * 0.05, 2.0)
    exp = 0.9 * 0.85 + 0.9 * temporal * echo * 0.15
    assert abs(got - exp) < 1e-9


def test_score_decay_min_factor_floor(spark):
    # very old node: temporal floors at 0.1, days capped at 365
    df = spark.createDataFrame(
        [(1.0, "event", "2020-01-01 00:00:00", 0, "2026-01-01 00:00:00")],
        "raw double, kind string, la string, ac bigint, now string",
    )
    got = _one(
        spark, df,
        score_decay_col(F.col("raw"), F.col("kind"), F.to_timestamp("la"), F.col("ac"), F.to_timestamp("now"), 0.15),
    )
    exp = 1.0 * 0.85 + 1.0 * 0.1 * 1.0 * 0.15
    assert abs(got - exp) < 1e-9


def test_score_decay_zero_bias_identity(spark):
    df = spark.createDataFrame(
        [(0.7, "event", "2020-01-01 00:00:00", 9, "2026-01-01 00:00:00")],
        "raw double, kind string, la string, ac bigint, now string",
    )
    got = _one(
        spark, df,
        score_decay_col(F.col("raw"), F.col("kind"), F.to_timestamp("la"), F.col("ac"), F.to_timestamp("now"), 0.0),
    )
    assert got == 0.7


def test_lang_id_and_quality(spark):
    from cortex_spark.functions.text import lang_id_col, quality_score_col, token_count_col

    df = spark.createDataFrame(
        [
            ("the cat and the dog in a house",),
            ("der hund und die katze ist nicht ein",),
            ("le chat et les chiens est pour que",),
            ("xyzzy qwerty",),
        ],
        "t string",
    )
    got = [r["l"] for r in df.select(lang_id_col(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "und"]
    tc = [r["n"] for r in df.select(token_count_col(F.col("t")).alias("n")).collect()]
    assert tc[0] == 8
    q = df.select(quality_score_col(F.col("t")).alias("q")).first()["q"]
    assert 0.0 <= q <= 1.0


def test_vocab_validation_split(spark, nodes_df_factory, edges_df_factory):
    """types.rs kind/relation rules + allowed-list quarantine split."""
    from tests.conftest import make_edge, make_node

    from cortex_spark.vocab import DEFAULT_KINDS, DEFAULT_RELATIONS, validate_vocab

    nodes = nodes_df_factory(
        [make_node("a", kind="fact"), make_node("b", kind="Bad"), make_node("c", kind="my-kind")]
    )
    edges = edges_df_factory(
        [make_edge("a", "b", relation="related_to"), make_edge("a", "c", relation="x-y")]
    )
    n_ok, n_bad, e_ok, e_bad = validate_vocab(nodes, edges)
    assert {r["node_id"] for r in n_ok.collect()} == {"a", "c"}
    bad = n_bad.first()
    assert bad["node_id"] == "b" and "kind" in bad["vocab_reason"]
    assert {r["relation"] for r in e_ok.collect()} == {"related_to"}
    assert e_bad.count() == 1

    # allowed-list narrows further (my-kind is syntactically fine but unlisted)
    n_ok2, n_bad2, _, _ = validate_vocab(nodes, edges, allowed_kinds=DEFAULT_KINDS)
    assert {r["node_id"] for r in n_ok2.collect()} == {"a"}
    assert n_bad2.count() == 2
    assert "related_to" in DEFAULT_RELATIONS and "fact" in DEFAULT_KINDS

    # explicit allowed-list membership overrides the syntactic rule:
    # cortex.example.toml ships 'relates-to' under [relations], so a
    # config-listed hyphenated relation must validate, not quarantine
    _, _, e_ok3, e_bad3 = validate_vocab(
        nodes, edges, allowed_relations=["related_to", "x-y"]
    )
    assert {r["relation"] for r in e_ok3.collect()} == {"related_to", "x-y"}
    assert e_bad3.count() == 0
