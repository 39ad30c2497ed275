"""Prompt-selection scoring (SURVEY §2.9 D6, reference prompt/selection.rs).

The reference builds prompt versioning ON TOP of the same graph: variants
are nodes, selection weight lives on edges. The scoring math re-expressed
as column expressions (one scan over a variants frame):

- context_fit = clamp(Σ wᵢ·sᵢ / Σ|wᵢ|, 0, 1); None when no usable weights
  (selection.rs:125-146)
- score_variant = clamp(0.5·edge_weight + 0.5·fit, 0, 1), falls back to
  edge_weight when fit is None (selection.rs:157-166, BLEND=0.5)
- observation_score = clamp(0.5·sentiment + 0.3·(1 − min(corrections·0.1, 1))
  + 0.2·task_success, 0, 1) (selection.rs:175-184)
- update_edge_weight = clamp(w + 0.1·(obs − w), 0, 1) — EMA α=0.1
  (selection.rs:191-194)

context weights ride as map<string,double>; signals as map<string,double>.
Epsilon-greedy variant pick (selection.rs) is made deterministic: the
"explore" branch picks by xxhash64(seed, variant) instead of RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BLEND = 0.5
ALPHA = 0.1


def context_fit_col(weights: Column, signals: Column) -> Column:
    """NULL when weights are null/empty/all-zero (selection.rs:125-146)."""
    entries = F.map_entries(weights)
    dot = F.aggregate(
        entries,
        F.lit(0.0),
        lambda acc, e: acc + F.coalesce(signals.getItem(e["key"]), F.lit(0.0)) * e["value"],
    )
    abs_sum = F.aggregate(entries, F.lit(0.0), lambda acc, e: acc + F.abs(e["value"]))
    fit = F.least(F.greatest(dot / abs_sum, F.lit(0.0)), F.lit(1.0))
    return F.when(weights.isNull() | (F.size(entries) == 0) | (abs_sum < 1e-7), F.lit(None)).otherwise(fit)


def score_variant_col(edge_weight: Column, weights: Column, signals: Column) -> Column:
    fit = context_fit_col(weights, signals)
    clamped = F.least(
        F.greatest(F.lit(BLEND) * edge_weight + F.lit(1.0 - BLEND) * fit, F.lit(0.0)), F.lit(1.0)
    )
    # greatest()/least() skip NULLs, so gate on fit explicitly — a null fit
    # must fall back to edge_weight (selection.rs:162-165), not clamp to 0
    return F.when(fit.isNotNull(), clamped).otherwise(edge_weight)


def observation_score_col(sentiment: Column, correction_count: Column, task_outcome: Column) -> Column:
    task = (
        F.when(task_outcome == "success", 1.0).when(task_outcome == "partial", 0.5).otherwise(0.0)
    )
    penalty = F.least(correction_count.cast("double") * 0.1, F.lit(1.0))
    raw = F.lit(0.5) * sentiment + F.lit(0.3) * (F.lit(1.0) - penalty) + F.lit(0.2) * task
    return F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))


def update_edge_weight_col(old_weight: Column, obs_score: Column) -> Column:
    return F.least(
        F.greatest(old_weight + F.lit(ALPHA) * (obs_score - old_weight), F.lit(0.0)), F.lit(1.0)
    )


def select_variant(
    variants: DataFrame,
    signals: dict[str, float],
    epsilon: float = 0.1,
    seed: int = 0,
) -> DataFrame:
    """Per prompt group: greedy best-scored variant, or (deterministically
    seeded) exploration with probability epsilon. variants columns:
    prompt_id, variant_id, edge_weight, context_weights map<string,double>."""
    sig = F.create_map(*[x for k, v in signals.items() for x in (F.lit(k), F.lit(float(v)))])
    scored = variants.withColumn(
        "score", score_variant_col(F.col("edge_weight"), F.col("context_weights"), sig)
    )
    explore_roll = (F.abs(F.xxhash64(F.lit(seed), F.col("prompt_id"))) % 1000) / 1000.0
    w_greedy = Window.partitionBy("prompt_id").orderBy(F.desc("score"), F.asc("variant_id"))
    w_explore = Window.partitionBy("prompt_id").orderBy(
        F.abs(F.xxhash64(F.lit(seed), F.col("prompt_id"), F.col("variant_id")))
    )
    return (
        scored.withColumn("greedy_rn", F.row_number().over(w_greedy))
        .withColumn("explore_rn", F.row_number().over(w_explore))
        .withColumn("explore", explore_roll < epsilon)
        .filter(
            (F.col("explore") & (F.col("explore_rn") == 1))
            | (~F.col("explore") & (F.col("greedy_rn") == 1))
        )
        .select("prompt_id", "variant_id", "score", "explore")
    )
