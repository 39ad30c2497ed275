"""Decay / scoring formulas as pure column expressions.

- decay_weight_col: edge decay with importance shielding
  (reference linker/decay.rs:72-99; defaults linker/config.rs:190-201).
- score_decay_col: query-time temporal+echo score decay
  (reference vector/scoring.rs:84-114 with the default per-kind rates
  scoring.rs:56-76).
- hybrid_score_col: combined = w·vec + (1-w)·graph (vector/hybrid.rs:163-164).

All math is f64 column expressions — a decay sweep over 100 B edges is one
scan + two broadcast joins for endpoint importances, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DAILY_DECAY_RATE = 0.01
IMPORTANCE_SHIELD = 0.8
DELETE_THRESHOLD = 0.05
PRUNE_THRESHOLD = 0.1

KIND_RATES = {
    "event": 0.05,
    "observation": 0.04,
    "decision": 0.005,
    "pattern": 0.005,
    "fact": 0.01,
    "preference": 0.005,
}
DEFAULT_RATE = 0.02
MAX_AGE_DAYS = 365.0
MIN_FACTOR = 0.1
ECHO_WEIGHT = 0.05
ECHO_CAP = 2.0
RECENCY_WEIGHT = 0.15


def decay_weight_col(
    weight: Column,
    updated_at: Column,
    now: Column,
    from_importance: Column,
    to_importance: Column,
    daily_rate: float = DAILY_DECAY_RATE,
    shield: float = IMPORTANCE_SHIELD,
) -> Column:
    """New edge weight after exponential decay with importance shielding.

    days ≤ 0 → weight unchanged (decay.rs:76-78).
    """
    days = (now.cast("double") - updated_at.cast("double")) / 86400.0
    max_imp = F.greatest(F.coalesce(from_importance, F.lit(0.0)), F.coalesce(to_importance, F.lit(0.0)))
    eff_rate = F.lit(daily_rate) * (F.lit(1.0) - max_imp * F.lit(shield))
    decayed = weight * F.exp(-eff_rate * days)
    return F.when(days <= 0.0, weight).otherwise(decayed)


def kind_rate_col(kind: Column) -> Column:
    expr = None
    for k, r in KIND_RATES.items():
        expr = F.when(kind == k, F.lit(r)) if expr is None else expr.when(kind == k, F.lit(r))
    return expr.otherwise(F.lit(DEFAULT_RATE))


def score_decay_col(
    raw_score: Column,
    kind: Column,
    last_accessed_at: Column,
    access_count: Column,
    now: Column,
    recency_bias: float = RECENCY_WEIGHT,
) -> Column:
    """final = raw·(1-rb) + raw·temporal·echo·rb (scoring.rs:84-114)."""
    if recency_bias == 0.0:
        return raw_score
    days_idle = F.greatest(
        (now.cast("double") - last_accessed_at.cast("double")), F.lit(0.0)
    ) / F.lit(86400.0)
    eff_days = F.least(days_idle, F.lit(MAX_AGE_DAYS))
    temporal = F.greatest(F.exp(-kind_rate_col(kind) * eff_days), F.lit(MIN_FACTOR))
    echo = F.least(F.lit(1.0) + access_count.cast("double") * F.lit(ECHO_WEIGHT), F.lit(ECHO_CAP))
    rb = F.lit(float(recency_bias))
    return raw_score * (F.lit(1.0) - rb) + raw_score * temporal * echo * rb


def hybrid_score_col(vector_score: Column, graph_score: Column, vector_weight: float = 0.7) -> Column:
    w = F.lit(float(vector_weight))
    return w * vector_score + (F.lit(1.0) - w) * F.coalesce(graph_score, F.lit(0.0))
