"""Kind/relation vocabularies + syntactic validation (kinds.rs,
relations.rs, types.rs:76-95/186-205).

Reference rules: NodeKind = non-empty lowercase alphanumeric + hyphens
ONLY; Relation = non-empty lowercase alphanumeric + underscores ONLY.
([kinds]/[relations] in cortex.toml may widen the *allowed list*; when an
explicit allowed list is supplied, membership in it is the whole check —
the reference's own cortex.example.toml lists 'relates-to', which the
types.rs character rule would reject, so explicit config wins. The
character rules apply only when no allowed list is configured.)

validate_vocab applies the quarantine pattern: syntactically invalid
values (or values outside an explicit allowed list) split into a rejected
frame with a reason instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kinds.rs defaults::all()
DEFAULT_KINDS = [
    "agent", "decision", "fact", "event", "goal",
    "preference", "pattern", "observation", "prompt",
]
# relations.rs defaults
DEFAULT_RELATIONS = [
    "informed_by", "led_to", "applies_to", "contradicts", "supersedes",
    "depends_on", "related_to", "instance_of", "uses",
]

_KIND_RE = "^[a-z0-9-]+$"
_RELATION_RE = "^[a-z0-9_]+$"


def kind_valid_col(kind) -> F.Column:
    k = F.col(kind) if isinstance(kind, str) else kind
    return k.isNotNull() & (k != "") & k.rlike(_KIND_RE)


def relation_valid_col(rel) -> F.Column:
    r = F.col(rel) if isinstance(rel, str) else rel
    return r.isNotNull() & (r != "") & r.rlike(_RELATION_RE)


def _split(df: DataFrame, ok, reason: str) -> tuple[DataFrame, DataFrame]:
    good = df.filter(ok)
    bad = df.filter(~ok).withColumn("vocab_reason", F.lit(reason))
    return good, bad


def validate_vocab(
    nodes: DataFrame,
    edges: DataFrame,
    allowed_kinds: list[str] | None = None,
    allowed_relations: list[str] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Returns (nodes_ok, nodes_rejected, edges_ok, edges_rejected)."""
    # Explicit allowed-list membership overrides the syntactic rule: the
    # reference's own cortex.example.toml lists 'relates-to' under
    # [relations] even though types.rs would reject the hyphen, so a
    # deployment's explicit vocabulary must win over the character rule
    # (otherwise every edge using that relation is silently quarantined).
    if allowed_kinds is not None:
        kind_ok = F.col("kind").isin(allowed_kinds)
    else:
        kind_ok = kind_valid_col("kind")
    if allowed_relations is not None:
        rel_ok = F.col("relation").isin(allowed_relations)
    else:
        rel_ok = relation_valid_col("relation")
    n_ok, n_bad = _split(nodes, kind_ok, "invalid or disallowed kind")
    e_ok, e_bad = _split(edges, rel_ok, "invalid or disallowed relation")
    return n_ok, n_bad, e_ok, e_bad
