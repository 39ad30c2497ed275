"""cortex.toml loader — reference config-file compatibility.

A reference deployment carries a `cortex.toml` (cortex.example.toml,
server/src/config.rs). This maps its sections onto this engine's configs
so an existing file drives the Spark pipeline unchanged:

- [auto_linker]   → LinkerConfig (similarity_threshold, max_edges_per_node)
- [embedding]     → embed_dim
- [retention]     → retention kwargs (0 = keep forever → None, per-kind
                    overrides, optional max_nodes cap + strategy)
- [write_gate]    → gate thresholds
- [schemas.*]     → per-kind KindSchema/FieldSchema for the gate
- [kinds]/[relations] → allowed vocabularies (validated: lowercase +
                    hyphens/underscores, config.rs naming rule)
- [security]      → encryption flag (key via CORTEX_SPARK_ENCRYPTION_KEY)
- [briefing]      → section list passthrough

Server-only sections (grpc/http addrs, NATS) are accepted and ignored —
the driver/batch contract replaces the RPC surface (SURVEY S6).
"""

from __future__ import annotations

import re
import tomllib
from dataclasses import dataclass, field

from cortex_spark.gate import FieldSchema, KindSchema
from cortex_spark.linker.rules import LinkerConfig

_NAME_RE = re.compile(r"^[a-z][a-z0-9_-]*$")


@dataclass
class RetentionSettings:
    default_ttl_days: int | None = None
    grace_days: int = 7
    ttl_days_by_kind: dict[str, int] = field(default_factory=dict)
    max_nodes: int | None = None
    strategy: str = "oldest_lowest_importance"


@dataclass
class CortexSparkConfig:
    linker: LinkerConfig = field(default_factory=LinkerConfig)
    embed_dim: int = 384
    retention: RetentionSettings = field(default_factory=RetentionSettings)
    gate_enabled: bool = True
    min_title_length: int = 10
    min_body_length: int = 20
    schemas: dict[str, KindSchema] = field(default_factory=dict)
    allowed_kinds: list[str] | None = None
    allowed_relations: list[str] | None = None
    encryption: bool = False
    briefing_sections: list[dict] = field(default_factory=list)


def _check_names(names: list[str], what: str) -> list[str]:
    for n in names:
        if not _NAME_RE.match(n):
            raise ValueError(f"invalid {what} name {n!r}: lowercase + hyphens/underscores only")
    return names


def load_config(path: str) -> CortexSparkConfig:
    with open(path, "rb") as fh:
        raw = tomllib.load(fh)

    cfg = CortexSparkConfig()

    al = raw.get("auto_linker", {})
    wg = raw.get("write_gate", {})
    linker_kwargs = {}
    if "similarity_threshold" in al:
        linker_kwargs["auto_link_threshold"] = float(al["similarity_threshold"])
    if "max_edges_per_node" in al:
        linker_kwargs["max_edges_per_node"] = int(al["max_edges_per_node"])
    if "conflict_threshold" in wg:
        linker_kwargs["contradiction_threshold"] = float(wg["conflict_threshold"])
    if "duplicate_threshold" in wg:
        linker_kwargs["dedup_threshold"] = float(wg["duplicate_threshold"])
    cfg.linker = LinkerConfig(**linker_kwargs)  # threshold invariant enforced there

    emb = raw.get("embedding", {})
    if "dimensions" in emb:
        cfg.embed_dim = int(emb["dimensions"])

    ret = raw.get("retention", {})
    ttl = int(ret.get("default_ttl_days", 0))
    by_kind = {k: int(v) for k, v in ret.get("by_kind", {}).items() if int(v) > 0}
    mn = ret.get("max_nodes", {})
    cfg.retention = RetentionSettings(
        default_ttl_days=ttl if ttl > 0 else None,  # 0 = keep forever
        grace_days=int(ret.get("grace_days", 7)),
        ttl_days_by_kind=by_kind,
        max_nodes=int(mn["limit"]) if "limit" in mn else None,
        strategy=mn.get("strategy", "oldest_lowest_importance"),
    )

    cfg.gate_enabled = bool(wg.get("enabled", True))
    cfg.min_title_length = int(wg.get("min_title_length", 10))
    cfg.min_body_length = int(wg.get("min_body_length", 20))

    for kind, spec in raw.get("schemas", {}).items():
        fields = {}
        for fname, fspec in spec.get("fields", {}).items():
            fields[fname] = FieldSchema(
                field_type=fspec.get("type"),
                min=float(fspec["min"]) if "min" in fspec else None,
                max=float(fspec["max"]) if "max" in fspec else None,
                allowed_values=fspec.get("allowed_values"),
            )
        cfg.schemas[kind] = KindSchema(
            required_fields=list(spec.get("required_fields", [])), fields=fields
        )

    if "kinds" in raw:
        cfg.allowed_kinds = _check_names(list(raw["kinds"].get("allowed", [])), "kind")
    if "relations" in raw:
        cfg.allowed_relations = _check_names(list(raw["relations"].get("allowed", [])), "relation")

    cfg.encryption = bool(raw.get("security", {}).get("encryption", False))
    cfg.briefing_sections = list(raw.get("briefing", {}).get("sections", []))
    return cfg
