"""Fixed StructType schemas for the pipeline tables.

Mirrors the reference's data model (cortex Node/Edge structs,
crates/cortex-core/src/types.rs:26-68,152-179) re-expressed columnar; the
`pages` input schema follows BASELINE.json input_hint exactly.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input corpus (BASELINE.json input_hint):
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),  # golden extraction output
        T.StructField("lang", T.StringType(), True),
    ]
)

# Node table (reference types.rs:26-68,130-148; Source struct types.rs:274-283)
NODES = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("source_agent", T.StringType(), True),
        T.StructField("source_session", T.StringType(), True),
        T.StructField("source_channel", T.StringType(), True),
        T.StructField("importance", T.FloatType(), True),
        T.StructField("access_count", T.LongType(), True),
        T.StructField("last_accessed_at", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("deleted", T.BooleanType(), True),
    ]
)

# Edge table == weighted (subj, pred, obj) triple with provenance
# (reference types.rs:152-179; EdgeProvenance types.rs:247-270)
PROVENANCE = T.StructType(
    [
        T.StructField("ptype", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("score", T.FloatType(), True),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("edge_id", T.StringType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("relation", T.StringType(), False),
        T.StructField("weight", T.FloatType(), True),
        T.StructField("provenance", PROVENANCE, True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

# Default node kinds / relations (reference kinds.rs:5-49, relations.rs:3-84)
DEFAULT_KINDS = [
    "agent",
    "decision",
    "fact",
    "event",
    "goal",
    "preference",
    "pattern",
    "observation",
    "prompt",
]

DEFAULT_RELATIONS = [
    "informed_by",
    "led_to",
    "applies_to",
    "contradicts",
    "supersedes",
    "depends_on",
    "related_to",
    "instance_of",
    "uses",
    "branched_from",
    "inherits_from",
    "used_by",
    "performed",
    "deployed",
    "observed_with",
    "observed_by",
    "rolled_back",
    "rolled_back_to",
]
