"""Import / export (SURVEY §2.1 S8/S9).

- import_nodes_json: JSON export → node rows with Imported provenance-style
  metadata (reference migrations/ + EdgeProvenance::Imported,
  types.rs:268-269).
- export_graph: full node+edge dump for visualization
  (GET /graph/export, cortex-server/src/http/viz.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def import_nodes_json(
    spark: SparkSession, path: str, source: str = "import", multiline: bool = False
) -> DataFrame:
    """Read a JSON export (one object per line, or a whole-file array with
    multiline=True) into the nodes schema; missing fields defaulted, ids
    content-hashed for idempotence. Raises on files Spark cannot parse at
    all (schema collapses to _corrupt_record) instead of importing
    default-valued garbage rows."""
    raw = spark.read.option("multiLine", multiline).json(path)
    cols = {f.name for f in raw.schema.fields}
    bad_hint = (
        f"{path} is not fully parseable as {'a JSON array' if multiline else 'JSON lines'}; "
        "for pretty-printed array files use format 'json' (multiLine), "
        "for one-object-per-line files use 'jsonl'"
    )
    if cols <= {"_corrupt_record"}:
        raise ValueError(bad_hint)
    if "_corrupt_record" in cols:
        # partial parse (e.g. an array file read line-wise where one line
        # happens to be a valid object): reject rather than silently
        # importing a subset / default-valued garbage. Spark disallows
        # querying the corrupt-record column straight off the file scan —
        # cache first (per the QUERY_ONLY_CORRUPT_RECORD_COLUMN guidance).
        raw = raw.cache()
        n_bad = raw.filter(F.col("_corrupt_record").isNotNull()).count()
        if n_bad:
            raise ValueError(f"{bad_hint} ({n_bad} unparseable records)")
        raw = raw.drop("_corrupt_record")
        cols.discard("_corrupt_record")

    def col_or(name: str, default):
        return F.col(name) if name in cols else default

    ts_default = F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    out = raw.select(
        F.sha2(
            F.concat_ws(
                "\x00",
                F.coalesce(col_or("title", F.lit("")), F.lit("")),
                F.coalesce(col_or("body", F.lit("")), F.lit("")),
                F.lit(source),
            ),
            256,
        ).substr(1, 32).alias("node_id"),
        F.coalesce(col_or("kind", F.lit("fact")), F.lit("fact")).alias("kind"),
        F.coalesce(col_or("title", F.lit("")), F.lit("")).alias("title"),
        F.coalesce(col_or("body", F.lit("")), F.lit("")).alias("body"),
        F.create_map(F.lit("imported_from"), F.lit(source)).alias("metadata"),
        F.array().cast("array<string>").alias("tags"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.coalesce(col_or("agent", F.lit(source)), F.lit(source)).alias("source_agent"),
        F.lit(None).cast("string").alias("source_session"),
        F.lit("import").alias("source_channel"),
        F.coalesce(col_or("importance", F.lit(0.5)).cast("float"), F.lit(0.5).cast("float")).alias("importance"),
        F.lit(0).cast("bigint").alias("access_count"),
        F.to_timestamp(F.lit("1970-01-01 00:00:00")).alias("last_accessed_at"),
        ts_default.alias("created_at"),
        ts_default.alias("updated_at"),
        F.lit(False).alias("deleted"),
    )
    return out


def export_graph(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Write the live graph as JSON (nodes/ + edges/ subdirs)."""
    nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).drop("embedding").write.mode("overwrite").json(f"{out_dir}/nodes")
    edges.write.mode("overwrite").json(f"{out_dir}/edges")
