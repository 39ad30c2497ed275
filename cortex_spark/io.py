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


def import_nodes_json(spark: SparkSession, path: str, source: str = "import") -> DataFrame:
    """Read a JSON export (one object per line or array) into the nodes
    schema; missing fields defaulted, ids content-hashed for idempotence."""
    raw = spark.read.json(path)  # JSON-lines; pass whole-file arrays through multiLine upstream
    cols = {f.name for f in raw.schema.fields}

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
    nodes.filter(~F.col("deleted")).drop("embedding").write.mode("overwrite").json(f"{out_dir}/nodes")
    edges.write.mode("overwrite").json(f"{out_dir}/edges")
