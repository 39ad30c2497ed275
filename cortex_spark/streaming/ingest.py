"""Streaming ingest (SURVEY §2.1 S4/S5, §2.11).

The reference subscribes NATS `warren.>` and templates 9 event types into
nodes (crates/warren-adapter/src/types.rs:7-75 event defs, :78-260
templating; wiring cortex-server/src/serve.rs:402-441). Spark-native:
any Structured Streaming source (file/Kafka/socket) delivering JSON lines →
`from_json` → the same templating as native column expressions →
`foreachBatch` append into the nodes table (late/duplicate events dedup'd
by (title, source_session), ARCHITECTURE.md:188).

Event → (kind, title, body, importance, session) mapping, exact per
types.rs:78-260:

| type | kind | importance | session |
|---|---|---|---|
| stage.advanced | event | 0.6 | item_id |
| item.completed | event | 0.8 | item_id |
| evidence.submitted | fact | 0.7 | item_id |
| gate.approved | decision | 0.8 | item_id |
| gate.rejected | decision | 0.7 | item_id |
| interaction.created | observation | 0.5 | interaction_id |
| task.picked | event | 0.5 | item_id |
| autonomy | pattern | 0.7 | None |
| refinement | decision | 0.6 | refinement_id |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("item_id", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("previous_stage", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("evidence_count", T.IntegerType()),
        T.StructField("evidence_id", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("submitted_by", T.StringType()),
        T.StructField("gate_id", T.StringType()),
        T.StructField("approved_by", T.StringType()),
        T.StructField("rejected_by", T.StringType()),
        T.StructField("reason", T.StringType()),
        T.StructField("interaction_id", T.StringType()),
        T.StructField("agent_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("task_id", T.StringType()),
        T.StructField("picked_by", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("context", T.StringType()),
        T.StructField("refinement_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _c(name: str) -> Column:
    return F.coalesce(F.col(name), F.lit(""))


def warren_events_to_nodes(events: DataFrame, source_agent: str = "warren") -> DataFrame:
    """Parsed warren events → node rows (schemas.NODES minus embedding)."""
    t = F.col("type")
    kind = (
        F.when(t.isin("stage.advanced", "item.completed", "task.picked"), "event")
        .when(t == "evidence.submitted", "fact")
        .when(t.isin("gate.approved", "gate.rejected", "refinement"), "decision")
        .when(t == "interaction.created", "observation")
        .when(t == "autonomy", "pattern")
    )
    title = (
        F.when(t == "stage.advanced", F.format_string("Item %s advanced to %s", _c("item_id"), _c("stage")))
        .when(t == "item.completed", F.concat(F.lit("Completed: "), _c("title")))
        .when(t == "evidence.submitted", F.concat(F.lit("Evidence: "), F.substring(_c("content"), 1, 50)))
        .when(t == "gate.approved", F.format_string("Approved: %s gate for stage %s", _c("gate_id"), _c("stage")))
        .when(t == "gate.rejected", F.format_string("Rejected: %s gate for stage %s", _c("gate_id"), _c("stage")))
        .when(t == "interaction.created", F.format_string("Interaction by %s", _c("agent_id")))
        .when(t == "task.picked", F.format_string("Task %s picked", _c("task_id")))
        .when(t == "autonomy", F.concat(F.lit("Autonomy: "), _c("action")))
        .when(t == "refinement", F.format_string("Refinement by %s", _c("agent_id")))
    )
    body = (
        F.when(
            t == "stage.advanced",
            F.format_string("Item progressed from %s to %s", F.coalesce(F.col("previous_stage"), F.lit("start")), _c("stage")),
        )
        .when(t == "item.completed", F.format_string("Item '%s' completed with %s pieces of evidence", _c("title"), F.coalesce(F.col("evidence_count"), F.lit(0)).cast("string")))
        .when(t == "evidence.submitted", _c("content"))
        .when(t == "gate.approved", F.format_string("Gate approved by %s", _c("approved_by")))
        .when(t == "gate.rejected", F.format_string("Rejected by %s: %s", _c("rejected_by"), _c("reason")))
        .when(t == "interaction.created", _c("content"))
        .when(t == "task.picked", F.format_string("Task picked by %s for item %s", _c("picked_by"), _c("item_id")))
        .when(t == "autonomy", _c("context"))
        .when(t == "refinement", _c("content"))
    )
    importance = (
        F.when(t == "stage.advanced", 0.6)
        .when(t == "item.completed", 0.8)
        .when(t == "evidence.submitted", 0.7)
        .when(t == "gate.approved", 0.8)
        .when(t == "gate.rejected", 0.7)
        .when(t == "interaction.created", 0.5)
        .when(t == "task.picked", 0.5)
        .when(t == "autonomy", 0.7)
        .when(t == "refinement", 0.6)
    )
    session = (
        F.when(t == "interaction.created", F.col("interaction_id"))
        .when(t == "refinement", F.col("refinement_id"))
        .when(t == "autonomy", F.lit(None).cast("string"))
        .otherwise(F.col("item_id"))
    )
    ts = F.coalesce(F.col("ts"), F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    return (
        events.filter(kind.isNotNull())
        .select(
            F.sha2(F.concat_ws("\x00", t, F.coalesce(title, F.lit("")), session), 256).substr(1, 32).alias("node_id"),
            kind.alias("kind"),
            title.alias("title"),
            body.alias("body"),
            F.create_map(F.lit("source"), F.lit("warren")).alias("metadata"),
            F.array().cast("array<string>").alias("tags"),
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(source_agent).alias("source_agent"),
            session.alias("source_session"),
            F.lit("warren").alias("source_channel"),
            importance.cast("float").alias("importance"),
            F.lit(0).cast("bigint").alias("access_count"),
            F.to_timestamp(F.lit("1970-01-01 00:00:00")).alias("last_accessed_at"),
            ts.alias("created_at"),
            ts.alias("updated_at"),
            F.lit(False).alias("deleted"),
        )
        # NATS ingest dedups by title+session (ARCHITECTURE.md:188)
        .dropDuplicates(["title", "source_session"])
    )


def ingest_stream(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    source_agent: str = "warren",
    embed_dim: int = 384,
    embed_seed: int = 42,
):
    """File-source Structured Streaming ingest: JSON-lines events → nodes
    parquet, exactly-once via the streaming checkpoint.

    Returns the StreamingQuery (caller awaits / stops it)."""
    from cortex_spark.embed import embed_input_col, embed_udf

    raw = (
        spark.readStream.schema(T.StructType([T.StructField("value", T.StringType())]))
        .text(source_dir)
    )
    parsed = raw.select(F.from_json(F.col("value"), EVENT_SCHEMA).alias("e")).select("e.*")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        nodes = warren_events_to_nodes(batch_df, source_agent)
        embed = embed_udf(embed_dim, embed_seed)
        nodes = nodes.withColumn(
            "embedding",
            embed(embed_input_col(F.col("kind"), F.col("title"), F.col("body"), F.col("tags"))),
        )
        nodes.write.mode("append").parquet(sink_dir)

    return (
        parsed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
