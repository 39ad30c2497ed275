"""Extraction stage: pages → staged `nodes` DataFrame.

One lineage of narrow transformations (reference ingest path §3.1,
briefing/ingest.rs:39-142 re-expressed):

    pages → [lang filter] → extract_text UDF → chunk UDF → posexplode
          → classify/title/tags (native exprs) → validate → embed UDF

Deterministic ids: node_id = sha2(url ‖ '\\x00' ‖ chunk_idx) — the reference
uses time-ordered UUIDv7 (types.rs:296) which would break golden-triple
reproducibility, so content-addressed ids replace them (SURVEY §1.3).

Everything except the three Arrow-batched kernels (extract/chunk/embed) is
JVM-side and whole-stage-codegen'd; filters on `lang` push down to the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cortex_spark.embed import embed_input_col, embed_udf
from cortex_spark.extract.chunk import chunk_udf
from cortex_spark.extract.classify import classify_col, title_col
from cortex_spark.extract.html import extract_text_udf

def epoch_ts() -> Column:
    """Never-accessed sentinel timestamp (types.rs:14-16)."""
    return F.to_timestamp(F.lit("1970-01-01 00:00:00"))


DEFAULT_IMPORTANCE = 0.5  # ingest.rs:119
MAX_TAGS = 32  # types.rs:331-348


def node_id_col(url: Column, chunk_idx: Column) -> Column:
    return F.sha2(F.concat_ws("\x00", url, chunk_idx.cast("string")), 256).substr(1, 32)


def tags_col(body: Column) -> Column:
    """Deterministic gazetteer-style tags: distinct entity tokens, sorted."""
    ents = F.regexp_extract_all(F.lower(body), F.lit(r"(entity[0-9]{3})"), 1)
    return F.slice(F.array_sort(F.array_distinct(ents)), 1, MAX_TAGS)


def pages_to_nodes(
    pages: DataFrame,
    langs: tuple[str, ...] = ("en",),
    embed_dim: int = 384,
    embed_seed: int = 42,
    with_embeddings: bool = True,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → nodes DataFrame (schemas.NODES)."""
    # the chunker auto-detects markdown vs plain from the text itself — a
    # separate `fmt` column would re-reference the extraction UDF and make
    # Catalyst evaluate the (expensive) HTML parse twice per row
    extracted = pages.filter(F.col("lang").isin(*langs)).withColumn(
        "etext", extract_text_udf(F.col("html"))
    )
    chunks = extracted.select(
        "url",
        "warc_ts",
        F.posexplode(chunk_udf(F.col("etext"), F.lit(None).cast("string"))).alias("chunk_idx", "chunk"),
    ).filter(F.trim(F.col("chunk")) != "")

    nodes = chunks.select(
        node_id_col(F.col("url"), F.col("chunk_idx")).alias("node_id"),
        classify_col(F.col("chunk")).alias("kind"),
        title_col(F.col("chunk")).alias("title"),
        F.col("chunk").alias("body"),
        F.create_map(F.lit("url"), F.col("url")).alias("metadata"),
        tags_col(F.col("chunk")).alias("tags"),
        F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1).alias("source_agent"),
        F.col("url").alias("source_session"),
        F.lit("ingest").alias("source_channel"),
        F.lit(DEFAULT_IMPORTANCE).cast("float").alias("importance"),
        F.lit(0).cast("bigint").alias("access_count"),
        epoch_ts().alias("last_accessed_at"),
        F.col("warc_ts").alias("created_at"),
        F.col("warc_ts").alias("updated_at"),
        F.lit(False).alias("deleted"),
    )

    # Validation F5 (types.rs:316-351): title ≤256, importance clamped [0,1],
    # non-empty body; invalid rows are dropped (quarantine semantics).
    nodes = nodes.filter((F.length("title") <= 256) & (F.length("body") > 0)).withColumn(
        "importance", F.least(F.greatest(F.col("importance"), F.lit(0.0)), F.lit(1.0)).cast("float")
    )

    if with_embeddings:
        embed = embed_udf(embed_dim, embed_seed)
        nodes = nodes.withColumn(
            "embedding",
            embed(embed_input_col(F.col("kind"), F.col("title"), F.col("body"), F.col("tags"))),
        )
    else:
        nodes = nodes.withColumn("embedding", F.lit(None).cast("array<float>"))

    return nodes.select(
        "node_id",
        "kind",
        "title",
        "body",
        "metadata",
        "tags",
        "embedding",
        "source_agent",
        "source_session",
        "source_channel",
        "importance",
        "access_count",
        "last_accessed_at",
        "created_at",
        "updated_at",
        "deleted",
    )
