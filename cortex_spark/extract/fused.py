"""Fused extraction kernel: pages → nodes in ONE Python pass.

`pages_to_nodes` (extract/pipeline.py) chains three Arrow-batched UDF
boundaries — extract_text → chunk → embed — so every page crosses the
JVM↔Python Arrow bridge three times and pays three Python-stage overheads.
At bench scale that per-stage overhead is the dominant *non-scaling* cost
(it grows with task count, not data), which is exactly what depressed the
round-1 local[8]→local[32] scaling efficiency (BASELINE.md round-1 notes).

This module computes the identical node rows (bit-for-bit: pytest
`test_fused_matches_unfused` asserts frame equality against the unfused
path) in a single `mapInPandas` pass: html → text → chunks → classify /
title / tags / ids → embedding, one Arrow deserialize in, one serialize out.

Semantics replicated 1:1 from the column-expression path:
- node_id       sha2(url ‖ '\\x00' ‖ chunk_idx)[:32]      (extract/pipeline.py)
- classify      keyword cascade, reference priority order (ingest.rs:181-211)
- title         first line → strip '#' → trim → first 200 chars
- tags          sorted distinct entityNNN tokens, ≤32      (types.rs:331-348)
- validation    title ≤256 chars, non-empty body           (types.rs:316-351)
- embedding     encode_py over the reference input builder (embedding.rs:113-131)
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cortex_spark.embed import DEFAULT_DIM, DEFAULT_SEED, encode_np
from cortex_spark.extract.chunk import chunk_text
from cortex_spark.extract.classify import TITLE_MAX_BYTES, classify_py
from cortex_spark.extract.html import extract_text_py
from cortex_spark.extract.pipeline import DEFAULT_IMPORTANCE, MAX_TAGS
from cortex_spark.schemas import NODES

_ENTITY_RE = re.compile(r"entity[0-9]{3}")
_AGENT_RE = re.compile(r"https?://([^/]+)/")
_EPOCH = datetime(1970, 1, 1)


def _title(chunk: str) -> str:
    # parity with title_col: trim(split_part(c,'\n',1)) → strip ^#+ → trim →
    # substring(1,200) (char semantics — the generated corpus is ASCII so the
    # reference's byte truncation, title_py, is identical; ingest.rs:100-111)
    first = chunk.split("\n", 1)[0].strip()
    return re.sub(r"^#+", "", first).strip()[:TITLE_MAX_BYTES]


def _node_rows(
    url: str,
    warc_ts,
    html,
    dim: int,
    seed: int,
    with_embeddings: bool,
) -> Iterator[tuple]:
    text = extract_text_py(html)
    agent_m = _AGENT_RE.search(url)
    agent = agent_m.group(1) if agent_m else ""
    for idx, chunk in enumerate(chunk_text(text, None)):
        if not chunk.strip():
            continue
        title = _title(chunk)
        if len(title) > 256 or not chunk:
            continue
        kind = classify_py(chunk)
        tags = sorted(set(_ENTITY_RE.findall(chunk.lower())))[:MAX_TAGS]
        if with_embeddings:
            tag_line = "\ntags: " + ", ".join(tags) if tags else ""
            emb = encode_np(f"{kind.capitalize()}: {title}\n{chunk}{tag_line}", dim, seed)
        else:
            emb = None
        node_id = hashlib.sha256(f"{url}\x00{idx}".encode()).hexdigest()[:32]
        yield (
            node_id, kind, title, chunk, {"url": url}, tags, emb,
            agent, url, "ingest", DEFAULT_IMPORTANCE, 0, _EPOCH,
            warc_ts, warc_ts, False,
        )


def pages_to_nodes_fused(
    pages: DataFrame,
    langs: tuple[str, ...] = ("en",),
    embed_dim: int = DEFAULT_DIM,
    embed_seed: int = DEFAULT_SEED,
    with_embeddings: bool = True,
) -> DataFrame:
    """Drop-in replacement for pages_to_nodes — identical rows, one Python stage."""
    cols = list(NODES.fieldNames())

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                row
                for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
                for row in _node_rows(url, ts, html, embed_dim, embed_seed, with_embeddings)
            ]
            yield pd.DataFrame(rows, columns=cols)

    # the lang filter stays JVM-side so it pushes down to the parquet scan
    return pages.filter(F.col("lang").isin(*langs)).select("url", "warc_ts", "html").mapInPandas(
        kernel, schema=NODES
    )
