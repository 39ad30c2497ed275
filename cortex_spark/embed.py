"""Deterministic embedding kernels (Arrow-batched pandas UDFs).

The reference embeds node text with FastEmbed bge-small-en-v1.5, 384-dim
(vector/embedding.rs:27-57). A model download is neither hermetic nor
deterministic, so — exactly as the reference's own tests substitute Noop/
Mock embedders (briefing/ingest.rs:223-296) — the default encoder here is a
seeded feature-hashing projection: every lowercased whitespace token hashes
(BLAKE2b, stdlib, platform-stable) to a (bucket, sign) pair, token counts
accumulate, and the vector is L2-normalized.  Swapping in a real ONNX
bge-small per executor is a one-line change of `encode_batch`.

Embedding input text mirrors the reference builder
("{Kind-capitalized}: {title}\n{body}\ntags: {t1, t2}",
vector/embedding.rs:113-131) via `embed_input_col`.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 384
DEFAULT_SEED = 42


@lru_cache(maxsize=1_000_000)
def _token_slot(token: str, dim: int, seed: int) -> tuple[int, float]:
    h = hashlib.blake2b(token.encode("utf-8"), digest_size=8, salt=str(seed).encode()).digest()
    v = int.from_bytes(h, "big")
    return v % dim, 1.0 if (v >> 63) & 1 else -1.0


def encode_py(text: str, dim: int = DEFAULT_DIM, seed: int = DEFAULT_SEED) -> list[float]:
    vec = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        idx, sign = _token_slot(tok, dim, seed)
        vec[idx] += sign
    n = float(np.linalg.norm(vec))
    if n > 0:
        vec /= n
    return [float(x) for x in vec.astype(np.float32)]


def encode_batch(texts: pd.Series, dim: int = DEFAULT_DIM, seed: int = DEFAULT_SEED) -> pd.Series:
    return pd.Series([encode_py(t or "", dim, seed) for t in texts])


def embed_udf(dim: int = DEFAULT_DIM, seed: int = DEFAULT_SEED):
    """Factory returning an Arrow-batched pandas UDF text → array<float>."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(text: pd.Series) -> pd.Series:
        return encode_batch(text, dim, seed)

    return _embed


def embed_input_col(kind: Column, title: Column, body: Column, tags: Column) -> Column:
    """Reference embedding-input builder, vector/embedding.rs:113-131."""
    head = F.concat(F.initcap(kind), F.lit(": "), F.coalesce(title, F.lit("")))
    tag_line = F.when(
        F.size(F.coalesce(tags, F.array())) > 0,
        F.concat(F.lit("\ntags: "), F.array_join(tags, ", ")),
    ).otherwise(F.lit(""))
    return F.concat(head, F.lit("\n"), F.coalesce(body, F.lit("")), tag_line)
