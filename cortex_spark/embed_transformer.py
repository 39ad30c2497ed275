"""Pure-numpy mini-transformer sentence encoder (prod-geometry test double).

The reference embeds with a real transformer (bge-small-en-v1.5 via ONNX,
vector/embedding.rs:27-57). The engine's thresholds (0.75/0.80/0.92) and
the LSH tuner's bucket/recall model were designed for REAL transformer
cosine geometry — anisotropic, shell-concentrated — which the hashing
test-double encoder (embed.encode_py) does not reproduce. This module is a
dependency-free transformer with the same architectural shape as a MiniLM
block stack (token+position embeddings → N×[multi-head self-attention +
LayerNorm + GELU FFN + LayerNorm] → masked mean-pool → L2 norm), seeded
deterministic weights, so transformer-geometry vectors exist IN-CONTAINER:

- tests/test_transformer_geometry.py runs the full linker over these
  embeddings and asserts the LSH tuner's bucket/recall model holds on
  non-hashing geometry (round-5 task; no skipif),
- scripts/export_transformer_onnx.py exports the SAME weights to an ONNX
  graph where the optional `onnx` package exists, and the skipif parity
  test (tests/test_embed_onnx.py) pins ONNX-runtime output == this numpy
  forward pass, so the in-container evidence transfers to the prod seam.

Weights are committed to goldens/mini_transformer_w.npz (regenerable via
`MiniTransformer.seeded(...).save(path)` — pinned so a future numpy RNG
change cannot silently shift every golden built on top).

All math is float32 GEMMs + numpy softmax/layernorm — the forward pass is
vectorized over the batch and rides the same Arrow-batched pandas-UDF shape
as the hashing encoder (transformer_udf), never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cortex_spark.embed import DEFAULT_SEED, MAX_TOKENS, tokenize_batch

VOCAB = 512
HIDDEN = 64
N_LAYERS = 2
N_HEADS = 4
FFN = 128


def _gelu(x: np.ndarray) -> np.ndarray:
    # tanh approximation (the one transformer checkpoints ship with)
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def _layernorm(x: np.ndarray, g: np.ndarray, b: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


class MiniTransformer:
    """Deterministic-weight encoder: texts → L2-normalized float32 [n, HIDDEN]."""

    def __init__(self, weights: dict[str, np.ndarray]):
        self.w = {k: np.asarray(v, dtype=np.float32) for k, v in weights.items()}

    # -- construction ----------------------------------------------------------

    @classmethod
    def seeded(
        cls,
        seed: int = 11,
        vocab: int = VOCAB,
        hidden: int = HIDDEN,
        n_layers: int = N_LAYERS,
        ffn: int = FFN,
        max_seq: int = MAX_TOKENS,
    ) -> "MiniTransformer":
        rng = np.random.default_rng(seed)

        def w(*shape, scale=None):
            s = scale if scale is not None else (1.0 / np.sqrt(shape[0]))
            return (rng.standard_normal(shape) * s).astype(np.float32)

        ws: dict[str, np.ndarray] = {
            "tok": w(vocab, hidden, scale=0.5),
            "pos": w(max_seq, hidden, scale=0.1),
        }
        for i in range(n_layers):
            ws[f"l{i}.wq"] = w(hidden, hidden)
            ws[f"l{i}.wk"] = w(hidden, hidden)
            ws[f"l{i}.wv"] = w(hidden, hidden)
            ws[f"l{i}.wo"] = w(hidden, hidden)
            ws[f"l{i}.ln1_g"] = np.ones(hidden, dtype=np.float32)
            ws[f"l{i}.ln1_b"] = np.zeros(hidden, dtype=np.float32)
            ws[f"l{i}.w1"] = w(hidden, ffn)
            ws[f"l{i}.b1"] = np.zeros(ffn, dtype=np.float32)
            ws[f"l{i}.w2"] = w(ffn, hidden)
            ws[f"l{i}.b2"] = np.zeros(hidden, dtype=np.float32)
            ws[f"l{i}.ln2_g"] = np.ones(hidden, dtype=np.float32)
            ws[f"l{i}.ln2_b"] = np.zeros(hidden, dtype=np.float32)
        ws["meta"] = np.array([n_layers, N_HEADS, vocab], dtype=np.int64)
        return cls(ws)

    @classmethod
    def load(cls, path: str) -> "MiniTransformer":
        with np.load(path) as z:
            return cls({k: z[k] for k in z.files})

    def save(self, path: str) -> None:
        np.savez_compressed(path, **self.w)

    # -- forward ---------------------------------------------------------------

    @property
    def n_layers(self) -> int:
        return int(self.w["meta"][0])

    @property
    def n_heads(self) -> int:
        return int(self.w["meta"][1])

    @property
    def vocab(self) -> int:
        return int(self.w["meta"][2])

    def forward_ids(self, ids: np.ndarray) -> np.ndarray:
        """int64 [batch, seq] (0 = pad) → L2-normalized float32 [batch, hidden].

        One batched set of GEMMs per layer — no per-row loops."""
        w = self.w
        n, seq = ids.shape
        hidden = w["tok"].shape[1]
        heads = self.n_heads
        hd = hidden // heads
        mask = ids != 0  # [n, seq]
        x = w["tok"][ids] + w["pos"][None, :seq, :]  # [n, seq, h]
        # padded positions must not leak into attention: bias their keys away
        att_bias = np.where(mask[:, None, None, :], 0.0, -1e9).astype(np.float32)
        for i in range(self.n_layers):
            q = (x @ w[f"l{i}.wq"]).reshape(n, seq, heads, hd).transpose(0, 2, 1, 3)
            k = (x @ w[f"l{i}.wk"]).reshape(n, seq, heads, hd).transpose(0, 2, 1, 3)
            v = (x @ w[f"l{i}.wv"]).reshape(n, seq, heads, hd).transpose(0, 2, 1, 3)
            scores = q @ k.transpose(0, 1, 3, 2) / np.float32(np.sqrt(hd))
            scores = scores + att_bias  # [n, heads, seq, seq]
            scores -= scores.max(axis=-1, keepdims=True)
            p = np.exp(scores)
            p /= p.sum(axis=-1, keepdims=True)
            att = (p @ v).transpose(0, 2, 1, 3).reshape(n, seq, hidden)
            x = _layernorm(x + att @ w[f"l{i}.wo"], w[f"l{i}.ln1_g"], w[f"l{i}.ln1_b"])
            h = _gelu(x @ w[f"l{i}.w1"] + w[f"l{i}.b1"]) @ w[f"l{i}.w2"] + w[f"l{i}.b2"]
            x = _layernorm(x + h, w[f"l{i}.ln2_g"], w[f"l{i}.ln2_b"])
        # masked mean-pool (pad rows excluded), then L2 normalize
        denom = np.maximum(mask.sum(axis=1, keepdims=True), 1).astype(np.float32)
        pooled = (x * mask[:, :, None]).sum(axis=1) / denom
        norms = np.linalg.norm(pooled, axis=1, keepdims=True)
        out = np.where(norms > 0, pooled / np.maximum(norms, 1e-12), pooled)
        return out.astype(np.float32)

    def encode(self, texts, seed: int = DEFAULT_SEED) -> np.ndarray:
        ids = tokenize_batch(pd.Series(list(texts)), self.vocab, seed)
        return self.forward_ids(ids)


def transformer_udf(weights_path: str | None = None, seed: int = 11, tok_seed: int = DEFAULT_SEED):
    """Arrow-batched pandas UDF text → array<float> backed by the numpy
    mini-transformer — the same UDF shape as embed_udf / embed_udf_onnx, so
    the whole KG path runs encoder-agnostic over transformer geometry.
    Each executor process materializes the weights once (from the pinned
    npz when given, else the seeded generator)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType

    holder: dict = {}

    def _model() -> MiniTransformer:
        m = holder.get("m")
        if m is None:
            m = MiniTransformer.load(weights_path) if weights_path else MiniTransformer.seeded(seed)
            holder["m"] = m
        return m

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(text: pd.Series) -> pd.Series:
        out = _model().encode(text.fillna(""), seed=tok_seed)
        return pd.Series([row.tolist() for row in out])

    return _embed
