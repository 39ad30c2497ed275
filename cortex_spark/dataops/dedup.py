"""Deduplication operators for training-data pipelines (first-class ops).

Five families, each sized for 10^12-document corpora:

- exact_dedup: hash-groupBy on normalized text (one shuffle on a 32-byte
  key; keeps the min doc id as canonical).
- MinHash + banded LSH: shingle → k min-hashes → bands → bucket join.
  Hash = md5 hex strings (identical in Spark and DuckDB ⇒ SQL-oracle-able);
  min over strings = min-hash. Native exprs, no Python.
- SimHash: 64-bit bit-majority fingerprint; near-dups = pairs within
  Hamming distance d via band-exact match on 4×16-bit chunks (any chunk
  equal ⇒ candidate, exact Hamming rescored). Two kernels: a blake2b
  Arrow pandas UDF (reference-style), and a pure native-expression md5
  variant (whole-stage codegen, SQL-oracle-able — the scale path).
- n-gram Jaccard: exact Jaccard over token 3-gram sets, evaluated on
  LSH-candidate pairs only (never all-pairs).
- embedding cosine near-dup: candidate pairs from random-hyperplane LSH,
  exact cosine rescoring.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from cortex_spark.functions.similarity import cosine_col
from cortex_spark.linker.lsh import candidate_pairs


def normalized_text_col(text) -> F.Column:
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: canonical (min) id + dup count."""
    h = F.md5(normalized_text_col(F.col(text_col)))
    return (
        df.select(F.col(id_col), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingles_col(text, n: int = 3) -> F.Column:
    """Token n-gram shingles of normalized text (distinct, sorted)."""
    toks = F.filter(F.split(normalized_text_col(text), " "), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_sort(F.array_distinct(grams))


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 12, shingle_n: int = 3) -> DataFrame:
    """(id, sig array<string> of k min-hashes). min(md5(i||'|'||shingle))
    per i — string min-hash, reproducible in any engine with md5.

    NOTE: the per-hash transforms are SQL-parsed lambdas (F.expr), not
    Python-API lambdas — PySpark 4.1 mis-binds lambda variables when several
    Python-created `F.transform` lambdas share one expression tree (verified:
    k>=2 in one select returns wrong hashes; expr-parsed lambdas are scoped
    correctly)."""
    base = df.select(
        F.col(id_col).alias("doc_id"), shingles_col(F.col(text_col), shingle_n).alias("__sh")
    )
    sigs = F.array(
        *[F.expr(f"array_min(transform(__sh, s -> md5(concat('{i}|', s))))") for i in range(k)]
    )
    return base.select("doc_id", sigs.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (a_id < b_id, band) via banded MinHash LSH."""
    rows = k // bands
    sigs = minhash_signatures(df, text_col, id_col, k, shingle_n)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("|", F.lit(str(b)), *[F.col("sig")[b * rows + r] for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    banded = banded.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= max_bucket).drop("rn")
    a = banded.select(F.col("doc_id").alias("a_id"), "bucket")
    b = banded.select(F.col("doc_id").alias("b_id"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def simhash_udf(seed: int = 11):
    """Arrow pandas UDF: text → 64-bit SimHash (bit-majority of token hashes)."""

    @F.pandas_udf(LongType())
    def _simhash(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            toks = (t or "").lower().split()
            if not toks:
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = hashlib.blake2b(tok.encode(), digest_size=8, salt=str(seed).encode()).digest()
                v = int.from_bytes(h, "big")
                bits = np.array([(v >> b) & 1 for b in range(64)], dtype=np.int64)
                acc += 2 * bits - 1
            sig = 0
            for b in range(64):
                if acc[b] > 0:
                    sig |= 1 << b
            out[i] = np.int64(sig - (1 << 64) if sig >= (1 << 63) else sig)
        return pd.Series(out)

    return _simhash


def _cap_buckets(chunks: DataFrame, max_bucket: int) -> DataFrame:
    """Hot-bucket guard for the simhash chunk index, mirroring the minhash
    path: 16-bit chunk values mean bucket population grows linearly with
    corpus size (and degenerate corpora — e.g. many empty docs hashing to
    chunk 0 — go quadratic outright without it). Deterministic truncation
    in doc_id order."""
    w = Window.partitionBy("chunk_idx", "chunk").orderBy("doc_id")
    return chunks.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= max_bucket).drop("rn")


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 11,
    max_bucket: int = 2000,
) -> DataFrame:
    """Near-dup pairs by SimHash: 4×16-bit chunk index (pigeonhole: Hamming
    ≤ 3 ⇒ at least one of 4 chunks equal), exact Hamming rescoring."""
    sh = df.select(F.col(id_col).alias("doc_id"), simhash_udf(seed)(F.col(text_col)).alias("sh"))
    chunks = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(*[F.shiftrightunsigned(F.col("sh"), 16 * c).bitwiseAND(F.lit(0xFFFF)) for c in range(4)])
        ).alias("chunk_idx", "chunk"),
    )
    chunks = _cap_buckets(chunks, max_bucket)
    a = chunks.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"), "chunk_idx", "chunk")
    b = chunks.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"), "chunk_idx", "chunk")
    hamming = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def simhash_chunks_native(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """64-bit SimHash as 4×16-bit chunk columns (c0..c3), pure native
    expressions — no Python in the path, one shuffle (the groupBy).

    Token hash = first 16 hex chars of md5("<seed>|" + token), split into
    two 32-bit halves so every value fits a signed long; bit b of the
    64-bit hash comes from h_lo (b<32) or h_hi (b≥32). Bit-majority over
    token occurrences (+1/-1, ties → 0) per the classic Charikar scheme.
    md5 is identical in every engine, so the whole kernel has an exact
    DuckDB oracle (cf. reference fingerprinting in cortex-core; engine
    choice here is Spark-first: explode → 64 codegen'd SUMs).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col("tok")))
    ex = df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")).select(
        "doc_id",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("h_hi"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("h_lo"),
    )
    sums = []
    for b in range(64):
        src = F.col("h_lo") if b < 32 else F.col("h_hi")
        bit = F.shiftrightunsigned(src, b % 32).bitwiseAND(F.lit(1))
        sums.append(F.sum(bit * 2 - F.lit(1)).alias(f"s{b}"))
    agg = ex.groupBy("doc_id").agg(*sums)
    chunk_cols = []
    for c in range(4):
        chunk = F.lit(0).cast("long")
        for j in range(16):
            chunk = chunk + (F.col(f"s{16 * c + j}") > 0).cast("long") * F.lit(1 << j)
        chunk_cols.append(chunk.alias(f"c{c}"))
    return agg.select("doc_id", *chunk_cols)


def simhash_pairs_native(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 11,
    max_bucket: int = 2000,
) -> DataFrame:
    """Near-dup pairs from the native md5 SimHash: candidates = any of the
    4 16-bit chunks equal (pigeonhole-complete for Hamming ≤ 3), exact
    Hamming rescoring over all 4 chunks. Never all-pairs; hot chunk buckets
    capped at max_bucket (see _cap_buckets)."""
    f = simhash_chunks_native(df, text_col, id_col, seed)
    chunks = f.select(
        "doc_id",
        "c0",
        "c1",
        "c2",
        "c3",
        F.posexplode(F.array("c0", "c1", "c2", "c3")).alias("chunk_idx", "chunk"),
    )
    chunks = _cap_buckets(chunks, max_bucket)
    a = chunks.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(f"c{c}").alias(f"a_c{c}") for c in range(4)],
        "chunk_idx",
        "chunk",
    )
    b = chunks.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(f"c{c}").alias(f"b_c{c}") for c in range(4)],
        "chunk_idx",
        "chunk",
    )
    hamming = sum(
        F.bit_count(F.col(f"a_c{c}").bitwiseXOR(F.col(f"b_c{c}"))) for c in range(4)
    ).cast("long")
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold, computed only on MinHash-LSH
    candidate pairs (the scale path: candidates ≪ all-pairs)."""
    cands = minhash_lsh_pairs(df, text_col, id_col, k, bands, shingle_n)
    sh = df.select(F.col(id_col).alias("doc_id"), shingles_col(F.col(text_col), shingle_n).alias("sh"))
    pairs = (
        cands.join(sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh")), "a_id")
        .join(sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh")), "b_id")
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter.cast("double") / union.cast("double"))
    return pairs.select("a_id", "b_id", jac.alias("jaccard")).filter(F.col("jaccard") >= threshold)


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    use_lsh: bool = True,
    lsh_kwargs: dict | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicates ≥ threshold (LSH candidates + exact
    rescore; the embedding analogue of minhash_lsh_pairs)."""
    d = df.select(F.col(id_col).cast("string").alias("node_id"), F.col(vec_col).alias("embedding"))
    if use_lsh:
        pairs = candidate_pairs(d, **(lsh_kwargs or {}))
    else:
        a = d.select(F.col("node_id").alias("a_id"), F.col("embedding").alias("a_vec"))
        b = d.select(F.col("node_id").alias("b_id"), F.col("embedding").alias("b_vec"))
        pairs = (
            a.crossJoin(b)
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", cosine_col(F.col("a_vec"), F.col("b_vec")).alias("score"))
        )
    return pairs.filter(F.col("score") >= threshold)
