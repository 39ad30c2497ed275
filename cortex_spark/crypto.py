"""At-rest column encryption (reference storage/encrypted.rs:1-152).

The reference wraps its store in AES-256-GCM with a base64 256-bit key from
`CORTEX_ENCRYPTION_KEY`. Spark-first analogue: the sensitive columns
(title/body/metadata payloads) are encrypted with the built-in
`aes_encrypt(..., 'GCM')` expression — JVM-side, whole-stage codegen, a
fresh random IV per value (so ciphertexts don't leak equality) — and the
parquet at rest holds only binary ciphertext. Key handling mirrors the
reference exactly: env var, base64, must decode to 32 bytes, same error
texts (encrypted.rs:10-33); `generate_key` matches `cortex-server security
generate-key`.

Decrypt uses `try_aes_decrypt` for read paths that must quarantine rather
than fail (wrong key / corrupt value → NULL), and strict `aes_decrypt`
where a bad key should be an error.
"""

from __future__ import annotations

import base64
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENV_KEY = "CORTEX_SPARK_ENCRYPTION_KEY"


def generate_key() -> str:
    """Random 256-bit key, base64 (encrypted.rs:36-39)."""
    return base64.b64encode(os.urandom(32)).decode()


def derive_key(env: str = ENV_KEY) -> bytes:
    """Validated 32-byte key from the environment (encrypted.rs:10-33)."""
    raw = os.environ.get(env)
    if raw is None:
        raise ValueError(
            f"{env} environment variable not set. "
            "Run `python -c 'from cortex_spark.crypto import generate_key; print(generate_key())'` to create one."
        )
    try:
        key = base64.b64decode(raw.strip(), validate=True)
    except Exception:
        raise ValueError(f"{env} is not valid base64") from None
    if len(key) != 32:
        raise ValueError(
            f"{env} must decode to exactly 32 bytes (256 bits), got {len(key)} bytes"
        )
    return key


def encrypt_columns(df: DataFrame, key: bytes, cols: list[str]) -> DataFrame:
    """Replace each string column with its AES-256-GCM ciphertext (binary).
    Random IV per value — equal plaintexts yield distinct ciphertexts."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.aes_encrypt(F.col(c).cast("binary"), F.lit(key), F.lit("GCM"))
        )
    return out


def decrypt_columns(
    df: DataFrame, key: bytes, cols: list[str], strict: bool = True
) -> DataFrame:
    """Inverse of encrypt_columns. strict=False quarantines undecryptable
    values as NULL (try_aes_decrypt) instead of failing the job."""
    fn = F.aes_decrypt if strict else F.try_aes_decrypt
    out = df
    for c in cols:
        out = out.withColumn(c, fn(F.col(c), F.lit(key), F.lit("GCM")).cast("string"))
    return out


SENSITIVE_NODE_COLS = ["title", "body"]


def write_encrypted(df: DataFrame, path: str, key: bytes, cols: list[str] | None = None) -> None:
    """Encrypt sensitive columns and write parquet — the at-rest contract of
    the reference's EncryptedStorage wrapper."""
    encrypt_columns(df, key, cols or SENSITIVE_NODE_COLS).write.mode("overwrite").parquet(path)


def read_encrypted(spark, path: str, key: bytes, cols: list[str] | None = None, strict: bool = True) -> DataFrame:
    return decrypt_columns(spark.read.parquet(path), key, cols or SENSITIVE_NODE_COLS, strict)
