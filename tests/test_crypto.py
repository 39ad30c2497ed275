"""At-rest encryption (storage/encrypted.rs analogue): key contract,
roundtrip, ciphertext properties, wrong-key quarantine."""

from __future__ import annotations

import base64

import pytest

from cortex_spark.crypto import (
    decrypt_columns,
    derive_key,
    encrypt_columns,
    generate_key,
    read_encrypted,
    write_encrypted,
)


def test_key_contract(monkeypatch):
    monkeypatch.delenv("CORTEX_SPARK_ENCRYPTION_KEY", raising=False)
    with pytest.raises(ValueError, match="not set"):
        derive_key()
    monkeypatch.setenv("CORTEX_SPARK_ENCRYPTION_KEY", "!!!not-base64!!!")
    with pytest.raises(ValueError, match="not valid base64"):
        derive_key()
    monkeypatch.setenv("CORTEX_SPARK_ENCRYPTION_KEY", base64.b64encode(b"short").decode())
    with pytest.raises(ValueError, match="exactly 32 bytes.*got 5"):
        derive_key()
    monkeypatch.setenv("CORTEX_SPARK_ENCRYPTION_KEY", generate_key())
    assert len(derive_key()) == 32


def test_roundtrip_and_ciphertext_properties(spark, tmp_path):
    key = base64.b64decode(generate_key())
    df = spark.createDataFrame(
        [("n1", "Title A", "same body"), ("n2", "Title B", "same body")],
        "node_id string, title string, body string",
    )
    enc = encrypt_columns(df, key, ["title", "body"]).cache()
    rows = {r["node_id"]: r for r in enc.collect()}
    # ciphertext is binary and equal plaintexts do NOT collide (random IV)
    assert isinstance(rows["n1"]["body"], (bytes, bytearray))
    assert bytes(rows["n1"]["body"]) != bytes(rows["n2"]["body"])

    dec = decrypt_columns(enc, key, ["title", "body"])
    got = {(r["node_id"], r["title"], r["body"]) for r in dec.collect()}
    assert got == {("n1", "Title A", "same body"), ("n2", "Title B", "same body")}

    # at-rest write/read helpers: parquet on disk holds only ciphertext
    path = str(tmp_path / "enc_nodes")
    write_encrypted(df, path, key)
    raw = spark.read.parquet(path).first()
    assert isinstance(raw["body"], (bytes, bytearray))
    assert b"same body" not in bytes(raw["body"])
    back = read_encrypted(spark, path, key)
    assert {r["body"] for r in back.collect()} == {"same body"}

    # wrong key: strict read fails the job, lenient read quarantines to NULL
    wrong = base64.b64decode(generate_key())
    lenient = read_encrypted(spark, path, wrong, strict=False)
    assert all(r["body"] is None for r in lenient.collect())
    with pytest.raises(Exception):
        read_encrypted(spark, path, wrong, strict=True).collect()
