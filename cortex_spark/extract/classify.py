"""Chunk classifier + title derivation as native Spark column expressions.

Classifier: keyword cascade, first match wins, case-insensitive substring on
the whole chunk — priority order replicated exactly from the reference
(briefing/ingest.rs:181-211). Implemented as a `when` chain over
`lower(text)` so it stays inside whole-stage codegen (no Python in the hot
path); `classify_py` is the same cascade in pure Python for golden tests.

Title: first line, trim, strip leading '#', trim, byte-truncate at 200
(reference ingest.rs:100-111 slices *bytes*; the UDF-free Spark path uses
char `substring` which is identical for ASCII corpora — the generator emits
ASCII titles — and `title_py` keeps exact byte semantics for parity tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (kind, [keywords]) in exact reference priority order, ingest.rs:182-210
CLASSIFIER_CASCADE: list[tuple[str, list[str]]] = [
    ("decision", ["decided", "decision", "chose", "will use"]),
    ("goal", ["goal", "target", "aim", "objective"]),
    ("preference", ["prefer", "always", "never", "style"]),
    ("pattern", ["pattern", "recurring", "tendency"]),
    ("event", ["happened", "event", "occurred"]),
    ("observation", ["observed", "noticed", "note"]),
]
DEFAULT_KIND = "fact"
TITLE_MAX_BYTES = 200


def classify_col(text: Column) -> Column:
    lower = F.lower(text)
    expr = None
    for kind, words in CLASSIFIER_CASCADE:
        cond = None
        for w in words:
            c = lower.contains(w)
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, F.lit(kind)) if expr is None else expr.when(cond, F.lit(kind))
    return expr.otherwise(F.lit(DEFAULT_KIND))


def classify_py(text: str) -> str:
    lower = text.lower()
    for kind, words in CLASSIFIER_CASCADE:
        if any(w in lower for w in words):
            return kind
    return DEFAULT_KIND


def title_col(text: Column) -> Column:
    """First line, '#'-stripped, trimmed, capped at TITLE_MAX_BYTES *bytes*.
    The reference (briefing/ingest.rs:108) does a raw `title[..200]` byte
    slice, which PANICS when byte 200 splits a multi-byte char; this engine
    deliberately diverges by backing up to the previous UTF-8 boundary
    instead of failing the row (≤ 3 steps back — UTF-8 chars are ≤ 4
    bytes). On any input the reference survives (boundary at 200, or pure
    ASCII) the two agree byte-for-byte; on inputs that would panic the
    reference, this yields the longest valid-UTF-8 prefix ≤ 200 bytes."""
    first = F.trim(F.split_part(text, F.lit("\n"), F.lit(1)))
    stripped = F.trim(F.regexp_replace(first, r"^#+", ""))
    raw = stripped.cast("binary")

    def cont(i: int) -> Column:  # byte i (1-based) is a UTF-8 continuation byte
        b = F.conv(F.hex(F.substring(raw, i, 1)), 16, 10).cast("int")
        return (b >= 128) & (b < 192)

    m = TITLE_MAX_BYTES
    cut = (
        F.when(~cont(m + 1), F.lit(m))
        .when(~cont(m), F.lit(m - 1))
        .when(~cont(m - 1), F.lit(m - 2))
        .otherwise(F.lit(m - 3))
    )
    out = F.when(F.octet_length(stripped) <= m, stripped).otherwise(
        F.decode(F.substring(raw, F.lit(1), cut), "UTF-8")
    )
    return F.when(text.isNull() | (text == ""), F.lit("Untitled")).otherwise(out)


def title_py(text: str) -> str:
    raw = (text.split("\n", 1)[0] if text else "Untitled").strip()
    t = raw.lstrip("#").strip()
    b = t.encode("utf-8")
    return b[:TITLE_MAX_BYTES].decode("utf-8", errors="ignore") if len(b) > TITLE_MAX_BYTES else t
