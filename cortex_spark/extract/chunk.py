"""Text chunkers, matching the reference's semantics exactly.

- chunk_markdown: split into sections at lines starting with '#', each chunk
  trimmed; reference briefing/ingest.rs:148-166.
- chunk_plain: 20-line groups joined by '\n', empty groups dropped;
  reference briefing/ingest.rs:169-176.

Exposed as an Arrow-batched pandas UDF returning array<string>; callers
`explode` it (UDTF-equivalent) with `posexplode` when chunk index is needed
for deterministic ids.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

PLAIN_GROUP_LINES = 20


def chunk_markdown(text: str) -> list[str]:
    chunks: list[str] = []
    current: list[str] = []
    for line in text.split("\n"):
        if line.startswith("#") and current:
            chunks.append("\n".join(current).strip())
            current = []
        current.append(line)
    if current and "\n".join(current).strip():
        chunks.append("\n".join(current).strip())
    # reference pushes `current` only when non-empty-after-trim; the mid-loop
    # push happens only when current is non-empty, matching ingest.rs:153-158
    return [c for c in chunks if c]


def chunk_plain(text: str) -> list[str]:
    lines = text.split("\n")
    out = []
    for i in range(0, len(lines), PLAIN_GROUP_LINES):
        group = "\n".join(lines[i : i + PLAIN_GROUP_LINES])
        if group.strip():
            out.append(group)
    return out


def chunk_text(text: str | None, fmt: str | None) -> list[str]:
    if not text:
        return []
    if fmt == "markdown" or (fmt is None and "\n#" in ("\n" + text)):
        return chunk_markdown(text)
    return chunk_plain(text)


@F.pandas_udf(ArrayType(StringType()))
def chunk_udf(text: pd.Series, fmt: pd.Series) -> pd.Series:
    return pd.Series([chunk_text(t, f) for t, f in zip(text, fmt)])
