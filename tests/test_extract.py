"""Extraction goldens: byte-identical HTML→text, chunker and classifier
semantics matching the reference (briefing/ingest.rs:100-211, 148-176)."""

from __future__ import annotations

import hashlib

from cortex_spark.corpus import gen_text, render_html
from cortex_spark.extract.chunk import chunk_markdown, chunk_plain, chunk_text
from cortex_spark.extract.classify import classify_py, title_py
from cortex_spark.extract.html import extract_text_py


def test_roundtrip_byte_identical():
    for i in range(200):
        t = gen_text(42, i)
        html = render_html(t, "en", f"https://x/{i}")
        out = extract_text_py(html)
        assert out == t, f"doc {i} not byte-identical"
        # determinism across calls
        assert hashlib.sha256(extract_text_py(html).encode()).digest() == hashlib.sha256(
            out.encode()
        ).digest()


def test_extract_drops_boilerplate():
    html = b"<html><head><script>x</script><style>s</style></head><body><nav>Nav</nav><p>keep me</p><footer>foot</footer></body></html>"
    assert extract_text_py(html) == "keep me"


def test_extract_heading_markdownized():
    assert extract_text_py(b"<h2>Hello</h2><p>world</p>") == "## Hello\nworld"


def test_extract_entities_unescaped():
    assert extract_text_py(b"<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_chunk_markdown_reference_semantics():
    # ingest.rs:148-166: split at '#' lines, chunks trimmed
    text = "# A\nline1\nline2\n# B\nline3"
    assert chunk_markdown(text) == ["# A\nline1\nline2", "# B\nline3"]
    # leading non-heading content becomes its own first chunk
    text2 = "intro\n# A\nbody"
    assert chunk_markdown(text2) == ["intro", "# A\nbody"]
    # empty → no chunks
    assert chunk_markdown("") == []


def test_chunk_plain_20_line_groups():
    lines = [f"l{i}" for i in range(45)]
    got = chunk_plain("\n".join(lines))
    assert len(got) == 3
    assert got[0] == "\n".join(lines[:20])
    assert got[2] == "\n".join(lines[40:])
    # all-empty group dropped
    assert chunk_plain("\n\n\n") == []


def test_chunk_auto_format():
    assert chunk_text("# h\nx", None) == ["# h\nx"]
    assert chunk_text("a\nb", None) == ["a\nb"]


def test_classifier_priority_order():
    # ingest.rs:181-211 cascade, first match wins
    assert classify_py("we decided on the goal") == "decision"  # decision > goal
    assert classify_py("the goal is to prefer x") == "goal"  # goal > preference
    assert classify_py("we prefer this pattern") == "preference"  # pref > pattern
    assert classify_py("a recurring event") == "pattern"  # pattern > event
    assert classify_py("it occurred; we noticed") == "event"  # event > observation
    assert classify_py("we noticed things") == "observation"
    assert classify_py("plain statement") == "fact"
    # substring semantics: 'goals' contains 'goal'
    assert classify_py("our goals") == "goal"
    # case-insensitive
    assert classify_py("DECIDED") == "decision"


def test_title_derivation():
    assert title_py("## My Title \nbody") == "My Title"
    assert title_py("plain first line\nrest") == "plain first line"
    long = "x" * 300
    assert title_py(long) == "x" * 200  # byte-truncate at 200 (ingest.rs:107-111)
    assert title_py("") == "Untitled"


def test_spark_extract_matches_python(spark):
    from pyspark.sql import functions as F

    from cortex_spark.extract.html import extract_text_udf

    rows = [(render_html(gen_text(42, i), "en", f"u{i}"), gen_text(42, i)) for i in range(20)]
    df = spark.createDataFrame(rows, "html binary, expected string")
    bad = df.withColumn("got", extract_text_udf("html")).filter(F.col("got") != F.col("expected"))
    assert bad.count() == 0


def test_fused_matches_unfused(spark):
    """The single-pass mapInPandas kernel must produce bit-identical rows to
    the 3-UDF column path (same ids, kinds, titles, tags, embeddings)."""
    from cortex_spark.corpus import synth_pages
    from cortex_spark.extract.fused import pages_to_nodes_fused
    from cortex_spark.extract.pipeline import pages_to_nodes

    pages = synth_pages(spark, 60, seed=7, partitions=4).cache()
    a = pages_to_nodes(pages, embed_dim=32).orderBy("node_id")
    b = pages_to_nodes_fused(pages, embed_dim=32).orderBy("node_id")
    ra, rb = a.collect(), b.collect()
    assert len(ra) == len(rb) and len(ra) > 50
    for x, y in zip(ra, rb):
        assert x == y, f"mismatch: {x}\n!=\n{y}"
    pages.unpersist()


def test_title_col_byte_truncation_parity(spark):
    """title_col now byte-truncates on UTF-8 boundaries exactly like the
    Python/Rust reference (title_py), including mid-char cuts with 2-, 3-
    and 4-byte characters."""
    from pyspark.sql import functions as F

    from cortex_spark.extract.classify import title_col, title_py

    cases = [
        "x" * 250,                        # pure ASCII over the cap
        "é" * 150,                        # 2-byte chars: 300 bytes, cut at 200 (even)
        "a" + "é" * 150,                  # odd offset → mid-char cut at byte 200
        "€" * 100,                        # 3-byte chars: cut 200 → mid-char (200 % 3 ≠ 0)
        "ab" + "€" * 100,                 # shifted 3-byte grid
        "🚀" * 60,                        # 4-byte chars: 240 bytes, 200 mid-char
        "abc🚀" * 30,                     # mixed grid
        "## Héading with ünïcode\nbody",  # under the cap, strip/trim path
        "short",
        "",                               # empty → 'Untitled' (ingest.rs)
    ]
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = [r["t"] for r in df.select(title_col(F.col("text")).alias("t")).collect()]
    want = [title_py(t) for t in cases]
    assert got == want
    assert all(len(t.encode()) <= 200 for t in got)


def test_extract_text_multibyte_and_entities():
    """Byte-identity invariant holds on non-ASCII input: UTF-8 passthrough,
    named/decimal/hex character references, invalid bytes → U+FFFD."""
    from cortex_spark.extract.html import extract_text_py

    assert extract_text_py(b"<p>caf\xc3\xa9 &eacute; &#233; &#x1F680;</p>") == "café é é \U0001f680"
    assert extract_text_py(b"<p>broken \xff bytes</p>") == "broken � bytes"
