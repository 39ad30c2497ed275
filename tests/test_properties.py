"""Property-based tests (hypothesis) over the pure scalar kernels —
invariants that hold for ALL inputs, complementing the golden fixtures.
No SparkSession needed: these drive the Python mirrors that the column
kernels are pytest-pinned against elsewhere."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cortex_spark.extract.chunk import chunk_markdown, chunk_plain, chunk_text
from cortex_spark.extract.classify import classify_py, title_py

KINDS = {"decision", "goal", "preference", "pattern", "event", "observation", "fact"}

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=600
)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_title_always_within_byte_cap_and_single_line(t):
    out = title_py(t)
    assert len(out.encode("utf-8")) <= 200
    assert "\n" not in out
    assert out == out.strip() or out == "Untitled"


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_classifier_total_and_deterministic(t):
    k = classify_py(t)
    assert k in KINDS
    assert classify_py(t) == k


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_chunk_plain_partition_properties(t):
    chunks = chunk_plain(t)
    # every chunk is non-empty after trim, and ≤ 20 lines
    for c in chunks:
        assert c.strip()
        assert len(c.split("\n")) <= 20
    # chunks appear in order as disjoint line ranges of the original
    lines = t.split("\n")
    pos = 0
    for c in chunks:
        cl = c.split("\n")
        while lines[pos : pos + len(cl)] != cl:
            pos += 1
            assert pos + len(cl) <= len(lines), "chunk lines not found in order"
        pos += len(cl)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_chunk_markdown_covers_all_content(t):
    chunks = chunk_markdown(t)
    for c in chunks:
        assert c == c.strip() and c
    # concatenated chunk content preserves every non-whitespace character
    # of the input, in order (splitting only removes line boundaries/space)
    def squash(s):
        return "".join(s.split())

    assert squash("".join(chunks)) == squash(t)


@settings(max_examples=100, deadline=None)
@given(text_st, st.sampled_from([None, "markdown", "plain"]))
def test_chunk_text_total(t, fmt):
    chunks = chunk_text(t, fmt)
    assert isinstance(chunks, list)
    if not t:
        assert chunks == []
    for c in chunks:
        assert isinstance(c, str) and c.strip()
