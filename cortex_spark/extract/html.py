"""Deterministic HTML → text extraction (the ingest front door).

The reference ingests plain .md/.txt files (briefing/ingest.rs:39-73); the
north rule replaces that with HTML→text over a Common-Crawl-style page table
with the invariant *byte-identical extracted text per url*. To guarantee
byte-stability across platforms/library versions the parser is pure stdlib
(`html.parser.HTMLParser`) with fully specified whitespace semantics:

- content of <script>/<style>/<nav>/<header>/<footer>/<aside>/<template>
  and HTML comments is dropped (boilerplate removal),
- each block element (<h1>..<h6>, <p>, <li>, <pre>, <blockquote>, <td>,
  <div>, <br>) closes the current line,
- <h1>..<h6> text is prefixed with `#`·level + space (markdown-ish, so the
  downstream markdown chunker — reference ingest.rs:148-166 — sees headings),
- entity/char refs are decoded (convert_charrefs), inner whitespace of a
  line is preserved verbatim, lines are joined with '\n', and the result is
  stripped of leading/trailing blank lines.

Runs as an Arrow-batched pandas UDF (binary → string); no per-row Python at
the DataFrame API level.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_SKIP_TAGS = {"script", "style", "nav", "header", "footer", "aside", "template", "title", "head"}
_BLOCK_TAGS = {
    "p",
    "div",
    "li",
    "ul",
    "ol",
    "pre",
    "blockquote",
    "table",
    "tr",
    "td",
    "th",
    "section",
    "article",
    "main",
    "body",
    "h1",
    "h2",
    "h3",
    "h4",
    "h5",
    "h6",
}
_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_VOID_TAGS = {"br", "hr", "img", "meta", "link", "input"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.lines: list[str] = []
        self._buf: list[str] = []
        self._skip_depth = 0
        self._heading_level = 0

    def _flush(self) -> None:
        line = "".join(self._buf)
        self._buf = []
        if line.strip():
            if self._heading_level:
                line = "#" * self._heading_level + " " + line.strip()
            self.lines.append(line)

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in ("br", "hr"):
            self._flush()
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _HEADINGS:
                self._heading_level = _HEADINGS[tag]

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _HEADINGS:
                self._heading_level = 0

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            self._buf.append(data)

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def extract_text_py(html: bytes | str | None) -> str:
    """Pure-Python single-value extraction (used by tests and the UDF)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return "\n".join(p.lines).strip("\n")


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction kernel: Series[bytes] → Series[str]."""
    return html.map(extract_text_py)
