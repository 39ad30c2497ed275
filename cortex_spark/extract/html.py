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


# ── fast tokenizer ─────────────────────────────────────────────────────────
#
# html.parser.HTMLParser scans char-by-char with many small regex matches
# (70% of the extract kernel's profile). This tokenizer walks the document
# with ONE compiled regex and drives the SAME _TextExtractor handler object,
# so the emitted text is identical by construction wherever the fast path
# accepts the input. Anything it is not bit-sure about — a stray '<' in
# text, an unquoted attribute value containing '/', processing instructions,
# CDATA sections, end tags with attributes/whitespace — makes it bail and
# the document re-parses from scratch with the stdlib parser.
# tests/test_html_fast.py asserts parity on the synthetic corpus and on the
# adversarial/fallback cases.

import re as _re
from html import unescape as _unescape

_TOKEN_RE = _re.compile(
    r"<!--.*?-->"  # comment (handler: no-op)
    r"|<!DOCTYPE[^>]*>"  # doctype (handler: no-op)
    r"|</([a-zA-Z][a-zA-Z0-9]*)>"  # end tag, no attrs/space (else: fallback)
    r"|<([a-zA-Z][a-zA-Z0-9]*)((?:[^<>\"']|\"[^\"]*\"|'[^']*')*)>",  # start tag
    _re.DOTALL | _re.IGNORECASE,
)
_QUOTED_RE = _re.compile(r"\"[^\"]*\"|'[^']*'")
_CDATA_TAGS = ("script", "style")  # HTMLParser raw-text mode


def _fast_feed(html: str, p: _TextExtractor) -> bool:
    """Drive `p`'s handlers over `html`; False = input too unusual, re-parse
    with the stdlib parser (caller uses a fresh handler)."""
    pos, n = 0, len(html)
    search = _TOKEN_RE.search
    while pos < n:
        m = search(html, pos)
        data = html[pos : m.start()] if m else html[pos:]
        if data:
            if "<" in data:
                return False  # stray '<' — stdlib parser has its own rules
            p.handle_data(_unescape(data) if "&" in data else data)
        if not m:
            return True
        if m.group(1) is not None:  # </tag>
            p.handle_endtag(m.group(1).lower())
        elif m.group(2) is not None:  # <tag ...>
            tag = m.group(2).lower()
            attrs = m.group(3)
            if "/" in attrs or "&" in attrs:
                # self-closing vs unquoted-value-with-slash needs the
                # stdlib attribute grammar; entity-bearing attrs ditto
                noq = _QUOTED_RE.sub("", attrs)
                if "/" in noq or "&" in noq:
                    return False
            p.handle_starttag(tag, [])
            if tag in _CDATA_TAGS:
                # raw-text content: no tags, no charrefs until </tag
                m2 = _re.compile(rf"</\s*{tag}", _re.IGNORECASE).search(html, m.end())
                if m2 is None:
                    p.handle_data(html[m.end() :])
                    return True
                p.handle_data(html[m.end() : m2.start()])
                pos = m2.start()
                continue
        pos = m.end()
    return True


def extract_text_py(html: bytes | str | None) -> str:
    """Pure-Python single-value extraction (used by tests and the UDF)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    if not _fast_feed(html, p):
        p = _TextExtractor()  # fresh state: the stdlib parser re-reads all
        p.feed(html)
    p.close()
    return "\n".join(p.lines).strip("\n")


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction kernel: Series[bytes] → Series[str]."""
    return html.map(extract_text_py)
