"""Parity of the regex fast-path tokenizer with the stdlib HTMLParser path.

The fast path must either produce byte-identical text or refuse (return
False) so extract_text_py re-parses with html.parser. Cases cover the
synthetic corpus, the driver-documents rendering, and the adversarial
shapes the tokenizer is supposed to bail on."""

from __future__ import annotations

from cortex_spark.corpus import gen_row, render_html
from cortex_spark.extract.html import _fast_feed, _TextExtractor, extract_text_py


def _stdlib(html: str) -> str:
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return "\n".join(p.lines).strip("\n")


def _fast(html: str):
    p = _TextExtractor()
    ok = _fast_feed(html, p)
    if not ok:
        return None
    p.close()
    return "\n".join(p.lines).strip("\n")


def test_corpus_parity_and_fast_path_taken():
    taken = 0
    for i in range(400):
        html = gen_row(42, i)["html"].decode("utf-8")
        fast = _fast(html)
        if fast is not None:
            taken += 1
            assert fast == _stdlib(html)
        assert extract_text_py(html) == _stdlib(html)
    # the generated corpus must ride the fast path, else the optimization
    # is dead weight
    assert taken == 400


ADVERSARIAL = [
    "plain text, no markup at all & an amp",
    "<p>a < b</p>",  # stray '<' in text -> fallback
    "<p>ent &amp; &lt;done&gt; &#65; &#x42; &unknown; &amp</p>",
    "<script>if (a<b && c>d) { x('</div>'); }</script><p>after</p>",
    "<script>no closing tag at all",
    "<style>.x{color:#333}</style><p>styled</p>",
    '<a href="/about">quoted slash</a><p>t</p>',
    "<br/><p>self closing</p>",  # '/' outside quotes -> fallback
    "<a href=/about>unquoted slash</a>",  # -> fallback
    "<p attr='sq \"dq\" <notatag>'>nested quotes</p>",
    "<P>UPPER</P><H2>head</H2>",
    "<!-- comment <p>not text</p> --><p>real</p>",
    "<!DOCTYPE html><html><body><p>x</p></body></html>",
    "<div><div><p>nested</p></div></div>",
    "<nav>skip<p>inner block</p>still skip</nav><p>keep</p>",
    "<title>skip me</title><h3>kept</h3>",
    "<p>unterminated <",
    "<p>tab\tand  spaces   kept</p>",
    "<my-tag>custom</my-tag>",  # tag name the fast regex refuses
    "<p>日本語 тест 🚀 &amp; café</p>",
    "<pre>line1\nline2</pre>",
    "<p>a</p \n><p>weird end tag</p>",
    "<?php echo 1; ?><p>pi</p>",
    "<![CDATA[raw]]><p>cd</p>",
    "",
]


def test_adversarial_parity():
    for html in ADVERSARIAL:
        assert extract_text_py(html) == _stdlib(html), html


def test_driver_documents_rendering_parity():
    # the exact shape pages_from_documents renders
    html = render_html(
        "# Heading one\nbody line & entity test\n## sub\nmore", "en",
        "https://src.example.com/doc/7",
    ).decode("utf-8")
    fast = _fast(html)
    assert fast is not None and fast == _stdlib(html)
