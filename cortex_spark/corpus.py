"""Deterministic synthetic web-page corpus (the `pages` input table).

Generates Common-Crawl-style rows (url, warc_ts, html, text, lang) per
FIXTURES.md §1, distributed via `mapInPandas` over `spark.range(n)` so the
100k-row bench corpus is built executor-side (no driver loop, no external
data).  Properties engineered into the corpus:

- Zipf-skewed head domains (~top-3 domains take >20% of rows) — exercises
  AQE skew handling / salting exactly as the north rule demands.
- warc_ts clustered in ±30-min windows (8 docs per cluster center inside a
  90-day range) — exercises the TemporalProximity rule (linker/rules.rs:97).
- markdown-ish text with '#'-heading sections → both chunkers hit
  (ingest.rs:148-176); controlled keyword injections cover every classifier
  kind including priority-conflict cases (ingest.rs:181-211).
- shared entity tokens drive embedding similarity; every 17th doc is a
  near-duplicate of its predecessor (dedup 0.92/0.98 thresholds), and every
  23rd doc injects a negation word (contradiction rule, rules.rs:360-380).
- ~90% en, rest de/fr; non-en rows are filtered by the extract stage.

The HTML template wraps the text with nav/script/style/footer boilerplate
such that `extract_text_py(render_html(text)) == text` byte-identically —
the per-url golden invariant.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone
from html import escape

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cortex_spark.schemas import PAGES

BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)
N_DOMAINS = 50
CLUSTER_SIZE = 8  # docs per ±30-min temporal cluster

_BASE_WORDS = (
    "graph memory engine node edge vector index spark batch shuffle "
    "partition query latency storage schema corpus crawl entity relation "
    "pipeline lineage metric checkpoint cluster domain token embed"
).split()
# widen the vocabulary so unrelated documents are actually dissimilar
# (cosine baseline ≈ 0) — similarity comes from PLANTED near-dups/entities,
# not from global vocab overlap, mirroring real web text.
_WORDS = _BASE_WORDS + [f"term{i:03d}" for i in range(400)] + [
    # multibyte tokens: real web text is not ASCII — these exercise the
    # byte-exact paths (extraction byte-identity, title byte-truncation,
    # UTF-8 md5 tokenization) end to end in every synth corpus
    "café", "münchen", "façade", "naïve", "zürich", "résumé",
    "données", "straße", "日本語", "тест", "señor", "🚀",
]
_ENTITIES = [f"entity{i:03d}" for i in range(120)]
_KIND_SNIPPETS = [
    "we decided to adopt this approach",  # decision
    "the goal is broad coverage",  # goal
    "we prefer columnar layouts",  # preference
    "a recurring pattern appears here",  # pattern
    "the incident occurred at midnight",  # event
    "we noticed unusual latencies",  # observation
    "throughput stays stable",  # fact
    "the team chose a new target",  # decision (conflict case: chose > goal)
]
_NEGATION = "this claim is no longer valid"
_LANGS = ["en"] * 18 + ["de", "fr"]


def _rng(seed: int, i: int) -> np.random.Generator:
    h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "big"))


def _domain(rng: np.random.Generator) -> str:
    # Zipf(1.4) over 50 domains → heavy head
    d = min(int(rng.zipf(1.4)) - 1, N_DOMAINS - 1)
    return f"site{d:02d}.example.com"


def gen_text(seed: int, i: int) -> str:
    rng = _rng(seed, i)
    n_sections = int(rng.integers(1, 5))
    ents = rng.choice(_ENTITIES, size=int(rng.integers(2, 6)), replace=False)
    lines: list[str] = []
    # rng.choice(arr, size=m) with replacement draws exactly
    # rng.integers(0, len(arr), size=m) under the hood but pays ~10x numpy
    # dispatch overhead per call (shape checks, np.prod) — generation was
    # 70% of the extract stage's task time in rng.choice. Indexing the
    # python list with the same integer draws is BIT-IDENTICAL (stream and
    # values; asserted by tests/test_corpus_stream.py) and ~3x faster per
    # page. The replace=False draw above keeps using choice: its Floyd
    # sampling consumes the stream differently and is not worth replicating.
    for s in range(n_sections):
        words = [_WORDS[j] for j in rng.integers(0, len(_WORDS), size=3)]
        lines.append(f"# Section {s} {' '.join(words)} {ents[s % len(ents)]}")
        n_lines = int(rng.integers(2, 6))
        for _ in range(n_lines):
            n_words = int(rng.integers(6, 14))
            sent = " ".join(_WORDS[j] for j in rng.integers(0, len(_WORDS), size=n_words))
            ent = ents[int(rng.integers(0, len(ents)))]
            lines.append(f"{sent} {ent}.")
        if rng.random() < 0.55:
            lines.append(_KIND_SNIPPETS[int(rng.integers(0, len(_KIND_SNIPPETS)))] + ".")
    if i % 23 == 0:
        lines.append(_NEGATION + ".")
    text = "\n".join(lines)
    if i % 17 == 0 and i > 0:
        # near-duplicate of predecessor: same text, one token appended
        text = gen_text(seed, i - 1) + "\nminor addendum line."
    return text


def render_html(text: str, lang: str, url: str) -> bytes:
    body_html: list[str] = []
    for line in text.split("\n"):
        if line.startswith("#"):
            level = min(len(line) - len(line.lstrip("#")), 6)
            content = line.lstrip("#")[1:] if line.lstrip("#").startswith(" ") else line.lstrip("#")
            # reconstructable: extractor re-adds '#'*level + ' ' + strip()
            body_html.append(f"<h{level}>{escape(content, quote=False)}</h{level}>")
        else:
            body_html.append(f"<p>{escape(line, quote=False)}</p>")
    doc = (
        f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8">'
        f"<title>{escape(url, quote=False)}</title>"
        "<script>var t=Date.now();</script><style>.nav{color:#333}</style></head>"
        '<body><nav><a href="/">Home</a> <a href="/about">About</a></nav>'
        "<main>" + "".join(body_html) + "</main>"
        "<footer>&copy; 2026 Example Corp &middot; crawled content</footer>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def gen_row(seed: int, i: int, skew: bool = False) -> dict:
    """`skew=True` cranks the corpus to crawl-shaped pathology (round-5
    stretch leg): every 3rd page is a near-duplicate of one of 100
    boilerplate base pages (the real-web template/mirror regime — giant
    near-dup clusters ⇒ hot LSH buckets and heavy dedup components) and
    head domains draw from Zipf(2.0) (top domain ≈60% of rows) instead of
    the default Zipf(1.4). Default False is bit-identical to round ≤4."""
    rng = _rng(seed, i)
    lang = str(_LANGS[int(rng.integers(0, len(_LANGS)))])
    text = gen_text(seed, i)
    if skew and i % 3 == 0 and i >= 100:
        # boilerplate mirror: base page body + a tiny per-page line
        text = gen_text(seed, i % 100) + f"\nmirror variant {i}."
    domain = _domain(rng)
    if skew:
        d = min(int(rng.zipf(2.0)) - 1, N_DOMAINS - 1)
        domain = f"site{d:02d}.example.com"
    url = f"https://{domain}/page/{i}"
    cluster = i // CLUSTER_SIZE
    center = BASE_TS + timedelta(seconds=int(_rng(seed, 10_000_000 + cluster).integers(0, 90 * 86400)))
    ts = center + timedelta(seconds=int(rng.integers(-1800, 1801)))
    return {
        "url": url,
        "warc_ts": ts.replace(tzinfo=None),
        "html": render_html(text, lang, url),
        "text": text,
        "lang": lang,
    }


def synth_pages(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None,
    skew: bool = False,
) -> DataFrame:
    """Distributed deterministic corpus: spark.range(n) → mapInPandas."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_row(seed, int(i), skew) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=parts).mapInPandas(build, schema=PAGES)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a pages table from the driver's read-only documents.parquet.

    Deterministic mapping (no external data): url from (source, doc_id),
    html = render_html(text), golden text = documents.text verbatim — so the
    byte-identical extraction invariant is SQL-checkable against the raw
    documents table.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "url": [
                        f"https://{s}.example.com/doc/{d}" for s, d in zip(pdf["source"], pdf["doc_id"])
                    ],
                    "warc_ts": [
                        (BASE_TS + timedelta(seconds=int(d) * 60)).replace(tzinfo=None)
                        for d in pdf["doc_id"]
                    ],
                    "html": [
                        render_html(t, lg, f"https://{s}.example.com/doc/{d}")
                        for t, lg, s, d in zip(pdf["text"], pdf["lang"], pdf["source"], pdf["doc_id"])
                    ],
                    "text": pdf["text"],
                    "lang": pdf["lang"],
                }
            )
            yield out

    return docs.select("doc_id", "text", "lang", "source").mapInPandas(build, schema=PAGES)
