"""Text-analysis column functions for large-scale corpus pipelines.

- has_negation_col: the contradiction rule's negation-word test
  (reference linker/rules.rs:360-380 word list, substring semantics).
- lang_id_col: stopword-hit n-gram heuristic language ID (en/de/fr/es, else
  'und') — a training-data-pipeline first-class op (no external models).
- quality_score_col: length / punctuation / stopword-ratio quality signal.
- token_count_col: whitespace + BPE-ish subword estimate.
- fingerprint_col: 64-bit document fingerprint (xxhash64 of normalized text).

All native expressions — these run over 10^12 documents, so they must stay
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NEGATION_WORDS = [
    "not",
    "never",
    "no longer",
    "stopped",
    "removed",
    "deprecated",
    "replaced",
    "obsolete",
]

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "pour", "que"],
    "es": ["el", "la", "de", "que", "los", "es", "una", "por", "con", "para"],
}


def has_negation_col(title: Column, body: Column) -> Column:
    """Case-insensitive substring over `title + ' ' + body` (rules.rs:369-378)."""
    text = F.lower(F.concat_ws(" ", F.coalesce(title, F.lit("")), F.coalesce(body, F.lit(""))))
    cond = None
    for w in NEGATION_WORDS:
        c = text.contains(w)
        cond = c if cond is None else (cond | c)
    return cond


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^\p{L}]+"), lambda t: t != "")


def lang_id_col(text: Column) -> Column:
    """Pick the language whose stopword list hits the most tokens; ties go to
    the earlier language in (en, de, fr, es); 'und' when nothing hits."""
    toks = _tokens(text)
    hits = {
        lang: F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))
        for lang, words in _STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in _STOPWORDS:  # insertion order = tie-break priority
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def token_count_col(text: Column) -> Column:
    """Whitespace token count; BPE-ish estimate ≈ ceil(chars/4) blended."""
    ws = F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))
    return ws


def subword_estimate_col(text: Column) -> Column:
    return F.ceil(F.length(text) / F.lit(4.0)).cast("bigint")


def quality_score_col(text: Column) -> Column:
    """Composite quality ∈ [0,1]: length band + alpha ratio + stopword ratio.

    score = 0.4·min(1, n_tokens/100) + 0.3·alpha_ratio + 0.3·min(1, 5·stop_ratio)
    """
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.greatest(F.length(text), F.lit(1))
    en_stops = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stops, t)))
    stop_ratio = stop_hits / F.greatest(n, F.lit(1)).cast("double")
    return (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * alpha
        + F.lit(0.3) * F.least(F.lit(1.0), F.lit(5.0) * stop_ratio)
    )


def fingerprint_col(text: Column) -> Column:
    """Order-stable 64-bit fingerprint of whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.xxhash64(norm)


def truncate_annotated(s: str, max_chars: int) -> str:
    """Char-safe truncate appending " [truncated]" when there is room
    (reference briefing/renderer.rs:27-53; char-based, unlike the byte-based
    title slice in ingest.rs:107-111 — SURVEY §2.10 keeps both straight)."""
    if len(s) <= max_chars:
        return s
    suffix = " [truncated]"
    if max_chars > len(suffix) + 2:  # reference uses literal 14 == len + 2
        return s[: max_chars - 14] + suffix
    return s[:max_chars]


def body_preview(s: str, max_chars: int) -> str:
    """Preview with "..." (renderer.rs:56-68)."""
    if len(s) <= max_chars:
        return s
    return s[: max(max_chars - 3, 0)] + "..."


def pluralize_section(kind: str) -> str:
    """Section naming: Title Case + naive pluralisation
    (briefing/engine.rs:27-62)."""
    title = kind.replace("-", " ").replace("_", " ").title()
    if title.endswith(("s", "x", "ch", "sh")):
        return title + "es"
    if title.endswith("y") and len(title) > 1 and title[-2].lower() not in "aeiou":
        return title[:-1] + "ies"
    return title + "s"
