"""Text-analysis operators for training-data pipelines (all JVM-side
Catalyst expressions — no Python in the hot path, exact SQL oracles).

- token counting (whitespace tokenizer, same semantics as the index)
- quality scoring: length / alphabetic-ratio / stopword-ratio features
- language ID: marker-stopword-overlap heuristic (argmax with fixed
  tie-break order) — a deterministic n-gram-free baseline
- document fingerprint: sha256 over whitespace-normalized lowercase text
  (exact-dedup key)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"\s+"

STOPWORDS = ("the", "a", "of", "and", "in", "to")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "das", "und"),
    "zh": ("的", "是", "了", "在"),
}


def tokens_col(col: Column) -> Column:
    return F.split(F.lower(col.cast("string")), WS)


def token_count(col: Column) -> Column:
    return F.size(F.filter(tokens_col(col), lambda t: t != F.lit("")))


# GPT-2-style pretokenizer regex, restricted to the Java-regex / RE2 common
# subset (ASCII classes, no lookahead) so Spark and the DuckDB oracle count
# identically: contractions | space-prefixed letter runs | digit runs |
# punctuation runs | whitespace runs.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: number of pretokenizer matches (the standard
    first stage of GPT-2/tiktoken-family tokenizers; real BPE merges only
    split these further, so this lower-bounds and tracks true token counts)."""
    return F.regexp_count(col.cast("string"), F.lit(BPE_PRETOKEN_RE))


def normalized_text(col: Column) -> Column:
    """lower + collapse whitespace + trim: the canonical dedup form."""
    return F.trim(F.regexp_replace(F.lower(col.cast("string")), WS, " "))


def fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint (sha256 of normalized text)."""
    return F.sha2(normalized_text(col), 256)


def stopword_ratio(col: Column, stopwords=STOPWORDS) -> Column:
    toks = tokens_col(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(list(stopwords))))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    s = col.cast("string")
    kept = F.length(F.regexp_replace(s, "[^A-Za-z ]", ""))
    return F.when(F.length(s) > 0, kept / F.length(s)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length docs with high
    alphabetic content and a natural stopword rate."""
    n = token_count(col)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.4 * alpha_ratio(col) + 0.2 * F.least(
            stopword_ratio(col) * 5.0, F.lit(1.0)
        ),
        6,
    )


def lang_scores(col: Column) -> dict[str, Column]:
    toks = F.array_distinct(tokens_col(col))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax over marker-overlap scores; ties break in LANG_MARKERS order;
    zero overlap everywhere -> 'unknown'."""
    scores = lang_scores(col)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[l] for l in langs]) if len(langs) > 1 else scores[langs[0]]
    out = F.lit("unknown")
    for lang in reversed(langs):  # earlier langs win ties: apply last
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with the full feature set (keyed by all original
    columns so callers can join back)."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.round(alpha_ratio(c), 6).alias("alpha_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        quality_score(c).alias("quality_score"),
        lang_id(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )


def redact(col: Column, patterns, replacement: str = "[REDACTED]") -> Column:
    """PII-scrub shape: replace every match of each regex (in order) with
    ``replacement`` — a chain of JVM-side ``regexp_replace`` calls, global
    per pattern (Spark semantics; the SQL-oracle twin needs the 'g' flag).
    Keep patterns in the Java-regex / RE2 common subset so engine and
    oracle agree (same rule as BPE_PRETOKEN_RE)."""
    out = col.cast("string")
    for p in patterns:
        out = F.regexp_replace(out, p, replacement)
    return out
