"""Text analysis operators over `documents` — language-ID heuristic,
quality scoring, token counting, document fingerprinting. All built-in
column expressions (whole-stage codegen; zero UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

# tiny marker-word profiles (public stopword lists, truncated)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "las", "que", "es", "con", "una"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une"],
}

STOPWORDS = LANG_MARKERS["en"]


def _count_in(tok_col, words: list[str]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok_col, lambda w: F.array_contains(arr, w)))


def token_count(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Whitespace/punct token count + BPE-ish subword estimate
    (chars/4 heuristic, the common rule of thumb)."""
    tok = tokens(text_col)
    return df.select(
        id_col,
        F.size(tok).alias("n_tokens"),
        F.ceil(F.length(text_col) / 4).cast("bigint").alias("n_subwords_est"),
        F.size(F.array_distinct(tok)).alias("n_unique_tokens"),
    )


def quality_score(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Composite quality heuristics: length, mean word length, stopword
    ratio, punctuation ratio, uniqueness ratio — rounded for cross-
    engine comparison."""
    tok = tokens(text_col)
    n_tok = F.size(tok)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9 ]", ""))
    stop = _count_in(tok, STOPWORDS)
    uniq = F.size(F.array_distinct(tok))
    score = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.4
        + (stop / F.greatest(n_tok, F.lit(1))) * 0.3
        + (uniq / F.greatest(n_tok, F.lit(1))) * 0.3
    )
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(uniq / F.greatest(n_tok, F.lit(1)), 4).alias("unique_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Marker-word language ID with deterministic ties (en>de>es>fr
    priority order)."""
    tok = tokens(text_col)
    counts = {lang: _count_in(tok, words) for lang, words in LANG_MARKERS.items()}
    pred = (
        F.when(
            (counts["en"] >= counts["de"]) & (counts["en"] >= counts["es"]) & (counts["en"] >= counts["fr"]),
            F.lit("en"),
        )
        .when((counts["de"] >= counts["es"]) & (counts["de"] >= counts["fr"]), F.lit("de"))
        .when(counts["es"] >= counts["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    sel = [F.col(id_col)]
    for lang in LANG_MARKERS:
        sel.append(counts[lang].alias(f"n_{lang}"))
    sel.append(pred.alias("lang_pred"))
    return df.select(*sel)


def fingerprint(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set (robust to reordering/duplication — the cheap
    winnowing stand-in), plus the exact content hash."""
    tok = tokens(text_col)
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("content_hash"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tok)))).alias("token_set_hash"),
    )
