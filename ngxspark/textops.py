"""Text-analysis operators for training-data pipelines over `documents`.

Everything here is pure JVM expressions (whole-stage codegen, no Python):
token counting, quality scoring, language-ID heuristic, fingerprinting.
Hashes use md5 so the DuckDB oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny English stopword set for the language-ID / quality heuristics
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization (single-space split; matches DuckDB string_split)."""
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_token_count(col: Column) -> Column:
    """BPE-ish regex tokens: words, numbers, or single punctuation marks."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def alpha_ratio(col: Column) -> Column:
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return alpha / F.greatest(F.length(col), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    alphabetic density. Deterministic, SQL-expressible."""
    n = token_count(col)
    len_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) > 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + stop_ok + alpha_ratio(col)) / 3.0, 4)


def lang_id(col: Column) -> Column:
    """n-gram/stopword heuristic language ID: 'en' when English stopwords
    are present, 'unknown' otherwise (the synthetic corpus is en-only;
    real corpora would extend the dictionary per language)."""
    return F.when(stopword_ratio(col) > 0.01, F.lit("en")).otherwise(F.lit("unknown"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the lower-cased, space-normalized text
    (content-defined identity for exact/near-exact dedup)."""
    return F.md5(F.regexp_replace(F.lower(col), r"\s+", " "))


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        word_token_count(t).alias("n_word_tokens"),
        F.length(t).alias("n_chars_measured"),
        F.round(stopword_ratio(t), 4).alias("stopword_ratio"),
        F.round(alpha_ratio(t), 4).alias("alpha_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
