"""Text-analysis operators for training-data pipelines.

All pure JVM expressions (split/regexp/aggregate/transform) — no
Python in the hot path. These are the per-document analogs of the
per-turn text features in fte.features.library, aimed at corpus
curation at 100 TB: language ID, quality scoring, token counting,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny stopword profiles for an n-gram-free language-ID heuristic:
# score(lang) = fraction of tokens that are stopwords of that lang.
# Deliberately small + deterministic; real deployments swap in a model
# via the same column contract.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ich", "ein", "zu", "mit"),
    "fr": ("le", "la", "les", "et", "des", "est", "un", "une", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que", "por", "con"),
}

# BPE-ish token regex: words, numbers, or single non-space symbols —
# a cheap proxy for subword tokenizers' pre-tokenization.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != F.lit(""))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (empty string → 0)."""
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count via regexp extraction."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0))).cast("long")


def lang_scores(col: Column | str) -> dict[str, Column]:
    toks = F.transform(tokens(col), lambda w: F.lower(w))
    out = {}
    for lang, words in LANG_PROFILES.items():
        sw = F.array([F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))
        out[lang] = (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")
    return out


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """argmax over stopword-profile scores; 'und' (undetermined) when
    no profile scores > 0."""
    scores = lang_scores(text_col)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(l).alias("lang")) for l, s in scores.items()]
    )
    best = F.array_max(pairs)
    return df.withColumn(
        out_col, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    ).withColumn("lang_score", best["score"])


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristics (Gopher/C4-style cheap filters):
    char/token counts, mean word length, stopword/punct/upper/digit
    ratios, and a [0,1] composite score. All one projection."""
    c = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    sw = F.array([F.lit(w) for w in LANG_PROFILES["en"]])
    stop_ratio = F.size(F.filter(toks, lambda w: F.array_contains(sw, F.lower(w)))) / F.greatest(n_tok, F.lit(1))
    punct_ratio = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")) / F.greatest(n_chars, F.lit(1))
    upper_ratio = F.length(F.regexp_replace(c, r"[^A-Z]", "")) / F.greatest(n_chars, F.lit(1))
    digit_ratio = F.length(F.regexp_replace(c, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1))
    mean_word_len = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        / F.greatest(n_tok, F.lit(1))
    )
    score = (
        F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 2) & (mean_word_len <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((punct_ratio <= 0.2) & (upper_ratio <= 0.3) & (digit_ratio <= 0.3), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("mean_word_len", mean_word_len.cast("double"))
        .withColumn("stopword_ratio", stop_ratio.cast("double"))
        .withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("upper_ratio", upper_ratio.cast("double"))
        .withColumn("digit_ratio", digit_ratio.cast("double"))
        .withColumn("quality_score", score.cast("double"))
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: xxhash64 of whitespace-normalized,
    lowercased text — robust to formatting-only edits. Used as the
    exact-dedup key at scale (group on 64-bit int, not the raw text)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.xxhash64(norm))
