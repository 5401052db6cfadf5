"""Text-analysis operators for training-data pipelines.

All pure JVM whole-stage-codegen expressions (regexp_count /
regexp_replace / length / xxhash64) — no Python, and no interpreted
higher-order-function lambdas in the hot path (per-token HOF filters
made lang_id the slowest doc query; rewritten as one boundary-anchored
regexp_count per profile). These are the per-document analogs of the
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
    """Whitespace token count (empty string → 0): number of maximal
    non-space runs via regexp_count — pure JVM codegen, no per-token
    interpreted lambda (identical to size(tokens(col)))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"\S+")).cast("long")


def _stopword_hits(c: Column, words: tuple[str, ...]) -> Column:
    """Count of whitespace tokens (case-folded) equal to any of
    ``words``: one codegen regexp_count with whitespace-boundary
    lookarounds — exactly size(filter(toks, w -> w IN words)) without
    the interpreted per-token lambda (~100µs/element; lang_id was the
    slowest doc query before this rewrite). Words must be regex-safe
    (alphabetic); boundaries are (?<=^|\\s)/(?=\\s|$), the same \\s
    class tokens() splits on, so a match is a FULL token."""
    pat = r"(?<=^|\s)(" + "|".join(words) + r")(?=\s|$)"
    return F.regexp_count(F.lower(c), F.lit(pat))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count via regexp extraction."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0))).cast("long")


def lang_scores(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    out = {}
    for lang, words in LANG_PROFILES.items():
        hits = _stopword_hits(c, words)
        out[lang] = (hits / F.greatest(n_tok, F.lit(1))).cast("double")
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
    # all-codegen formulation: token count = non-space runs, sum of
    # token lengths = non-space char count — no interpreted HOF folds
    n_tok = token_count(c).cast("int")
    n_chars = F.length(c)
    stop_ratio = _stopword_hits(c, LANG_PROFILES["en"]) / F.greatest(n_tok, F.lit(1))
    punct_ratio = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")) / F.greatest(n_chars, F.lit(1))
    upper_ratio = F.length(F.regexp_replace(c, r"[^A-Z]", "")) / F.greatest(n_chars, F.lit(1))
    digit_ratio = F.length(F.regexp_replace(c, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1))
    mean_word_len = (
        F.length(F.regexp_replace(c, r"\s", "")).cast("long")
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


def winnow_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 3, window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS rolling-fingerprint scheme): hash every
    word k-gram, slide a window of ``window`` consecutive gram hashes,
    keep the minimum of each window, emit the distinct selected hashes
    per doc. Guarantees: any shared run of ≥ k+window-1 words between
    two docs shares at least one selected fingerprint, while storing
    only ~1/window of the grams.

    All whole-stage codegen: posexplode + lead-window grams (the
    shingle machinery) + a trailing MIN window + distinct — one shuffle
    on id_col. Hashes are md5 hex strings so a SQL oracle can reproduce
    them exactly (xxhash64 is Spark-only); swap to xxhash64 for
    production compactness. Docs with fewer than ``window`` grams emit
    the min over all their grams (the last gram's trailing window).

    Output: (id_col, fp string) distinct rows.
    """
    from pyspark.sql import Window

    c = F.col(text_col)
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    words = F.split(norm, " ")
    ex = df.select(
        F.col(id_col),
        norm.alias("_nt"),
        F.size(words).alias("_n"),
        F.posexplode(words).alias("_pos", "_w"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    gram = F.concat_ws(" ", F.col("_w"), *[F.lead("_w", j).over(w) for j in range(1, k)])
    last = F.lead("_w", k - 1).over(w) if k > 1 else F.col("_w")
    grams = (
        ex.withColumn("_gram", gram)
        .withColumn("_last", last)
        .filter(((F.col("_n") < k) & (F.col("_pos") == 0)) | F.col("_last").isNotNull())
        .select(
            id_col,
            F.col("_pos"),
            F.greatest(F.col("_n") - k + 1, F.lit(1)).alias("_ngrams"),
            F.when(F.col("_n") >= k, F.md5(F.col("_gram")))
            .otherwise(F.md5(F.col("_nt")))
            .alias("_gh"),
        )
    )
    wmin = Window.partitionBy(id_col).orderBy("_pos").rowsBetween(-(window - 1), 0)
    selected = (
        grams.withColumn("_sel", F.min("_gh").over(wmin))
        # emit one selection per full window; short docs emit the last
        # gram's (all-covering) trailing window
        .filter((F.col("_pos") >= window - 1) | (F.col("_pos") == F.col("_ngrams") - 1))
        .select(id_col, F.col("_sel").alias("fp"))
    )
    return selected.distinct()
