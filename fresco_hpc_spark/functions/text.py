"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

Not present in the reference (its data is numeric telemetry); added per the
engine's charter as first-class operators over the ``documents`` table.
Everything is Catalyst-native (regexp/length/split expressions) — no UDFs,
so the operators pipeline inside whole-stage codegen and scale linearly
with a parquet scan of just the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROUND = 6

# Marker-word inventories for the n-gram/stopword language heuristic.
# Deterministic tie-break: first language in this order wins ties.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|of|to|and|is|in|that|it|for)\b",
    "es": r"\b(el|la|de|que|y|en|un|una|por|con)\b",
    "fr": r"\b(le|la|de|et|les|des|un|une|dans|pour)\b",
    "de": r"\b(der|die|das|und|ist|von|mit|den|für|auf)\b",
}

EN_STOPWORDS = r"\b(the|a|of|to|and|is|in|that|it|for|on|with|as|at|by)\b"
PUNCT_PATTERN = r"[.,!?;:]"


def token_count(col: Column | str) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics + a composite quality score.

    quality = 0.4·min(words/50, 1) + 0.3·(1 − min(10·punct_ratio, 1))
            + 0.3·min(5·stopword_ratio, 1)
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_words = token_count(c)
    non_ws = F.length(F.regexp_replace(c, r"\s", ""))
    punct = F.regexp_count(c, F.lit(PUNCT_PATTERN))
    digits = F.regexp_count(c, F.lit(r"[0-9]"))
    stop = F.regexp_count(F.lower(c), F.lit(EN_STOPWORDS))
    denom_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    denom_words = F.greatest(n_words, F.lit(1)).cast("double")
    punct_ratio = punct / denom_chars
    stop_ratio = stop / denom_words
    quality = (
        F.lit(0.4) * F.least(n_words / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        F.round(non_ws / denom_words, _ROUND).alias("avg_word_len"),
        punct.cast("bigint").alias("punct_count"),
        digits.cast("bigint").alias("digit_count"),
        F.round(punct_ratio, _ROUND).alias("punct_ratio"),
        F.round(stop_ratio, _ROUND).alias("stopword_ratio"),
        F.round(quality, _ROUND).alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: count language-specific stopwords,
    argmax with deterministic first-wins tie-break."""
    lowered = F.lower(F.col(text_col))
    scores = {
        lang: F.regexp_count(lowered, F.lit(pat)).cast("bigint").alias(f"score_{lang}")
        for lang, pat in LANG_MARKERS.items()
    }
    scored = df.select(F.col(id_col), *scores.values())
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred: Column = F.lit("unknown")
    for lang in reversed(langs):  # first language wins ties → build backwards
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("unknown")).otherwise(pred)
    return scored.withColumn("predicted_lang", pred)


# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space
# symbols — the usual byte-pair-encoding pre-split shape.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_FP_MULT = 1_000_003
_FP_MOD = 2_147_483_647


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting both ways: whitespace tokens and BPE-ish regex
    tokens. Pure Catalyst expressions — counts stream through codegen."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).cast("bigint").alias("ws_tokens"),
        F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN)).cast("bigint").alias("bpe_tokens"),
    )


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Polynomial rolling-hash fingerprint over words.

    Each word contributes ``ascii(first_char)*256 + length(word)``; the
    hash folds left with ``acc = (acc*1000003 + v) mod (2^31-1)``. The
    running value stays < 2^31, so the bigint product never overflows —
    safe under ANSI mode and identical arithmetic in any engine.
    Order-sensitive (unlike the md5 fingerprint): permuted documents get
    different fingerprints, matching rolling-hash fingerprinting
    semantics."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    vals = F.transform(
        words, lambda w: F.ascii(F.substring(w, 1, 1)).cast("bigint") * 256 + F.length(w)
    )
    fp = F.aggregate(
        vals,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * F.lit(_FP_MULT) + x) % F.lit(_FP_MOD),
    )
    fp = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(fp)
    return df.select(F.col(id_col), fp.cast("bigint").alias("fingerprint"))


def document_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic content fingerprint: md5 of the whitespace-normalized,
    lower-cased text. The canonical key for exact dedup."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col), F.md5(normalized.cast("binary")).alias("fingerprint")
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Within-document repetition signals (the Gopher/C4-style quality
    filters): fraction of duplicated word ``n``-gram shingles and
    fraction of words consumed by the single most frequent word.
    Boilerplate, keyword stuffing, and decoding loops all show up as
    high repetition long before any cross-document dedup runs.

    Entirely per-row array expressions (shingles assembled and counted
    inside one projection) — no explode, no shuffle; the operator is a
    narrow map at any corpus size.
    """
    words_expr = f"split(trim(lower({text_col})), '\\\\s+')"
    ngrams = (
        f"CASE WHEN size({words_expr}) >= {n} THEN "
        f"transform(sequence(1, size({words_expr}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({words_expr}, i, {n}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    # most-frequent-word share via aggregate over the distinct words:
    # counting occurrences of each distinct word with a filter pass
    top_word_share = (
        f"CASE WHEN size({words_expr}) > 0 THEN "
        f"ROUND(CAST(array_max(transform(array_distinct({words_expr}), "
        f"w -> size(filter({words_expr}, x -> x = w)))) AS DOUBLE) "
        f"/ size({words_expr}), {_ROUND}) ELSE CAST(NULL AS DOUBLE) END"
    )
    dup_shingle_frac = (
        f"CASE WHEN size({ngrams}) > 0 THEN "
        f"ROUND(1.0 - CAST(size(array_distinct({ngrams})) AS DOUBLE) "
        f"/ size({ngrams}), {_ROUND}) ELSE CAST(NULL AS DOUBLE) END"
    )
    return df.select(
        F.col(id_col),
        F.size(F.expr(words_expr)).alias("n_words"),
        F.expr(dup_shingle_frac).alias("dup_shingle_frac"),
        F.expr(top_word_share).alias("top_word_share"),
    )
