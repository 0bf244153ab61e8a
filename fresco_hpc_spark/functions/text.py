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

from fresco_hpc_spark.functions.vectors import bind_once

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


def _fan_out(df: DataFrame) -> DataFrame:
    """Spread a compact file-backed table across the cluster before
    CPU-bound per-row text work: a table stored as fewer files than
    cores serializes regexp/shingle evaluation into that many tasks
    (measured: repetition_stats 22.6 s → 3.6 s, decontaminate
    4.2 s → 1.8 s, text_stats 0.45 s → 0.28 s at sf0.1). Self-disabling
    at real scale — when the table already has ≥ cores files (any 100 TB
    layout), this is the identity and costs nothing."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — non-file-backed plan
        n_files = 0
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def token_count(col: Column | str) -> Column:
    """Whitespace token count; empty/blank text counts 0; NULL text
    counts NULL — stated explicitly because the fall-through otherwise
    lands on ``size(split(NULL))``, which is −1 under the legacy
    sizeOfNull (ANSI off) and NULL under ANSI — an engine-mode
    divergence that polluted percentile bounds on null-bearing corpora
    (caught by the r13 null-parity probe: a −1 token count dragged
    length_percentile_filter's p5 bound down). The explicit branch
    makes every session mode agree with the SQL oracles' CASE form."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return (
        F.when(trimmed.isNull(), F.lit(None).cast("int"))
        .when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics + a composite quality score.

    quality = 0.4·min(words/50, 1) + 0.3·(1 − min(10·punct_ratio, 1))
            + 0.3·min(5·stopword_ratio, 1)
    """
    df = _fan_out(df)
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
    df = _fan_out(df)
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
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: bool = False,
) -> DataFrame:
    """Deterministic content fingerprint: md5 of the whitespace-normalized,
    lower-cased text. The canonical key for exact dedup. With
    ``keep_cols`` the fingerprint is appended to the full row instead
    of projecting down to (id, fingerprint) — the shape pipeline
    compositions need to dedup in ONE pass via
    ``groupBy(fingerprint).agg(min(struct(id, ...)))`` rather than
    computing canonical ids separately and joining back (which makes
    the upstream lineage a two-consumer plan)."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    fp = F.md5(normalized.cast("binary")).alias("fingerprint")
    if keep_cols:
        if "fingerprint" in df.columns:
            # select('*', fp) would emit TWO 'fingerprint' columns and any
            # downstream groupBy('fingerprint') dies on an ambiguous
            # reference far from the cause (ADVICE r10) — fail here with
            # the actionable message instead
            raise ValueError(
                "document_fingerprint(keep_cols=True): input already has "
                "a 'fingerprint' column — drop or rename it first"
            )
        return df.select("*", fp)
    return df.select(F.col(id_col), fp)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Within-document repetition signals (the Gopher/C4-style quality
    filters): fraction of duplicated word ``n``-gram shingles and
    fraction of words consumed by the single most frequent word.
    Boilerplate, keyword stuffing, and decoding loops all show up as
    high repetition long before any cross-document dedup runs.

    Entirely per-row array expressions (shingles assembled and counted
    inside one projection) — no explode, no aggregation shuffle; the
    only exchange is the round-robin fan-out when the source has fewer
    files than cores.
    """
    df = _fan_out(df)
    # materialize words/shingles ONCE as columns — inlining the split()
    # expression into every consumer re-evaluates it per reference
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    staged = df.select(F.col(id_col), words.alias("_w"))
    g = F.when(
        F.size("_w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("_w", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.withColumn("_g", g)
    dup_shingle_frac = F.when(
        F.size("_g") > 0,
        F.round(
            1.0 - F.size(F.array_distinct("_g")).cast("double") / F.size("_g"),
            _ROUND,
        ),
    ).otherwise(F.lit(None).cast("double"))
    # most-frequent-word share as the max run length of the SORTED word
    # array — one O(n log n) sort + one O(n) aggregate pass, instead of
    # the O(distinct x n) transform(filter(...)) formulation (which was
    # the 22 s hot spot at sf0.1)
    run_best = F.aggregate(
        F.array_sort("_w"),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_word_share = F.when(
        F.size("_w") > 0,
        F.round(run_best.cast("double") / F.size("_w"), _ROUND),
    ).otherwise(F.lit(None).cast("double"))
    return staged.select(
        F.col(id_col),
        # explicit NULL for NULL text: the bare size() is the legacy
        # size(NULL) = -1 under ANSI-off (the token_count trap — r13
        # null-parity probe), NULL under ANSI — pin one semantics
        F.when(F.col("_w").isNull(), F.lit(None).cast("int"))
        .otherwise(F.size("_w"))
        .alias("n_words"),
        dup_shingle_frac.alias("dup_shingle_frac"),
        top_word_share.alias("top_word_share"),
    )


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Training-set decontamination (the GPT-3/PaLM recipe): count, per
    training document, the distinct word ``n``-grams it shares with ANY
    eval/benchmark document, and flag overlap > 0 as contaminated.
    Returns ``(doc_id, n_overlap, contaminated)`` for EVERY train doc.

    100 TB shape: the eval side is benchmark suites — thousands of
    documents, not billions — so its distinct n-gram set is explicitly
    ``broadcast()``: the training corpus is scanned ONCE, n-grams
    stream through a map-side hash probe (no shuffle of the corpus),
    and only matching (doc, token) rows — bounded by contamination, not
    corpus size — reach the per-doc count. The final left join attaches
    counts back to the (id-only) train projection.

    Tokens are lowercased whitespace words; the n-gram is the
    space-joined window — identical construction to the Jaccard
    operators, so oracles share the shingle SQL.
    """
    def toks(df: DataFrame) -> DataFrame:
        words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        # guard: docs shorter than n words contribute no n-grams (an
        # unguarded sequence(0, size-n) would DESCEND for negative
        # stops); words bound once — the unbound form re-split the
        # text per shingle index (r14)
        grams = bind_once(
            words,
            lambda w: F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.array_join(F.slice(w, i + 1, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        return df.select(
            F.col(id_col).alias("doc"), F.explode(grams).alias("token")
        )

    eval_grams = toks(eval_df).select("token").distinct()
    train = _fan_out(train)
    # Train-side n-grams are NOT pre-deduplicated: a distinct here would
    # shuffle the whole exploded corpus before the probe. Instead the raw
    # stream hits the broadcast probe map-side, and countDistinct dedups
    # only the MATCHES — shuffle ∝ contamination, not corpus size.
    hits = (
        toks(train)
        .join(F.broadcast(eval_grams), "token")
        .groupBy("doc")
        .agg(F.countDistinct("token").alias("n_overlap"))
    )
    return (
        train.select(F.col(id_col))
        .join(hits.withColumnRenamed("doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy(id_col)
    )


def quality_rule_exprs(
    text_col: str = "text",
    lang_col: str | None = "lang",
    min_words: int = 20,
    mean_word_len_bounds: tuple[float, float] = (2.5, 12.0),
) -> dict[str, Column]:
    """The C4-rule boolean expressions behind :func:`quality_rules`,
    exposed so a composed pipeline can FILTER on the conjunction
    in-line (key ``kept``) instead of joining the projected gate
    relation back onto its own input — the join-back shape consumes
    the upstream lineage twice, which doubles every stage of a lazy
    multi-stage composition (measured on corpus_curation_v5, r14).
    Single source of truth: :func:`quality_rules` builds its columns
    from this dict, so the two forms cannot drift."""
    c = F.col(text_col)
    n_words = token_count(c)
    non_ws = F.length(F.regexp_replace(c, r"\s", ""))
    mean_len = non_ws / F.greatest(n_words, F.lit(1)).cast("double")
    lo, hi = mean_word_len_bounds
    rules = {
        "rule_min_words": n_words >= min_words,
        "rule_word_len": (mean_len >= lo) & (mean_len <= hi),
        "rule_has_stopword": F.regexp_count(F.lower(c), F.lit(EN_STOPWORDS)) > 0,
    }
    if lang_col is not None:
        rules["rule_lang"] = F.col(lang_col) == "en"
    kept = None
    for expr in rules.values():
        kept = expr if kept is None else (kept & expr)
    rules["kept"] = kept
    return rules


def quality_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    min_words: int = 20,
    mean_word_len_bounds: tuple[float, float] = (2.5, 12.0),
) -> DataFrame:
    """C4-style rule-based quality gate: per document, each rule as its
    own boolean column plus the conjunction ``kept`` — the auditable
    shape curation pipelines need (you tune rules by inspecting WHICH
    one rejected a document, not just the survivor set).

    Rules (all single-pass Catalyst expressions, no shuffle):
      * ``rule_min_words``   — at least ``min_words`` whitespace tokens;
      * ``rule_word_len``    — mean word length inside
        ``mean_word_len_bounds`` (gibberish/格-noise filter);
      * ``rule_has_stopword``— at least one English stopword (C4's
        "natural language, not keyword spam" proxy);
      * ``rule_lang``        — declared language is 'en' (skipped when
        ``lang_col`` is None).
    """
    df = _fan_out(df)
    c = F.col(text_col)
    n_words = token_count(c)
    non_ws = F.length(F.regexp_replace(c, r"\s", ""))
    mean_len = non_ws / F.greatest(n_words, F.lit(1)).cast("double")
    rules = quality_rule_exprs(
        text_col, lang_col, min_words, mean_word_len_bounds
    )
    return df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_len, _ROUND).alias("mean_word_len"),
        *[v.alias(k) for k, v in rules.items()],
    ).orderBy(id_col)


# PII patterns — intersection of Java-regex and RE2 syntax so Spark and
# DuckDB (the oracle engine) match the SAME spans: no backrefs, no
# lookaround, explicit character classes.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing for training corpora: count and replace emails,
    IPv4 addresses, and NANP-style phone numbers with typed placeholders
    (``<EMAIL>``/``<IP>``/``<PHONE>``). Returns
    ``(doc_id, n_emails, n_ips, n_phones, redacted)``.

    Order matters and is fixed: emails first (an address can embed
    digit runs a later pass would mangle), then IPs, then phones —
    counts are taken on the ORIGINAL text, replacement cascades. All
    regexp expressions run inside whole-stage codegen; per-row, no
    shuffle — the same linear-scan profile as the other text operators.
    """
    df = _fan_out(df)
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "<EMAIL>"),
            PII_IPV4, "<IP>",
        ),
        PII_PHONE, "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(c, F.lit(PII_IPV4)).cast("bigint").alias("n_ips"),
        F.regexp_count(c, F.lit(PII_PHONE)).cast("bigint").alias("n_phones"),
        redacted.alias("redacted"),
    ).orderBy(id_col)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Context-window chunking for training-data prep: split each
    document's whitespace tokens into windows of ``chunk_tokens`` words
    with ``overlap`` words carried between consecutive chunks (stride =
    chunk_tokens − overlap). Returns
    ``(doc_id, chunk_index, n_tokens, chunk_text)``; a document shorter
    than one window yields exactly one chunk (itself). The final chunk
    keeps its tail even when shorter than a full window.

    Pure Catalyst: the window starts are a ``sequence`` over the stride,
    each chunk a ``slice`` + ``array_join``, fanned out with one
    ``explode`` — per-row compute, no shuffle, the same linear-scan
    shape as tokenization. At 100 TB this is a map-only stage.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    # no text, no chunks — left in, size(NULL) = -1 under ANSI-off
    # satisfies n <= chunk_tokens and fabricates one all-NULL chunk
    # per textless doc (r13 null-parity probe)
    df = _fan_out(df.filter(F.col(text_col).isNotNull()))
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")

    # last window start: the smallest s with s + chunk >= n, clamped
    # >= 0. The word array is bound once (bind_once) — the unbound form
    # re-split the text per chunk and per size() reference (r14).
    def _chunks_of(w: Column) -> Column:
        n = F.size(w)
        n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1
        )
        starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
        return F.transform(
            starts,
            lambda s: F.struct(
                (s / stride).cast("int").alias("idx"),
                F.slice(w, s + 1, chunk_tokens).alias("toks"),
            ),
        )

    chunks = bind_once(words, _chunks_of)
    ex = df.select(F.col(id_col), F.explode(chunks).alias("c"))
    return ex.select(
        id_col,
        F.col("c.idx").cast("int").alias("chunk_index"),
        F.size("c.toks").cast("bigint").alias("n_tokens"),
        F.array_join("c.toks", " ").alias("chunk_text"),
    ).orderBy(id_col, "chunk_index")


def tf_idf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF —
    the standard corpus-curation primitive for keyword extraction,
    topic tagging, and building per-domain vocabularies.

    ``score = tf * (ln((N + 1) / (df + 1)) + 1)`` (sklearn-style smooth
    idf: never zero, never divides by zero). Ranking is by the SCORE
    itself (rounded to 6 dp — the same rounded value the column emits
    and the oracle hash-compares, so ranking by it adds no new
    cross-engine risk beyond the value comparison that already holds),
    with the integer triple (tf desc, df asc, token asc) as a
    deterministic tiebreak at equal rounded score. Ranking by tf alone
    would be wrong: a tf=1 rare term (idf ≈ ln((N+1)/2)+1) outscores a
    tf=2 everywhere-term (idf = 1) whenever N ≥ 9, so ``term_rank`` is
    guaranteed monotonic in ``tf_idf`` only under score-first ordering.

    Scale shape: tokenize (map) → (doc, token) counts and (token) df
    (two partial-agg shuffles) → equi-join on token (df is
    vocabulary-sized — NEVER broadcast; it grows with the corpus) →
    per-doc rank window. N arrives via a broadcast 1-row cross join, so
    no action runs at build time and the plan stays fully lazy.
    """
    from pyspark.sql import Window

    df = _fan_out(df)
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.select(F.col(id_col).alias("doc"), F.explode(words).alias("token"))
    toks = toks.filter(F.col("token") != "")
    tf = toks.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = (
        toks.select("doc", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tf_idf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                _ROUND,
            ),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("tf_idf").desc(),
        F.col("tf").desc(),
        F.col("df").asc(),
        F.col("token").asc(),
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            F.col("doc").alias(id_col),
            F.col("term_rank").cast("bigint").alias("term_rank"),
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.col("tf_idf").cast("double").alias("tf_idf"),
        )
        .orderBy(id_col, "term_rank")
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean token log-probability under a unigram language
    model — the CCNet-family quality signal: gibberish, boilerplate, and
    out-of-domain documents score far below the corpus mode, and a
    simple threshold on this column is a standard pretraining filter.

    The model is estimated from ``reference`` (a documents table; e.g.
    a trusted high-quality corpus) or, when None, from ``df`` itself
    (self-scoring: outliers against the corpus's own distribution).
    Laplace-smoothed: ``P(t) = (count(t) + 1) / (total + vocab)`` with
    unseen tokens (possible only when a reference is supplied) falling
    back to the same +1 mass. Scores are mean ln P per token, rounded.

    Scale shape: both corpora tokenize map-side; the model is ONE
    aggregated (token, count) relation — vocabulary-sized, joined on
    token (never broadcast: vocabulary grows with the corpus). The
    scalar totals ride a broadcast 1-row cross join; per-doc mean is a
    partial-agg groupBy. Fully lazy, no driver collect.
    """
    df = _fan_out(df)
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.select(F.col(id_col).alias("doc"), F.explode(words).alias("token"))
    toks = toks.filter(F.col("token") != "")

    ref = toks if reference is None else (
        _fan_out(reference)
        .select(F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("token"))
        .filter(F.col("token") != "")
    )
    model = ref.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    totals = model.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("vocab"),
    )

    # integer micro-units (oracle contract rule 8, COVERAGE.md): a float
    # avg's summation order differs between engines; summing
    # round(lp * 1e6) as bigint is exact and order-free in both
    lp = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + 1)
        / (F.col("total") + F.col("vocab"))
    )
    joined = (
        toks.join(model, "token", "left")
        .crossJoin(F.broadcast(totals))
        .select("doc", F.round(lp * 1_000_000, 0).cast("bigint").alias("lp_u"))
    )
    return (
        joined.groupBy("doc")
        .agg(
            F.round(
                F.sum("lp_u") / (F.lit(1_000_000.0) * F.count(F.lit(1))), _ROUND
            ).alias("mean_logprob"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
        .select(F.col("doc").alias(id_col), "mean_logprob", "n_tokens")
        .orderBy(id_col)
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 100,
) -> DataFrame:
    """Corpus vocabulary statistics: the top-``top_n`` tokens by term
    frequency with document frequency and cumulative coverage — the
    preflight for tokenizer/BPE training (how much of the corpus does a
    k-token vocabulary cover?) and for stop-word/df-cap threshold
    selection in the dedup family.

    Scale shape: one tokenize explode → one (token) partial-agg groupBy
    (tf via count, df via approx-free countDistinct per token) → the
    global (tf desc, token) order is applied ONLY to the top-n relation
    (Catalyst turns orderBy+limit into TakeOrderedAndProject — no full
    sort); the cumulative window then runs over ≤ top_n rows, so the
    single-partition window is bounded by the parameter, not the corpus.
    Totals ride a broadcast 1-row cross join. Deterministic tie-break:
    (tf desc, token asc) is a total order.
    """
    from pyspark.sql import Window

    df = _fan_out(df)
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.select(F.col(id_col).alias("doc"), F.explode(words).alias("token"))
    toks = toks.filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc").alias("df"),
    )
    totals = counts.agg(F.sum("tf").alias("total_tokens"))
    top = counts.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(top_n)
    w = Window.orderBy(F.col("tf").desc(), F.col("token").asc())
    cum = F.sum("tf").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.row_number().over(w).cast("bigint").alias("token_rank"),
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round(F.col("tf") / F.col("total_tokens"), _ROUND).alias("frac"),
            F.round(cum / F.col("total_tokens"), _ROUND).alias("cum_frac"),
        )
        .orderBy("token_rank")
    )


def duplicate_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 10,
) -> DataFrame:
    """Exact substring-duplication profile (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" signal,
    re-expressed relationally): for every document, the fraction of its
    word ``n``-gram positions whose n-gram also appears in at least one
    OTHER document. High ``dup_frac`` marks near-verbatim recopies,
    templated pages, and licence boilerplate that document-level
    MinHash misses when the surrounding text differs; a threshold on
    this column (or span-level removal keyed on the same relation) is a
    standard pretraining cleanup.

    Output: one row per document — ``n_grams`` (sliding positions,
    0 for docs shorter than n), ``n_dup_grams`` (positions whose gram's
    corpus document-frequency ≥ 2), ``dup_frac`` (rounded ratio, 0.0
    when no grams).

    Scale shape (100 TB): tokenize + sliding slice is map-only; grams
    travel as md5 fingerprints (16 B fixed, not the raw 10-gram
    string, so the shuffle width is independent of n); gram document
    frequency is a partial-aggregated groupBy; the dup flag rejoins on
    the fingerprint (equi-join) and the per-doc rollup is a second
    partial agg. No windows, no cartesian products.
    """
    df = _fan_out(df)
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # guard: F.sequence(1, m) steps DOWNWARD when m < 1 — emit no
    # positions for docs shorter than n instead of a reversed range
    # guard unchanged (no positions for docs shorter than n); the word
    # array is BOUND ONCE (bind_once) — the unbound form re-ran the
    # regex split for every shingle start, O(tokens²) regex work per
    # document (r14; the d1b9ae2 vector-kernel trap, text edition)
    gram_fps = bind_once(
        words,
        lambda w: F.transform(
            F.when(
                F.size(w) - F.lit(n - 1) >= 1,
                F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            ).otherwise(F.array().cast("array<int>")),
            lambda s: F.md5(F.array_join(F.slice(w, s, n), " ")),
        ),
    )
    grams = df.select(
        F.col(id_col).alias("doc"),
        F.explode(gram_fps).alias("gram_fp"),
    )
    gram_df = (
        grams.select("doc", "gram_fp")
        .distinct()
        .groupBy("gram_fp")
        .agg(F.count(F.lit(1)).alias("gram_docs"))
    )
    dup_counts = (
        grams.join(gram_df.filter(F.col("gram_docs") >= 2), "gram_fp")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_dup_grams"))
    )
    totals = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    base = df.select(F.col(id_col).alias("doc")).distinct()
    return (
        base.join(totals, "doc", "left")
        .join(dup_counts, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_dup_grams"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_grams"),
            F.round(
                F.coalesce(F.col("n_dup_grams"), F.lit(0))
                / F.greatest(F.col("n_grams"), F.lit(1)),
                _ROUND,
            ).alias("dup_frac"),
        )
        .orderBy(id_col)
    )


def remove_duplicate_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 10,
) -> DataFrame:
    """Exact substring-duplication SURGERY — the removal counterpart of
    :func:`duplicate_ngram_spans` (Lee et al. 2022 deduplicate the
    spans themselves, not whole documents): every occurrence of a word
    ``n``-gram that appears in ≥2 distinct documents is removed EXCEPT
    its corpus-wide first occurrence (min (doc, position)), and each
    document is rebuilt from its surviving tokens. Exactly one copy of
    every duplicated passage survives, in the earliest document.

    A token is dropped when ANY removed gram occurrence covers it
    (positions i..i+n−1), so overlapping duplicated spans merge into
    one excision, as in the reference implementation's byte-range cuts.

    Output: one row per document — ``n_tokens`` (before), ``n_removed``,
    ``clean_text`` ('' when everything was duplicated elsewhere first).

    Scale shape (100 TB): tokenize + gram fingerprints are map-only
    (md5, 16 B each); the winner ``min(struct(doc,pos))`` and the
    cross-doc ``countDistinct(doc)`` are FUSED into one groupBy (r14),
    so both partial-combine before a single fingerprint shuffle and one
    join back attaches them (no windows, so a boilerplate gram in 10⁶
    docs never sorts on one task); covered positions explode map-side
    from removed occurrences; the final anti-join and per-doc rebuild
    are equi-key operations.
    """
    df = _fan_out(df)
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(words).alias("pos", "word"),
    ).filter(F.col("word") != "")
    # same bind-once rewrite as duplicate_ngram_spans: the unbound form
    # re-split the text per shingle start (O(tokens²) per doc)
    gram_structs = bind_once(
        words,
        lambda w: F.transform(
            F.when(
                F.size(w) - F.lit(n - 1) >= 1,
                F.sequence(F.lit(0), F.size(w) - F.lit(n)),
            ).otherwise(F.array().cast("array<int>")),
            lambda s: F.struct(
                s.alias("pos"),
                F.md5(F.array_join(F.slice(w, s + 1, n), " ")).alias("fp"),
            ),
        ),
    )
    grams = df.select(
        F.col(id_col).alias("doc"),
        F.explode(gram_structs).alias("g"),
    ).select("doc", F.col("g.pos").alias("pos"), F.col("g.fp").alias("fp"))
    # winner + cross-doc count fused into ONE groupBy (r14): the two
    # separate aggs + two joins consumed the grams relation three times
    # — and with it the whole upstream lineage when this operator runs
    # mid-pipeline (corpus_curation_v5). countDistinct partial-combines
    # before the same fp shuffle min(struct) rides.
    gstats = grams.groupBy("fp").agg(
        F.min(F.struct("doc", "pos")).alias("w"),
        F.countDistinct("doc").alias("nd"),
    )
    removed = grams.join(gstats.filter(F.col("nd") >= 2), "fp").filter(
        (F.col("doc") != F.col("w.doc")) | (F.col("pos") != F.col("w.pos"))
    )
    covered = removed.select(
        "doc", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("pos")
    ).distinct()
    kept = toks.join(covered, ["doc", "pos"], "left_anti")
    totals = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("n_tokens"))
    rebuilt = kept.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        totals.join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
        .orderBy(id_col)
    )


def oov_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` term-frequency vocabulary — the tokenizer-prep
    question vocab_stats answers in aggregate ("how much does a k-token
    vocabulary cover?"), asked per document: a high OOV rate marks
    documents a fixed vocabulary will shred into UNK/bytes (foreign
    scripts, code, gibberish), another standard curation threshold.

    Ties at the vocabulary boundary break deterministically by
    (tf desc, token asc) — the same order vocab_stats ranks by.

    Scale shape: one tokenize pass feeds both the (token, tf) aggregate
    (partial-agg) and the membership probe; the vocabulary is BOUNDED by
    ``vocab_size``, so it broadcasts — the probe is a map-side hash
    lookup, no shuffle of the token stream (contrast the unbounded
    vocabulary joins in tf_idf/unigram_logprob, which must stay
    shuffle joins). Per-doc rollup is a second partial agg.
    """
    df = _fan_out(df)
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.select(F.col(id_col).alias("doc"), F.explode(words).alias("token"))
    toks = toks.filter(F.col("token") != "")
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    vocab = (
        tf.orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "token", "left")
    return (
        joined.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("_in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .select(
            F.col("doc").alias(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_oov").cast("bigint").alias("n_oov"),
            F.round(F.col("n_oov") / F.col("n_tokens"), _ROUND).alias("oov_rate"),
        )
        .orderBy(id_col)
    )


def length_percentile_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    p_low: float = 0.05,
    p_high: float = 0.95,
) -> DataFrame:
    """Keep documents whose token count lies within the corpus's
    [p_low, p_high] length percentiles (inclusive) — the
    tails-trimming curation pass that drops both fragments and
    concatenation blobs without hand-picked thresholds.

    Returns the surviving documents with ALL their payload columns plus
    ``n_words`` (ADVICE r5: the old (id, n_words)-only relation forced
    callers to re-join for the text they asked to keep). ``n_words`` is
    a map-side expression on the full rows, so keeping the payload
    costs no join.

    The bounds come from :func:`...percentiles.distributed_exact_percentiles`
    (range-shuffle order statistics — exact PERCENTILE_CONT semantics
    with no single-reducer buffer, the same machinery as the A5 global
    percentiles), then apply as broadcast literals in a map-side
    filter: two bounded jobs at build time, zero shuffle of the corpus.
    """
    from fresco_hpc_spark.operators.percentiles import (
        distributed_exact_percentiles,
    )

    with_n = df.withColumn(
        "n_words", token_count(F.col(text_col)).cast("bigint")
    )
    lo, hi = distributed_exact_percentiles(
        with_n.select("n_words"), "n_words", [p_low, p_high]
    )
    lo = round(lo, _ROUND)
    hi = round(hi, _ROUND)
    return with_n.filter(
        (F.col("n_words") >= lo) & (F.col("n_words") <= hi)
    ).orderBy(id_col)


def _bigram_rel(
    frame: DataFrame, text_col: str, id_col: str | None
) -> DataFrame:
    """The (doc?, prev, cur) word-transition relation — a map-side
    self-zip of the token array (no join against the doc's own tokens);
    shared by the bigram and Kneser-Ney scorers. Docs with <2 tokens
    contribute no transitions."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    pairs = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    cols = [F.col(id_col).alias("doc")] if id_col else []
    out = frame.select(*cols, F.explode(pairs).alias("b")).select(
        *(["doc"] if id_col else []),
        F.col("b.prev").alias("prev"),
        F.col("b.cur").alias("cur"),
    )
    return out.filter((F.col("prev") != "") & (F.col("cur") != ""))


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean TRANSITION log-probability under a Laplace-
    smoothed bigram language model — the order-sensitive upgrade of
    :func:`unigram_logprob_score`: a document whose words are plausible
    but shuffled (spam keyword-stuffing, bag-of-words boilerplate)
    scores high under a unigram model and collapses under bigrams,
    because ``P(wᵢ | wᵢ₋₁) = (c(wᵢ₋₁,wᵢ) + 1) / (c(wᵢ₋₁) + V)``
    punishes transitions the corpus never makes. Score = mean ln P per
    transition (docs with <2 tokens have no transitions and are
    omitted, like tokenize-family operators omit empty docs).

    The model comes from ``reference`` (a trusted corpus) or, when
    None, from ``df`` itself. Micro-unit integer summation keeps the
    mean order-free (oracle contract rule 8).

    Scale shape: bigrams are a map-side self-zip of the token array
    (no join against the doc's own tokens); the model is ONE
    (prev, cur, count) relation plus a (prev, count) marginal — both
    corpus-vocabulary-sized and therefore JOINED on their keys, never
    broadcast; V rides a broadcast 1-row cross join. Two partial-agg
    shuffles build the model, one equi-join scores, one groupBy rolls
    up per doc.
    """
    df = _fan_out(df)

    def bigrams(frame: DataFrame, with_doc: bool) -> DataFrame:
        return _bigram_rel(frame, text_col, id_col if with_doc else None)

    doc_bi = bigrams(df, with_doc=True)
    ref_bi = doc_bi if reference is None else bigrams(_fan_out(reference), False)
    model = ref_bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    marg = model.groupBy("prev").agg(F.sum("c2").alias("c1"))
    vocab = ref_bi.select(F.col("cur").alias("w")).union(
        ref_bi.select(F.col("prev").alias("w"))
    ).distinct().agg(F.count(F.lit(1)).alias("v"))

    lp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + 1)
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
    )
    scored = (
        doc_bi.join(model, ["prev", "cur"], "left")
        .join(marg, "prev", "left")
        .crossJoin(F.broadcast(vocab))
        .select("doc", F.round(lp * 1_000_000, 0).cast("bigint").alias("lp_u"))
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.round(
                F.sum("lp_u") / (F.lit(1_000_000.0) * F.count(F.lit(1))), _ROUND
            ).alias("mean_logprob"),
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        )
        .select(F.col("doc").alias(id_col), "mean_logprob", "n_transitions")
        .orderBy(id_col)
    )


def trigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean transition log-probability under a Laplace-
    smoothed TRIGRAM language model — the next rung of the
    unigram→bigram quality ladder:
    ``P(w₃ | w₁,w₂) = (c(w₁,w₂,w₃) + 1) / (c(w₁,w₂) + V)``. Two words
    of context separate fluent prose from locally-plausible word salad
    a bigram model still accepts (template stitching, shuffled
    clauses); mean ln P per transition, micro-unit integer summation
    (oracle rule 8). Docs with <3 tokens have no transitions and are
    omitted, like the bigram scorer omits <2.

    Scale shape mirrors :func:`bigram_logprob_score`: trigrams are a
    map-side double self-zip of the token array; the model is ONE
    (w₁,w₂,w₃, count) relation plus a (w₁,w₂) marginal — both
    corpus-sized and JOINED on their keys, never broadcast; V rides a
    broadcast 1-row cross join.
    """
    df = _fan_out(df)

    def trigrams(frame: DataFrame, with_doc: bool) -> DataFrame:
        words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        n = F.size(words)
        heads = F.zip_with(
            F.slice(words, 1, n - 2),
            F.slice(words, 2, n - 2),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        tris = F.when(
            n >= 3,
            F.zip_with(
                heads,
                F.slice(words, 3, n - 2),
                lambda p, c: F.struct(
                    p.getField("w1").alias("w1"),
                    p.getField("w2").alias("w2"),
                    c.alias("w3"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
        )
        cols = [F.col(id_col).alias("doc")] if with_doc else []
        out = frame.select(*cols, F.explode(tris).alias("t")).select(
            *(["doc"] if with_doc else []),
            F.col("t.w1").alias("w1"),
            F.col("t.w2").alias("w2"),
            F.col("t.w3").alias("w3"),
        )
        return out.filter(
            (F.col("w1") != "") & (F.col("w2") != "") & (F.col("w3") != "")
        )

    doc_tri = trigrams(df, with_doc=True)
    ref_tri = (
        doc_tri if reference is None else trigrams(_fan_out(reference), False)
    )
    model = ref_tri.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c3")
    )
    marg = model.groupBy("w1", "w2").agg(F.sum("c3").alias("c2"))
    vocab = (
        ref_tri.select(F.col("w1").alias("w"))
        .union(ref_tri.select(F.col("w2").alias("w")))
        .union(ref_tri.select(F.col("w3").alias("w")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("v"))
    )

    lp = F.log(
        (F.coalesce(F.col("c3"), F.lit(0)) + 1)
        / (F.coalesce(F.col("c2"), F.lit(0)) + F.col("v"))
    )
    scored = (
        doc_tri.join(model, ["w1", "w2", "w3"], "left")
        .join(marg, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(vocab))
        .select("doc", F.round(lp * 1_000_000, 0).cast("bigint").alias("lp_u"))
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.round(
                F.sum("lp_u") / (F.lit(1_000_000.0) * F.count(F.lit(1))), _ROUND
            ).alias("mean_logprob"),
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        )
        .select(F.col("doc").alias(id_col), "mean_logprob", "n_transitions")
        .orderBy(id_col)
    )


def kn_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean transition log-probability under an
    INTERPOLATED KNESER-NEY bigram model — the smoothing KenLM uses and
    CCNet-style perplexity filtering is built on. Laplace over-taxes
    frequent transitions and hands unseen ones probability proportional
    to nothing useful; KN discounts every seen bigram by a fixed D and
    redistributes that mass by CONTINUATION fertility (how many distinct
    contexts a word follows — 'francisco' is frequent but predicts
    poorly, 'the' completes anything):

    ``P(w|u) = (max(c(uw) − D, 0) + D·N₁₊(u·)·N₁₊(·w)/N₁₊(··)) / c(u)``

    with D = 3/4. Exact-rational evaluation (oracle rules 8/10): with
    D = 3/4 every term scales by 4·c(u)·N₁₊(··) into BIGINTs —
    ``ln( (max(4·c(uw)−3, 0)·N + 3·N₁₊(u·)·N₁₊(·w)) / (4·c(u)·N) )``
    where N = N₁₊(··) — so both engines feed libm the identical double
    ratio of identical integers, then micro-round. The BIGINT products
    assume ``c·N < 2⁶²`` (true far past any testdata scale; a trillion-
    type corpus would compute the two addends in doubles instead and
    accept last-ulp risk).

    Per-context probabilities sum EXACTLY to 1 over the vocabulary
    (Σ_seen (4c−3) = 4c(u) − 3N₁₊(u·); the continuation term restores
    3N₁₊(u·) since Σ_w N₁₊(·w) = N — pinned by a Fraction-exact test).
    Transitions whose context u is unseen in the reference are DROPPED
    (no c(u) to condition on — reference mode only; self-scored, every
    context is its own witness), and an unseen-in-reference w clamps
    N₁₊(·w) to 1 rather than ln(0). Same scale shape as the bigram
    scorer: vocabulary-sized model relations joined on their keys, one
    1-row broadcast for N.
    """
    df = _fan_out(df)
    doc_bi = _bigram_rel(df, text_col, id_col)
    ref_bi = (
        doc_bi
        if reference is None
        else _bigram_rel(_fan_out(reference), text_col, None)
    )
    model = ref_bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    # c(u) and N1+(u·) fall out of ONE pass over the model relation
    ctx = model.groupBy("prev").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    cont = model.groupBy("cur").agg(F.count(F.lit(1)).alias("ncw"))
    nn = model.agg(F.count(F.lit(1)).alias("nc"))

    num = (
        F.greatest(
            F.lit(4).cast("bigint") * F.coalesce(F.col("c2"), F.lit(0)) - 3,
            F.lit(0).cast("bigint"),
        )
        * F.col("nc")
        + F.lit(3).cast("bigint")
        * F.col("n1p")
        * F.greatest(F.coalesce(F.col("ncw"), F.lit(0)), F.lit(1).cast("bigint"))
    )
    den = F.lit(4).cast("bigint") * F.col("c1") * F.col("nc")
    lp = F.log(num.cast("double") / den.cast("double"))
    scored = (
        doc_bi.join(model, ["prev", "cur"], "left")
        .join(ctx, "prev", "inner")  # unseen contexts are dropped
        .join(cont, "cur", "left")
        .crossJoin(F.broadcast(nn))
        .select("doc", F.round(lp * 1_000_000, 0).cast("bigint").alias("lp_u"))
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.round(
                F.sum("lp_u") / (F.lit(1_000_000.0) * F.count(F.lit(1))), _ROUND
            ).alias("mean_logprob"),
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        )
        .select(F.col("doc").alias(id_col), "mean_logprob", "n_transitions")
        .orderBy(id_col)
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the CHARACTER
    distribution — the cheapest gibberish/encoding-garbage signal in
    the Gopher-style quality family: natural prose sits in a narrow
    entropy band; base64 blobs, minified code, and single-char floods
    fall far outside it (low for floods, high for uniform random
    bytes). ``H = ln(n) − (1/n)·Σ_c cnt_c·ln(cnt_c)``.

    Entirely per-row array expressions — no explode, no aggregation,
    zero shuffle. Counts come from RUN LENGTHS of the sorted char array
    (boundary indices diffed against their successors), not a
    per-distinct-char filter scan: higher-order-function lambdas run
    interpreted, so the O(distinct·len) scan form cost 6.8 s at sf0.1
    where this O(len) form is a small multiple of the sort. Each array
    is MATERIALIZED as a column before the lambdas reference it (the
    DSIR O(len²) lesson). Exact cross-engine: counts are integers
    (identical under any counting method, so the oracle keeps the
    direct per-char form), each ``cnt·ln(cnt)`` term is micro-quantized
    HALF_UP before the integer fold, and the final subtraction sees
    identical doubles. Empty/NULL texts have no distribution and are
    omitted."""
    s1 = df.filter(
        F.col(text_col).isNotNull() & (F.length(F.col(text_col)) > 0)
    ).select(F.col(id_col), F.split(F.col(text_col), "").alias("cs"))
    s2 = s1.select(id_col, F.size("cs").alias("n"), F.array_sort("cs").alias("srt"))
    # 1-based boundary positions: i == 1 or srt[i] != srt[i-1]
    idx = F.filter(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: (i == 1)
        | (F.element_at(F.col("srt"), i) != F.element_at(F.col("srt"), i - 1)),
    )
    s2b = s2.select(id_col, "n", idx.alias("idx"))
    nxt = F.concat(
        F.slice(F.col("idx"), 2, F.greatest(F.size("idx") - 1, F.lit(0))),
        F.array(F.col("n") + 1),
    )
    counts = F.zip_with(F.col("idx"), nxt, lambda a, b: b - a)
    s3 = s2b.select(
        id_col,
        F.col("n").cast("bigint").alias("n_chars"),
        F.size("idx").cast("bigint").alias("distinct_chars"),
        counts.alias("counts"),
    )
    term = F.transform(
        F.col("counts"),
        lambda k: F.round(
            k.cast("double") * F.log(k.cast("double")) * 1_000_000.0, 0
        ).cast("bigint"),
    )
    ssum = F.aggregate(term, F.lit(0).cast("bigint"), lambda a, x: a + x)
    entropy = F.round(
        F.log(F.col("n_chars").cast("double"))
        - ssum / (F.lit(1_000_000.0) * F.col("n_chars")),
        6,
    )
    return s3.select(
        id_col, "n_chars", "distinct_chars", entropy.alias("entropy_nats")
    ).orderBy(id_col)


def source_quality_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-source corpus health report — the table a curation run
    prints first: documents, total/mean tokens, mean quality score, and
    the share of documents passing the quality threshold (0.5), per
    source. Composes :func:`text_stats` with one partial-aggregated
    rollup; the mean of the (already 6-dp-rounded) quality scores rides
    integer micro-units so the cross-engine hash is summation-order
    free.
    """
    stats = text_stats(df, text_col, id_col)
    src = df.select(F.col(id_col), F.col(group_col))
    q_u = F.round(F.col("quality_score") * 1_000_000, 0).cast("bigint")
    return (
        stats.join(src, id_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_tokens"),
            F.round(F.sum("n_words") / F.count(F.lit(1)), 6).alias("mean_tokens"),
            F.round(
                F.sum(q_u) / (F.lit(1_000_000.0) * F.count(F.lit(1))), 6
            ).alias("mean_quality"),
            F.round(
                F.count(F.when(F.col("quality_score") >= 0.5, 1))
                / F.count(F.lit(1)),
                6,
            ).alias("pass_rate"),
        )
        .orderBy(group_col)
    )


def source_token_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group token-distribution divergence from the whole corpus:
    for each value of ``group_col``, KL(p_group ‖ p_corpus) over the
    unigram distributions, plus the group's token and vocabulary
    counts. The mixture-QA check an LLM-data pipeline runs on its
    sources — a source whose KL spikes is distributionally unlike the
    blend it feeds (scraper drift, language contamination, boilerplate
    floods) and its mixing weight needs a second look; near-zero KL
    flags a source that adds volume but no diversity.

    Exactness contract (oracle rule 8, COVERAGE.md): every per-token
    contribution p·ln(p/q) is quantized to integer micro-units
    (×1e6, half-up) BEFORE the per-group sum, so the aggregate is
    summation-order-free and cross-engine identical. The ratio inside
    the log is computed from exact integer products,
    ``(c_gt·N) / (n_g·c_t)`` — both operands are exact BIGINTs (< 2^53
    at any realistic vocabulary mass), so the double division and the
    libm log see bit-identical inputs in both engines. KL ≥ 0 up to
    quantization; tokens absent from a group contribute 0 by the
    p·log p convention (p = 0), and every group token exists in the
    corpus by construction so q > 0 — no smoothing needed.

    Scale shape: one tokenize-explode → one (group, token) partial-agg
    groupBy; the group totals are a whole-partition WINDOW over that
    vocabulary-sized relation (no totals join — which would silently
    drop a NULL group, the recurring null-group bug class; a window
    partition keeps NULL natively) and the final per-group aggregate
    reuses the same hash(group) partitioning. The corpus token totals
    re-aggregate the counts relation (never the token stream twice)
    and join back on the never-null token; the corpus grand total
    rides a broadcast 1-row frame. At 100 TB the token-total side is
    vocabulary-sized — far under the stream — and AQE broadcasts it
    when small. Nothing touches Python.
    """
    from pyspark.sql import Window

    df = _fan_out(df)
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = (
        df.select(F.col(group_col).alias("grp"), F.explode(words).alias("token"))
        .filter(F.col("token") != "")
    )
    gt = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("c_gt"))
    wg = Window.partitionBy("grp")
    gt = gt.withColumn("n_g", F.sum("c_gt").over(wg)).withColumn(
        "vocab", F.count(F.lit(1)).over(wg)
    )
    t_tot = gt.groupBy("token").agg(F.sum("c_gt").alias("c_t"))
    corpus = t_tot.agg(F.sum("c_t").alias("n_tot"))

    p = F.col("c_gt") / F.col("n_g")
    ratio = (F.col("c_gt") * F.col("n_tot")) / (F.col("n_g") * F.col("c_t"))
    u = F.round(p * F.log(ratio) * 1_000_000, 0).cast("bigint")
    return (
        gt.join(t_tot, "token")
        .crossJoin(F.broadcast(corpus))
        .select("grp", "n_g", "vocab", u.alias("u"))
        .groupBy("grp", "n_g", "vocab")
        .agg(F.round(F.sum("u") / 1_000_000.0, _ROUND).alias("kl_divergence"))
        .select(
            F.col("grp").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_tokens"),
            F.col("vocab").cast("bigint").alias("vocab"),
            "kl_divergence",
        )
        .orderBy(group_col)
    )


def boilerplate_remove(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    min_docs: int = 3,
    sep: str = r"\n",
    join_sep: str = "\n",
) -> DataFrame:
    """Frequency-threshold boilerplate stripping, the C4/RefinedWeb line
    filter: a line is boilerplate within its ``group_col`` (site/domain/
    source) when its normalized form occurs in at least ``min_docs``
    DISTINCT documents of that group; ALL copies of boilerplate lines
    are removed and each document is reassembled from the survivors.

    Complementary to :func:`fresco_hpc_spark.functions.dedup.
    paragraph_dedup`, which keeps the FIRST corpus-wide copy of every
    duplicated paragraph: navigation chrome / cookie banners / footers
    repeat on every page of a site, so even the first copy is noise —
    the frequency rule drops them everywhere, while lines shared by
    fewer than ``min_docs`` documents (legitimate quotations) survive
    in full. Repeats WITHIN one document don't count toward the
    threshold (a chorus repeated five times in one lyric sheet is
    content, not chrome).

    Normalization is lower + collapse-whitespace + trim; empty lines
    are dropped. Output: one row per document having ≥1 non-empty line
    — (id, group, ``n_lines``, ``n_kept``, ``clean_text``).

    Scale shape (100 TB): split+explode is map-only. The boilerplate
    set is two partial-aggregatable groupBys — distinct (group, line,
    doc) then count per (group, line) — so a banner repeated on a
    billion pages arrives at the shuffle pre-combined. Each line is
    then FLAGGED via one LEFT join against that (far smaller) set on
    the null-safe (group, fingerprint) key, and a single per-doc
    groupBy computes the total, the kept count, and the reassembled
    text together (ADVICE r9: the earlier anti-join + separate totals
    aggregate + reassembly join consumed the exploded relation three
    times and shuffled twice more). The exploded relation is still
    read twice — once to build the frequency set, once to flag — which
    is inherent to the threshold rule; both reads are map-only off the
    scan, and caching an exploded corpus larger than its source would
    cost more than the recompute. Nothing is windowed over the skewed
    line key.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would strip every line)")
    lines = (
        df.select(
            F.col(id_col).alias("doc"),
            F.col(group_col).alias("grp"),
            F.posexplode(F.split(F.col(text_col), sep)).alias("idx", "line"),
        )
        .withColumn(
            "_norm",
            F.trim(F.regexp_replace(F.lower(F.col("line")), r"\s+", " ")),
        )
        .filter(F.col("_norm") != "")
        .withColumn("_fp", F.md5(F.col("_norm")))
        .drop("_norm")
    )
    boiler = (
        lines.select("grp", "_fp", "doc")
        .distinct()
        .groupBy("grp", "_fp")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select(F.col("grp").alias("_b_grp"), F.col("_fp").alias("_b_fp"))
    )
    flagged = lines.join(
        boiler,
        F.col("grp").eqNullSafe(F.col("_b_grp"))
        & (F.col("_fp") == F.col("_b_fp")),
        "left",
    ).withColumn("_is_b", F.col("_b_fp").isNotNull())
    kept_lines = F.filter(
        F.array_sort(F.collect_list(F.struct("idx", "line", "_is_b"))),
        lambda s: ~s["_is_b"],
    )
    return (
        flagged.groupBy("doc", "grp")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(~F.col("_is_b"), F.lit(1))).alias("n_kept"),
            F.array_join(
                F.transform(kept_lines, lambda s: s["line"]), join_sep
            ).alias("clean_text"),
        )
        .select(
            F.col("doc").alias(id_col),
            F.col("grp").alias(group_col),
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
            "clean_text",
        )
        .orderBy(id_col)
    )


#: fixed latin accent-fold table (lowercase side only — normalize
#: lowercases first). Chosen over Unicode NFKD because BOTH engines can
#: replay a translate() over an explicit table byte-identically, while
#: full Unicode normalization differs by ICU version.
_ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöøùúûüýÿ"
_ACCENT_DST = "aaaaaaceeeeiiiinoooooouuuuyy"


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4/CCNet-style text normalization — the canonical form dedup and
    fingerprinting run on: lowercase → fixed-table accent fold
    (``translate``, byte-identical in DuckDB — deliberately NOT
    ICU/NFKD, which drifts across library versions) → control chars to
    spaces → whitespace runs collapsed → trimmed. Returns ``(id,
    norm_text, n_norm_chars)``. Pure per-row Catalyst expressions in
    one projection: zero shuffle, streams through codegen at any
    scale."""
    c = F.lower(F.col(text_col))
    c = F.translate(c, _ACCENT_SRC, _ACCENT_DST)
    c = F.regexp_replace(c, "[\\x00-\\x1f\\x7f]", " ")
    c = F.regexp_replace(c, "\\s+", " ")
    c = F.trim(c)
    return df.select(
        F.col(id_col),
        c.alias("norm_text"),
        F.length(c).cast("bigint").alias("n_norm_chars"),
    )


def tfidf_search(
    df: DataFrame,
    query: str,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vector-space-model retrieval: top-k documents by COSINE over
    smoothed TF-IDF vectors — the classic VSM ranking next to
    :func:`~fresco_hpc_spark.functions.search.bm25_search_table`'s
    probabilistic one (same idf family as :func:`tf_idf_top_terms`:
    ``ln((N+1)/(df+1))+1``, never zero). Vocabulary is the corpus
    vocabulary; query terms outside it are dropped (the sklearn
    convention — they carry no idf and contribute to neither side's
    norm). Returns ``(doc_id, cosine_sim)``, best first, ties on id.

    Determinism (oracle rule 9/10): weights quantize to 10^3
    micro-units BEFORE any aggregation — per-doc norms are Σq² over
    exact BIGINTs (envelope: safe while tf·idf < ~3·10⁴ with 10⁴-term
    docs, far beyond real text), normalized weights round at 9 dp, and
    per-term score contributions quantize to 10^12 micro-units before
    the per-doc BIGINT sum, so no float ever accumulates in
    engine-dependent order. The query side is built IN-ENGINE from a
    literal (tokenized relationally), so both engines derive even the
    query weights from the same plan.

    Scale shape: tokenize (map) → two partial-agg shuffles (tf, df) →
    vocabulary-sized equi-joins (df is NEVER broadcast — it grows with
    the corpus); the ≤|query|-term query-weight relation IS broadcast
    into the postings scan, and top-k is a TakeOrderedAndProject — the
    bm25 linear-scan shape, no pair explosion anywhere."""
    if not query.strip():
        raise ValueError("query must contain at least one token")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    W = 1_000  # weight micro-units
    C = 1_000_000_000_000  # contribution micro-units
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(words).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = (
        toks.select("doc", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)
    qw = F.round(F.col("tf") * idf * W, 0).cast("bigint")
    weighted = (
        tf.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select("doc", "token", qw.alias("qw"))
    )
    norms = weighted.groupBy("doc").agg(
        F.sum(F.col("qw") * F.col("qw")).alias("norm2")
    )
    unit = weighted.join(norms, "doc").select(
        "doc",
        "token",
        F.round(F.col("qw") / F.sqrt(F.col("norm2")), 9).alias("w"),
    )

    # query side, built relationally from the literal
    qtoks = (
        df.sparkSession.range(1)
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.lit(query))), r"\s+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
    )
    qtf = qtoks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    qweighted = (
        qtf.join(docfreq, "token")  # inner: OOV terms drop, norm excludes
        .crossJoin(F.broadcast(n_docs))
        .select("token", qw.alias("qw"))
    )
    qnorm = qweighted.select(
        F.sum(F.col("qw") * F.col("qw")).alias("qnorm2")
    )
    qunit = qweighted.crossJoin(F.broadcast(qnorm)).select(
        "token",
        F.round(F.col("qw") / F.sqrt(F.col("qnorm2")), 9).alias("qwu"),
    )

    contrib = F.round(F.col("w") * F.col("qwu") * C, 0).cast("bigint")
    return (
        unit.join(F.broadcast(qunit), "token")
        .select("doc", contrib.alias("c"))
        .groupBy("doc")
        .agg(F.round(F.sum("c") / C, 6).alias("cosine_sim"))
        .select(F.col("doc").alias(id_col), "cosine_sim")
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(int(top_k))
    )
