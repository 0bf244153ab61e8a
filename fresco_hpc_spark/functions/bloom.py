"""Bloom-filter membership pre-filtering — the bounded-memory probe
for set-membership sweeps whose exact reference set outgrows a
comfortable broadcast.

``ngram_decontaminate`` broadcasts the eval suite's EXACT n-gram set:
right for thousands of benchmark docs, but a consolidated multi-
benchmark suite (millions of n-grams × ~50-byte strings) turns that
broadcast into gigabytes per executor. A Bloom filter is ~10 bits per
element at 1% false positives, ORDER-FREE to build (bitwise OR is
commutative — one ``bit_or`` aggregate), and mergeable (OR two
bitmaps). False positives are harmless here by construction: the
bloom only SHORTLISTS candidates, and the exact (now candidate-sized)
probe confirms — no false negatives ever, pinned in tests.

Determinism/oracle story: positions come from the shared md5 ``_h60``
under k salts; the bitmap lives as a ``(word, bits)`` BIGINT relation
(32 data bits per word, so no shift ever touches the sign bit under
ANSI or DuckDB overflow checks), and every bit is replayed by the
DuckDB oracle — a stored binary filter blob would be unverifiable,
this relation is queryable anywhere.

Scale shape: build = one explode of the reference set into k cells +
one ``bit_or`` groupBy (≤ m_words groups); probe = map-side against
the broadcast bitmap relation (corpus never shuffles); only candidate
(doc, gram) rows — bounded by contamination + the false-positive rate
— reach the exact verification join and the per-doc count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fresco_hpc_spark.functions.dedup import _h60

_WORD_BITS = 32


def _positions(token: Column, m_words: int, k: int, salt: str):
    """The k (word, bit) cells of a token: pos_i = h60(salt_i|token)
    mod m_words·32; word = pos >> 5, bit = pos mod 32 — identical
    integer ops in DuckDB (``>>`` / ``%``)."""
    cells = []
    for i in range(k):
        pos = F.pmod(
            _h60(F.concat(F.lit(f"{salt}{i}|"), token)),
            F.lit(int(m_words) * _WORD_BITS),
        )
        cells.append(
            F.struct(
                F.shiftright(pos, 5).cast("bigint").alias("word"),
                F.pmod(pos, F.lit(_WORD_BITS)).cast("int").alias("bit"),
            )
        )
    return F.inline(F.array(*cells))


def bloom_build(
    tokens: DataFrame,
    token_col: str = "token",
    m_words: int = 1024,
    k: int = 4,
    salt: str = "bf",
) -> DataFrame:
    """Build the bitmap relation ``(word, bits)`` from a token column:
    ≤ m_words rows of BIGINTs carrying 32 data bits each (m_words=1024
    ⇒ a 4 KB filter; size for ~10 bits per distinct element). Absent
    words mean all-zero bits. Orderless and mergeable: ``bit_or`` again
    over the union of two bitmaps is the filter of the union set."""
    if m_words < 1 or k < 1:
        raise ValueError(f"need m_words >= 1 and k >= 1, got {m_words}, {k}")
    return (
        tokens.filter(F.col(token_col).isNotNull())
        .select(_positions(F.col(token_col), m_words, k, salt))
        .groupBy("word")
        # expr: the pyspark shiftleft wrapper takes only a literal shift
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("bits")
        )
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    m_words: int = 1024,
    k: int = 4,
    salt: str = "bf",
) -> DataFrame:
    """Two-phase training-set decontamination: a Bloom bitmap of the
    eval suite's n-grams SHORTLISTS candidate (doc, gram) pairs
    map-side, then the exact eval set verifies only those candidates —
    the memory-bounded sibling of :func:`ngram_decontaminate` with
    identical ``n_overlap``/``contaminated`` semantics (no false
    negatives: a bloom never misses a member). The extra
    ``n_bloom_candidates`` column exposes the false-positive overhead
    the filter traded for its 10-bits-per-element footprint.

    At true scale the exact-verify side stays a broadcast of the
    CANDIDATE-matched eval grams only when the eval set itself must be
    joined distributed; here the verification reuses the eval set
    directly — the decisive saving is that the corpus-side stream is
    pre-thinned by the 4 KB bitmap before anything else touches it."""
    def toks(df: DataFrame) -> DataFrame:
        words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        grams = F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(
            F.col(id_col).alias("doc"), F.explode(grams).alias("token")
        )

    eval_grams = toks(eval_df).select("token").distinct()
    bitmap = bloom_build(eval_grams, "token", m_words, k, salt)

    # r14: the bitmap is ≤ m_words BIGINTs (4 KB at the default sizing)
    # — small enough for the driver-held-codebook pattern, so collect
    # it once and inline it as ONE literal array. The membership test
    # then runs ENTIRELY map-side on the training stream: k bound
    # positions, k array lookups, k bit tests — no k-way position
    # explode, no join, no (doc, token) shuffle+groupBy (the prior
    # shape shuffled k× the gram stream — 23 MB at sf0.1 — to compute
    # what is a per-row conjunction). Positions/bits are the identical
    # integer ops, so the candidate SET is unchanged; downstream
    # countDistinct aggregation absorbs duplicate (doc, gram) rows the
    # old distinct-groupBy used to fold.
    from fresco_hpc_spark.functions.vectors import bind_once, lit_bigints

    words = [0] * int(m_words)
    for r in bitmap.collect():  # bounded: ≤ m_words rows
        words[int(r["word"])] = int(r["bits"])
    lut = lit_bigints(words)
    powers = lit_bigints([1 << b for b in range(_WORD_BITS)])

    def _hit(i: int):
        pos = F.pmod(
            _h60(F.concat(F.lit(f"{salt}{i}|"), F.col("token"))),
            F.lit(int(m_words) * _WORD_BITS),
        )

        def _test(p):
            word_bits = F.element_at(
                lut, F.shiftright(p, 5).cast("int") + 1
            )
            mask = F.element_at(
                powers, F.pmod(p, F.lit(_WORD_BITS)).cast("int") + 1
            )
            return word_bits.bitwiseAND(mask) != 0

        return bind_once(pos, _test)

    allset = _hit(0)
    for i in range(1, k):
        allset = allset & _hit(i)
    cand = toks(train).filter(allset)
    verified = cand.join(F.broadcast(eval_grams), "token")
    per_doc = cand.groupBy("doc").agg(
        F.countDistinct("token").alias("n_bloom_candidates")
    )
    exact = verified.groupBy("doc").agg(
        F.countDistinct("token").alias("n_overlap")
    )
    return (
        train.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("doc", id_col), id_col, "left")
        .join(exact.withColumnRenamed("doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bloom_candidates", F.lit(0))
            .cast("bigint")
            .alias("n_bloom_candidates"),
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy(id_col)
    )
