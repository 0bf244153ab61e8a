"""Inverted text index at rest + phrase search.

Completes the index-at-rest family (MinHash band index for near-dup
text, phash chunk index for images, IVF inverted lists for vectors —
COVERAGE.md LLM-extension table): the POSITIONAL inverted index is the
exact-search sibling — token → (doc, position) postings persisted
hive-partitioned on a content-stable token bucket, so a phrase query
reads only its tokens' partitions (PartitionFilters, same contract as
the IVF nprobe pruning) and never rescans the corpus text.

Phrase matching is the classic positional-postings join, made
EQUI-joinable by shifting: token i of the phrase contributes postings
projected to ``start = pos − i``, so a phrase occurrence is simply a
(doc, start) key present in ALL k projections — a k-way equi-join on
(doc, start), never a positional theta-join. Candidates after the first
join are bounded by the rarest token's postings.

The bucket hash is the repo's shared md5-derived 60-bit value
(functions/dedup.py::_h60) — computable identically driver-side in
Python (`_py_bucket`), so query planning needs NO Spark job to locate
partitions, and in any other engine for cross-checking.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fresco_hpc_spark.functions.dedup import _h60

_SALT = "tok|"


def canonical_fingerprint(fingerprint: str) -> str:
    """The ONE stored form of an index content fingerprint: sha256 hex
    of the raw stamp string. Both writers (``ensure_text_index`` and
    ``stamp_text_index_fingerprint``) and the staleness check compare
    THIS form — VERDICT r9 item 2: a call site that stamped the raw
    string while ensure() compared the sha256 made every subsequent
    phrase query silently rebuild the index (raw ≠ sha256(raw)), the
    exact rebuild-per-call bug the canonical form exists to kill.
    Hashing also sidesteps SQL quoting/backslash escaping in the
    TBLPROPERTIES literal (ADVICE r8)."""
    return hashlib.sha256(fingerprint.encode("utf-8")).hexdigest()


def stamp_text_index_fingerprint(
    spark: SparkSession, table_name: str, fingerprint: str
) -> None:
    """Persist the corpus fingerprint on an already-built index table
    in the canonical form ``ensure_text_index`` compares. Any code that
    builds via :func:`build_text_index` directly (e.g. a build-cost
    exhibit that must rebuild unconditionally) stamps through HERE so
    a later ``ensure_text_index(..., fingerprint=same)`` recognizes the
    index as fresh instead of rebuilding."""
    spark.sql(
        f"ALTER TABLE {table_name} SET TBLPROPERTIES "
        f"('fresco.fingerprint' = '{canonical_fingerprint(fingerprint)}')"
    )


def _py_bucket(token: str, n_buckets: int) -> int:
    """Driver-side twin of the JVM bucket expression: first 15 hex
    chars of md5(salt+token) as int, mod n_buckets — byte-identical to
    ``_h60`` (pinned by test_llm_ops)."""
    h = int(hashlib.md5((_SALT + token).encode("utf-8")).hexdigest()[:15], 16)
    return h % n_buckets


def tokenize_positions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, pos, token) postings: the house whitespace tokenization
    (lower + trim + split on ``\\s+``) with 0-based positions. Tokens
    are NOT filtered — ``\\s+`` on trimmed text yields no interior
    empties, and dropping the single "" token of a blank document would
    be the only effect; keeping it preserves position arithmetic and a
    real phrase token never equals ""."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words).alias("pos", "token"),
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")


def build_text_index(
    docs: DataFrame,
    table_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> None:
    """Persist the positional postings AT REST, hive-partitioned on
    ``_bkt = _h60('tok|' + token) % n_buckets``. One tokenize pass over
    the corpus at build time; every later phrase query prunes to its
    tokens' partitions. ``n_buckets`` trades directory count against
    pruning selectivity (a query for k distinct tokens reads ≤ k
    buckets); the token column stays in the data for the exact residual
    filter, so bucket collisions cost I/O, never correctness.

    Same catalog-resolved managed-table lifecycle as
    ``vectors.ivf_build_index`` (drop stale metadata, clear an orphaned
    location, then partitioned saveAsTable)."""
    spark = docs.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if "." in table_name:
        db, tbl = table_name.rsplit(".", 1)
    else:
        db, tbl = spark.catalog.currentDatabase(), table_name
    db_loc = spark.catalog.getDatabase(db).locationUri.rstrip("/")
    jp = spark._jvm.org.apache.hadoop.fs.Path(f"{db_loc}/{tbl.lower()}")
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jp):
        fs.delete(jp, True)
    postings = tokenize_positions(docs, text_col, id_col).withColumn(
        "_bkt",
        F.pmod(_h60(F.concat(F.lit(_SALT), F.col("token"))), F.lit(n_buckets)),
    )
    (
        postings.write.mode("overwrite")
        .format("parquet")
        .partitionBy("_bkt")
        .saveAsTable(table_name)
    )
    # persist the bucket count WITH the index: a query run with a
    # different n_buckets computes the wrong partition and silently
    # returns empty — the property makes the parameter part of the
    # index, not a caller-remembered convention
    spark.sql(
        f"ALTER TABLE {table_name} SET TBLPROPERTIES "
        f"('fresco.n_buckets' = '{int(n_buckets)}')"
    )
    # doc-length sidecar for RANKED retrieval (BM25 needs |d| and the
    # corpus averages): computed by reading the just-written postings
    # back (no second tokenize of the corpus) into a slim managed
    # table, with the exact corpus totals as TBLPROPERTIES next to the
    # bucket count — without the sidecar a BM25 query would have to
    # scan EVERY bucket for lengths, defeating the partition pruning
    # the index exists for
    stats_table = f"{table_name}_docstats"
    spark.sql(f"DROP TABLE IF EXISTS {stats_table}")
    sp = spark._jvm.org.apache.hadoop.fs.Path(
        f"{db_loc}/{stats_table.rsplit('.', 1)[-1].lower()}"
    )
    if fs.exists(sp):
        fs.delete(sp, True)
    (
        spark.table(table_name)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(stats_table)
    )
    tot = spark.table(stats_table).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).first()
    spark.sql(
        f"ALTER TABLE {table_name} SET TBLPROPERTIES "
        f"('fresco.n_docs' = '{int(tot['n'])}', "
        f"'fresco.total_len' = '{int(tot['t'])}')"
    )


def ensure_text_index(
    docs: DataFrame,
    table_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
    fingerprint: str | None = None,
) -> bool:
    """Build the positional index only when it is missing or STALE —
    the amortized entry point separating one-time build cost from
    per-query cost (VERDICT r7 item 4: the registered phrase query was
    re-building its index on every invocation, so the bench number
    conflated the two).

    ``fingerprint`` is a caller-supplied content stamp of the source
    corpus (e.g. path + row count + Σ chars). It is persisted as a
    TBLPROPERTY next to the bucket count; a later call with a different
    fingerprint (regenerated testdata, new corpus snapshot at the same
    path) rebuilds instead of silently serving stale postings — the
    same params-live-with-the-index discipline as ``fresco.n_buckets``.
    The stored form is the sha256 hex of the fingerprint, computed ONCE
    and used for both the write and the equality check (ADVICE r8:
    storing a quote-sanitized variant but comparing against the raw
    string made any fingerprint containing a quote rebuild on every
    call; hashing sidesteps SQL quoting and backslash escaping
    entirely). Indexes stamped by pre-sha256 code (raw or
    quote-sanitized fingerprints) never match the canonical form and
    rebuild ONCE after upgrade — expected, self-healing. With
    ``fingerprint=None`` the index is always rebuilt (the explicit
    build_text_index behavior). Returns True when a build happened.
    """
    spark = docs.sparkSession
    canon = (
        canonical_fingerprint(fingerprint) if fingerprint is not None else None
    )
    if canon is not None and spark.catalog.tableExists(table_name):
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {table_name}").collect()
        }
        if (
            props.get("fresco.fingerprint") == canon
            and props.get("fresco.n_buckets") == str(int(n_buckets))
            # an index stamped by pre-BM25 code can match the fingerprint
            # forever while lacking the _docstats sidecar + doc-count
            # props bm25_search_table requires — treat their absence as
            # STALE so the upgrade path self-heals like the raw-vs-sha256
            # fingerprint case (ADVICE r10) instead of hard-failing bm25
            and "fresco.n_docs" in props
            and "fresco.total_len" in props
            and spark.catalog.tableExists(f"{table_name}_docstats")
        ):
            return False
    build_text_index(docs, table_name, text_col, id_col, n_buckets)
    if fingerprint is not None:
        stamp_text_index_fingerprint(spark, table_name, fingerprint)
    return True


def phrase_search_table(
    spark: SparkSession, table_name: str, phrase: str
) -> DataFrame:
    """Catalog-resolved phrase search: reads the index's OWN stored
    ``n_buckets`` (written by :func:`build_text_index` as a table
    property), eliminating the silent-empty-result footgun of passing a
    mismatched bucket count — the same resolve-from-the-catalog
    discipline as the IVF index location handling. Raises if the table
    carries no bucket property (not built by ``build_text_index``)."""
    props = {
        r["key"]: r["value"]
        for r in spark.sql(
            f"SHOW TBLPROPERTIES {table_name}"
        ).collect()
    }
    if "fresco.n_buckets" not in props:
        raise ValueError(
            f"{table_name} has no 'fresco.n_buckets' property — "
            "not a build_text_index table; use phrase_search_index "
            "with the explicit bucket count at your own risk"
        )
    return phrase_search_index(
        spark.table(table_name), phrase, n_buckets=int(props["fresco.n_buckets"])
    )


def phrase_search_index(
    index_df: DataFrame,
    phrase: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact phrase search over a stored positional index
    (``build_text_index`` output): documents containing the phrase's
    tokens CONSECUTIVELY, with the match count and first position.

    The phrase is normalized with the index's own tokenization. Token i
    contributes its postings as ``(doc_id, pos − i)``; an occurrence is
    a (doc_id, start) key surviving all k equi-joins. The scan for each
    token carries ``_bkt = <driver-computed bucket>`` — partition
    pruning, no job needed to plan — plus the exact ``token =`` residual.
    Duplicate phrase tokens reuse the same partition; a phrase of one
    token degenerates to a postings count per doc.

    Scale shape: k pruned scans (I/O ∝ the tokens' posting lists, not
    the corpus) → (k−1) equi-joins on (doc_id, start) whose left side
    shrinks monotonically → one groupBy(doc_id). Join order is the
    phrase order; a cost-based engine would reorder by df — at the
    index layer the rarest-first rewrite is a caller-side permutation
    of the same relation (document, don't silently reorder: the result
    is identical either way)."""
    tokens = [t for t in phrase.lower().strip().split() if t]
    if not tokens:
        raise ValueError("phrase must contain at least one token")
    matched = None
    for i, tok in enumerate(tokens):
        p = (
            index_df.filter(
                (F.col("_bkt") == F.lit(_py_bucket(tok, n_buckets)))
                & (F.col("token") == F.lit(tok))
            )
            .select("doc_id", (F.col("pos") - F.lit(i)).alias("start"))
        )
        matched = p if matched is None else matched.join(
            p, ["doc_id", "start"]
        )
    return (
        matched.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("start").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


def bm25_search_table(
    spark: SparkSession, table_name: str, query: str, top_k: int = 20
) -> DataFrame:
    """Catalog-resolved BM25 over a stored index: resolves the bucket
    count AND the corpus stats (doc count, total tokens) from the
    index's own TBLPROPERTIES and the ``_docstats`` sidecar — the same
    params-live-with-the-index discipline as ``phrase_search_table``.
    Raises when the index predates the sidecar (rebuild it)."""
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table_name}").collect()
    }
    needed = {"fresco.n_buckets", "fresco.n_docs", "fresco.total_len"}
    if not needed <= set(props):
        raise ValueError(
            f"{table_name} lacks {sorted(needed - set(props))} — not a "
            "build_text_index table with the docstats sidecar; rebuild "
            "with the current build_text_index"
        )
    return bm25_search_index(
        spark.table(table_name),
        spark.table(f"{table_name}_docstats"),
        query,
        n_docs=int(props["fresco.n_docs"]),
        total_len=int(props["fresco.total_len"]),
        n_buckets=int(props["fresco.n_buckets"]),
        top_k=top_k,
    )


def bm25_search_index(
    index_df: DataFrame,
    docstats_df: DataFrame,
    query: str,
    n_docs: int,
    total_len: int,
    n_buckets: int = 32,
    top_k: int = 20,
) -> DataFrame:
    """BM25 ranked retrieval over the positional index — the RANKED
    sibling of :func:`phrase_search_index`, completing the index-at-rest
    family (exact phrase = positional equi-joins; relevance ranking =
    this). Standard Robertson/Lucene BM25 with k1 = 1.2, b = 0.75 and
    the always-positive idf ``ln((N − df + 0.5)/(df + 0.5) + 1)``,
    algebraically ``ln((2N + 2)/(2·df + 1))`` — kept in THAT form so
    the log's input is a ratio of exact BIGINTs and both engines feed
    libm the identical double (the source_token_divergence recipe).
    Per-(doc, term) scores are quantized to integer micro-units before
    the per-doc sum (order-free, cross-engine identical); ties break
    on doc_id.

    Scale shape: one pruned scan per distinct query term (driver-side
    bucket arithmetic — partition pruning with no planning job, plus
    the exact token residual), tf = one partial-agg groupBy over those
    posting lists, df = a term-sized re-aggregate of tf, document
    lengths join from the slim ``_docstats`` sidecar (broadcast-sized
    relative to the corpus; built at index time precisely so ranking
    never scans the other buckets), and the top-k is a
    TakeOrderedAndProject — no global sort. I/O ∝ the query terms'
    posting lists, never the corpus."""
    terms = sorted({t for t in query.lower().strip().split() if t})
    if not terms:
        raise ValueError("query must contain at least one token")
    buckets = sorted({_py_bucket(t, n_buckets) for t in terms})
    postings = index_df.filter(
        F.col("_bkt").isin(buckets) & F.col("token").isin(terms)
    )
    tf = postings.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(2 * (n_docs + 1)).cast("bigint")
        / (F.lit(2).cast("bigint") * F.col("df") + F.lit(1))
    )
    norm_len = (F.col("dl") * F.lit(n_docs).cast("bigint")) / F.lit(
        total_len
    ).cast("bigint")
    score = idf * (
        (F.col("tf") * F.lit(2.2))
        / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * norm_len))
    )
    u = F.round(score * 1_000_000, 0).cast("bigint")
    from pyspark.sql import Window

    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(docstats_df.select("doc_id", "dl"), "doc_id")
        .select("doc_id", u.alias("u"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
            F.sum("u").alias("score_micro"),
        )
    )
    return (
        scored.orderBy(F.desc("score_micro"), F.col("doc_id"))
        .limit(int(top_k))
        .select(
            "doc_id",
            "n_terms_matched",
            "score_micro",
            F.round(F.col("score_micro") / 1_000_000.0, 6).alias("score"),
            F.row_number()
            .over(Window.orderBy(F.desc("score_micro"), F.col("doc_id")))
            .cast("bigint")
            .alias("rank"),
        )
    )


def collocation_pmi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gap: int = 2,
    min_count: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """Collocation extraction by pointwise mutual information: ordered
    token pairs co-occurring within ``max_gap`` positions, scored
    ``PMI = ln(c_ab·N² / (M·c_a·c_b))`` — the merge-candidate statistic
    tokenizer/BPE training starts from and the phrase-vocabulary probe
    for corpus analysis. Directional (a strictly before b) and
    gap-collapsed: one count per pair summed over gaps 1..max_gap.

    Exactness: PMI is a PER-PAIR value (no cross-row float sum), and
    every quantity entering the log is an exact BIGINT product of
    counts — both engines feed libm the identical double, so plain
    6 dp rounding hash-matches with no micro-unit machinery. N² must
    stay under 2⁶³ (N < 3·10⁹ tokens); beyond that, shard the corpus
    or rescale counts before the ratio — documented, not silently
    wrong, since BIGINT overflow raises under ANSI mode.

    Scale shape: the co-occurrence pair stream is ONE equi-join of the
    postings relation against itself on ``(doc, pos + gap)`` after
    exploding gap ∈ 1..max_gap — stream size N·max_gap, strictly
    linear, never tokens² (the same shifted-position trick as
    ``phrase_search_index``). Unigram counts and the two totals are
    vocabulary-sized re-aggregations; the final ranking is
    orderBy+limit, which Catalyst executes as TakeOrderedAndProject —
    no global sort. Ties break on (tok_a, tok_b).
    """
    if max_gap < 1:
        raise ValueError(f"max_gap must be >= 1, got {max_gap}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    postings = tokenize_positions(df, text_col, id_col).filter(
        F.col("token") != ""
    )
    uni = postings.groupBy(F.col("token").alias("tok")).agg(
        F.count(F.lit(1)).alias("c")
    )
    n_tot = uni.agg(F.sum("c").alias("n"))
    a = postings.select(
        "doc_id", F.col("token").alias("tok_a"), F.col("pos")
    ).withColumn("gap", F.explode(F.sequence(F.lit(1), F.lit(int(max_gap)))))
    b = postings.select(
        "doc_id",
        F.col("token").alias("tok_b"),
        F.col("pos").alias("_pos_b"),
    )
    pairs = (
        a.withColumn("_pos_b", F.col("pos") + F.col("gap"))
        .join(b, ["doc_id", "_pos_b"])
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    m_tot = pairs.agg(F.sum("c_ab").alias("m"))
    ca = uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    pmi = F.round(
        F.log(
            (F.col("c_ab") * F.col("n") * F.col("n"))
            / (F.col("m") * F.col("c_a") * F.col("c_b"))
        ),
        6,
    )
    return (
        pairs.filter(F.col("c_ab") >= F.lit(int(min_count)))
        .join(ca, "tok_a")
        .join(cb, "tok_b")
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(m_tot))
        .select(
            "tok_a",
            "tok_b",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.col("c_a").cast("bigint").alias("c_a"),
            F.col("c_b").cast("bigint").alias("c_b"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "tok_a", "tok_b")
        .limit(int(top_n))
    )


def _bpe_train(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    min_count: int,
):
    """Word-level BPE merge learning: ``k`` iterations of
    count-adjacent-pairs → pick the most frequent pair → merge its
    non-overlapping occurrences greedily left-to-right — the classic
    byte-pair-encoding training loop lifted to whitespace tokens,
    completing the tokenizer-prep story (vocab_stats → oov_rate →
    collocation_pmi → merges). Returns one row per learned merge:
    ``step, unit_a, unit_b, pair_count`` (≤ k rows; learning stops
    early when no pair reaches ``min_count``).

    Determinism (oracle rule 9): pair counts are exact BIGINTs; the
    winner is (count DESC, unit_a ASC, unit_b ASC) — a total order, so
    both engines pick the same pair every step. Greedy overlap
    resolution matters only for self-pairs (a candidate can overlap
    the next only when unit_a == unit_b): within each maximal chain of
    consecutive candidates, the 1st/3rd/5th… merge — "x x x x" merges
    positions 0 and 2, exactly the sequential greedy result — via two
    per-document windows over the CANDIDATE rows (bounded by document
    length, the same per-doc window contract as every text operator).

    Scale shape per iteration (r14): the units relation is a PARTITION
    of each document's token sequence, so "the following unit" is the
    next row in per-doc position order — adjacency is ``lead()`` over
    one (doc, pos) window, NOT a self-join (the r13 shape shuffled both
    join legs plus an anti-join per round, ~19 MB/iteration at sf0.1;
    the window shape pays ONE hash-by-doc exchange for the whole
    trainer and reuses it every round, since the checkpoint preserves
    partitioning and ordering). A lead row is adjacent iff its pos
    equals pos+span (gaps left by filtered empty tokens break
    adjacency exactly like the join's missed key did). The greedy
    merge is window arithmetic in the SAME frame: candidate chains are
    maximal runs of consecutive candidate ROWS (a preceding candidate
    row always overlaps — its b-unit IS this row; a non-adjacent
    preceding candidate can never satisfy pos = prev_pos + prev_span
    because positions strictly increase), odd chain offsets are the
    sequential-greedy picks, and the consumed-b-row flag is
    ``lag(selected)``. Per round that leaves one partial-agg pair
    count + a 1-row driver collect of the winner (bounded, k of them
    total: the same bounded-driver-stat contract as
    distributed_exact_percentiles) and zero other shuffles. The units
    relation is localCheckpointed each round: it feeds the pair count,
    the merge, and the next round, and k rounds of uncheckpointed
    lineage would re-run the tokenize k times (the ivf_train persist
    rationale).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    spark = df.sparkSession
    units = (
        tokenize_positions(df, text_col, id_col)
        .filter(F.col("token") != "")
        .select(
            "doc_id",
            F.col("pos"),
            F.col("token").alias("unit"),
            F.lit(1).cast("bigint").alias("span"),
        )
        # pay the per-doc hash exchange ONCE, before the first
        # checkpoint: every window below clusters by doc_id, and the
        # checkpointed relations inherit this layout round over round
        # (also spreads the bench's single-row-group scan across cores)
        .repartition("doc_id")
    )
    out_schema = "step int, unit_a string, unit_b string, pair_count bigint"
    merges: list[tuple[int, str, str, int]] = []
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    wcum = wdoc.rowsBetween(Window.unboundedPreceding, 0)
    for step in range(1, int(k) + 1):
        # checkpoint AFTER the lead window, not before: the winner
        # collect below then reads materialized rows instead of
        # re-sorting the relation per round (the pair-count job and the
        # merge projection share one physical pass per round this way)
        paired = units.select(
            "doc_id",
            "pos",
            "unit",
            "span",
            F.lead("pos").over(wdoc).alias("_bpos"),
            F.lead("unit").over(wdoc).alias("_bunit"),
            F.lead("span").over(wdoc).alias("_bspan"),
        ).localCheckpoint(eager=True)
        adjacent = F.col("_bpos") == F.col("pos") + F.col("span")
        top = (
            paired.filter(adjacent)
            .groupBy("unit", "_bunit")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= F.lit(int(min_count)))
            .orderBy(F.desc("c"), "unit", "_bunit")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["unit"], top[0]["_bunit"], int(top[0]["c"])
        merges.append((step, a, b, c))
        # greedy left-to-right merge of the winning pair, all in the
        # same per-doc window frame (see docstring): chain-offset
        # parity picks the 1st/3rd/5th… of each run of consecutive
        # candidate rows — the sequential-greedy result.
        cand = F.when(
            adjacent
            & (F.col("unit") == F.lit(a))
            & (F.col("_bunit") == F.lit(b)),
            1,
        ).otherwise(0)
        staged = (
            paired.withColumn("_cand", cand)
            .withColumn("_prev_cand", F.lag("_cand", 1, 0).over(wdoc))
            .withColumn("_cum", F.sum("_cand").over(wcum))
        )
        chain_start = (F.col("_cand") == 1) & (F.col("_prev_cand") == 0)
        staged = staged.withColumn(
            "_chain_base", F.max(F.when(chain_start, F.col("_cum"))).over(wcum)
        )
        selected = (F.col("_cand") == 1) & (
            (F.col("_cum") - F.col("_chain_base")) % 2 == 0
        )
        staged = staged.withColumn("_sel", selected.cast("int")).withColumn(
            "_consumed", F.lag("_sel", 1, 0).over(wdoc)
        )
        units = staged.filter(F.col("_consumed") == 0).select(
            "doc_id",
            "pos",
            F.when(F.col("_sel") == 1, F.lit(a + " " + b))
            .otherwise(F.col("unit"))
            .alias("unit"),
            F.when(F.col("_sel") == 1, F.col("span") + F.col("_bspan"))
            .otherwise(F.col("span"))
            .alias("span"),
        )
    return spark.createDataFrame(merges, out_schema), units


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 5,
) -> DataFrame:
    """The learned merge TABLE of :func:`_bpe_train` — one row per
    merge step: ``step, unit_a, unit_b, pair_count`` (≤ k rows; see the
    trainer's docstring for the algorithm, determinism, and scale
    contract)."""
    merges, _ = _bpe_train(df, text_col, id_col, k, min_count)
    return merges


def bpe_segment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 5,
) -> DataFrame:
    """The APPLY side of BPE: the corpus re-segmented by the k learned
    merges — the final units relation ``(doc_id, pos, unit, span)``
    the training loop maintains anyway (pos is the unit's original
    start position, span how many source tokens it absorbed). Training
    and application share one implementation, so the segmentation is
    exactly the greedy left-to-right result of applying the learned
    merge list in order — the property the sequential-greedy
    equivalence test pins for :func:`bpe_merges` extends to the units
    by construction. Completes the tokenizer-prep story: learn the
    merges (`bpe_merges`), then measure what they do to the corpus
    (units per doc, compression, the new unit vocabulary)."""
    _, units = _bpe_train(df, text_col, id_col, k, min_count)
    return units


def reciprocal_rank_fusion(
    ranked: list[tuple[DataFrame, str, str]],
    id_col: str = "doc_id",
    k_const: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) — the standard hybrid-retrieval combiner: each input list
    contributes ``1/(k_const + rank)`` and documents are re-ranked by
    the sum, so agreement between retrievers beats any single high
    rank. ``ranked`` is a list of ``(df, score_col, rank_name)``:
    each df a BOUNDED top-N relation (the output of tfidf_search /
    brute_force_knn / bm25 — never a corpus-sized input), ranked here
    by the shared (score DESC, id ASC) tie discipline.

    Determinism: per-list contributions micro-quantize HALF_UP to
    BIGINT (``round(1e6 / (k_const + rank))``) and the fusion key is
    their exact integer sum — order-free and engine-identical; ties
    break on id. Output: ``(id, <rank_name per list — NULL where the
    document missed that list>, rrf_micro)``, top_k rows by
    (rrf_micro DESC, id ASC).

    Scale shape: every input is already top-N, so the full-outer join
    chain and the final TakeOrderedAndProject run on at most
    Σ N_i rows — the expensive part is the retrievals, never the
    fusion."""
    if len(ranked) < 2:
        raise ValueError(f"need >= 2 ranked lists, got {len(ranked)}")
    if k_const < 1 or top_k < 1:
        raise ValueError(
            f"k_const and top_k must be >= 1, got {k_const}, {top_k}"
        )
    # repeated rank_name values would surface much later as an
    # ambiguous-column error inside the join chain (ADVICE r12) —
    # reject them here, at the API boundary, with a usable message
    all_names = [rank_name for _, _, rank_name in ranked]
    if len(set(all_names)) != len(all_names):
        raise ValueError(f"rank_name values must be distinct: {all_names}")
    if id_col in all_names:
        raise ValueError(f"rank_name may not shadow id_col {id_col!r}")
    fused = None
    names = []
    for df, score_col, rank_name in ranked:
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        # a duplicated id inside one list would fan out the full-outer
        # join and double-count its credit (ADVICE r12); dedup to the
        # best score per id BEFORE ranking (ADVICE r13: ranking the
        # raw list and then min-ing left a rank GAP for every document
        # after the duplicate — the next doc got rank 3, not 2,
        # shifting its 1/(k+rank) credit). A no-op for well-formed
        # top-N inputs; both steps stay on bounded relations.
        part = (
            df.groupBy(id_col)
            .agg(F.max(score_col).alias(score_col))
            .select(
                F.col(id_col),
                F.row_number().over(w).cast("int").alias(rank_name),
            )
        )
        names.append(rank_name)
        fused = part if fused is None else fused.join(
            part, id_col, "full_outer"
        )
    contribs = [
        F.coalesce(
            F.round(
                F.lit(1_000_000.0) / (F.lit(int(k_const)) + F.col(n)), 0
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        )
        for n in names
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return (
        fused.select(id_col, *names, total.alias("rrf_micro"))
        .orderBy(F.desc("rrf_micro"), F.asc(id_col))
        .limit(int(top_k))
    )
