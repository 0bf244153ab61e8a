"""Deterministic sampling for training-data pipelines.

``.sample()`` is the wrong tool for corpus curation at scale: its output
depends on partitioning and RNG state, so reruns and engines disagree.
These operators decide per ROW from a content-derived hash — stable
across partitionings, retries, engines — the property a 100 TB pipeline
needs for reproducible train/eval splits and per-source mixing ratios
(the data-mixture knob in LLM corpus construction).

The hash is the repo's shared md5-derived 60-bit value
(functions/dedup.py::_h60), byte-identical in DuckDB, so every sample is
fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fresco_hpc_spark.functions.dedup import _h60

_H60_RANGE = float(2**60)


def hash_fraction(key: Column) -> Column:
    """Uniform [0, 1) fraction derived from md5(key) — the per-row coin."""
    return _h60(key.cast("string")) / F.lit(_H60_RANGE)


def hash_sample(df: DataFrame, rate: float, key_col: str) -> DataFrame:
    """Keep rows whose hash fraction falls under ``rate`` — a
    deterministic ~rate sample, exactly reproducible anywhere. A narrow
    map-side filter: no shuffle, no RNG, pushdown-friendly."""
    return df.filter(hash_fraction(F.col(key_col)) < F.lit(float(rate)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixture operator:
    each stratum keeps its own fraction (e.g. {"wiki": 1.0, "web": 0.1}).
    The rate lookup is a literal CASE chain (strata vocabularies are
    small and known, like pivot columns); the decision stays one
    map-side comparison per row. Salting the hash with the stratum keeps
    per-stratum decisions independent even when the same key appears in
    two strata."""
    frac = hash_fraction(
        F.concat(F.col(strata_col), F.lit("|"), F.col(key_col).cast("string"))
    )
    rate: Column = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(frac < rate)


def corpus_split(
    df: DataFrame,
    key_col: str,
    eval_frac: float = 0.01,
    split_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/eval membership: rows whose salted hash
    fraction falls under ``eval_frac`` are labeled ``eval``, the rest
    ``train``. The salt decorrelates the split coin from any sampling
    coin on the same keys (otherwise eval would be a subset of every
    downsampled corpus). Membership is a pure function of the key —
    stable across reruns, engines, and corpus growth (a document keeps
    its split when new data arrives, the property that prevents
    train/eval leakage over pipeline generations)."""
    frac = hash_fraction(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    return df.withColumn(
        split_col,
        F.when(frac < F.lit(float(eval_frac)), F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    token_count_col: Column,
    key_col: str,
    strata_col: str | None = None,
    salt: str = "budget",
) -> DataFrame:
    """Quota sampling by token budget: within each stratum, take
    documents in a deterministic pseudo-random order until the running
    token total reaches ``budget`` (inclusive of the row that crosses
    it stays OUT; every kept row fits entirely). The data-mixture
    operator expressed in tokens, which is what an LLM pretraining mix
    actually budgets — per-source doc COUNTS under-weight long docs.

    The order is the salted hash fraction (then key for total order):
    reproducible on any engine/partitioning, and independent of any
    other sampling coin on the same keys. One window pass per stratum —
    the running sum shuffles once on the stratum key.
    """
    part = [F.col(strata_col)] if strata_col is not None else []
    from pyspark.sql import Window

    frac = hash_fraction(
        F.concat(F.lit(salt + "|"), F.col(key_col).cast("string"))
    )
    w = (
        Window.partitionBy(*part)
        .orderBy(frac.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_count_col).over(w)
    return df.withColumn("_cum_tokens", cum).filter(
        F.col("_cum_tokens") <= F.lit(int(budget))
    )


def temperature_mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    temperature: float = 2.0,
    target_fraction: float = 0.5,
    rate_col: str = "sample_rate",
) -> DataFrame:
    """Temperature-scaled source mixing — the multilingual-pretraining
    data-mixture rule: source s is sampled with probability
    ``p_s ∝ n_s^(1/T)``. ``T = 1`` reproduces natural proportions;
    larger T flattens toward uniform, boosting small sources' share
    relative to head sources. Per-source keep rate is
    ``min(1, target_fraction · total · p_s / n_s)`` — downsampling
    only, so sources whose temperature share exceeds their size cap at
    1.0; chain with ``weighted_repeat`` when a source's temperature
    share calls for true upsampling beyond rate 1.

    Unlike ``stratified_hash_sample`` the rates are DERIVED FROM THE
    DATA, fully inside the plan: per-source counts → temperature
    weights → a broadcast rate join (source vocabularies are small and
    bounded — genuinely broadcastable, unlike token vocabularies). No
    driver collect, no RNG: the per-row coin is the shared md5 hash
    fraction, so the sample is deterministic and oracle-checkable.

    Output: input rows that pass their source's coin, plus ``rate_col``
    (the applied rate, rounded) for audit/debiasing downstream.
    """
    counts = df.groupBy(F.col(strata_col)).agg(F.count(F.lit(1)).alias("_n"))
    weights = counts.select(
        strata_col,
        "_n",
        F.pow(F.col("_n").cast("double"), F.lit(1.0 / float(temperature))).alias("_w"),
    )
    totals = weights.agg(
        F.sum("_n").alias("_total"), F.sum("_w").alias("_wsum")
    )
    rates = weights.crossJoin(F.broadcast(totals)).select(
        strata_col,
        F.least(
            F.lit(1.0),
            F.lit(float(target_fraction))
            * F.col("_total")
            * F.col("_w")
            / (F.col("_wsum") * F.col("_n")),
        ).alias("_rate"),
    )
    frac = hash_fraction(
        F.concat(F.col(strata_col), F.lit("|"), F.col(key_col).cast("string"))
    )
    # null-safe on the stratum (r7 sweep of the r6-review join-null
    # class): a NULL stratum is counted by the groupBy above and gets
    # its own temperature weight, but a plain equi-join would silently
    # drop every row of it here. NOTE: the coin concat yields NULL for
    # a NULL stratum, so those rows use the bare-key coin instead.
    rates_r = rates.withColumnRenamed(strata_col, "_s")
    frac = F.coalesce(
        frac, hash_fraction(F.concat(F.lit("|"), F.col(key_col).cast("string")))
    )
    return (
        df.join(
            F.broadcast(rates_r), F.col(strata_col).eqNullSafe(F.col("_s"))
        )
        .filter(frac < F.col("_rate"))
        .withColumn(rate_col, F.round(F.col("_rate"), 6))
        .drop("_rate", "_s")
    )


def weighted_repeat(
    df: DataFrame,
    key_col: str,
    weight: Column | float,
    copy_col: str = "copy_idx",
    salt: str = "repeat",
) -> DataFrame:
    """Deterministic fractional UPSAMPLING — the other half of mixture
    construction (``temperature_mixture_sample`` only downsamples): each
    row is emitted ``⌊w⌋`` times plus one more when its hash coin falls
    under ``frac(w)``, so expected multiplicity is exactly ``w`` with
    zero RNG. ``weight`` may be a constant or a Column (e.g. a
    per-source weight joined on). ``copy_col`` (0-based) distinguishes
    the copies so downstream exact-dedup doesn't immediately undo the
    repetition and shuffles spread copies across partitions.

    Map-side only: ``sequence`` + ``explode`` per row, no shuffle, no
    driver involvement; the salted coin is decorrelated from the
    sampling/split coins on the same keys.
    """
    w = F.lit(float(weight)) if isinstance(weight, (int, float)) else weight
    w = w.cast("double")
    base = F.floor(w).cast("int")
    frac = w - F.floor(w)
    coin = hash_fraction(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    n_copies = base + F.when(coin < frac, F.lit(1)).otherwise(F.lit(0))
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies.cast("int") - 1)
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    return df.withColumn(copy_col, F.explode(copies))


def cap_per_group(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap",
    prefilter_factor: int = 4,
) -> DataFrame:
    """Per-group document cap — domain/source balancing, web-corpus
    curation's standard defense against one domain dominating the
    mixture (the reference keeps per-source mixing ratios; the cap is
    the hard ceiling variant): keep AT MOST ``n`` documents per group,
    selected as the n smallest salted-hash coins (content-stable, so
    survival is reproducible across partitionings, retries, engines —
    not "first n by arrival"). Ties on the coin break by the key.
    Output adds ``cap_rank`` (1-based rank within the group).

    Scale shape — the head-domain problem: a per-group rank is a
    window sort, and at web scale one domain can hold 10⁸ documents,
    which would sort (and spill) in a single task. This implementation
    is TWO-PHASE and stays exact:

    1. group counts (one partial-aggregated shuffle, relation sized by
       the number of groups);
    2. groups bigger than ``prefilter_factor·n`` are PRE-FILTERED
       map-side to coins below ``prefilter_factor·n / count`` — an
       expected ``prefilter_factor·n`` survivors per group, so the
       window input is bounded by ~p·n rows per group regardless of
       group size. Because the selection criterion and the prefilter
       use the SAME coin, the n smallest coins always survive a
       prefilter that keeps ≥ n rows; any group the filter leaves
       short (P ≤ exp(−p·n·ln(p/e)/…) — astronomically rare, but
       checked, not assumed) falls back to ranking ALL its rows, so
       the result is deterministically exact, never sampled.

    The final window therefore sorts ≤ max(p·n, shortfall-group size)
    rows per group — head domains cost the same as everyone else.
    """
    from pyspark.sql import Window

    coin = hash_fraction(
        F.concat(F.lit(salt + "|"), F.col(key_col).cast("string"))
    )
    with_coin = df.withColumn("_coin", coin)
    p = int(prefilter_factor)
    # every join below is NULL-SAFE on the group key: a NULL group
    # (missing domain metadata) is a legitimate group of its own —
    # window PARTITION BY already treats it as one, and a plain
    # equi-join would silently drop every NULL-group row instead of
    # capping it (r6 review finding)
    counts = (
        with_coin.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_gn"))
        .withColumnRenamed(group_col, "_g")
    )
    joined = with_coin.join(
        counts, F.col(group_col).eqNullSafe(F.col("_g"))
    ).drop("_g")
    thresh = F.lit(float(p * n)) / F.col("_gn")
    pre = joined.filter(
        (F.col("_gn") <= F.lit(p * n)) | (F.col("_coin") < thresh)
    )
    # exactness check: a big group whose prefilter kept < n rows (in
    # practice: never) re-ranks over all of its rows. Anchored on the
    # FULL group list (counts), not pre — a group whose prefilter kept
    # ZERO rows is absent from pre's groupBy and would otherwise
    # silently vanish instead of falling back.
    kept = (
        pre.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_kept"))
        .withColumnRenamed(group_col, "_g")
    )
    short = (
        counts.join(kept, counts["_g"].eqNullSafe(kept["_g"]), "left")
        .filter(F.coalesce(F.col("_kept"), F.lit(0)) < F.lit(n))
        .select(counts["_g"].alias("_gshort"))
    )
    fallback = joined.join(
        short, F.col(group_col).eqNullSafe(F.col("_gshort")), "left_semi"
    )
    final_input = pre.join(
        short, F.col(group_col).eqNullSafe(F.col("_gshort")), "left_anti"
    ).unionByName(fallback)
    w = Window.partitionBy(group_col).orderBy(
        F.col("_coin").asc(), F.col(key_col).asc()
    )
    return (
        final_input.withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= F.lit(n))
        .drop("_coin", "_gn")
        .orderBy(group_col, "cap_rank")
    )


def cluster_aware_split(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str = "doc_id",
    eval_frac: float = 0.1,
    split_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/eval split: the split coin is thrown on the
    near-dup CLUSTER representative, not the document id, so every
    member of a duplicate cluster lands on the SAME side. A plain
    per-document split leaks — a near copy of an eval document in train
    lets the model memorize the "held-out" text (the exact failure
    cross-corpus dedup papers flag in public benchmarks).

    ``pairs`` is any near-dup pair relation (MinHash, SimHash, phash,
    containment — columns ``doc_a``/``doc_b``); clusters come from
    :func:`...dedup.dup_clusters` (large-star/small-star CC), documents
    absent from every pair are their own singleton cluster. The coin
    itself is :func:`corpus_split`'s salted hash on the representative,
    so singleton documents get EXACTLY the split corpus_split gives
    them — the cluster pass only coordinates duplicates.

    Scale shape: clustering is the O(log² n) CC rounds over the pair
    relation (pairs ∝ near-dups, not corpus); the membership join is an
    equi left join; the coin is a map-side expression. Output adds
    ``cluster_id`` (the representative) and ``split``.
    """
    from fresco_hpc_spark.functions.dedup import dup_clusters

    clusters = dup_clusters(pairs).withColumnRenamed("doc", key_col)
    labeled = df.join(clusters, key_col, "left")
    rep = F.coalesce(F.col("cluster_id"), F.col(key_col))
    frac = hash_fraction(F.concat(F.lit(salt + "|"), rep.cast("string")))
    # cluster_id keeps the key column's NATIVE type (ADVICE r5: a
    # hard-coded bigint cast silently nulled the column for string/uuid
    # document ids while the split itself still worked)
    key_type = df.schema[key_col].dataType
    return labeled.withColumn("cluster_id", rep.cast(key_type)).withColumn(
        split_col,
        F.when(frac < F.lit(float(eval_frac)), F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Sequence packing — assign documents to fixed-token-budget
    training bins (the pre-tokenization step that turns a document
    corpus into ~budget-sized concatenated training sequences, so short
    documents don't waste context length as padding). Deterministic
    contiguous first-fit in (stratum, id) order: a document opens a new
    bin when the stratum's EXCLUSIVE running token count crosses a
    budget boundary, so ``bin_id = floor(prefix_sum / budget)``. Bins
    may overrun the budget by at most one document's tokens minus one
    (the standard streaming-pack bound — the trainer truncates or
    rolls the tail into the next sequence).

    Scale shape: the prefix sum is a window WITHIN each stratum
    (partitioned — no single-partition global sort; packing per
    shard/source is also what training pipelines actually do, keeping
    mixtures intact). One shuffle on the stratum key; token counting is
    map-side.

    Output: one row per document — stratum, id, ``n_tokens``,
    ``bin_id`` (0-based within the stratum).
    """
    from pyspark.sql import Window

    from fresco_hpc_spark.functions.text import token_count

    counts = df.filter(F.col(text_col).isNotNull()).select(
        F.col(strata_col),
        F.col(id_col),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return counts.select(
        strata_col,
        id_col,
        "n_tokens",
        F.floor(prefix / F.lit(int(budget_tokens))).cast("bigint").alias("bin_id"),
    ).orderBy(strata_col, id_col)


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
    salt: str = "ares",
    round_to: int = 9,
) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    A-Res, the missing member of the sampling family (hash_sample /
    stratified rates = Bernoulli; weighted_repeat = with replacement;
    this = fixed-size k, inclusion probability ∝ weight, no
    duplicates). Each row draws ``sample_key = u^(1/w)`` with ``u`` the
    deterministic md5-uniform coin; the k LARGEST keys are a weighted
    reservoir sample. Content-derived coin ⇒ reproducible across
    partitionings, retries, and engines, and fully oracle-checkable
    (the key rounds to ``round_to`` dp before ranking so a last-ulp
    ``pow`` difference between libm implementations cannot flip a rank;
    ties break on the id).

    Rows with a NULL id or NULL/non-positive weight are excluded: the
    coin is id-derived, so a NULL id has no defined inclusion
    probability (r7 review: without the id filter the global and
    grouped routes disagreed — the grouped route's cume-counts dropped
    the NULL key while the global sort could emit it), and weight ∝
    inclusion has no meaning for non-positive weights. Filter or
    reassign upstream if such rows must participate. Ids are the
    sampling IDENTITY and must be unique within a group: duplicate ids
    draw the SAME coin (hence identical keys), so their relative rank
    at the k-boundary is tie-broken arbitrarily — dedup upstream if
    ids can repeat.

    Scale shape: the GLOBAL variant (``group_col=None``) is a
    ``TakeOrderedAndProject`` — top-k without a global sort. The
    grouped variant must not sort whole groups on one task (a hot
    stratum can hold 10⁸ rows), so it is TWO-PHASE and exact, built on
    the grouped distributed order statistics primitive:

    1. :func:`~fresco_hpc_spark.operators.percentiles.grouped_cume_counts`
       over the keys gives, per group, the EXACT k-th-largest key (the
       smallest distinct key with ≥ min(k, n) rows at or above it) —
       no per-group sort, no driver collect.
    2. rows prefilter map-side to ``key ≥ bound`` — at most k plus the
       bound's tie run per group — and only that bounded relation pays
       the rank window. Unlike cap_per_group's probabilistic
       coin-threshold prefilter (which needs a shortfall fallback),
       the order-statistic bound is exact by construction: the
       prefilter always keeps ≥ min(k, n) rows.

    NULL group keys form their own group (null-safe join — same
    contract as cap_per_group and knn_graph_blocked). Output adds
    ``sample_key`` (rounded) and ``sample_rank`` (1-based within the
    group, or globally).
    """
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    u = hash_fraction(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    )
    key = F.round(F.pow(u, F.lit(1.0) / w), round_to)
    base = df.filter(
        F.col(id_col).isNotNull() & w.isNotNull() & (w > 0)
    ).withColumn("_key", key)
    if group_col is None:
        return (
            base.orderBy(F.desc("_key"), F.col(id_col))
            .limit(int(k))
            .withColumnRenamed("_key", "sample_key")
            .withColumn(
                "sample_rank",
                F.row_number()
                .over(Window.orderBy(F.desc("sample_key"), F.col(id_col)))
                .cast("bigint"),
            )
        )
    from fresco_hpc_spark.operators.percentiles import grouped_cume_counts

    cc = grouped_cume_counts(base, [group_col], "_key")
    at_or_above = F.col("_n") - F.col("_cume") + F.col("_cnt")
    bounds = (
        cc.filter(at_or_above >= F.least(F.lit(int(k)), F.col("_n")))
        .groupBy(group_col)
        .agg(F.max("_v").alias("_bound"))
        .withColumnRenamed(group_col, "_g")
    )
    pre = base.join(
        bounds, F.col(group_col).eqNullSafe(F.col("_g"))
    ).filter(F.col("_key") >= F.col("_bound"))
    rank_w = Window.partitionBy(group_col).orderBy(
        F.desc("_key"), F.col(id_col)
    )
    return (
        pre.withColumn(
            "sample_rank", F.row_number().over(rank_w).cast("bigint")
        )
        .filter(F.col("sample_rank") <= F.lit(int(k)))
        .drop("_g", "_bound")
        .withColumnRenamed("_key", "sample_key")
    )


def pack_texts(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "source",
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize the packed training sequences themselves — the
    completion of :func:`pack_sequences` (VERDICT r5 item 3/"minor"):
    one row per (stratum, bin) with the member documents CONCATENATED
    in packing order plus the doc-boundary metadata a trainer needs to
    mask cross-document attention. Binning is identical to
    pack_sequences (same window prefix sum, same first-fit bound).

    Output per (stratum, bin_id): ``n_docs``, ``n_tokens`` (sum over
    members' DOCUMENT tokens — may overrun the budget by at most one
    document's tokens minus one; separator tokens are not counted
    here), ``doc_ids`` and ``offsets`` as comma-joined strings
    (offsets[i] = whitespace-token offset where document i starts in
    ``packed_text``, INCLUDING any tokens the separator itself
    contributes — ADVICE r6), and ``packed_text`` (members joined by
    ``sep`` in (stratum, id) order).

    ``sep`` must either be pure whitespace (contributes 0 tokens) or
    carry whitespace on BOTH ends (its interior words count as
    tokens). A separator with word characters touching a document —
    e.g. ``"<|doc|>"`` — would glue onto adjacent document tokens,
    making every following offset ill-defined; that raises ValueError
    rather than silently shifting offsets.

    Scale shape: ONE shuffle — the stratum-partitioned window; the
    following groupBy (stratum, bin_id) reuses the same partitioning
    (hash(stratum) already clusters every (stratum, bin) group), so
    Catalyst inserts no second exchange (plan-pinned in
    test_plan_quality). The per-bin offset fold is a JVM higher-order
    ``aggregate`` over the bin's members — bin membership is bounded by
    the token budget, not the corpus.
    """
    import re

    from pyspark.sql import Window

    from fresco_hpc_spark.functions.text import token_count

    if re.fullmatch(r"\s*", sep):
        sep_tokens = 0
    elif re.fullmatch(r"\s.*\s", sep, re.DOTALL):
        sep_tokens = len(sep.split())
    else:
        raise ValueError(
            "pack_texts sep must be pure whitespace or whitespace-"
            f"delimited on both ends (got {sep!r}): a separator touching "
            "a document's text merges with its tokens and every "
            "following offset would silently shift"
        )

    # a NULL-text doc cannot be packed: its NULL token count would
    # poison the prefix sums and the offsets fold (r13 null-parity
    # probe); pack_sequences filters identically so both binnings agree
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(strata_col),
        F.col(id_col),
        F.col(text_col),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    binned = base.withColumn(
        "bin_id", F.floor(prefix / F.lit(int(budget_tokens))).cast("bigint")
    )
    members = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(id_col).alias("id"),
                F.col("n_tokens").alias("nt"),
                F.col(text_col).alias("txt"),
            )
        )
    )
    agg = binned.groupBy(strata_col, "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        members.alias("_m"),
    )
    # running token offsets: JVM fold over the bin's (bounded) members;
    # each step advances by the member's tokens PLUS the separator's own
    # token contribution (0 for whitespace seps — ADVICE r6: a non-blank
    # sep shifted every true offset)
    offsets = F.aggregate(
        F.col("_m"),
        F.struct(
            F.lit(0).cast("bigint").alias("acc"),
            F.expr("CAST(array() AS array<bigint>)").alias("offs"),
        ),
        lambda st, x: F.struct(
            (st["acc"] + x["nt"] + F.lit(sep_tokens)).alias("acc"),
            F.concat(st["offs"], F.array(st["acc"])).alias("offs"),
        ),
        lambda st: st["offs"],
    )
    return (
        agg.select(
            F.col(strata_col),
            F.col("bin_id"),
            "n_docs",
            "n_tokens",
            F.array_join(
                F.transform(F.col("_m"), lambda x: x["id"].cast("string")), ","
            ).alias("doc_ids"),
            F.array_join(
                F.transform(offsets, lambda o: o.cast("string")), ","
            ).alias("offsets"),
            F.array_join(
                F.transform(F.col("_m"), lambda x: x["txt"]), sep
            ).alias("packed_text"),
        )
        .orderBy(strata_col, "bin_id")
    )


def length_bucket_profile(
    df: DataFrame,
    text_col: str = "text",
    bins: int = 8,
) -> DataFrame:
    """Padding-efficiency profile of length-bucketed training batches:
    split the corpus into ``bins`` equi-depth buckets by token count
    and report, per bucket, how much compute padding-to-the-bucket-max
    would waste. The pre-flight for length-sorted batching (the
    standard alternative to sequence packing): if batches are drawn
    within a bucket and padded to that batch's max length,
    ``padding_waste`` ≈ the fraction of padded positions that are pad
    tokens — near 0 for well-separated buckets, and the bucket-count
    knob trades waste against shuffle granularity. Complements
    ``pack_sequences``/``pack_texts`` (which eliminate padding by
    concatenation) by quantifying the do-nothing baseline.

    Semantics: documents with zero tokens are excluded (they would
    join any bucket for free and report 100% waste); bucket edges sit
    at the i/bins percentiles of the token count via the distributed
    order-statistics machinery (bounds rounded HALF_UP at 6 dp, equal
    lengths always share a bucket — standard equi-depth tie
    semantics); ``padding_waste = 1 − Σtokens/(n·max_tokens)`` rounded
    to 6 dp.

    Scale shape: identical to ``equi_depth_histogram`` — two bounded
    bounds jobs, then a map-side ``when()`` labeling and ONE
    partial-aggregated groupBy with ``bins`` groups. No sort of the
    data, no window, nothing ∝ n on a single task; the token count is
    a per-row JVM expression.
    """
    from fresco_hpc_spark.functions.text import token_count
    from fresco_hpc_spark.operators.percentiles import quantile_bucket

    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    lengths = df.select(
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    if bins == 1:
        labeled = lengths.withColumn("bucket", F.lit(1).cast("bigint"))
    else:
        fractions = [i / bins for i in range(1, bins)]
        labeled = quantile_bucket(lengths, "n_tokens", fractions)
    return (
        labeled.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.sum("n_tokens") / F.count(F.lit(1)), 6).alias(
                "mean_tokens"
            ),
            F.round(
                1 - F.sum("n_tokens") / (F.count(F.lit(1)) * F.max("n_tokens")),
                6,
            ).alias("padding_waste"),
        )
        .orderBy("bucket")
    )


def _dsir_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Word unigram + bigram features per document (with multiplicity),
    the DSIR feature space before hashing. Map-only: one split
    MATERIALIZED as a column first (the repetition_stats lesson —
    inlining the split into per-element lambdas re-evaluates it per
    reference, turning a linear explode into O(len²) per doc; measured
    8 s -> 0.6 s at sf0.1), then bigrams as a zip of the two
    one-shifted slices — two O(n) slices, never element_at in a loop.
    Fanned out before the CPU-bound split/zip work (r15: the raw-corpus
    explode ran as ONE ~1.8 s task per consumer because the documents
    table is a single file; identity on any ≥cores-files layout)."""
    from fresco_hpc_spark.functions.text import _fan_out

    df = _fan_out(df)
    ws_expr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).alias("doc"), ws_expr.alias("ws"))
    w = F.col("ws")
    n = F.size(w)
    unis = F.filter(w, lambda x: x != "")
    bis = F.when(
        n >= 2,
        F.zip_with(
            F.slice(w, 1, n - 1),
            F.slice(w, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        "doc", F.explode(F.concat(unis, bis)).alias("feat")
    ).filter(F.col("feat") != "")


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, *Data Selection
    for Language Models via Importance Resampling*): score every raw
    document by how target-like its hashed n-gram profile is —
    ``log w(x) = Σ_b c_b(x)·(log p_b − log q_b)`` with ``p``/``q``
    bag-of-hashed-ngram (unigram+bigram, ``n_buckets`` buckets,
    Laplace +1) models of the target and raw corpora. The standard
    pretraining-data selection operator: rank a web crawl by domain
    affinity to a small in-domain corpus without training a model.

    Output: one row per raw document — ``n_feats`` (feature
    occurrences) and ``logw_micro`` (BIGINT micro-nats) /
    ``logw`` (6-dp view).

    Exactness contract (oracle rule 8): the per-(doc, bucket) term
    ``c_db·ln(ratio_b)`` is quantized to integer micro-nats before the
    per-doc sum (order-free, cross-engine identical), and the log
    ratio's operands are exact BIGINT products
    ``(ct_b+1)·(Nr+B) / (cr_b+1)·(Nt+B)`` — exact while corpus feature
    mass stays under ~2×10⁹ per side (document the shard-and-merge
    route past that; same caveat as source_token_divergence).

    Scale shape (100 TB): feature extraction is map-only; both bucket
    models are ``n_buckets``-row aggregates with map-side partials (a
    bucket hit a billion times pre-combines); the per-doc score joins
    the (doc, bucket) counts against the BROADCAST bucket table and
    sums per doc — one shuffle on the doc key. The hash is the shared
    md5 ``_h60`` so every weight is byte-identical in DuckDB.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    b = F.lit(int(n_buckets))

    def bucketed(frame: DataFrame) -> DataFrame:
        return _dsir_features(frame, text_col, id_col).select(
            "doc",
            F.pmod(
                _h60(F.concat(F.lit(salt + "|"), F.col("feat"))), b
            ).alias("bucket"),
        )

    # ONE tokenize pass per corpus: per-(doc, bucket) counts are the
    # only aggregate computed from the raw explode; the bucket model
    # re-aggregates that compact relation, and both corpus totals are
    # whole-relation windows over the ≤ n_buckets-row model (a
    # separate .agg() per total would re-derive the explode lineage —
    # measured 7.6 s -> ~3 s at sf0.1). The outer join keeps
    # target-only buckets in the totals (the library must not assume
    # target ⊆ raw).
    from pyspark.sql import Window

    doc_counts = (
        bucketed(raw)
        .groupBy("doc", "bucket")
        .agg(F.count(F.lit(1)).alias("c_db"))
    )
    raw_counts = doc_counts.groupBy("bucket").agg(
        F.sum("c_db").alias("cr")
    )
    tgt_counts = (
        bucketed(target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    wall = Window.partitionBy(F.lit(1))
    model = (
        raw_counts.join(tgt_counts, "bucket", "outer")
        .select(
            "bucket",
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        )
        .withColumn("n_r", F.sum("cr").over(wall))
        .withColumn("n_t", F.sum("ct").over(wall))
        .filter(F.col("cr") > 0)
        .select(
            "bucket",
            ((F.col("ct") + 1) * (F.col("n_r") + b.cast("bigint"))).alias(
                "_num"
            ),
            ((F.col("cr") + 1) * (F.col("n_t") + b.cast("bigint"))).alias(
                "_den"
            ),
        )
    )
    term = F.round(
        F.col("c_db") * F.log(F.col("_num") / F.col("_den")) * 1_000_000, 0
    ).cast("bigint")
    return (
        doc_counts.join(F.broadcast(model), "bucket")
        .select("doc", "c_db", term.alias("u"))
        .groupBy("doc")
        .agg(
            F.sum("c_db").cast("bigint").alias("n_feats"),
            F.sum("u").alias("logw_micro"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_feats",
            "logw_micro",
            F.round(F.col("logw_micro") / 1_000_000.0, 6).alias("logw"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    gumbel: bool = True,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR selection: sample ``k`` raw documents without replacement
    with inclusion probability ∝ the importance weight ``w(x)`` from
    :func:`dsir_logweights`, via Gumbel-top-k (adding Gumbel(0,1)
    noise to ``log w`` and taking the k largest keys draws exactly a
    weighted sample without replacement — the log-space sibling of the
    A-Res reservoir in :func:`weighted_sample_k`). The Gumbel draw
    rides the deterministic md5 coin (shifted to the open interval so
    the double log never sees 0), so the selection is reproducible
    across partitionings, retries, and engines, and the noisy key is
    quantized to micro-nats before ranking (a last-ulp libm difference
    cannot flip a rank; ties break on the id). ``gumbel=False`` gives
    the deterministic top-k-by-weight variant (pure exploitation — the
    paper's ablation).

    Scale shape: everything up to the per-doc weights is
    :func:`dsir_logweights`; the selection itself is top-k by
    (key desc, id) — a ``TakeOrderedAndProject``, no global sort.
    Output adds ``select_key_micro`` and ``sample_rank``.
    """
    from pyspark.sql import Window

    weights = dsir_logweights(
        raw, target, text_col, id_col, n_buckets=n_buckets, salt=salt
    )
    if gumbel:
        u = (
            _h60(
                F.concat(
                    F.lit(salt + "g|"), F.col(id_col).cast("string")
                ).cast("string")
            )
            + F.lit(0.5)
        ) / F.lit(float(2**60))
        g = -F.log(-F.log(u))
        key = F.col("logw_micro") + F.round(g * 1_000_000, 0).cast("bigint")
    else:
        key = F.col("logw_micro")
    keyed = weights.withColumn("select_key_micro", key)
    return (
        keyed.orderBy(F.desc("select_key_micro"), F.col(id_col))
        .limit(int(k))
        .withColumn(
            "sample_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("select_key_micro"), F.col(id_col)))
            .cast("bigint"),
        )
    )
