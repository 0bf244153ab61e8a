"""KMV (k-minimum-values) cardinality sketches — deterministic,
mergeable distinct-count estimation (Bar-Yossef et al. 2002, the
ancestor of the theta sketch family).

Why not HyperLogLog: Spark's ``approx_count_distinct`` is HLL++ with an
engine-private register layout — unverifiable against any oracle and
unusable as a STORED artifact. KMV keeps the k smallest values of a
uniform hash per group; with the repo's shared md5 ``_h60`` hash every
sketch byte is replayable in DuckDB (oracle rule: the same engine-
agnostic hash as every sampling/bucketing operator), the estimator
``(k−1)·H/h_(k)`` is one double division of exact integers, and —
the actual 100 TB value — sketches MERGE: the k smallest of a union is
computable from the per-side k smallest, so per-partition/per-day
sketches roll up without rescanning, and union/intersection/Jaccard
between groups cost O(k) per pair from the stored sketches alone.

Estimator contract: groups with fewer than k distinct hashes are EXACT
(``n_seen < k`` ⇒ the sketch holds the whole set); at or past k the
relative error is ~1/√(k−2) (k=64 ⇒ ~13%). Hash collisions fold
distinct values onto one hash with probability ~n²/2⁶¹ — negligible,
and both engines fold identically (determinism is preserved; the
estimate, not the contract, absorbs it).

Scale shape: the sketch build deduplicates (group, hash) map-side
(distinct's partial aggregate), then one rank window per group bounded
by the group's distinct count — the same shape as exact
COUNT(DISTINCT), because building ANY exact-threshold sketch requires
seeing the distinct set once. The payoff is afterwards: stored sketches
are k BIGINTs per group, and every later union/intersection/rollup is
sketch-only (never rescans the corpus) — the sketch-based sibling of
functions/text.py's exact ``source_overlap``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fresco_hpc_spark.functions.dedup import _h60

#: the _h60 hash space: md5's first 15 hex chars = 60 bits
_H = float(1 << 60)


def _kmv_hash(value: Column, salt: str) -> Column:
    return _h60(F.concat(F.lit(salt + "|"), value.cast("string")))


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Build one KMV sketch per group: ``(group, n_seen, hs)`` where
    ``hs`` is the ASCENDING array of the group's k smallest distinct
    value hashes (shorter than k when the group has fewer distinct
    values — then the sketch is the exact set). NULL values are skipped
    (no identity to count); a NULL group forms its own group, matching
    groupBy semantics. Store this relation; every estimate below reads
    it, never the corpus."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hs = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            _kmv_hash(F.col(value_col), salt).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    return (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(int(k)))
        .groupBy("g")
        .agg(
            F.max("rn").cast("bigint").alias("n_seen"),
            F.sort_array(F.collect_list("h")).alias("hs"),
        )
        .select(F.col("g").alias(group_col), "n_seen", "hs")
    )


def _estimate(n_seen: Column, kth: Column, k: int) -> Column:
    """(k−1)·H/h_(k) when the sketch is full, exact count otherwise —
    one double division of exact integers, HALF_UP to a BIGINT."""
    est = F.round(F.lit(float(k - 1)) * F.lit(_H) / kth, 0).cast("bigint")
    return F.when(n_seen < F.lit(int(k)), n_seen).otherwise(est)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group distinct-count estimate next to the exact count —
    ``(group, n_seen, est_distinct, exact_distinct)`` — the
    sketch-accuracy exhibit (and the one-shot path when no sketch is
    stored). Exact while the group has < k distinct values by the
    estimator contract."""
    sk = kmv_sketch(df, value_col, group_col, k, salt)
    exact = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("_kmv_ge"), F.col(value_col))
        .distinct()
        .groupBy("_kmv_ge")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    )
    # eqNullSafe: the NULL group must match its own exact row, not drop
    joined = sk.join(
        exact, F.col(group_col).eqNullSafe(F.col("_kmv_ge")), "inner"
    ).drop("_kmv_ge")
    return joined.select(
        group_col,
        "n_seen",
        _estimate(F.col("n_seen"), F.element_at("hs", -1), k).alias(
            "est_distinct"
        ),
        "exact_distinct",
    ).orderBy(group_col)


def kmv_union_intersect(
    sketches: DataFrame,
    k: int = 64,
    group_col: str = "source",
) -> DataFrame:
    """Pairwise set-cardinality estimates from STORED sketches alone —
    O(k) per pair, zero corpus access: for every group pair a < b,
    merge the two hash arrays, keep the k smallest (the union's own KMV
    sketch — the merge property), estimate ``union_est`` from its k-th
    value, count how many of the merged-k appear in BOTH sides (the
    standard KMV intersection fraction ρ), and report
    ``inter_est = round(ρ·union_est)`` plus the 6-dp ``jaccard_est``.
    When the merged sketch holds fewer than k hashes both sides were
    exact, so union AND intersection are exact too. Array expressions
    end to end — no explode, no shuffle beyond the tiny pair
    cross-join of sketch rows."""
    a = sketches.select(
        F.col(group_col).alias("ga"),
        F.col("n_seen").alias("na"),
        F.col("hs").alias("ha"),
    )
    b = sketches.select(
        F.col(group_col).alias("gb"),
        F.col("n_seen").alias("nb"),
        F.col("hs").alias("hb"),
    )
    pairs = a.join(b, F.col("ga") < F.col("gb"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("ha"), F.col("hb"))), 1, int(k)
    )
    n_m = F.size(merged)
    kth = F.element_at(merged, -1)
    union_est = F.when(
        n_m < F.lit(int(k)), n_m.cast("bigint")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(_H) / kth, 0).cast("bigint")
    )
    in_both = F.size(
        F.filter(
            merged,
            lambda x: F.array_contains(F.col("ha"), x)
            & F.array_contains(F.col("hb"), x),
        )
    )
    rho = in_both / n_m
    return pairs.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        union_est.alias("union_est"),
        F.round(rho * union_est, 0).cast("bigint").alias("inter_est"),
        F.round(rho, 6).alias("jaccard_est"),
    ).orderBy("group_a", "group_b")


def kmv_merge_sketches(
    sketches: DataFrame, k: int = 64, group_col: str = "g"
) -> DataFrame:
    """Merge any number of sketch rows per group into one: explode the
    hash arrays, dedupe, keep the k smallest per group — valid because
    the k smallest of a union is a function of the per-side k smallest
    (the KMV merge property, pinned exactly in tests). This is the
    rollup operator: per-partition / per-day / per-batch sketches fold
    into coarser granularities without ever rescanning values. Output
    schema matches :func:`kmv_sketch`."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hs = sketches.select(
        F.col(group_col).alias("g"), F.explode("hs").alias("h")
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    return (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(int(k)))
        .groupBy("g")
        .agg(
            F.max("rn").cast("bigint").alias("n_seen"),
            F.sort_array(F.collect_list("h")).alias("hs"),
        )
        .select(F.col("g").alias(group_col), "n_seen", "hs")
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a value
    column's frequency distribution: a ``d×w`` counter matrix in long
    format ``(row, col, cnt)`` — ≤ d·w rows regardless of corpus size,
    the bounded-space frequency summary heavy-hitter monitoring stores
    per shard/day and SUMS to merge (counters are additive, the CMS
    merge property). Row i hashes with the shared md5 ``_h60`` under
    salt ``{salt}{i}``, so the sketch replays byte-identically in
    DuckDB (the KMV determinism argument, applied to counters —
    Spark has no exposed CMS, and a binary sketch blob would be
    unverifiable).

    Error contract: point estimates (:func:`cms_estimate`) NEVER
    underestimate, and overestimate by more than ``2n/w`` with
    probability ≤ 2^-d. Build shape: one map-side projection fans each
    occurrence into its d (row, col) cells, ONE partially-aggregated
    groupBy collapses them — a corpus-sized scan shuffling at most d·w
    groups."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d}, w={w}")
    cells = F.inline(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("row"),
                    F.pmod(
                        _h60(
                            F.concat(
                                F.lit(f"{salt}{i}|"),
                                F.col(value_col).cast("string"),
                            )
                        ),
                        F.lit(int(w)),
                    ).alias("col"),
                )
                for i in range(int(d))
            ]
        )
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(cells)
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    values: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-query a stored CMS: for every value in ``values``, the
    minimum of its d counters — ``(value, cms_est)``, never below the
    true count. An equi-join of the d probe cells per value against
    the ≤ d·w-row sketch (broadcast-sized by construction); a counter
    no value ever hashed to reads as 0."""
    probes = values.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col),
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row"),
                        F.pmod(
                            _h60(
                                F.concat(
                                    F.lit(f"{salt}{i}|"),
                                    F.col(value_col).cast("string"),
                                )
                            ),
                            F.lit(int(w)),
                        ).alias("col"),
                    )
                    for i in range(int(d))
                ]
            )
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(value_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
                "cms_est"
            )
        )
    )


# --------------------------------------------------------------------------
# HyperLogLog — register sketches with an EXPLICIT, oracle-replayable layout
# --------------------------------------------------------------------------

#: HLL bias-correction constants (Flajolet et al. 2007, §4): alpha_16,
#: alpha_32, alpha_64, and the m>=128 closed form.
def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_params(b: int) -> tuple[int, int, float]:
    """(m, rho_max, numerator) for precision ``b``: m = 2^b registers,
    rho_max = 61-b (the 60-bit hash leaves 60-b pattern bits, so rho in
    1..61-b), and the raw-estimate numerator alpha*m^2*2^rho_max folded
    into ONE double literal so both engines evaluate the identical
    constant."""
    if not 4 <= b <= 14:
        raise ValueError(f"precision b must be in [4, 14], got {b}")
    m = 1 << b
    rho_max = 61 - b
    num = _hll_alpha(m) * float(m) * float(m) * float(1 << rho_max)
    return m, rho_max, num


def _as_cols(group_cols) -> list[str]:
    return [group_cols] if isinstance(group_cols, str) else list(group_cols)


def hll_sketch(
    df: DataFrame,
    value_col: str,
    group_col,
    b: int = 9,
    salt: str = "hll",
) -> DataFrame:
    """Build one HyperLogLog sketch per group in LONG format
    ``(group, j, r)``: register index ``j`` = top ``b`` bits of the
    shared md5 ``_h60`` hash, ``r`` = max over the group of
    rho(remaining 60-b bits) — leading-zero count + 1, computed
    INTEGER-EXACTLY as ``(60-b) - bit_length(w) + 1`` with bit_length =
    ``length(conv(w, 10, 2))`` (DuckDB twin: ``length(bin(w))``), never
    via floating log2. Absent registers mean r = 0 (never observed).

    Why this exists next to KMV (:func:`kmv_sketch`): KMV's build
    shuffles the group's DISTINCT VALUE SET (that is what "k smallest
    distinct hashes" costs); the HLL build shuffles at most
    groups x 2^b (j, r) cells with a map-side MAX partial — at 100 TB
    the shuffle is bounded by the sketch size, not the data's
    cardinality. The price is a ~1.04/sqrt(m) multiplicative error
    estimator instead of KMV's exact-below-k contract. Spark's own
    ``approx_count_distinct`` is HLL++ with an engine-private register
    blob; this layout is plain rows, so stored sketches replay
    byte-identically in DuckDB and MERGE by ``MAX`` per (group, j) —
    see :func:`hll_merge`."""
    m, rho_max, _ = _hll_params(b)
    gcols = _as_cols(group_col)
    h = _h60(F.concat(F.lit(salt + "|"), F.col(value_col).cast("string")))
    w_bits = 60 - b
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *gcols, h.alias("h")
    )
    jw = hashed.select(
        *gcols,
        F.shiftright("h", w_bits).cast("int").alias("j"),
        F.col("h").bitwiseAND(F.lit((1 << w_bits) - 1)).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(rho_max)).otherwise(
        F.lit(w_bits + 1) - F.length(F.conv(F.col("w").cast("string"), 10, 2))
    )
    return (
        jw.select(*gcols, "j", rho.cast("int").alias("rho"))
        .groupBy(*gcols, "j")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(sketches: DataFrame, group_col="g") -> DataFrame:
    """Merge any number of long-format sketch rows per group into one:
    MAX per (group, register) — the HLL merge property (registers are
    element-wise maxima, so per-day / per-shard sketches roll up
    without rescanning; merged-then-estimated EQUALS built-directly,
    pinned by the daily-rollup oracle). Coarsening is just dropping
    grouping columns from ``group_col``: per-(type, day) sketches merge
    to per-type by grouping on type alone."""
    gcols = _as_cols(group_col)
    return (
        sketches.groupBy(*gcols, "j")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(
    sketch: DataFrame, b: int, group_col="g"
) -> DataFrame:
    """Estimate per-group cardinality from a stored long-format sketch:
    ``(group, est_distinct)``.

    The harmonic sum is kept in EXACT INTEGER arithmetic: sum over all
    m registers of 2^(rho_max - r) = [present] shiftleft(1, rho_max-r)
    + V * 2^rho_max for the V zero registers; the total is <= m *
    2^rho_max = 2^61, inside BIGINT, so no float accumulation order can
    perturb it. The raw estimate is then ONE double division
    numerator/S; the small-range branch (E <= 2.5m with V > 0 zero
    registers) switches to linear counting m*ln(m/V) (Flajolet et al.
    2007 §4 — the 60-bit hash space makes the large-range correction
    unreachable). Rounded HALF_UP to a BIGINT like every sketch
    estimator here."""
    m, rho_max, num = _hll_params(b)
    gcols = _as_cols(group_col)
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_regs"),
        F.sum(
            F.expr(f"shiftleft(1L, {rho_max} - r)")
        ).cast("bigint").alias("s_present"),
    )
    v = (F.lit(m) - F.col("n_regs")).cast("bigint")
    s = F.col("s_present") + v * F.lit(1 << rho_max).cast("bigint")
    e_raw = F.lit(num) / s.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *gcols,
        F.col("n_regs"),
        F.round(est, 0).cast("bigint").alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_col: str,
    b: int = 9,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HLL estimate next to the exact count — ``(group,
    n_regs, est_distinct, exact_distinct)`` — the accuracy exhibit
    (relative error ~1.04/sqrt(2^b)) and the one-shot path when no
    sketch is stored. NULL values are skipped; a NULL group forms its
    own group (groupBy semantics), matching :func:`kmv_distinct`."""
    sk = hll_sketch(df, value_col, group_col, b, salt)
    est = hll_estimate(sk, b, group_col)
    exact = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("_hll_ge"), F.col(value_col))
        .distinct()
        .groupBy("_hll_ge")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    )
    joined = est.join(
        exact, F.col(group_col).eqNullSafe(F.col("_hll_ge")), "inner"
    ).drop("_hll_ge")
    return joined.select(
        group_col, "n_regs", "est_distinct", "exact_distinct"
    ).orderBy(group_col)


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    d: int = 4,
    w: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Two-pass bounded-shuffle heavy hitters — the Count-Min sketch
    doing its actual 100 TB job. Pass 1 builds the d×w counter matrix
    (:func:`cms_sketch`, ≤ d·w rows) and holds it DRIVER-SIDE (the
    codebook pattern: exact integers, deterministic). Pass 2 re-streams
    occurrences and filters MAP-SIDE against the inlined counters
    (min of the d looked-up cells — never an underestimate, so the
    surviving set is a SUPERSET of every true heavy hitter: zero false
    negatives by the CMS contract); only survivors reach the exact
    groupBy. The shuffle carries the heavy-hitter occurrence mass, not
    the vocabulary — a full-vocab ``groupBy(value).count()`` shuffles
    every distinct key, this shuffles keys whose frequency can exceed
    ``threshold`` (+ the ≤ 2n/w-with-prob-2^-d overcount tail).

    Returns ``(value, cnt, cms_est)`` for values with EXACT count >=
    threshold, heaviest first; ``cms_est >= cnt`` always (the one-sided
    error, visible per row)."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    sk = cms_sketch(df, value_col, d, w, salt)
    cells = {(int(r["row"]), int(r["col"])): int(r["cnt"]) for r in sk.collect()}
    # each counter row inlines as ONE dense ArrayType literal (w
    # BIGINTs, absent cells 0) — a create_map of w entries is 2w
    # expression-tree children and the codegen compile dominated the
    # query's runtime at w=1024. Built as ONE parsed expr per row
    # (lit_bigints, the r14 vector-kernel lesson): F.lit(list) builds w
    # Column children over py4j, which cost ~2 s of driver time per
    # call at d=4, w=1024 (r15 stage profile: a 2.05 s gap between the
    # pass-1 collect and the first pass-2 stage).
    from fresco_hpc_spark.functions.vectors import lit_bigints

    rows = [
        lit_bigints([cells.get((i, c), 0) for c in range(int(w))])
        for i in range(int(d))
    ]
    probe_cols = [
        F.element_at(
            rows[i],
            (
                F.pmod(
                    _h60(
                        F.concat(
                            F.lit(f"{salt}{i}|"),
                            F.col(value_col).cast("string"),
                        )
                    ),
                    F.lit(int(w)),
                )
                + F.lit(1)
            ).cast("int"),
        )
        for i in range(int(d))
    ]
    est = F.least(*probe_cols) if d > 1 else probe_cols[0]
    survivors = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col), est.alias("cms_est"))
        .filter(F.col("cms_est") >= F.lit(int(threshold)))
    )
    return (
        survivors.groupBy(value_col, "cms_est")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(int(threshold)))
        .select(value_col, "cnt", "cms_est")
        .orderBy(F.desc("cnt"), F.asc(value_col))
    )
