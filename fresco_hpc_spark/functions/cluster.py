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
    pq_train_codebooks,
)

__all__ = [
    "kmeans_train",
    "kmeans_assign",
    "kmeans_clusters",
    "kmeans_silhouette",
    "lightweight_coreset",
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
    replay for free."""
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
    ``_pq_dists`` so the DuckDB twin lands on identical doubles."""
    x = _as_double(F.col(vec_col))
    dists = _pq_dists(x, *_cb_lits(centroids))
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return F.array_sort(dists), cluster


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
    codegen-friendly."""
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
    a_m, b_m = _micro(sorted_d.getItem(0)), _micro(sorted_d.getItem(1))
    s_micro = F.when(b_m > 0, F.round((b_m - a_m) / b_m * 1_000_000, 0))
    s_micro = s_micro.otherwise(F.lit(0)).cast("bigint")
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
    components (SQL x/0.0 semantics) and should be filtered upstream."""
    vd = _as_double(F.col(vec_col))
    nrm = F.sqrt(_dot(vd, vd))
    unit = F.transform(vd, lambda x: x / nrm)
    return df.withColumn(out_col or vec_col, unit)


def semdedup_kmeans(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
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
    cluster by construction. Pairwise cosine uses the shared
    ``dot/(nrm·nrm)`` 6-dp convention of ``embedding_near_dup_pairs``
    over the ORIGINAL vectors (cosine is scale-invariant — the
    normalization is only for cluster routing). Returns the surviving
    rows of ``df`` plus their ``cluster`` (greedy min-id-survivor
    semantics, exactly :func:`semantic_dedup`'s drop rule).

    ``materialize=True`` persists the assigned relation before the
    three downstream reads (both pair-join legs + the anti-join) and
    eagerly checkpoints the result — REQUIRED beyond toy sizes: the
    per-element unit-normalize lambda re-expands inside every one of
    the k distance references when left lazy (Catalyst collapses the
    projection; no common-subexpression elimination inside
    higher-order functions), turning the one normalize pass into
    k·dim² work per row — measured 23 min for 100k×64 at k=200 lazy
    vs one linear pass persisted. ``materialize=False`` keeps the
    plan fully lazy/composable for plan tests and tiny inputs.

    Plan: one map-side assignment projection (persisted once under
    ``materialize``), one same-cluster equi-join for pairs (never
    all-pairs), one distinct + left-anti.
    """
    from fresco_hpc_spark.functions.dedup import _finish_pairs

    vd = _as_double(F.col(vec_col))
    nrm = F.sqrt(_dot(vd, vd))
    unit = F.transform(vd, lambda x: x / nrm)
    base = df.filter(F.col(vec_col).isNotNull()).select(
        *df.columns, nrm.alias("_nrm"), unit.alias("_u")
    )
    _, cluster = _d2_sorted("_u", centroids)
    asg = base.withColumn("cluster", cluster)
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
    sim = F.round(
        _dot(F.col("_va"), F.col("_vb"))
        / (F.col("_nrm_a") * F.col("_nrm_b")),
        6,
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .filter(sim >= F.lit(float(threshold)))
        .select(F.col("_id_b").alias(id_col))
        .distinct()
    )
    result = asg.drop("_nrm", "_u").join(dropped, id_col, "left_anti")
    return _finish_pairs(result, [asg], materialize)
