"""k-means clustering family (functions/cluster.py): training
determinism, assignment/inertia contracts, simplified silhouette, and
lightweight-coreset selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _blobs(spark):
    """Two tight, well-separated 2-D blobs + one equidistant point."""
    rows = [
        (0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.0, 0.1]),
        (3, [10.0, 10.0]), (4, [10.1, 10.0]), (5, [10.0, 10.1]),
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_kmeans_train_partition_invariance(spark):
    """The trained codebook is bit-identical under wildly different
    input partitionings — the determinism recipe (pmod seeding, 9-dp
    means, lowest-cluster ties) holds for the m=1 degenerate case."""
    from fresco_hpc_spark.functions import kmeans_train
    from fresco_hpc_spark.sources.readers import table

    emb = table(spark, SF_SMALL, "embeddings")
    a = kmeans_train(emb.repartition(1), k=4, iterations=2,
                     max_train_rows=None)
    b = kmeans_train(emb.repartition(32, "vec_id"), k=4, iterations=2,
                     max_train_rows=None)
    assert a == b
    assert len(a) == 4 and len(a[0]) == 64
    with pytest.raises(ValueError, match="k must"):
        kmeans_train(emb, k=0)


def test_kmeans_assign_and_clusters_contract(spark):
    """Assignment picks the squared-L2 argmin with ties to the LOWEST
    cluster; d2_micro is the HALF_UP micro-quantized winning distance;
    sizes sum to n and inertia is the exact BIGINT sum."""
    from fresco_hpc_spark.functions import kmeans_assign, kmeans_clusters

    df = _blobs(spark)
    cents = [[0.0, 0.0], [10.0, 10.0], [0.0, 0.0]]  # duplicate of 0
    asg = {r.vec_id: r for r in kmeans_assign(df, cents).collect()}
    assert [asg[i].cluster for i in range(6)] == [0, 0, 0, 1, 1, 1]
    assert asg[0].d2_micro == 0
    assert asg[1].d2_micro == 10_000  # 0.1^2 * 1e6 = 0.010000... * 1e6
    assert asg[4].d2_micro == 10_000

    cl = {r.cluster: r for r in kmeans_clusters(df, cents).collect()}
    assert set(cl) == {0, 1}  # the duplicate centroid 2 wins nothing
    assert cl[0]["size"] == 3 and cl[1]["size"] == 3
    assert cl[0].inertia_micro == 0 + 10_000 + 10_000
    assert cl[1].inertia_micro == 0 + 10_000 + 10_000
    with pytest.raises(ValueError, match="centroids"):
        kmeans_assign(df, [])


def test_kmeans_silhouette_contract(spark):
    """Well-separated blobs score near 1; a point exactly equidistant
    from both centroids scores 0; k < 2 fails loudly."""
    from fresco_hpc_spark.functions import kmeans_silhouette

    extra = spark.createDataFrame(
        [(6, [5.0, 5.0])], "vec_id bigint, embedding array<double>"
    )
    df = _blobs(spark).union(extra)
    cents = [[0.0, 0.0], [10.0, 10.0]]
    out = {r.cluster: r for r in kmeans_silhouette(df, cents).collect()}
    # vec 6 is equidistant: a == b -> s = 0; it lands in cluster 0
    # (lowest tie) making cluster 0's mean slightly below cluster 1's
    assert out[0].n == 4 and out[1].n == 3
    assert out[1].mean_silhouette > 0.99
    assert 0.7 < out[0].mean_silhouette < out[1].mean_silhouette
    # per-row replay: s_micro for vec 1 (a=0.01, b=196.02+...)
    with pytest.raises(ValueError, match="silhouette"):
        kmeans_silhouette(df, [[0.0, 0.0]])


def test_lightweight_coreset_selection(spark):
    """A-Res coreset: deterministic across partitionings, exactly
    n_sample rows, weights follow 1 + inertia div n + d2 (so far
    points carry more mass), and invalid sizes fail loudly."""
    from fresco_hpc_spark.functions import (
        kmeans_assign,
        lightweight_coreset,
    )
    from fresco_hpc_spark.sources.readers import table

    emb = table(spark, SF_SMALL, "embeddings")
    from fresco_hpc_spark.functions import kmeans_train

    cents = kmeans_train(emb, k=4, iterations=1, max_train_rows=None)
    a = lightweight_coreset(emb.repartition(1), cents, n_sample=20)
    b = lightweight_coreset(emb.repartition(16, "vec_id"), cents, 20)
    ra = [(r.vec_id, r.sample_rank) for r in a.orderBy("sample_rank").collect()]
    rb = [(r.vec_id, r.sample_rank) for r in b.orderBy("sample_rank").collect()]
    assert ra == rb and len(ra) == 20

    # weight replay on one row
    asg = kmeans_assign(emb, cents)
    n, inertia = asg.agg(
        F.count(F.lit(1)), F.sum("d2_micro")
    ).first()
    picked = a.first()
    assert picked.weight_micro == 1 + inertia // n + picked.d2_micro
    with pytest.raises(ValueError, match="n_sample"):
        lightweight_coreset(emb, cents, n_sample=0)


def test_unit_normalize_scaled_copy_is_bit_identical(spark):
    """A power-of-two-scaled copy unit-normalizes to the EXACT same
    doubles as its original (0.5x / (0.5·|x|) cancels exactly in
    IEEE), which is what guarantees planted dups share their
    original's spherical cluster."""
    from fresco_hpc_spark.functions import unit_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 0.5]), (2, [1.5, 2.0, 0.25])],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r.vec_id: r.embedding for r in unit_normalize(df).collect()}
    assert rows[1] == rows[2]
    norm = sum(x * x for x in rows[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-12


def test_semdedup_kmeans_blocks_by_cluster(spark):
    """The cluster structure IS the candidate filter: an exact
    duplicate in the same cluster is dropped (min-id survives), while
    two identical-direction vectors FORCED into different clusters by
    the codebook are never compared — the documented recall trade of
    blocking (the paper accepts it; k is the knob)."""
    from fresco_hpc_spark.functions import semdedup_kmeans

    # two well-separated directions as the codebook (unit vectors)
    cents = [[1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [
            (1, [10.0, 0.0]),    # cluster 0
            (2, [5.0, 0.0]),     # scaled copy of 1 -> cluster 0, dropped
            (3, [0.0, 7.0]),     # cluster 1, survives
            (4, [2.0, 9.0]),     # cluster 1, cos vs 3 ~0.976 < 0.999
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = {r.vec_id: r.cluster for r in semdedup_kmeans(
        df, cents, threshold=0.999
    ).collect()}
    assert sorted(out) == [1, 3, 4]
    assert out[1] == 0 and out[3] == 1 and out[4] == 1

    # same data, one-cluster codebook: everything is comparable, the
    # near-dup pair (1,2) still collapses, nothing else does
    allone = {r.vec_id for r in semdedup_kmeans(
        df, [[1.0, 1.0]], threshold=0.999
    ).collect()}
    assert allone == {1, 3, 4}


def test_semdedup_max_cluster_size_salting_is_exact(spark):
    """VERDICT r13 item 2: the heavy-cluster cure must not change the
    relation. max_cluster_size triangle-salts oversized clusters into
    g = ceil(n_c/cap) id-hash groups — every pair meets on exactly one
    (cluster, gi, gj) key — so survivors are IDENTICAL to the unsalted
    join at any cap, including caps small enough to force g > 1 on
    every cluster. (Sub-clustering, the rejected alternative, can
    split a near-dup pair across blocks and lose recall.)"""
    from fresco_hpc_spark.functions import semdedup_kmeans

    # one dominant direction (a deliberately skewed "natural cluster")
    # with planted power-of-two scaled copies, plus a small second
    # cluster — 40 vectors, near-dup structure known by construction
    rows = []
    for i in range(30):
        base = [float(1000 + i), 1.0]
        rows.append((2 * i, base))
        if i % 3 == 0:
            rows.append((2 * i + 1, [x * 2.0 for x in base]))  # dup of 2i
    for i in range(5):
        rows.append((100 + i, [1.0, float(500 + i)]))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    plain = sorted(
        r.vec_id
        for r in semdedup_kmeans(
            df, cents, threshold=0.999, materialize=False
        ).collect()
    )
    # scaled copies must actually be dropping (the fixture is live)
    assert len(plain) < len(rows)
    for cap in (1, 7, 1000):
        salted = sorted(
            r.vec_id
            for r in semdedup_kmeans(
                df, cents, threshold=0.999, materialize=False,
                max_cluster_size=cap,
            ).collect()
        )
        assert salted == plain, f"cap={cap} changed the relation"
    with pytest.raises(ValueError, match="max_cluster_size"):
        semdedup_kmeans(df, cents, max_cluster_size=0)


def test_kmeans_train_target_cluster_size_derives_k(spark):
    """VERDICT r13 item 5: target_cluster_size overrides k with
    clamp(ceil(n/target), 2, n) — the SemDeDup regime where cluster
    COUNT grows with the corpus so pair work stays bounded. The r13
    stress measured the failure mode this kills: fixed k=8 cost 1580 s
    at x50 where scaled k=200 cost 145 s."""
    from fresco_hpc_spark.functions import kmeans_train
    from fresco_hpc_spark.sources.readers import table

    emb = table(spark, SF_SMALL, "embeddings").limit(100)
    # n=100, target 10 -> k=10
    cents = kmeans_train(
        emb, iterations=1, max_train_rows=None, target_cluster_size=10
    )
    assert len(cents) == 10
    # target far above n clamps to the k=2 floor
    cents = kmeans_train(
        emb, iterations=1, max_train_rows=None,
        target_cluster_size=10_000,
    )
    assert len(cents) == 2
    # explicit k is untouched when the knob is absent
    assert len(kmeans_train(emb, k=3, iterations=1,
                            max_train_rows=None)) == 3
    with pytest.raises(ValueError, match="target_cluster_size"):
        kmeans_train(emb, target_cluster_size=0)


def test_semdedup_kmeans_auto_trains_when_centroids_absent(spark):
    """VERDICT r13 item 5, operator-level: centroids=None trains the
    spherical codebook internally with target_cluster_size-derived k
    and defaults the pair-join cap to 2x the target — the path a
    caller who knows nothing about the k knob gets. The planted scaled
    copy must still collapse (it shares its original's cluster by
    spherical construction at ANY trained k)."""
    from fresco_hpc_spark.functions import semdedup_kmeans

    import math

    rows = []
    for i in range(40):
        # directions 5 degrees apart: cos(5deg) ~ 0.9962 < 0.999, so
        # distinct bases never collide; the 2x copies are cosine 1.0
        r = math.radians(i * 5.0)
        base = [math.cos(r) * 3.0, math.sin(r) * 3.0]
        rows.append((2 * i, base))
        if i % 4 == 0:
            rows.append((2 * i + 1, [x * 2.0 for x in base]))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    out = semdedup_kmeans(
        df, threshold=0.999, target_cluster_size=10, materialize=False
    )
    ids = {r.vec_id for r in out.collect()}
    # every planted 2x copy dropped, every base survives
    assert all(2 * i in ids for i in range(40))
    assert all(2 * i + 1 not in ids for i in range(0, 40, 4))
    with pytest.raises(ValueError, match="target_cluster_size"):
        semdedup_kmeans(
            df, [[1.0, 0.0]], target_cluster_size=10, materialize=False
        )
