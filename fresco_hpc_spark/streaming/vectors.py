"""Streaming maintenance of the IVF inverted-list vector index.

Completes the incremental-index family for the ANN path: the batch
side persists IVF cells at rest (functions/vectors.py
``ivf_build_index``, hive-partitioned on ``_cell`` so a query reads
only its nprobe cells' directories); this module keeps that layout
CURRENT as vectors arrive on a stream. The codebook is FIXED at ingest
time (the standard IVF operational contract — assignment must be
stable for the stored lists to mean anything; re-training is a batch
rebuild, not a streaming concern), so each micro-batch is one map-side
nearest-centroid assignment and one partitioned append — no state, no
shuffle, and no batch is ever re-assigned.

Idempotent replay (the foreachBatch contract, same as the text/media/
LSH ingests): rows are partitioned by (``_cell``, ``_ingest_batch``)
and written with writer-scoped dynamic partition overwrite — a
replayed batch rewrites its own (cell, batch) partitions with
identical content instead of appending duplicates, while the extra
``_ingest_batch`` level changes nothing for queries (partition pruning
on ``_cell`` happens at the top directory level).

At 100 TB: assignment is embarrassingly parallel (n_cells × dim
broadcast constants per task), the write fans out ≤ n_cells × 1
directories per batch, and append-only growth skews CELL SIZES, not
correctness — the usual IVF rebuild-cadence question, decided by the
batch pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fresco_hpc_spark.functions.vectors import ivf_assign


def process_ivf_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    index_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch of IVF list maintenance, module-level so the
    replay contract is testable: calling this twice with the same
    (batch_df, batch_id) leaves the index byte-equivalent (the replay
    rewrites its own partitions in place)."""
    from pyspark.sql import functions as F

    if not batch_df.head(1):
        return
    assigned = (
        ivf_assign(batch_df, centroids, id_col, vec_col)
        .select("_cell", id_col, vec_col)
        .withColumn("_ingest_batch", F.lit(int(batch_id)))
    )
    (
        assigned.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_cell", "_ingest_batch")
        .parquet(index_dir)
    )


def start_incremental_ivf_ingest(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = False,
):
    """Continuous IVF index maintenance: each arriving vector batch is
    assigned to its nearest codebook cell and appended to the
    partitioned inverted-list layout. ``ivf_query_index`` over
    ``spark.read.parquet(index_dir)`` with the SAME codebook is then
    exactly the batch query over every vector ingested so far
    (drained-stream == batch, pinned in test_streaming); the file-source
    checkpoint gives exactly-once batches and the dynamic-partition
    overwrite makes the reachable replay states no-ops."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_ivf_ingest_batch(
            batch_df,
            batch_id,
            index_dir=index_dir,
            centroids=centroids,
            id_col=id_col,
            vec_col=vec_col,
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def process_kmeans_assign_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    store_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch of k-means cluster maintenance (VERDICT r12
    item 7) — the clustering family's incremental twin, the exact
    pattern of :func:`process_ivf_ingest_batch`: the codebook is FIXED
    at ingest time (re-training is a batch rebuild — assignment must
    be stable for the stored clusters to mean anything), so each batch
    is one map-side squared-L2 argmin (functions/cluster.py
    kmeans_assign: centroids as literal arrays, ties to the lowest
    cluster, micro-quantized winning distance) and one partitioned
    append. Rows land hive-partitioned on (``cluster``,
    ``_ingest_batch``) with writer-scoped dynamic partition overwrite,
    so a replayed batch rewrites its own partitions byte-identically
    instead of appending duplicates, and per-cluster reads prune at
    the top directory level. The per-cluster (size, inertia) rollup
    over the store equals ``kmeans_clusters`` over exactly the
    ingested prefix — d2_micro is exact BIGINT, so the sum is
    order-free."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions.cluster import kmeans_assign

    if not batch_df.head(1):
        return
    assigned = (
        kmeans_assign(batch_df, centroids, vec_col)
        .select(F.col("cluster"), F.col(id_col), F.col(vec_col), "d2_micro")
        .withColumn("_ingest_batch", F.lit(int(batch_id)))
    )
    (
        assigned.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cluster", "_ingest_batch")
        .parquet(store_dir)
    )


def start_incremental_kmeans_assign(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = False,
):
    """Continuous k-means cluster maintenance: each arriving vector
    batch is assigned against the fixed codebook and appended to the
    cluster-partitioned store. A per-cluster rollup (or any
    cluster-pruned read) over ``spark.read.parquet(store_dir)`` is
    then exactly the batch ``kmeans_clusters``/``kmeans_assign``
    result over every vector ingested so far (drained == batch and
    mid-ingest prefix serving pinned in test_streaming, matching the
    IVF/text index pins); the file-source checkpoint gives
    exactly-once batches and the dynamic-partition overwrite makes
    replays no-ops."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_kmeans_assign_batch(
            batch_df,
            batch_id,
            store_dir=store_dir,
            centroids=centroids,
            id_col=id_col,
            vec_col=vec_col,
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def process_semdedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    store_dir: str,
    centroids: list[list[float]],
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch of incremental SemDeDup (VERDICT r13 item 7) —
    the dedup family's serve-while-ingesting twin, completing the
    streaming-maintenance story the way r13's k-means assign did for
    clustering. The codebook is FIXED at ingest time (the family's
    operational contract); each batch runs:

    1. the shared spherical assignment kernel (functions/cluster.py
       ``semdedup_assign``: NULL/zero-norm rows excluded, unit
       normalize, argmin against literal centroids — map-only);
    2. the in-batch same-cluster pair sweep PLUS a new-vs-store sweep
       against every PRIOR row (``_ingest_batch < batch_id``), both
       with the batch operator's 6-dp ``dot/(nrm·nrm)`` cosine and
       smaller-id-drops-larger rule. The store keeps dropped rows too
       (flagged), because the batch drop rule compares against every
       smaller id, dropped ones included — a survivors-only store
       would resurrect the third link of an a<b<c chain;
    3. a partitioned append of ALL assigned rows with a ``survivor``
       flag, hive-partitioned on (``cluster``, ``_ingest_batch``) with
       writer-scoped dynamic partition overwrite, so a replayed batch
       rewrites its own partitions byte-identically (the prior-rows
       filter in step 2 also makes the replay's DECISIONS identical —
       the replayed batch never sees its own landed rows).

    Serving: ``spark.read.parquet(store_dir).filter("survivor")``
    equals batch :func:`semdedup_kmeans` over exactly the ingested
    prefix — bit-for-bit when ids arrive in increasing order (pinned
    in test_streaming, chains included). A later batch carrying an id
    SMALLER than a stored row's cannot retro-drop that row (an
    append-only store can't unsend); that ordering caveat is the same
    greedy-arrival contract as the MinHash/LSH ingests.

    Scale shape: per batch, one map-side assignment + one equi-join of
    the batch against the store's matching clusters — work ∝ batch ×
    cluster sizes, the batch operator's Σ n_c² spread over ingestion;
    nothing rescans or re-pairs the landed prefix."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions.cluster import semdedup_assign
    from fresco_hpc_spark.functions.vectors import _as_double, _dot

    if not batch_df.head(1):
        return
    spark = batch_df.sparkSession
    asg = semdedup_assign(
        batch_df.select(id_col, vec_col), centroids, vec_col
    )
    new_b = asg.select(
        F.col("cluster"),
        F.col(id_col).alias("_id_b"),
        _as_double(F.col(vec_col)).alias("_vb"),
        F.col("_nrm").alias("_nrm_b"),
    )
    legs = [
        asg.select(
            F.col("cluster"),
            F.col(id_col).alias("_id_a"),
            _as_double(F.col(vec_col)).alias("_va"),
            F.col("_nrm").alias("_nrm_a"),
        )
    ]
    try:
        prior = spark.read.parquet(store_dir).filter(
            F.col("_ingest_batch") < int(batch_id)
        )
        legs.append(
            prior.select(
                F.col("cluster"),
                F.col(id_col).alias("_id_a"),
                _as_double(F.col(vec_col)).alias("_va"),
                F.col("_nrm").alias("_nrm_a"),
            )
        )
    except Exception:  # first batch: no store yet
        pass
    sim = F.round(
        _dot(F.col("_va"), F.col("_vb"))
        / (F.col("_nrm_a") * F.col("_nrm_b")),
        6,
    )
    a_side = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
    dropped = (
        a_side.join(new_b, "cluster")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .withColumn("_sim", sim)
        .filter(F.col("_sim") >= F.lit(float(threshold)))
        .select(F.col("_id_b").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    out = (
        asg.join(dropped, id_col, "left")
        .select(
            F.col("cluster"),
            F.col(id_col),
            F.col(vec_col),
            F.col("_nrm"),
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("survivor"),
        )
        .withColumn("_ingest_batch", F.lit(int(batch_id)))
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cluster", "_ingest_batch")
        .parquet(store_dir)
    )


def start_incremental_semdedup(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = False,
):
    """Continuous SemDeDup maintenance: each arriving vector batch is
    assigned against the fixed spherical codebook, pair-checked within
    its batch and against all prior same-cluster rows, and appended
    with a ``survivor`` flag. ``filter("survivor")`` over
    ``spark.read.parquet(store_dir)`` serves the deduplicated corpus
    at any moment, equal to batch :func:`~fresco_hpc_spark.functions.
    cluster.semdedup_kmeans` over the drained prefix (pinned in
    test_streaming); the file-source checkpoint gives exactly-once
    batches and the dynamic-partition overwrite makes replays no-ops."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_semdedup_batch(
            batch_df,
            batch_id,
            store_dir=store_dir,
            centroids=centroids,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
