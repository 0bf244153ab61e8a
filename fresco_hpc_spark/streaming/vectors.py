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
