"""Streaming maintenance of KMV cardinality sketches.

Completes the incremental-index family for the sketch path (MinHash
bands, phash, LSH signatures, text postings, IVF cells — and now
distinct-count sketches): the batch side builds per-group KMV sketches
at rest (functions/sketch.py ``kmv_sketch``); this module keeps that
store CURRENT as values arrive on a stream, so "distinct users per
event type so far" is one read of a groups×k-BIGINT table at any
moment, never a rescan.

Each micro-batch: sketch the batch (map-side dedupe + one bounded rank
window), merge with the stored sketches via the KMV MERGE PROPERTY
(k smallest of a union = k smallest of the per-side sketches — the
whole reason this state is foldable), and overwrite the store. The
merged relation is eagerly localCheckpoint-ed before the overwrite so
the job never reads the directory it is rewriting.

Idempotent replay (the foreachBatch contract shared by every ingest
here): merging the same batch twice is a set-union no-op, so every
reachable crash-replay state rewrites the store with identical
content. State is bounded — groups × k BIGINTs — the sketch-sized
analogue of the driver-held codebooks.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame

from fresco_hpc_spark.functions.sketch import (
    hll_merge,
    hll_sketch,
    kmv_merge_sketches,
    kmv_sketch,
)


def process_kmv_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    store_dir: str,
    value_col: str,
    group_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> None:
    """One micro-batch of sketch maintenance, module-level so the
    replay contract is testable: calling this twice with the same
    (batch_df, batch_id) leaves the store content-equivalent."""
    if not batch_df.head(1):
        return
    spark = batch_df.sparkSession
    merged_in = kmv_sketch(batch_df, value_col, group_col, k, salt)
    if glob.glob(os.path.join(store_dir, "*.parquet")) or glob.glob(
        os.path.join(store_dir, "**", "*.parquet"), recursive=True
    ):
        stored = spark.read.parquet(store_dir)
        merged_in = stored.select(group_col, "n_seen", "hs").unionByName(
            merged_in
        )
    merged = kmv_merge_sketches(merged_in, k, group_col).localCheckpoint(
        eager=True
    )
    merged.write.mode("overwrite").parquet(store_dir)


def start_incremental_kmv_ingest(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    value_col: str,
    group_col: str,
    k: int = 64,
    salt: str = "kmv",
    available_now: bool = False,
):
    """Continuous sketch maintenance: after the stream drains,
    ``spark.read.parquet(store_dir)`` is content-identical to
    ``kmv_sketch`` over every row ingested so far (drained == batch,
    pinned in test_streaming), and ``kmv_union_intersect`` /
    ``kmv_distinct``-style estimates read it directly."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_kmv_ingest_batch(
            batch_df,
            batch_id,
            store_dir=store_dir,
            value_col=value_col,
            group_col=group_col,
            k=k,
            salt=salt,
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def process_hll_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    store_dir: str,
    value_col: str,
    group_col: str,
    b: int = 9,
    salt: str = "hll",
) -> None:
    """One micro-batch of HLL register maintenance. Same contract as
    :func:`process_kmv_ingest_batch`, with an even simpler fold: the
    HLL merge is MAX per (group, register), so replaying a batch can
    only re-assert maxima already in the store — every reachable
    crash-replay state rewrites identical content. State is bounded by
    groups x 2^b register rows."""
    if not batch_df.head(1):
        return
    spark = batch_df.sparkSession
    merged_in = hll_sketch(batch_df, value_col, group_col, b, salt)
    if glob.glob(os.path.join(store_dir, "*.parquet")) or glob.glob(
        os.path.join(store_dir, "**", "*.parquet"), recursive=True
    ):
        stored = spark.read.parquet(store_dir)
        merged_in = stored.select(group_col, "j", "r").unionByName(
            merged_in
        )
    merged = hll_merge(merged_in, group_col).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(store_dir)


def start_incremental_hll_ingest(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    value_col: str,
    group_col: str,
    b: int = 9,
    salt: str = "hll",
    available_now: bool = False,
):
    """Continuous HLL maintenance: after the stream drains,
    ``spark.read.parquet(store_dir)`` is register-identical to
    ``hll_sketch`` over every row ingested so far (drained == batch,
    pinned in test_streaming), and ``hll_estimate`` reads it directly —
    "distinct users so far" is one scan of a groups x m-row table at
    any moment."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_hll_ingest_batch(
            batch_df,
            batch_id,
            store_dir=store_dir,
            value_col=value_col,
            group_col=group_col,
            b=b,
            salt=salt,
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
