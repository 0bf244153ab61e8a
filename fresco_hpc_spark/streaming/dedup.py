"""Streaming deduplication — the incremental form of the corpus dedup
filter (fresco_hpc_spark/functions/dedup.py).

Beyond the reference's surface (its watcher processes each file
independently and keeps no cross-file state — reference
data-pipeline/.../watchers/file_watcher.py:39-113): an LLM-ingest
pipeline receiving documents continuously must drop duplicates ACROSS
micro-batches without unbounded state. Spark-first restatement:

  * the exact-dup key is the same normalized-content md5 fingerprint the
    batch operator uses, so batch and streaming dedup agree row-for-row;
  * ``dropDuplicatesWithinWatermark`` keeps fingerprint state only
    until the event-time watermark passes — bounded state, late
    duplicates inside the watermark still dedup, and Spark evicts the
    rest (state size ∝ distinct docs per watermark window, not corpus).

At 100 TB-scale ingest the fingerprint state is hash-partitioned across
executors by the state-store; the watermark horizon is the knob trading
dedup window against state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_fingerprint(text_col: str = "text") -> F.Column:
    """Normalized-content md5 — identical to the batch dedup_corpus key
    (lower, collapse whitespace, trim)."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")).cast("binary")
    )


def streaming_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct (normalized) content within
    the watermark horizon; duplicates arriving later than the watermark
    are out of contract (their state was evicted).

    Input must be a streaming DataFrame with an event-time column.
    """
    return (
        stream_df.withColumn("_fp", content_fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
