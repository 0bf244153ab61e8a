"""Streaming maintenance of the positional inverted index.

Completes the incremental-ingest family (streaming/dedup.py: text via
MinHash bands, images via phash, vectors via hyperplane LSH) with the
EXACT-search index: documents arriving on a stream have their postings
appended to the ``functions/search.py`` index layout, so phrase queries
over the growing corpus keep reading only their tokens' partitions and
no batch is ever re-tokenized.

Idempotent replay (the foreachBatch contract, ADVICE r4): postings are
partitioned by (``_bkt``, ``_ingest_batch``) and written with
writer-scoped dynamic partition overwrite — a replayed batch rewrites
its own (bucket, batch) partitions with identical content instead of
appending duplicates, while the extra ``_ingest_batch`` level changes
nothing for queries (partition pruning on ``_bkt`` happens at the top
directory level; readers never filter on the batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fresco_hpc_spark.functions.dedup import _h60
from fresco_hpc_spark.functions.search import _SALT, tokenize_positions


def process_text_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> None:
    """One micro-batch of index maintenance, module-level so the replay
    contract is testable: calling this twice with the same
    (batch_df, batch_id) leaves the index byte-equivalent (the replay
    rewrites its own partitions in place)."""
    if not batch_df.head(1):
        return
    postings = (
        tokenize_positions(batch_df, text_col, id_col)
        .withColumn(
            "_bkt",
            F.pmod(
                _h60(F.concat(F.lit(_SALT), F.col("token"))),
                F.lit(int(n_buckets)),
            ),
        )
        .withColumn("_ingest_batch", F.lit(int(batch_id)))
    )
    (
        postings.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bkt", "_ingest_batch")
        .parquet(index_dir)
    )


def start_incremental_text_index(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
    available_now: bool = False,
):
    """Continuous index build: each arriving document batch is tokenized
    once and its postings land in the partitioned index layout.
    ``phrase_search_index`` over ``spark.read.parquet(index_dir)`` is
    then exactly the batch search over every document ingested so far
    (drained-stream == batch, pinned in test_streaming). The file-source
    checkpoint gives exactly-once batches; the dynamic-partition
    overwrite makes the reachable replay states no-ops."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_text_index_batch(
            batch_df,
            batch_id,
            index_dir=index_dir,
            id_col=id_col,
            text_col=text_col,
            n_buckets=n_buckets,
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
