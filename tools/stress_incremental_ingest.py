"""Incremental-ingest scaling measurement (VERDICT r4 item 4).

The bucketed band index's entire purpose is that per-batch ingest cost
stays flat (∝ batch size + collisions) as the ACCEPTED CORPUS grows —
each batch joins the stored index on the folded band_sig key with zero
index-side exchange instead of re-reading accepted text. That claim was
correctness-tested (test_streaming) but never measured.

This harness drains N equal-size document batches through
``process_ingest_batch`` (the exact foreachBatch body of
start_incremental_ingest) into a growing bucketed index and records the
wall time of each batch beside the index row count it joined against.
Flat (or logarithmically-creeping, from file-listing growth) per-batch
seconds across a 10× index growth is the pass criterion; linear growth
would mean the cross-check is secretly rescanning the corpus.

Every batch holds ~10% duplicates of earlier batches (so the cross-join
actually fires and drops rows) plus in-batch near-dup pairs.

Usage: python tools/stress_incremental_ingest.py [n_batches] [docs_per_batch]
(defaults 10 x 2000). Prints one JSON line per batch and a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def gen_batch(spark, batch_i: int, n_docs: int):
    """Deterministic 40-word documents. 10% of each batch (after the
    first) repeats documents from an EARLIER batch under new ids — the
    cross-batch duplicates the stored index must catch; 5% are in-batch
    exact pairs."""
    base = batch_i * n_docs
    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()

    def text_expr(src_id):
        # 40 pseudo-random words drawn from the shared vocabulary,
        # seeded by the SOURCE doc id so repeats are exact
        parts = [
            F.element_at(
                F.array(*[F.lit(w) for w in words]),
                ((F.xxhash64(src_id, F.lit(k)) % 20 + 20) % 20 + 1).cast("int"),
            )
            for k in range(40)
        ]
        return F.concat_ws(" ", *parts)

    df = spark.range(base, base + n_docs).select(F.col("id").alias("doc_id"))
    is_cross_dup = (F.col("doc_id") % 10 == 3) & F.lit(batch_i > 0)
    is_batch_dup = F.col("doc_id") % 20 == 7
    src = (
        # repeat the batch-0 ANCESTOR (which was accepted and indexed) —
        # seeding by doc_id - n_docs would chain seeds and match nothing
        F.when(is_cross_dup, F.col("doc_id") % n_docs)
        .when(is_batch_dup, F.col("doc_id") - 1)  # repeat in-batch neighbor
        .otherwise(F.col("doc_id"))
    )
    return df.select("doc_id", text_expr(src).alias("text"))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    docs_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.streaming.dedup import process_ingest_batch

    spark = get_spark("stress-incremental-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest_stress_")
    index_table = "stress_ingest_band_idx"
    spark.sql(f"DROP TABLE IF EXISTS {index_table}")
    rows = []
    try:
        for i in range(n_batches):
            batch = gen_batch(spark, i, docs_per_batch).localCheckpoint(
                eager=True
            )  # materialize input OUTSIDE the timed region
            idx_rows = (
                spark.table(index_table).count()
                if spark.catalog.tableExists(index_table)
                else 0
            )
            t0 = time.perf_counter()
            process_ingest_batch(
                spark,
                batch,
                i,
                index_table=index_table,
                accepted_dir=os.path.join(work, "accepted"),
            )
            sec = round(time.perf_counter() - t0, 3)
            rows.append({"batch": i, "index_rows_before": idx_rows, "sec": sec})
            print(json.dumps(rows[-1]), flush=True)
        accepted = spark.read.parquet(os.path.join(work, "accepted")).count()
        head = sum(r["sec"] for r in rows[1:4]) / 3
        tail = sum(r["sec"] for r in rows[-3:]) / 3
        print(
            json.dumps(
                {
                    "summary": True,
                    "n_batches": n_batches,
                    "docs_per_batch": docs_per_batch,
                    "accepted_total": accepted,
                    "index_rows_final": spark.table(index_table).count(),
                    "head_mean_sec": round(head, 3),
                    "tail_mean_sec": round(tail, 3),
                    "tail_over_head": round(tail / head, 3),
                }
            )
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {index_table}")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
