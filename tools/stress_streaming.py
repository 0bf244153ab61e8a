"""Streaming throughput measurement for the stateful rate operator
(VERDICT r03 item 8).

The streaming path was equivalence-tested (test_streaming) but never
measured. This harness generates a counter-telemetry CSV backlog, drains
it through ``streaming_counter_rates`` (applyInPandasWithState) with
``trigger(availableNow)``, and reports files/sec, input rows/sec, output
rows/sec, and the state store's row count + memory from the query's
final progress — at a base key cardinality and at 10×, so the state-size
scaling is visible alongside throughput.

Usage: python tools/stress_streaming.py [n_files] [rows_per_file]
(defaults 100 × 10_000 = 1M rows per cardinality config).
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
from pyspark.sql import types as T  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType(), True),
        T.StructField("ts_seconds", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def gen_backlog(spark, out_dir: str, n_files: int, rows_per_file: int, n_keys: int):
    """Counter telemetry: key k emits a monotonically increasing counter
    sampled every 10 s; every file mixes all keys but files are
    CHRONOLOGICAL (range-partitioned on ts, and the file source orders
    same-mtime files by path) — the watch-mode arrival order. A sample
    arriving behind its key's state is dropped by the kernel's
    dt >= MIN_TIME_DELTA rule, so expected output = input − n_keys
    (each key's first-ever sample emits no rate)."""
    n = n_files * rows_per_file
    df = (
        spark.range(n)
        .select(
            F.concat(F.lit("host-"), (F.col("id") % n_keys).cast("string")).alias(
                "group_key"
            ),
            # per-key sample index -> strictly increasing timestamps
            (F.lit(1_700_000_000) + (F.col("id") / n_keys).cast("long") * 10).alias(
                "ts_seconds"
            ),
            # counter with deterministic jitter; occasional resets exercise
            # the negative-delta -> 0.0 rule
            (
                (F.col("id") / n_keys).cast("long") * 100
                + F.pmod(F.xxhash64("id"), 50)
            ).cast("double").alias("value"),
        )
    )
    (
        df.repartitionByRange(n_files, "ts_seconds")
        .write.mode("overwrite")
        .option("header", True)
        .csv(out_dir)
    )
    # the parallel write finishes files in arbitrary order, but the file
    # stream source processes same-listing files by MODIFICATION TIME —
    # pin mtimes to path order so arrival order is chronological
    base = int(time.time()) - 10_000
    for i, name in enumerate(
        sorted(f for f in os.listdir(out_dir) if f.endswith(".csv"))
    ):
        os.utime(os.path.join(out_dir, name), (base + i, base + i))


def run_config(spark, n_files: int, rows_per_file: int, n_keys: int) -> dict:
    from fresco_hpc_spark.streaming.stateful import streaming_counter_rates
    from fresco_hpc_spark.streaming.watcher import stream_csv_directory

    work = tempfile.mkdtemp(prefix=f"stress_stream_{n_keys}_")
    in_dir, ckpt, out_dir = (
        os.path.join(work, "in"),
        os.path.join(work, "ckpt"),
        os.path.join(work, "out"),
    )
    try:
        gen_backlog(spark, in_dir, n_files, rows_per_file, n_keys)
        actual_files = len(
            [f for f in os.listdir(in_dir) if f.endswith(".csv")]
        )
        stream = stream_csv_directory(
            spark, in_dir, SCHEMA, max_files_per_trigger=8
        )
        # ttl_seconds=None: with ProcessingTimeTimeout an availableNow
        # backfill keeps scheduling "no new data but cleaning up state"
        # batches until the TTL expires — it never terminates for long
        # TTLs (documented on streaming_counter_rates). TTL eviction
        # behavior itself is covered by test_streaming; this harness
        # measures throughput and state size.
        rates = streaming_counter_rates(stream, ttl_seconds=None)
        t0 = time.perf_counter()
        q = (
            rates.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        # final state-operator numbers from the last progress that has them
        state_rows = state_mem = n_batches = 0
        for p in q.recentProgress:
            n_batches += 1
            for op in p.get("stateOperators", []):
                state_rows = int(op.get("numRowsTotal", state_rows))
                state_mem = int(op.get("memoryUsedBytes", state_mem))
        # the parquet sink reports numOutputRows=-1; count the files
        out_rows = spark.read.parquet(out_dir).count()
        in_rows = n_files * rows_per_file
        return {
            "n_keys": n_keys,
            "files": actual_files,
            "input_rows": in_rows,
            "output_rows": out_rows,
            "expected_output_rows": in_rows - n_keys,
            "batches": n_batches,
            "wall_sec": round(wall, 2),
            "files_per_sec": round(actual_files / wall, 2),
            "input_rows_per_sec": round(in_rows / wall),
            "state_rows": state_rows,
            "state_memory_bytes": state_mem,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)




def run_scd2_config(spark, n_files: int, rows_per_file: int, n_keys: int) -> dict:
    """Throughput for the streaming SCD2 twin: a change-log backlog where
    each key flips state every ~5 events (deterministic), drained through
    ``streaming_scd2_state``. State = one open-episode tuple per key, so
    state_rows must equal n_keys regardless of input volume."""
    from fresco_hpc_spark.streaming.stateful import streaming_scd2_state
    from fresco_hpc_spark.streaming.watcher import stream_csv_directory

    work = tempfile.mkdtemp(prefix=f"stress_scd2_{n_keys}_")
    in_dir, ckpt, out_dir = (
        os.path.join(work, "in"),
        os.path.join(work, "ckpt"),
        os.path.join(work, "out"),
    )
    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), True),
            T.StructField("ts_us", T.LongType(), True),
            T.StructField("s", T.StringType(), True),
        ]
    )
    try:
        n = n_files * rows_per_file
        df = (
            spark.range(n)
            .select(
                F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias("k"),
                (F.col("id") * 1000).alias("ts_us"),
                F.concat(
                    F.lit("s"),
                    (
                        ((F.col("id") / n_keys).cast("long") / 5).cast("long") % 8
                    ).cast("string"),
                ).alias("s"),
            )
            .repartitionByRange(n_files, "ts_us")
        )
        df.write.mode("overwrite").option("header", True).csv(in_dir)
        stream = stream_csv_directory(
            spark, in_dir, schema, max_files_per_trigger=8
        )
        out = streaming_scd2_state(
            stream, key_col="k", ts_col="ts_us", state_col="s"
        )
        t0 = time.perf_counter()
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        state_rows = 0
        for p in q.recentProgress:
            for op in p.get("stateOperators", []):
                state_rows = int(op.get("numRowsTotal", state_rows))
        res = spark.read.parquet(out_dir)
        closed = res.filter("NOT is_current").count()
        return {
            "op": "streaming_scd2",
            "n_keys": n_keys,
            "input_rows": n,
            "closed_episodes": closed,
            "wall_sec": round(wall, 2),
            "input_rows_per_sec": round(n / wall),
            "state_rows": state_rows,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from fresco_hpc_spark.session import get_spark

    spark = get_spark("stress-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    for n_keys in (1_000, 10_000):
        res = run_config(spark, n_files, rows_per_file, n_keys)
        print(json.dumps(res))
    for n_keys in (1000, 10000):
        res = run_scd2_config(spark, n_files, rows_per_file, n_keys)
        print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
