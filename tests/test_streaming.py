"""Structured Streaming watcher (SURVEY.md §2.9 ST1-ST3).

Equivalence contract: the streaming path (file source → foreachBatch →
batch transformer → parquet append) must produce exactly the rows the
batch pipeline produces on the same files, because the reference's
watcher feeds each new file through the identical batch code path
(file_watcher.py:39-113 → pipeline.process_file).
"""

from __future__ import annotations

import pytest

from fresco_hpc_spark.etl.synthetic_raw import raw_block_from_events
from fresco_hpc_spark.etl.transformers import block_io_rates
from fresco_hpc_spark.schema import RAW_BLOCK_SCHEMA
from fresco_hpc_spark.sources import read_csv_tolerant, table
from fresco_hpc_spark.streaming import (
    start_etl_stream,
    streaming_hourly_agg,
    streaming_session_agg,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def raw_csv_dir(spark, tmp_path_factory):
    """Three raw block CSVs (plus one decoy .txt that the glob must skip)."""
    base = tmp_path_factory.mktemp("raw_csvs")
    events = table(spark, SF_SMALL, "events")
    raw = raw_block_from_events(events).toPandas()
    for i, part in enumerate(
        (raw.iloc[:300], raw.iloc[300:600], raw.iloc[600:])
    ):
        part.to_csv(base / f"block_{i}.csv", index=False)
    (base / "ignore_me.txt").write_text("jobID,node\nx,y\n")
    return str(base)


def test_stream_matches_batch(spark, raw_csv_dir, tmp_path):
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")
    q = start_etl_stream(
        spark,
        raw_csv_dir,
        RAW_BLOCK_SCHEMA,
        block_io_rates,
        output_dir=out_dir,
        checkpoint_dir=cp_dir,
        pattern="*.csv",
        max_files_per_trigger=1,  # reference: one file per watch event
        available_now=True,
    )
    q.awaitTermination(120)
    assert not q.isActive

    streamed = spark.read.parquet(out_dir)
    # The oracle is the reference's semantics: each file transformed
    # INDEPENDENTLY (lag state never crosses files), then concatenated.
    import glob

    batch = None
    for f in sorted(glob.glob(raw_csv_dir + "/*.csv")):
        part = block_io_rates(read_csv_tolerant(spark, f, schema=RAW_BLOCK_SCHEMA))
        batch = part if batch is None else batch.unionByName(part)
    assert streamed.count() == batch.count()
    # full-row equivalence, order-insensitive
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_pattern_filter_skips_non_matching(spark, raw_csv_dir, tmp_path):
    out_dir = str(tmp_path / "out2")
    cp_dir = str(tmp_path / "cp2")
    q = start_etl_stream(
        spark, raw_csv_dir, RAW_BLOCK_SCHEMA, lambda df: df,
        output_dir=out_dir, checkpoint_dir=cp_dir,
        pattern="block_0*.csv", max_files_per_trigger=10, available_now=True,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 300  # only the first file's rows


def test_streaming_hourly_agg_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    events_pq = str(tmp_path / "events_pq")
    events = table(spark, SF_SMALL, "events").select(
        F.col("ts").alias("time"), "value"
    )
    events.write.parquet(events_pq)

    stream = spark.readStream.schema(events.schema).parquet(events_pq)
    agg = streaming_hourly_agg(stream, "value")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hourly_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.table("hourly_stream")
    want = (
        events.groupBy(F.date_trunc("hour", "time").alias("bucket"))
        .agg(
            F.avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count("value").alias("count_value"),
        )
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_streaming_hourly_agg_drops_late_rows_past_watermark(spark, tmp_path):
    """VERDICT r5 item 8: pin the append-mode watermark CONTRACT, not
    just drained-stream equivalence. A window finalizes once the
    watermark (max event time − 1h) passes its end; a record arriving
    after that is DROPPED from the stream's result even though the
    batch path would count it. Two availableNow runs share one
    checkpoint, so the watermark persists across the restart exactly
    like a long-running stream moving between micro-batches:

    - run 1: hour-00 rows + a 03:30 row → the watermark advances to
      02:30 after the data batch, and availableNow's trailing flush
      batch finalizes window 00 (count 3).
    - run 2: a LATE hour-00 row (00:40 < watermark 02:30) arrives →
      it is filtered before aggregation and append mode NEVER revises
      the already-emitted window: run 2 emits no hour-00 row at all.
    """
    from datetime import datetime

    from pyspark.sql import functions as F

    from fresco_hpc_spark.streaming import streaming_hourly_agg

    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "late_ckpt")
    schema = "time timestamp, value double"

    def arrive(rows):
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "append"
        ).parquet(str(src))

    out = str(tmp_path / "late_out")

    def run():
        # file sink (not memory): the restarted run must RECOVER the
        # watermark from the checkpoint, which memory sinks don't support
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_hourly_agg(stream, "value", watermark="1 hour")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    d = datetime
    on_time = [
        (d(2024, 1, 1, 0, 10), 1.0),
        (d(2024, 1, 1, 0, 20), 2.0),
        (d(2024, 1, 1, 0, 30), 3.0),
        (d(2024, 1, 1, 3, 30), 9.0),
    ]
    late = [(d(2024, 1, 1, 0, 40), 100.0), (d(2024, 1, 1, 4, 30), 9.0)]

    arrive(on_time)
    first = {r.bucket: r for r in run().collect()}
    # watermark 02:30 after the data batch; the availableNow flush
    # batch finalizes exactly window 00 (03:00's end is past watermark)
    assert set(first) == {d(2024, 1, 1, 0, 0)}
    w0 = first[d(2024, 1, 1, 0, 0)]
    assert (w0.count_value, w0.min_value, w0.max_value, w0.avg_value) == (
        3,
        1.0,
        3.0,
        2.0,
    )

    arrive(late)
    second = run().collect()
    # the 00:40 late row is dropped pre-aggregation and the finalized
    # window is never re-emitted or revised in append mode: the sink
    # still holds exactly ONE hour-00 row, unchanged
    hour0 = [r for r in second if r.bucket == d(2024, 1, 1, 0, 0)]
    assert len(hour0) == 1
    assert (hour0[0].count_value, hour0[0].max_value) == (3, 3.0)
    # ...whereas the batch path over the SAME files counts all 4
    batch = (
        spark.read.schema(schema)
        .parquet(str(src))
        .filter(F.col("time") < d(2024, 1, 1, 1, 0))
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .first()
    )
    assert (batch.n, batch.mx) == (4, 100.0)


def test_streaming_hopping_and_ohlc_drop_late_rows(spark, tmp_path):
    """Same watermark contract (VERDICT r5 item 8) for the other two
    append-mode windowed aggregations: a late row below the recovered
    watermark neither revises a finalized window nor re-emits it."""
    from datetime import datetime

    from fresco_hpc_spark.streaming import streaming_hopping_agg
    from fresco_hpc_spark.streaming.watcher import streaming_ohlc

    d = datetime
    src = tmp_path / "late2_src"
    src.mkdir()
    schema = "k string, time timestamp, value double"

    def arrive(rows):
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "append"
        ).parquet(str(src))

    def run(agg_fn, tag):
        out = str(tmp_path / f"{tag}_out")
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            agg_fn(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"{tag}_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    on_time = [
        ("k", d(2024, 1, 1, 0, 10), 1.0),
        ("k", d(2024, 1, 1, 0, 30), 3.0),
        ("k", d(2024, 1, 1, 3, 30), 9.0),
    ]
    late = [("k", d(2024, 1, 1, 0, 40), 100.0)]

    hop = lambda s: streaming_hopping_agg(  # noqa: E731
        s, "value", window="1 hour", slide="15 minutes", watermark="1 hour"
    )
    ohlc = lambda s: streaming_ohlc(s, "k", value_col="value")  # noqa: E731

    arrive(on_time)
    hop1 = run(hop, "hop").collect()
    ohlc1 = run(ohlc, "ohlc").collect()
    w0 = [r for r in hop1 if r.window_start == d(2024, 1, 1, 0, 0)]
    assert len(w0) == 1 and (w0[0].n_events, w0[0].avg_value) == (2, 2.0)
    b0 = [r for r in ohlc1 if r.bucket == d(2024, 1, 1, 0, 0)]
    assert len(b0) == 1 and (b0[0].open, b0[0].close, b0[0].high) == (
        1.0,
        3.0,
        3.0,
    )

    arrive(late)
    hop2 = run(hop, "hop").collect()
    ohlc2 = run(ohlc, "ohlc").collect()
    # every window the late row would touch was already finalized: the
    # sinks are byte-identical to run 1 (no new rows, no revision)
    assert sorted(map(tuple, hop2)) == sorted(map(tuple, hop1))
    assert sorted(map(tuple, ohlc2)) == sorted(map(tuple, ohlc1))


def test_stateful_rates_cross_batch_boundaries(spark, tmp_path):
    """applyInPandasWithState carries (ts, value) across micro-batches:
    with one file per trigger, deltas at file boundaries must still be
    emitted — the semantics the per-file batch path cannot provide."""
    import pandas as pd

    from fresco_hpc_spark.streaming.stateful import (
        expected_rates,
        streaming_counter_rates,
    )

    # two groups, samples interleaved across three files
    samples = [
        ("g1", 10, 100.0), ("g1", 20, 300.0), ("g1", 30, 250.0),  # reset at 30
        ("g1", 40, 500.0), ("g1", 50, 900.0), ("g1", 60, 960.0),
        ("g2", 10, 0.0), ("g2", 25, 150.0), ("g2", 55, 450.0),
    ]
    files = [samples[0:3] + samples[6:7], samples[3:5] + samples[7:8],
             samples[5:6] + samples[8:9]]
    src = tmp_path / "src"
    src.mkdir()
    import os
    import time as _time

    base_mtime = _time.time() - 100
    for i, rows in enumerate(files):
        path = src / f"part_{i}.csv"
        pd.DataFrame(rows, columns=["group_key", "ts_seconds", "value"]).to_csv(
            path, index=False
        )
        # the file source orders micro-batches by modification time; pin
        # distinct ascending mtimes so batch order (hence lag state) is
        # deterministic
        os.utime(path, (base_mtime + i, base_mtime + i))

    schema = "group_key string, ts_seconds long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    rates = streaming_counter_rates(stream)
    q = (
        rates.writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_rates")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.group_key, r.ts_seconds, round(r.rate, 6))
        for r in spark.table("stateful_rates").collect()
    }
    want = {(k, t, round(v, 6)) for k, t, v in expected_rates(samples)}
    assert got == want
    # the boundary-crossing deltas specifically (file0→file1→file2)
    assert ("g1", 40, 25.0) in got and ("g1", 60, 6.0) in got
    assert ("g2", 25, 10.0) in got and ("g2", 55, 10.0) in got


def test_stream_into_partitioned_store(spark, tmp_path):
    """Composition: streaming watcher → hour-partitioned store. The
    foreachBatch sink writes through write_partitioned_store, so arriving
    files land in prunable year=/month=/day=/hour= partitions — the
    continuous-ingest path of the reference's chunk store."""
    import pandas as pd

    from fresco_hpc_spark.plans import write_partitioned_store
    from fresco_hpc_spark.sources import table as load_table

    src = tmp_path / "src"
    src.mkdir()
    events = load_table(spark, SF_SMALL, "events").limit(200).toPandas()
    events.to_csv(src / "events.csv", index=False)

    store = str(tmp_path / "store")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def sink(batch_df, _bid):
        write_partitioned_store(
            batch_df.withColumnRenamed("ts", "time"), store, time_col="time", mode="append"
        )

    q = (
        spark.readStream.schema(schema)
        .option("header", True)
        .csv(str(src))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = spark.read.parquet(store)
    assert back.count() == 200
    assert {"year", "month", "day", "hour"} <= set(back.columns)


def test_stream_cdc_merge_into_store(spark, tmp_path):
    """The write-side CDC loop closed end to end: a CHANGE stream
    (upserts + deletes arriving across micro-batches) applied to the
    hour-partitioned store via foreachBatch → merge_into_store. The
    drained store must equal the batch replay of the full change log in
    arrival order, and re-running a batch's merge (foreachBatch's
    at-least-once failure mode) must be a no-op — the idempotency that
    makes merge a legal streaming sink."""
    import pandas as pd

    from fresco_hpc_spark.plans import (
        PARTITION_COLS,
        merge_into_store,
        read_partitioned_store,
        write_partitioned_store,
    )
    from fresco_hpc_spark.sources import table as load_table

    base = (
        load_table(spark, SF_SMALL, "events")
        .limit(300)
        .selectExpr("ts AS time", "event_id", "user_id", "value")
    )
    store = str(tmp_path / "store")
    write_partitioned_store(base, store)

    pdf = base.toPandas()
    # batch 1: double value for ids % 3 == 0; batch 2: delete ids % 3 == 1
    b1 = pdf[pdf.event_id % 3 == 0].copy()
    b1["value"] = b1["value"] * 2
    b1["op"] = "upsert"
    b2 = pdf[pdf.event_id % 3 == 1].copy()
    b2["op"] = "delete"
    src = tmp_path / "changes_in"
    src.mkdir()
    b1.to_json(src / "b1.json", orient="records", lines=True, date_format="iso")

    schema = "time timestamp, event_id long, user_id long, value double, op string"
    last_batch = {}

    def sink(batch_df, _bid):
        batch_df = batch_df.filter("time IS NOT NULL")
        if batch_df.isEmpty():
            return
        merge_into_store(spark, store, batch_df, ["event_id"], time_col="time")
        last_batch["df"] = batch_df.collect()

    def drain():
        q = (
            spark.readStream.schema(schema)
            .json(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cp_cdc"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    b2.to_json(src / "b2.json", orient="records", lines=True, date_format="iso")
    drain()

    survivors = pdf[pdf.event_id % 3 == 2]
    got = (
        read_partitioned_store(spark, store)
        .drop(*PARTITION_COLS)
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )
    assert sorted(got.event_id) == sorted(
        list(survivors.event_id) + list(b1.event_id)
    )
    assert (
        got[got.event_id.isin(set(b1.event_id))].value.sum()
        == b1.value.sum()
    )
    # at-least-once replay: re-merging the LAST batch changes nothing
    replay = spark.createDataFrame(last_batch["df"], schema)
    merge_into_store(spark, store, replay, ["event_id"], time_col="time")
    again = (
        read_partitioned_store(spark, store)
        .drop(*PARTITION_COLS)
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], again[sorted(again.columns)]
    )


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Cross-micro-batch exact dedup: the same normalized content arriving
    in a LATER file must be dropped, whitespace/case variants included —
    matching the batch dedup_corpus fingerprint."""
    import os
    import pandas as pd

    from fresco_hpc_spark.streaming import streaming_dedup

    src = tmp_path / "docs_in"
    src.mkdir()
    f1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta", "gamma delta", "unique one"],
            "ts": ["2024-01-01 10:00:00"] * 3,
        }
    )
    f2 = pd.DataFrame(
        {
            "doc_id": [4, 5, 6],
            # 4 duplicates 1 exactly; 5 is a whitespace/case variant of 2
            "text": ["alpha beta", "  Gamma   DELTA ", "unique two"],
            "ts": ["2024-01-01 10:10:00"] * 3,
        }
    )
    f1.to_csv(src / "a.csv", index=False)
    f2.to_csv(src / "b.csv", index=False)
    os.utime(src / "a.csv", (1000000000, 1000000000))
    os.utime(src / "b.csv", (1000000100, 1000000100))

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        streaming_dedup(stream, text_col="text", ts_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM dedup_out").collect()}
    assert got == {1, 2, 3, 6}


def test_streaming_session_agg_matches_batch_sessionize(spark, tmp_path):
    """Native session_window sessions equal the batch sessionize sessions
    (start, event count) on gap-unambiguous data; watermark closes state."""
    import datetime as dt

    from pyspark.sql import functions as F

    from fresco_hpc_spark.operators import session_stats

    def ts(m):
        return dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(minutes=m)

    rows = [
        ("u1", ts(0), 1.0), ("u1", ts(10), 1.0),   # session 1
        ("u1", ts(60), 1.0),                        # gap 50 min -> session 2
        ("u2", ts(5), 2.0), ("u2", ts(20), 2.0),    # one session
    ]
    ev = spark.createDataFrame(rows, "user_id string, time timestamp, value double")
    pq = str(tmp_path / "sess_pq")
    ev.write.parquet(pq)

    stream = spark.readStream.schema(ev.schema).parquet(pq)
    sess = streaming_session_agg(stream, "user_id", "time", value_col="value",
                                 gap="30 minutes")
    q = (
        sess.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.table("session_stream").collect()
    }
    want = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in session_stats(ev, "user_id", ts_col="time", value_col="value",
                               gap_seconds=1800).collect()
    }
    assert got == want


def test_streaming_ohlc_matches_batch(spark, tmp_path):
    """The streaming OHLC (min_by/max_by mergeable aggregates) emits the
    same rows as the batch rank-edge ohlc_downsample over the same data."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.operators import ohlc_downsample
    from fresco_hpc_spark.streaming import streaming_ohlc

    events_pq = str(tmp_path / "events_ohlc_pq")
    events = table(spark, SF_SMALL, "events").select(
        "user_id", F.col("ts").alias("time"), "value", "event_id"
    )
    events.write.parquet(events_pq)

    stream = spark.readStream.schema(events.schema).parquet(events_pq)
    agg = streaming_ohlc(stream, "user_id", tiebreak_col="event_id")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ohlc_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.table("ohlc_stream")
    want = ohlc_downsample(
        events, "user_id", bucket="hour", time_col="time", value_col="value"
    )
    assert got.count() == want.count() > 0
    assert got.select(*want.columns).exceptAll(want).count() == 0


def test_stream_to_store_to_planner_end_to_end(spark, tmp_path):
    """VERDICT r02 item 5 — the full rate pipeline in one test: counter
    CSVs stream in one file per micro-batch → streaming_counter_rates
    (state crosses batch boundaries) → hour-partitioned store → planner
    ``execute`` with a time-BETWEEN query — and the result equals the
    batch lag-window twin computed over the same files in one read."""
    import os
    import time as _time

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fresco_hpc_spark.plans import plan_query, write_partitioned_store
    from fresco_hpc_spark.plans import planner as planner_mod
    from fresco_hpc_spark.streaming.stateful import streaming_counter_rates

    # two devices sampled across three hours of 2024-03-05 (epoch secs);
    # 10:00 = 1709632800
    h10 = 1709632800
    samples = [
        ("devA", h10 + 60 * i, 1000.0 * i) for i in range(10)
    ] + [
        ("devA", h10 + 3600 + 60 * i, 10_000.0 + 500.0 * i) for i in range(10)
    ] + [
        ("devA", h10 + 7200 + 60 * i, 20_000.0 - (1.0 if i == 3 else 0.0) * 30_000.0 + 100.0 * i)
        for i in range(10)
    ] + [
        ("devB", h10 + 90 * i, 50.0 * i * i) for i in range(40)
    ]
    # three files cut by time: micro-batch boundaries fall mid-sequence
    samples.sort(key=lambda r: r[1])
    cuts = [samples[0:20], samples[20:45], samples[45:]]
    src = tmp_path / "src"
    src.mkdir()
    base_mtime = _time.time() - 100
    for i, rows in enumerate(cuts):
        p = src / f"f{i}.csv"
        pd.DataFrame(rows, columns=["group_key", "ts_seconds", "value"]).to_csv(
            p, index=False
        )
        os.utime(p, (base_mtime + i, base_mtime + i))

    schema = "group_key string, ts_seconds long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    store = str(tmp_path / "store")

    from fresco_hpc_spark.streaming import exactly_once_store_writer

    sink = exactly_once_store_writer(store)

    def to_store(batch_df, bid):
        sink(batch_df.withColumn("time", F.timestamp_seconds("ts_seconds")), bid)

    q = (
        streaming_counter_rates(stream)
        .writeStream.outputMode("append")
        .foreachBatch(to_store)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # the planner prunes to the two queried hours (10:00 and 11:00) only
    sql = (
        "SELECT group_key, ts_seconds, rate FROM s3_fresco WHERE time "
        "BETWEEN '2024-03-05T10:00:00' AND '2024-03-05T11:59:59'"
    )
    plan = plan_query(spark, sql, store)
    assert [h.hour for h in plan.hours] == [10, 11]
    assert plan.chunks and all(
        "hour=10" in c or "hour=11" in c for c in plan.chunks
    )
    got = {
        (r.group_key, r.ts_seconds, round(r.rate, 6))
        for r in planner_mod.execute(spark, sql, store).collect()
    }

    # batch twin: ALL files in one read, lag window per key — the
    # boundary-free semantics the stateful stream must reproduce
    batch = spark.read.schema(schema).option("header", True).csv(str(src))
    w = Window.partitionBy("group_key").orderBy("ts_seconds")
    twin = (
        batch.withColumn("_t0", F.lag("ts_seconds").over(w))
        .withColumn("_v0", F.lag("value").over(w))
        .filter(F.col("_t0").isNotNull())
        .withColumn("_dt", (F.col("ts_seconds") - F.col("_t0")).cast("double"))
        .filter(F.col("_dt") >= 0.1)
        .withColumn(
            "rate",
            F.when(
                F.col("value") >= F.col("_v0"),
                (F.col("value") - F.col("_v0")) / F.col("_dt"),
            ).otherwise(F.lit(0.0)),
        )
        .filter(
            (F.col("ts_seconds") >= h10) & (F.col("ts_seconds") < h10 + 7200)
        )
    )
    want = {
        (r.group_key, r.ts_seconds, round(r.rate, 6))
        for r in twin.select("group_key", "ts_seconds", "rate").collect()
    }
    assert got == want and len(got) > 30
    # the cross-file boundary deltas specifically must be present
    boundary_ts = {cuts[1][0][1], cuts[2][0][1]}
    assert {t for (_, t, _) in got} & boundary_ts


def test_exactly_once_store_writer_is_idempotent_on_replay(spark, tmp_path):
    """Replaying a micro-batch (crash between sink write and checkpoint
    commit) must NOT duplicate rows: the writer overwrites its own
    batch_id partitions dynamically. Distinct batches still accumulate,
    and untouched batches survive a replay of another."""
    from datetime import datetime

    from fresco_hpc_spark.plans import read_partitioned_store
    from fresco_hpc_spark.streaming import exactly_once_store_writer

    store = str(tmp_path / "store")
    write = exactly_once_store_writer(store)
    b0 = spark.createDataFrame(
        [(1, datetime(2024, 3, 5, 10, 1), 1.0), (2, datetime(2024, 3, 5, 11, 2), 2.0)],
        "id bigint, time timestamp, v double",
    )
    b1 = spark.createDataFrame(
        [(3, datetime(2024, 3, 5, 10, 30), 3.0)],
        "id bigint, time timestamp, v double",
    )
    write(b0, 0)
    write(b1, 1)
    assert read_partitioned_store(spark, store).count() == 3

    # replay batch 0 (identical content, as the checkpointed file source
    # guarantees): row count must be unchanged
    write(b0, 0)
    back = read_partitioned_store(spark, store)
    assert back.count() == 3
    assert {r.id for r in back.collect()} == {1, 2, 3}


def test_stateful_rates_ttl_evicts_idle_groups(spark, tmp_path):
    """With ttl_seconds, a group idle past the TTL is evicted from the
    state store: when it reappears, its first sample emits NO rate (same
    as a first-ever sample). Without eviction the cross-batch delta
    would bridge the gap — the assertion distinguishes the two."""
    import time as _time

    import pandas as pd

    from fresco_hpc_spark.streaming.stateful import streaming_counter_rates

    src = tmp_path / "src"
    src.mkdir()
    schema = "group_key string, ts_seconds long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    rates = streaming_counter_rates(stream, ttl_seconds=2)
    q = (
        rates.writeStream.outputMode("append")
        .format("memory")
        .queryName("ttl_rates")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def write(name, rows):
        pd.DataFrame(rows, columns=["group_key", "ts_seconds", "value"]).to_csv(
            src / name, index=False
        )

    def wait_for_row(pred, timeout=60):
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            rows = spark.table("ttl_rates").collect()
            if any(pred(r) for r in rows):
                return
            _time.sleep(0.3)
        raise AssertionError("expected row not emitted in time")

    try:
        write("f0.csv", [("g1", 10, 100.0), ("g1", 20, 300.0)])
        wait_for_row(lambda r: r.group_key == "g1" and r.ts_seconds == 20)
        _time.sleep(3.0)  # > ttl: g1 goes idle past its timeout
        # a new batch (different group) must run for eviction to fire
        write("f1.csv", [("g2", 5, 1.0), ("g2", 6, 2.0)])
        wait_for_row(lambda r: r.group_key == "g2")
        _time.sleep(0.5)
        # g1 reappears: state must be GONE, so no bridged rate emits
        write("f2.csv", [("g1", 60, 700.0), ("g1", 70, 800.0)])
        wait_for_row(lambda r: r.group_key == "g1" and r.ts_seconds == 70)
        got = {
            (r.group_key, r.ts_seconds, r.rate)
            for r in spark.table("ttl_rates").collect()
        }
    finally:
        q.stop()
    assert ("g1", 20, 20.0) in got           # in-batch rate before idling
    assert ("g1", 70, 10.0) in got           # in-batch rate after revival
    # the bridged delta (60, (700-300)/(60-20)=10.0) must NOT exist:
    # eviction reset the carried state
    assert ("g1", 60, 10.0) not in got
    assert not any(k == "g1" and t == 60 for k, t, _ in got)


def test_incremental_ingest_dedups_within_and_across_batches(spark, tmp_path):
    """Near-dup-free continuous ingest (streaming/dedup.py
    start_incremental_ingest): batch 1 accepts two distinct docs and
    seeds the band index; batch 2's copy of an accepted doc is dropped
    via the STORED index (its text is never re-read), its in-batch
    near-dup pair collapses to the min id, and its genuinely new doc is
    accepted and indexed."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    from fresco_hpc_spark.streaming import start_incremental_ingest

    def doc(i):
        return (f"w{i} alpha w{i} bravo w{i} charlie w{i} delta w{i} echo "
                f"w{i} foxtrot w{i} golf w{i} hotel")

    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": [doc(1), doc(2)]}).to_csv(
        src / "a.csv", index=False
    )
    pd.DataFrame(
        {
            "doc_id": [10, 11, 12],
            # 10 duplicates accepted doc 1; 11/12 are an in-batch dup pair
            "text": [doc(1), doc(7), doc(7)],
        }
    ).to_csv(src / "b.csv", index=False)
    pd.DataFrame(
        {
            "doc_id": [20, 21],
            # 20 duplicates doc 11, accepted only in the PREVIOUS batch —
            # catches a stale index listing (the append runs on the
            # micro-batch's cloned session); 21 is new
            "text": [doc(7), doc(9)],
        }
    ).to_csv(src / "c.csv", index=False)
    os.utime(src / "a.csv", (1000000000, 1000000000))
    os.utime(src / "b.csv", (1000000100, 1000000100))
    os.utime(src / "c.csv", (1000000200, 1000000200))

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    spark.sql("DROP TABLE IF EXISTS ingest_band_idx")
    try:
        q = start_incremental_ingest(
            spark,
            stream,
            index_table="ingest_band_idx",
            accepted_dir=str(tmp_path / "accepted"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(180)
        accepted = {
            r.doc_id for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
        }
        assert accepted == {1, 2, 11, 21}, accepted
        # the index covers exactly the accepted docs (16 bands each)
        idx_docs = {
            r.doc for r in spark.table("ingest_band_idx").select("doc").distinct().collect()
        }
        assert idx_docs == {1, 2, 11, 21}
    finally:
        spark.sql("DROP TABLE IF EXISTS ingest_band_idx")


def test_incremental_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """ADVICE r4: foreachBatch bodies replay after a crash, and the
    reachable crash state is accepted-without-index (the accepted write
    runs first). Replaying the same (batch, batch_id) must not duplicate
    rows in the accepted corpus — the per-batch dynamic-partition
    overwrite rewrites the batch's own partition in place. Both replay
    states are exercised: after-both-writes (full replay of batch 0) and
    accepted-without-index (index dropped before the replay)."""
    from fresco_hpc_spark.streaming.dedup import process_ingest_batch

    def doc(i):
        return (f"w{i} alpha w{i} bravo w{i} charlie w{i} delta w{i} echo "
                f"w{i} foxtrot w{i} golf w{i} hotel")

    batch = spark.createDataFrame(
        [(1, doc(1)), (2, doc(2))], "doc_id bigint, text string"
    )
    accepted_dir = str(tmp_path / "accepted")
    spark.sql("DROP TABLE IF EXISTS replay_band_idx")
    try:
        kw = dict(index_table="replay_band_idx", accepted_dir=accepted_dir)
        process_ingest_batch(spark, batch, 0, **kw)
        baseline = sorted(
            (r.doc_id, r._ingest_batch)
            for r in spark.read.parquet(accepted_dir).collect()
        )
        assert [d for d, _ in baseline] == [1, 2]

        # replay state A: crash AFTER both writes — the cross-check sees
        # the batch's own index rows, drops everything, writes nothing
        process_ingest_batch(spark, batch, 0, **kw)
        assert sorted(
            (r.doc_id, r._ingest_batch)
            for r in spark.read.parquet(accepted_dir).collect()
        ) == baseline

        # replay state B: crash BETWEEN the writes (accepted present,
        # index rows absent) — the recomputed identical survivor set
        # must overwrite the batch's partition, not append to it
        spark.sql("DROP TABLE replay_band_idx")
        process_ingest_batch(spark, batch, 0, **kw)
        assert sorted(
            (r.doc_id, r._ingest_batch)
            for r in spark.read.parquet(accepted_dir).collect()
        ) == baseline
        # a LATER batch still appends alongside, never clobbers batch 0
        batch2 = spark.createDataFrame([(3, doc(3))], "doc_id bigint, text string")
        process_ingest_batch(spark, batch2, 1, **kw)
        got = sorted(
            (r.doc_id, r._ingest_batch)
            for r in spark.read.parquet(accepted_dir).collect()
        )
        assert got == baseline + [(3, 1)]
    finally:
        spark.sql("DROP TABLE IF EXISTS replay_band_idx")


def test_incremental_vector_ingest_replay_is_idempotent(spark, tmp_path):
    """The vector ingest inherits the text ingest's replay contract:
    re-running the same (batch, batch_id) leaves the accepted corpus
    unchanged in both reachable crash states (after-both-writes, and
    accepted-without-index)."""
    from fresco_hpc_spark.streaming.dedup import process_vector_ingest_batch

    def unit(axis, dim=8):
        v = [0.0] * dim
        v[axis] = 1.0
        return v

    batch = spark.createDataFrame(
        [(1, unit(0)), (2, unit(1))], "vec_id bigint, embedding array<double>"
    )
    accepted_dir = str(tmp_path / "vraccepted")
    spark.sql("DROP TABLE IF EXISTS vreplay_idx")
    try:
        kw = dict(index_table="vreplay_idx", accepted_dir=accepted_dir)
        process_vector_ingest_batch(spark, batch, 0, **kw)
        baseline = sorted(
            (r.vec_id, r._ingest_batch)
            for r in spark.read.parquet(accepted_dir).collect()
        )
        assert [v for v, _ in baseline] == [1, 2]
        # replay after both writes: all rows drop as self-duplicates
        process_vector_ingest_batch(spark, batch, 0, **kw)
        assert sorted(
            (r.vec_id, r._ingest_batch)
            for r in spark.read.parquet(accepted_dir).collect()
        ) == baseline
        # replay with the index lost: partition overwritten in place
        spark.sql("DROP TABLE vreplay_idx")
        process_vector_ingest_batch(spark, batch, 0, **kw)
        assert sorted(
            (r.vec_id, r._ingest_batch)
            for r in spark.read.parquet(accepted_dir).collect()
        ) == baseline
    finally:
        spark.sql("DROP TABLE IF EXISTS vreplay_idx")


def test_vector_ingest_rejects_zero_norm_vectors(spark, tmp_path):
    """ADVICE r6: a zero-norm vector has NULL cosine against everything
    (0/0), so it evaded within-batch AND cross-index dedup and a replay
    re-appended it to the index. Ingest now rejects zero vectors up
    front: they never reach the accepted corpus or the index, and an
    all-zero batch is a clean no-op."""
    from fresco_hpc_spark.streaming.dedup import process_vector_ingest_batch

    def unit(axis, dim=8):
        v = [0.0] * dim
        v[axis] = 1.0
        return v

    zero = [0.0] * 8
    batch = spark.createDataFrame(
        [(1, unit(0)), (2, zero), (3, unit(1))],
        "vec_id bigint, embedding array<double>",
    )
    accepted_dir = str(tmp_path / "vzaccepted")
    spark.sql("DROP TABLE IF EXISTS vzero_idx")
    try:
        kw = dict(index_table="vzero_idx", accepted_dir=accepted_dir)
        process_vector_ingest_batch(spark, batch, 0, **kw)
        accepted = sorted(r.vec_id for r in spark.read.parquet(accepted_dir).collect())
        assert accepted == [1, 3]
        assert sorted(r.vec_id for r in spark.table("vzero_idx").collect()) == [1, 3]
        # replay stays idempotent with the zero vector in the batch
        process_vector_ingest_batch(spark, batch, 0, **kw)
        assert sorted(
            r.vec_id for r in spark.read.parquet(accepted_dir).collect()
        ) == [1, 3]
        assert sorted(r.vec_id for r in spark.table("vzero_idx").collect()) == [1, 3]
        # an all-zero batch is a no-op (head(1) empty after the guard)
        zbatch = spark.createDataFrame(
            [(9, zero)], "vec_id bigint, embedding array<double>"
        )
        process_vector_ingest_batch(spark, zbatch, 1, **kw)
        assert sorted(
            r.vec_id for r in spark.read.parquet(accepted_dir).collect()
        ) == [1, 3]
    finally:
        spark.sql("DROP TABLE IF EXISTS vzero_idx")


def test_incremental_vector_ingest_dedups_across_batches(spark, tmp_path):
    """The vector member of the incremental-ingest trio:
    start_incremental_vector_ingest drops an exact copy of a
    previously-ACCEPTED embedding via the stored LSH-signature index
    (no re-hash of accepted vectors), collapses an in-batch near-dup
    pair to the min id, and keeps orthogonal newcomers. Identical
    vectors always share a bucket, so recall at threshold→1 is exact."""
    import os
    import time

    from fresco_hpc_spark.streaming import start_incremental_vector_ingest

    def unit(axis, dim=8, eps=0.0):
        v = [0.0] * dim
        v[axis] = 1.0
        if eps:
            v[(axis + 1) % dim] = eps
        return v

    schema = "vec_id bigint, embedding array<double>"
    batches = [
        [(1, unit(0)), (2, unit(1))],
        # 10 = exact copy of accepted 1; 11/12 in-batch near-dup pair
        [(10, unit(0)), (11, unit(2)), (12, unit(2, eps=1e-4))],
        # 20 = near-copy of 11 (accepted the PREVIOUS batch); 21 new
        [(20, unit(2, eps=2e-4)), (21, unit(3))],
    ]
    src = tmp_path / "vin"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        t = 1_000_000_000 + i * 100
        for f in src.glob("part-*.parquet"):
            if os.path.getmtime(f) > t - 50:
                os.utime(f, (t, t))
        time.sleep(0.05)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    spark.sql("DROP TABLE IF EXISTS vec_lsh_idx")
    try:
        q = start_incremental_vector_ingest(
            spark,
            stream,
            index_table="vec_lsh_idx",
            accepted_dir=str(tmp_path / "vaccepted"),
            checkpoint_dir=str(tmp_path / "vckpt"),
            threshold=0.999,
            available_now=True,
        )
        q.awaitTermination(180)
        accepted = {
            r.vec_id
            for r in spark.read.parquet(str(tmp_path / "vaccepted")).collect()
        }
        assert accepted == {1, 2, 11, 21}, accepted
        idx = {r.vec_id for r in spark.table("vec_lsh_idx").collect()}
        assert idx == {1, 2, 11, 21}
    finally:
        spark.sql("DROP TABLE IF EXISTS vec_lsh_idx")


def test_incremental_media_ingest_phash_dedups_across_batches(spark, tmp_path):
    """VERDICT r4 item 9 — the multimodal → incremental-dedup loop:
    start_incremental_media_ingest drops an exact pixel copy of a
    previously-ACCEPTED image via the stored phash index (no pixel
    re-decode), collapses an in-batch near-dup pair (1-bit pattern
    edit) to the min id, and catches a near-dup of an image accepted
    only in the PREVIOUS batch. Patterns are 8x8 block images whose
    average hash equals the pattern exactly."""
    import os
    import time

    from fresco_hpc_spark.functions.codecs import encode_bmp
    from fresco_hpc_spark.functions.multimodal import MEDIA_SCHEMA
    from fresco_hpc_spark.streaming import start_incremental_media_ingest

    def rgb(v):
        px = bytearray()
        for y in range(64):
            for x in range(64):
                val = 255 if (v >> ((y // 8) * 8 + (x // 8))) & 1 else 0
                px += bytes((val, val, val))
        return bytes(px)

    P1 = 0x00F0_F0F0_0F0F_0F01
    P2 = 0x1234_5678_9ABC_DEF0
    P3 = 0x0FF0_00FF_FF00_0FF0
    P4 = 0x7070_0707_7070_0707
    def media_row(mid, pat):
        return {
            "media_id": mid, "modality": "image",
            "payload": encode_bmp(64, 64, rgb(pat)),
            "meta": {"width": 64, "height": 64, "sample_rate": None,
                     "duration_s": None, "format": "bmp"},
        }

    src = tmp_path / "in"
    src.mkdir()
    batches = [
        [media_row(1, P1), media_row(2, P2)],
        # 10 = exact copy of accepted 1; 11/12 near-dup pair (1 bit)
        [media_row(10, P1), media_row(11, P3), media_row(12, P3 ^ 1)],
        # 20 = near-dup of 11 (accepted in the PREVIOUS batch); 21 new
        [media_row(20, P3 ^ (1 << 40)), media_row(21, P4)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        # order the part files' mtimes so maxFilesPerTrigger honors
        # batch order (file source sorts by modification time)
        t = 1_000_000_000 + i * 100
        for f in src.glob("part-*.parquet"):
            if os.path.getmtime(f) > t - 50:
                os.utime(f, (t, t))
        time.sleep(0.05)

    stream = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    spark.sql("DROP TABLE IF EXISTS media_phash_idx")
    try:
        q = start_incremental_media_ingest(
            spark,
            stream,
            index_table="media_phash_idx",
            accepted_dir=str(tmp_path / "accepted"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(180)
        accepted = {
            r.media_id
            for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
        }
        assert accepted == {1, 2, 11, 21}, accepted
        idx = {r.media_id for r in spark.table("media_phash_idx").collect()}
        assert idx == {1, 2, 11, 21}
    finally:
        spark.sql("DROP TABLE IF EXISTS media_phash_idx")


def test_streaming_hopping_agg_matches_batch(spark, tmp_path):
    """The watermarked sliding-window aggregate must equal the batch
    hopping_window_agg row-for-row on a drained stream — the mergeable
    (count, micro-unit sum) state makes the mean exact regardless of
    micro-batch arrival order."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.operators import hopping_window_agg
    from fresco_hpc_spark.streaming import streaming_hopping_agg

    events_pq = str(tmp_path / "events_pq")
    events = table(spark, SF_SMALL, "events").select(
        F.col("ts").alias("time"), "value"
    )
    events.write.parquet(events_pq)

    stream = spark.readStream.schema(events.schema).parquet(events_pq)
    agg = streaming_hopping_agg(stream, "value")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hopping_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.table("hopping_stream")
    want = hopping_window_agg(events, "value", time_col="time")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_holt_matches_batch_scan(spark, tmp_path):
    """Drained stream == batch holt_scan bit-for-bit: (level, trend)
    state carries across per-file micro-batches with the same IEEE op
    order, so the file-boundary samples — where a stateless per-file
    pass would re-seed l=v, b=0 — agree with the batch operator."""
    import os
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from fresco_hpc_spark.operators import holt_scan
    from fresco_hpc_spark.streaming import streaming_holt

    samples = [
        ("g1", 10, 100.0), ("g1", 20, 300.0), ("g1", 30, 250.0),
        ("g1", 40, 500.0), ("g1", 50, 900.0), ("g1", 60, 960.0),
        ("g2", 10, 0.5), ("g2", 25, 150.25), ("g2", 55, 450.0),
    ]
    files = [samples[0:3] + samples[6:7], samples[3:5] + samples[7:8],
             samples[5:6] + samples[8:9]]
    src = tmp_path / "hsrc"
    src.mkdir()
    base = _time.time() - 100
    for i, rows in enumerate(files):
        path = src / f"part_{i}.csv"
        pd.DataFrame(rows, columns=["group_key", "ts_seconds", "value"]).to_csv(
            path, index=False
        )
        os.utime(path, (base + i, base + i))

    schema = "group_key string, ts_seconds long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        streaming_holt(stream, alpha=0.3, beta=0.1)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("holt_stream")
        .option("checkpointLocation", str(tmp_path / "hcp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # HALF_UP like the batch operator's F.round — Python's banker's
    # round() would diverge on exactly-representable .5 boundaries
    from decimal import ROUND_HALF_UP, Decimal

    r6 = lambda x: float(  # noqa: E731
        Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )
    got = {
        (r.group_key, r.ts_seconds): (
            r6(r.level), r6(r.trend), r6(r.forecast)
        )
        for r in spark.table("holt_stream").collect()
    }
    batch_df = spark.createDataFrame(samples, schema)
    want = {
        (r.group_key, r.ts_seconds): (r.level, r.trend, r.forecast)
        for r in holt_scan(
            batch_df, "group_key", "value", time_col="ts_seconds",
            alpha=0.3, beta=0.1,
        ).collect()
    }
    assert got == want and len(got) == len(samples)


def test_streaming_ewma_holt_null_parity_with_batch(spark, tmp_path):
    """ADVICE r6: a NULL stream value must poison the rest of the key
    with SQL NULL exactly like the batch scans — not become NaN — and
    the poison must survive a micro-batch boundary (stored None state
    vs 'unseeded'). Also pins the NULL-first sort tie (Spark sorts NULL
    first ascending; pandas would sort NaN last without
    na_position='first'). One source drives both stateful operators."""
    import os
    import time as _time

    import pandas as pd

    from fresco_hpc_spark.operators import ewma_scan, holt_scan
    from fresco_hpc_spark.streaming import streaming_ewma, streaming_holt

    samples = [
        # start_null: poisoned from the first sample, across batches
        ("start_null", 10, None), ("start_null", 20, 5.0),
        # mid_null: seeds in batch 1, poisons in batch 2, stays poisoned
        ("mid_null", 10, 10.0), ("mid_null", 30, None), ("mid_null", 40, 7.0),
        # tie_null: NULL and value at the SAME ts (sort-order pin)
        ("tie_null", 10, 3.0), ("tie_null", 20, None), ("tie_null", 20, 4.0),
        # clean key: untouched
        ("clean", 10, 4.0), ("clean", 30, 8.0),
    ]
    files = [samples[0:1] + samples[2:3] + samples[5:8] + samples[8:9],
             samples[1:2] + samples[3:5] + samples[9:10]]
    src = tmp_path / "nsrc"
    src.mkdir()
    base = _time.time() - 100
    for i, rows in enumerate(files):
        path = src / f"part_{i}.csv"
        pd.DataFrame(rows, columns=["group_key", "ts_seconds", "value"]).to_csv(
            path, index=False
        )
        os.utime(path, (base + i, base + i))

    schema = "group_key string, ts_seconds long, value double"

    def drain(op, name):
        stream = (
            spark.readStream.schema(schema)
            .option("header", True)
            .option("maxFilesPerTrigger", 1)
            .csv(str(src))
        )
        q = (
            op(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"{name}_cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.table(name)

    from decimal import ROUND_HALF_UP, Decimal

    def r6(x):
        if x is None:
            return None
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    def by_key(rows, cols):
        """(group, ts) -> sorted multiset of output tuples (the tie rows
        share a ts, so per-key output is a multiset, not a scalar)."""
        out = {}
        for r in rows:
            out.setdefault((r.group_key, r.ts_seconds), []).append(
                tuple(r6(getattr(r, c)) for c in cols)
            )
        for v in out.values():
            v.sort(key=lambda t: tuple((x is None, x) for x in t))
        return out

    batch_df = spark.createDataFrame(samples, schema)

    got_e = by_key(
        drain(lambda s: streaming_ewma(s, alpha=0.3), "null_ewma").collect(),
        ["ewma"],
    )
    want_e = by_key(
        ewma_scan(
            batch_df, "group_key", "value", time_col="ts_seconds", alpha=0.3
        ).collect(),
        ["ewma"],
    )
    assert got_e == want_e
    assert got_e[("start_null", 20)] == [(None,)]
    assert got_e[("mid_null", 40)] == [(None,)]
    # tie row: NULL sorts FIRST, so the 4.0 sample is already poisoned —
    # a NaN-last sort would have produced 0.3·4 + 0.7·3 = 3.3 instead
    assert got_e[("tie_null", 20)] == [(None,), (None,)]
    assert got_e[("clean", 30)] == [(r6(0.3 * 8.0 + 0.7 * 4.0),)]

    got_h = by_key(
        drain(
            lambda s: streaming_holt(s, alpha=0.3, beta=0.1), "null_holt"
        ).collect(),
        ["level", "trend", "forecast"],
    )
    want_h = by_key(
        holt_scan(
            batch_df, "group_key", "value", time_col="ts_seconds",
            alpha=0.3, beta=0.1,
        ).collect(),
        ["level", "trend", "forecast"],
    )
    assert got_h == want_h
    assert got_h[("start_null", 20)] == [(None, None, None)]
    assert got_h[("mid_null", 40)] == [(None, None, None)]
    assert got_h[("tie_null", 20)] == [(None, None, None), (None, None, None)]


def test_streaming_weighted_sample_matches_batch(spark, tmp_path):
    """Drained-stream A-Res reservoir == batch weighted_sample_k over
    all rows seen, exactly: same md5 coin, same u^(1/w) key with
    HALF_UP 9-dp rounding, same (key desc, id) tie order. The winner
    set changes ACROSS micro-batches (later rows evict earlier reservoir
    members), state is O(k) per group, and null/non-positive weights
    are excluded in both paths."""
    import os
    import time as _time

    import pandas as pd

    from fresco_hpc_spark.functions import weighted_sample_k
    from fresco_hpc_spark.streaming import streaming_weighted_sample

    samples = [
        ("a", i, float(1 + (i * 13) % 17)) for i in range(30)
    ] + [
        ("b", 100 + i, float(5 + i)) for i in range(8)
    ] + [
        ("a", 500, None),    # excluded weights (both paths)
        ("b", 501, 0.0),
        ("b", 502, -3.0),
    ]
    files = [samples[0:10] + samples[30:32], samples[10:25] + samples[38:41],
             samples[25:30] + samples[32:38]]
    assert sum(len(f) for f in files) == len(samples)
    src = tmp_path / "wsrc"
    src.mkdir()
    base = _time.time() - 100
    for i, rows in enumerate(files):
        path = src / f"part_{i}.csv"
        pd.DataFrame(rows, columns=["g", "id", "w"]).to_csv(path, index=False)
        os.utime(path, (base + i, base + i))

    schema = "g string, id bigint, w double"
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    k = 5
    q = (
        streaming_weighted_sample(
            stream, k=k, key_col="g", id_col="id", weight_col="w"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("reservoir_stream")
        .option("checkpointLocation", str(tmp_path / "wcp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.table("reservoir_stream").collect()
    # supersession: the max-seq emission per group is "the sample so far"
    last_seq = {}
    for r in emitted:
        last_seq[r.group_key] = max(last_seq.get(r.group_key, 0), r.batch_seq)
    final = {
        (r.group_key, r.id): (r.weight, r.sample_key, r.sample_rank)
        for r in emitted
        if r.batch_seq == last_seq[r.group_key]
    }
    batch_df = spark.createDataFrame(samples, schema)
    want = {
        (r.g, r.id): (r.w, r.sample_key, r.sample_rank)
        for r in weighted_sample_k(
            batch_df, k=k, weight_col="w", id_col="id", group_col="g"
        ).collect()
    }
    assert final == want
    # the reservoir genuinely evolved: some batch-1 emission for 'a'
    # is absent from the final sample (eviction across batches)
    first_a = {r.id for r in emitted if r.group_key == "a" and r.batch_seq == 1}
    final_a = {i for (g, i) in final if g == "a"}
    assert first_a and final_a
    assert len(final_a) == k
    # excluded weights never appear in any emission
    assert not any(r.id in (500, 501, 502) for r in emitted)


def test_streaming_ewma_matches_batch_scan(spark, tmp_path):
    """Drained stream == batch ewma_scan bit-for-bit: the stateful
    kernel evaluates a*v + (1-a)*s in the same IEEE op order, and the
    recurrence state carries across the three per-file micro-batches
    (the file-boundary samples are exactly where a stateless per-file
    pass would diverge)."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from fresco_hpc_spark.operators import ewma_scan
    from fresco_hpc_spark.streaming import streaming_ewma

    samples = [
        ("g1", 10, 100.0), ("g1", 20, 300.0), ("g1", 30, 250.0),
        ("g1", 40, 500.0), ("g1", 50, 900.0), ("g1", 60, 960.0),
        ("g2", 10, 0.5), ("g2", 25, 150.25), ("g2", 55, 450.0),
    ]
    files = [samples[0:3] + samples[6:7], samples[3:5] + samples[7:8],
             samples[5:6] + samples[8:9]]
    src = tmp_path / "src"
    src.mkdir()
    import time as _time

    base = _time.time() - 100
    for i, rows in enumerate(files):
        path = src / f"part_{i}.csv"
        pd.DataFrame(rows, columns=["group_key", "ts_seconds", "value"]).to_csv(
            path, index=False
        )
        os.utime(path, (base + i, base + i))

    schema = "group_key string, ts_seconds long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        streaming_ewma(stream, alpha=0.3)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_stream")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.group_key, r.ts_seconds): r.ewma
        for r in spark.table("ewma_stream").collect()
    }
    batch_df = spark.createDataFrame(samples, schema)
    want = {
        (r.group_key, r.ts_seconds): r.ewma
        for r in ewma_scan(
            batch_df, "group_key", "value", time_col="ts_seconds", alpha=0.3,
            round_to=6,
        ).collect()
    }
    assert set(got) == set(want)
    # batch rounds to 6 dp; the stream emits raw doubles — rounding the
    # stream's output the same way must match EXACTLY (bit-identical
    # recurrence), including across the file boundaries
    from decimal import ROUND_HALF_UP, Decimal

    r6 = lambda x: float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))
    assert {k: r6(v) for k, v in got.items()} == want


def test_incremental_text_index_matches_batch_build(spark, tmp_path):
    """Drained incremental index == batch index (streaming/search.py
    start_incremental_text_index): documents arriving over three
    file-batches produce an index whose phrase search results equal a
    one-shot build_text_index over the union corpus, and the layout
    prunes on the same top-level _bkt partitions."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    from fresco_hpc_spark.functions import build_text_index, phrase_search_index
    from fresco_hpc_spark.streaming import start_incremental_text_index

    docs = [
        (1, "the cat sat on the mat"),
        (2, "cat sat cat sat cat"),
        (3, "the dog sat"),
        (4, "cat sat again and cat sat"),
        (5, "nothing to see"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    for i, chunk in enumerate([docs[:2], docs[2:4], docs[4:]]):
        pd.DataFrame(chunk, columns=["doc_id", "text"]).to_csv(
            src / f"{i}.csv", index=False
        )
        os.utime(src / f"{i}.csv", (1000000000 + i * 100,) * 2)

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    idx_dir = str(tmp_path / "idx")
    q = start_incremental_text_index(
        stream, idx_dir, str(tmp_path / "ckpt"), n_buckets=8,
        available_now=True,
    )
    q.awaitTermination(180)

    streamed = phrase_search_index(
        spark.read.parquet(idx_dir), "cat sat", n_buckets=8
    ).collect()
    build_text_index(
        spark.createDataFrame(docs, ["doc_id", "text"]),
        "t_stream_idx_ref",
        n_buckets=8,
    )
    batch = phrase_search_index(
        spark.table("t_stream_idx_ref"), "cat sat", n_buckets=8
    ).collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert {r["doc_id"]: r["n_matches"] for r in streamed} == {1: 1, 2: 2, 4: 2}
    # top-level layout is the same _bkt partitioning the batch index prunes on
    assert any(d.startswith("_bkt=") for d in os.listdir(idx_dir))
    spark.sql("DROP TABLE IF EXISTS t_stream_idx_ref")


def test_incremental_text_index_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replay contract: re-running a batch rewrites its own
    (bucket, batch) partitions in place — postings count and search
    results are unchanged, no duplicates appended."""
    from fresco_hpc_spark.functions import phrase_search_index
    from fresco_hpc_spark.streaming import process_text_index_batch

    idx_dir = str(tmp_path / "idx")
    b0 = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    b1 = spark.createDataFrame([(2, "b a b")], ["doc_id", "text"])
    process_text_index_batch(b0, 0, index_dir=idx_dir, n_buckets=4)
    process_text_index_batch(b1, 1, index_dir=idx_dir, n_buckets=4)
    before = spark.read.parquet(idx_dir).count()
    res_before = phrase_search_index(
        spark.read.parquet(idx_dir), "a b", n_buckets=4
    ).collect()
    # crash-replay of batch 1
    process_text_index_batch(b1, 1, index_dir=idx_dir, n_buckets=4)
    after = spark.read.parquet(idx_dir).count()
    res_after = phrase_search_index(
        spark.read.parquet(idx_dir), "a b", n_buckets=4
    ).collect()
    assert before == after == 7
    assert sorted(map(tuple, res_before)) == sorted(map(tuple, res_after))
    assert {r["doc_id"]: r["n_matches"] for r in res_after} == {1: 2, 2: 1}


def test_streaming_scd2_matches_batch_history(spark, tmp_path):
    """Drained streaming SCD2 == batch scd2_history exactly: closed
    episodes stream out at the change that closes them (including
    changes that happen ACROSS micro-batch boundaries — exactly where a
    stateless per-file pass would open a duplicate episode), and the
    max-batch_seq open episode per key equals the batch operator's
    is_current row. Null states cross batches via the explicit null
    flag, never as the string 'None'/NaN."""
    import os
    import time as _time

    import pandas as pd

    from fresco_hpc_spark.operators import scd2_history
    from fresco_hpc_spark.streaming import streaming_scd2_state

    rows = [
        # key u1: a a | b None  (change at the batch boundary; then a
        # null state opening an episode in batch 2)
        ("u1", 1_000_000, "a", 1), ("u1", 2_000_000, "a", 2),
        ("u1", 3_000_000, "b", 3), ("u1", 4_000_000, None, 4),
        # key u2: single event in batch 1, unchanged repeat in batch 2
        ("u2", 1_000_000, "x", 5), ("u2", 9_000_000, "x", 6),
    ]
    files = [rows[0:2] + rows[4:5], rows[2:4] + rows[5:6]]
    src = tmp_path / "scd2src"
    src.mkdir()
    base = _time.time() - 100
    for i, chunk in enumerate(files):
        p = src / f"f{i}.csv"
        pd.DataFrame(chunk, columns=["k", "ts_us", "s", "eid"]).to_csv(
            p, index=False
        )
        os.utime(p, (base + i, base + i))

    stream = (
        spark.readStream.schema("k string, ts_us long, s string, eid long")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    out_dir = str(tmp_path / "scd2out")
    q = (
        streaming_scd2_state(
            stream, key_col="k", ts_col="ts_us", state_col="s",
            tie_col="eid",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "scd2ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.read.parquet(out_dir).toPandas()

    closed = streamed[~streamed.is_current]
    latest_open = (
        streamed[streamed.is_current]
        .sort_values("batch_seq")
        .groupby("group_key")
        .tail(1)
    )
    got = sorted(
        [
            (r.group_key, r.state if pd.notna(r.state) else None,
             int(r.valid_from_us),
             int(r.valid_to_us) if pd.notna(r.valid_to_us) else None,
             int(r.version), bool(r.is_current))
            for r in pd.concat([closed, latest_open]).itertuples()
        ],
        key=lambda t: (t[0], t[4]),  # (key, version): total, null-safe
    )

    bdf = spark.createDataFrame(
        [(k, ts, s, e) for k, ts, s, e in rows],
        "k string, ts_us long, s string, eid long",
    )
    batch = scd2_history(bdf, ["k"], "ts_us", ["s"], tie_cols=["eid"])
    want = sorted(
        [
            (r["k"], r["s"], r["valid_from"], r["valid_to"], r["version"],
             r["is_current"])
            for r in batch.collect()
        ],
        key=lambda t: (t[0], t[4]),
    )
    assert got == want, (got, want)
    # cross-batch unchanged repeat (u2) never opened a second episode
    assert sum(1 for g in got if g[0] == "u2") == 1


def test_streaming_ks_reference_matches_batch(spark, tmp_path):
    """The drift monitor's batch/stream equivalence: after draining a
    file backlog (maxFilesPerTrigger=1, so state genuinely crosses
    micro-batch boundaries), each group's LAST emitted row must equal
    the batch ks_vs_reference over the union of all files — same
    shared JVM bin expression, same first-max/min-edge tie-break, same
    half-up rounding. Includes a NULL group (real group) and values
    above the reference max (overflow bin)."""
    import os
    import random
    import time as _time

    import pandas as pd

    from fresco_hpc_spark.operators.percentiles import ks_vs_reference
    from fresco_hpc_spark.streaming import streaming_ks_reference

    rng = random.Random(88)
    ref_sorted = sorted(rng.gauss(50, 10) for _ in range(2000))
    b = 8
    edges = [ref_sorted[int(f * (len(ref_sorted) - 1))] for f in
             [i / b for i in range(1, b + 1)]]

    rows = [("same", rng.gauss(50, 10)) for _ in range(300)]
    rows += [("hot", rng.gauss(90, 5)) for _ in range(150)]  # above ref max
    rows += [(None, rng.gauss(55, 12)) for _ in range(80)]
    rng.shuffle(rows)
    files = [rows[0:170], rows[170:350], rows[350:]]
    src = tmp_path / "ks_src"
    src.mkdir()
    base = _time.time() - 100
    for i, chunk in enumerate(files):
        p = src / f"part_{i}.csv"
        pd.DataFrame(chunk, columns=["group_key", "value"]).to_csv(p, index=False)
        os.utime(p, (base + i, base + i))

    schema = "group_key string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        streaming_ks_reference(stream, edges)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ks_ref_mem")
        .option("checkpointLocation", str(tmp_path / "ks_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql(
        "SELECT * FROM ks_ref_mem"
    ).toPandas()
    # last emission per group = the one with the max n_seen (n_seen is
    # monotone per group across batches)
    last = emitted.loc[emitted.groupby("group_key", dropna=False)["n_seen"].idxmax()]
    got = {
        (None if pd.isna(r["group_key"]) else r["group_key"]): (
            r["n_seen"], r["ks_d"], r["ks_at"]
        )
        for _, r in last.iterrows()
    }

    batch_df = spark.createDataFrame(rows, "group_key string, value double")
    want = {
        r["group_key"]: (r["n_group"], r["ks_d"], r["ks_at"])
        for r in ks_vs_reference(batch_df, "group_key", "value", edges).collect()
    }
    assert got == want, (got, want)
    # every batch emitted an updated row for every group present in it
    assert emitted.groupby("group_key", dropna=False).size().min() >= 1


def test_incremental_ivf_ingest_matches_batch_build(spark, tmp_path):
    """Drained incremental IVF index == batch index
    (streaming/vectors.py start_incremental_ivf_ingest): vectors
    arriving over three file-batches produce inverted lists whose
    ivf_query_index top-k equals the batch ivf_build_index over the
    union corpus with the SAME fixed codebook, and the layout prunes
    on the same top-level _cell partitions."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    from fresco_hpc_spark.functions.vectors import (
        ivf_build_index,
        ivf_query_index,
        ivf_train_centroids,
    )
    from fresco_hpc_spark.streaming import start_incremental_ivf_ingest

    def vec(i, dim=8):
        return [float((i * 7 + d * 3) % 11) - 5.0 for d in range(dim)]

    rows = [(i, vec(i)) for i in range(30)]
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    centroids = ivf_train_centroids(corpus, n_cells=4, iterations=2)

    src = tmp_path / "vin"
    src.mkdir()
    for i, chunk in enumerate([rows[:10], rows[10:20], rows[20:]]):
        pd.DataFrame(
            chunk, columns=["vec_id", "embedding"]
        ).to_parquet(src / f"{i}.parquet", index=False)
        os.utime(src / f"{i}.parquet", (1000000000 + i * 100,) * 2)

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    idx_dir = str(tmp_path / "vidx")
    q = start_incremental_ivf_ingest(
        stream, idx_dir, str(tmp_path / "vckpt"), centroids,
        available_now=True,
    )
    q.awaitTermination(180)

    query = vec(13)
    streamed = ivf_query_index(
        spark.read.parquet(idx_dir), query, centroids, k=5, nprobe=2
    ).collect()
    ivf_build_index(corpus, centroids, "t_stream_ivf_ref")
    batch = ivf_query_index(
        spark.table("t_stream_ivf_ref"), query, centroids, k=5, nprobe=2
    ).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
    assert len(streamed) == 5
    # same top-level _cell partitioning the batch index prunes on
    assert any(d.startswith("_cell=") for d in os.listdir(idx_dir))
    # every vector landed exactly once
    assert spark.read.parquet(idx_dir).count() == 30
    spark.sql("DROP TABLE IF EXISTS t_stream_ivf_ref")


def test_incremental_ivf_ingest_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replay contract: re-running a batch rewrites its
    own (cell, batch) partitions in place — row count and assignments
    unchanged, no duplicates appended; an empty replayed batch is a
    no-op."""
    from fresco_hpc_spark.functions.vectors import ivf_train_centroids
    from fresco_hpc_spark.streaming import process_ivf_ingest_batch

    def vec(i, dim=8):
        return [float((i * 5 + d) % 7) - 3.0 for d in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(12)],
        "vec_id bigint, embedding array<double>",
    )
    centroids = ivf_train_centroids(corpus, n_cells=3, iterations=2)
    idx_dir = str(tmp_path / "ividx")
    b0 = corpus.filter("vec_id < 6")
    b1 = corpus.filter("vec_id >= 6")
    process_ivf_ingest_batch(
        b0, 0, index_dir=idx_dir, centroids=centroids
    )
    process_ivf_ingest_batch(
        b1, 1, index_dir=idx_dir, centroids=centroids
    )
    baseline = sorted(
        (r.vec_id, r._cell, r._ingest_batch)
        for r in spark.read.parquet(idx_dir).collect()
    )
    assert len(baseline) == 12
    process_ivf_ingest_batch(
        b0, 0, index_dir=idx_dir, centroids=centroids
    )
    assert sorted(
        (r.vec_id, r._cell, r._ingest_batch)
        for r in spark.read.parquet(idx_dir).collect()
    ) == baseline
    process_ivf_ingest_batch(
        b1.limit(0), 1, index_dir=idx_dir, centroids=centroids
    )
    assert spark.read.parquet(idx_dir).count() == 12


def test_ivf_index_query_mid_ingest_serves_drained_prefix(spark, tmp_path):
    """Serving-consistency contract (VERDICT r11 item 6): an
    ivf_query_index over the store MID-INGEST — some batches landed,
    later ones not yet — equals the batch query over exactly the
    drained prefix, at every prefix, and a concurrent REPLAY of an
    already-landed batch leaves the served result unchanged (the
    dynamic-partition overwrite rewrites identical bytes). This is the
    read-while-ingesting guarantee a production pipeline needs on top
    of the drained==batch pin above."""
    from fresco_hpc_spark.functions.vectors import (
        ivf_build_index,
        ivf_query_index,
        ivf_train_centroids,
    )
    from fresco_hpc_spark.streaming import process_ivf_ingest_batch

    def vec(i, dim=8):
        return [float((i * 7 + d * 3) % 11) - 5.0 for d in range(dim)]

    rows = [(i, vec(i)) for i in range(30)]
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    centroids = ivf_train_centroids(corpus, n_cells=4, iterations=2)
    idx_dir = str(tmp_path / "mididx")
    query = vec(13)

    def served():
        return [
            tuple(r)
            for r in ivf_query_index(
                spark.read.parquet(idx_dir), query, centroids,
                k=5, nprobe=2,
            ).collect()
        ]

    def batch_over(prefix_rows, tbl):
        ivf_build_index(
            spark.createDataFrame(
                prefix_rows, "vec_id bigint, embedding array<double>"
            ),
            centroids,
            tbl,
        )
        out = [
            tuple(r)
            for r in ivf_query_index(
                spark.table(tbl), query, centroids, k=5, nprobe=2
            ).collect()
        ]
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        return out

    chunks = [rows[:10], rows[10:20], rows[20:]]
    for i, chunk in enumerate(chunks):
        process_ivf_ingest_batch(
            spark.createDataFrame(
                chunk, "vec_id bigint, embedding array<double>"
            ),
            i,
            index_dir=idx_dir,
            centroids=centroids,
        )
        prefix = [r for c in chunks[: i + 1] for r in c]
        assert served() == batch_over(prefix, f"t_mid_ivf_{i}"), (
            f"mid-ingest serve diverged after batch {i}"
        )
        # a replay of the just-landed batch must not perturb readers
        process_ivf_ingest_batch(
            spark.createDataFrame(
                chunk, "vec_id bigint, embedding array<double>"
            ),
            i,
            index_dir=idx_dir,
            centroids=centroids,
        )
        assert served() == batch_over(prefix, f"t_mid_ivf_r{i}")


def test_text_index_query_mid_ingest_serves_drained_prefix(spark, tmp_path):
    """The same read-while-ingesting guarantee for the text index:
    phrase_search_index over the store after each landed batch equals
    build_text_index + search over exactly that document prefix."""
    from fresco_hpc_spark.functions import (
        build_text_index,
        phrase_search_index,
    )
    from fresco_hpc_spark.streaming import process_text_index_batch

    docs = [
        (1, "the cat sat on the mat"),
        (2, "cat sat cat sat cat"),
        (3, "the dog sat"),
        (4, "cat sat again and cat sat"),
        (5, "nothing to see"),
    ]
    idx_dir = str(tmp_path / "midtxt")
    chunks = [docs[:2], docs[2:4], docs[4:]]
    for i, chunk in enumerate(chunks):
        process_text_index_batch(
            spark.createDataFrame(chunk, ["doc_id", "text"]),
            i,
            index_dir=idx_dir,
            n_buckets=8,
        )
        streamed = sorted(
            map(
                tuple,
                phrase_search_index(
                    spark.read.parquet(idx_dir), "cat sat", n_buckets=8
                ).collect(),
            )
        )
        prefix = [d for c in chunks[: i + 1] for d in c]
        build_text_index(
            spark.createDataFrame(prefix, ["doc_id", "text"]),
            "t_mid_txt_ref",
            n_buckets=8,
        )
        batch = sorted(
            map(
                tuple,
                phrase_search_index(
                    spark.table("t_mid_txt_ref"), "cat sat", n_buckets=8
                ).collect(),
            )
        )
        spark.sql("DROP TABLE IF EXISTS t_mid_txt_ref")
        assert streamed == batch, f"prefix {i} diverged"


def test_incremental_kmv_ingest_matches_batch_sketch(spark, tmp_path):
    """Drained incremental KMV store == batch sketch over the union
    corpus (streaming/sketches.py): values arriving over three
    file-batches fold through the merge property into exactly the
    sketch kmv_sketch builds in one pass — per group, identical hash
    arrays, not just close estimates."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    from fresco_hpc_spark.functions import kmv_sketch
    from fresco_hpc_spark.streaming import start_incremental_kmv_ingest

    rows = [("g%d" % (i % 3), i * 17 + (i % 5)) for i in range(300)]
    corpus = spark.createDataFrame(rows, "g string, v bigint")

    src = tmp_path / "kin"
    src.mkdir()
    for i, chunk in enumerate([rows[:100], rows[100:200], rows[200:]]):
        pd.DataFrame(chunk, columns=["g", "v"]).to_parquet(
            src / f"{i}.parquet", index=False
        )
        os.utime(src / f"{i}.parquet", (1000000000 + i * 100,) * 2)

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "kstore")
    q = start_incremental_kmv_ingest(
        stream, store, str(tmp_path / "kckpt"), "v", "g", k=32,
        available_now=True,
    )
    q.awaitTermination(180)

    streamed = {
        r.g: (int(r.n_seen), [int(x) for x in r.hs])
        for r in spark.read.parquet(store).collect()
    }
    batch = {
        r.g: (int(r.n_seen), [int(x) for x in r.hs])
        for r in kmv_sketch(corpus, "v", "g", k=32).collect()
    }
    assert streamed == batch


def test_incremental_kmv_ingest_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replay contract: merging the same batch twice is a
    set-union no-op — the store content is unchanged; an empty replayed
    batch is a no-op too."""
    from fresco_hpc_spark.functions import kmv_sketch
    from fresco_hpc_spark.streaming import process_kmv_ingest_batch

    corpus = spark.createDataFrame(
        [("a", i) for i in range(50)] + [("b", i) for i in range(10)],
        "g string, v bigint",
    )
    store = str(tmp_path / "kstore2")
    b0 = corpus.filter("v < 30")
    b1 = corpus.filter("v >= 30")

    def snap():
        return sorted(
            (r.g, int(r.n_seen), tuple(int(x) for x in r.hs))
            for r in spark.read.parquet(store).collect()
        )

    process_kmv_ingest_batch(b0, 0, store_dir=store, value_col="v",
                             group_col="g", k=16)
    process_kmv_ingest_batch(b1, 1, store_dir=store, value_col="v",
                             group_col="g", k=16)
    full = snap()
    # replay batch 1: content-identical
    process_kmv_ingest_batch(b1, 1, store_dir=store, value_col="v",
                             group_col="g", k=16)
    assert snap() == full
    # empty replay: no-op
    process_kmv_ingest_batch(corpus.filter("v < 0"), 2, store_dir=store,
                             value_col="v", group_col="g", k=16)
    assert snap() == full
    # and the drained store equals the one-pass batch sketch
    batch = sorted(
        (r.g, int(r.n_seen), tuple(int(x) for x in r.hs))
        for r in kmv_sketch(corpus, "v", "g", k=16).collect()
    )
    assert full == batch


def test_incremental_hll_ingest_matches_batch_and_replays(spark, tmp_path):
    """Drained incremental HLL store == batch registers over the union
    corpus (streaming/sketches.py): register-identical, so estimates
    agree exactly; replaying a batch re-asserts maxima (no-op), and an
    empty batch is a no-op."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    from fresco_hpc_spark.functions import hll_estimate, hll_sketch
    from fresco_hpc_spark.streaming import (
        process_hll_ingest_batch,
        start_incremental_hll_ingest,
    )

    rows = [("g%d" % (i % 3), i * 17 + (i % 5)) for i in range(300)]
    corpus = spark.createDataFrame(rows, "g string, v bigint")

    src = tmp_path / "hin"
    src.mkdir()
    for i, chunk in enumerate([rows[:100], rows[100:200], rows[200:]]):
        pd.DataFrame(chunk, columns=["g", "v"]).to_parquet(
            src / f"{i}.parquet", index=False
        )
        os.utime(src / f"{i}.parquet", (1000000000 + i * 100,) * 2)

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "hstore")
    q = start_incremental_hll_ingest(
        stream, store, str(tmp_path / "hckpt"), "v", "g", b=6,
        available_now=True,
    )
    q.awaitTermination(180)

    def regs(df):
        return sorted((r.g, int(r.j), int(r.r)) for r in df.collect())

    streamed = regs(spark.read.parquet(store))
    batch = regs(hll_sketch(corpus, "v", "g", b=6))
    assert streamed == batch

    # estimates off the maintained store equal batch-built estimates
    est_s = {
        r.g: r.est_distinct
        for r in hll_estimate(
            spark.read.parquet(store), b=6, group_col="g"
        ).collect()
    }
    est_b = {
        r.g: r.est_distinct
        for r in hll_estimate(
            hll_sketch(corpus, "v", "g", b=6), b=6, group_col="g"
        ).collect()
    }
    assert est_s == est_b

    # replay + empty-batch no-ops
    b1 = corpus.filter("v >= 150")
    process_hll_ingest_batch(b1, 9, store_dir=store, value_col="v",
                             group_col="g", b=6)
    assert regs(spark.read.parquet(store)) == batch
    process_hll_ingest_batch(corpus.filter("v < 0"), 10, store_dir=store,
                             value_col="v", group_col="g", b=6)
    assert regs(spark.read.parquet(store)) == batch


def test_stream_static_enrichment_matches_batch_join(spark, tmp_path):
    """Stream-static broadcast enrichment (streaming/enrich.py): events
    arriving over three file-batches left-joined against a static user
    dimension drain to EXACTLY the batch join — unmatched users keep
    their fact rows with NULL dim columns; right/full fail loudly."""
    import os

    import pandas as pd
    import pytest as _pt
    from pyspark.sql import types as T

    from fresco_hpc_spark.streaming import enrich_with_static

    facts = [(i, i % 5, 10.0 * i) for i in range(90)]
    dim = [(u, f"tier{u}") for u in range(4)]  # user 4 unmatched
    dim_df = spark.createDataFrame(dim, "user_id bigint, tier string")

    src = tmp_path / "ein"
    src.mkdir()
    for i, chunk in enumerate([facts[:30], facts[30:60], facts[60:]]):
        pd.DataFrame(chunk, columns=["event_id", "user_id", "value"]).to_parquet(
            src / f"{i}.parquet", index=False
        )
        os.utime(src / f"{i}.parquet", (1000000000 + i * 100,) * 2)

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_dir = str(tmp_path / "eout")
    q = (
        enrich_with_static(stream, dim_df, "user_id", how="left")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch_df = spark.createDataFrame(facts, schema)
    want = sorted(
        map(tuple, batch_df.join(dim_df, "user_id", "left").collect())
    )
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert got == want
    assert any(t[-1] is None for t in got)  # user 4 kept with NULL tier

    with _pt.raises(ValueError, match="left/inner"):
        enrich_with_static(stream, dim_df, "user_id", how="full")


def test_incremental_kmeans_assign_matches_batch(spark, tmp_path):
    """Drained incremental k-means store == batch clustering
    (streaming/vectors.py start_incremental_kmeans_assign, VERDICT
    r12 item 7): vectors arriving over three file-batches produce a
    cluster-partitioned store whose per-cluster rollup equals
    kmeans_clusters over the union corpus with the SAME fixed
    codebook, bit-for-bit (d2_micro is exact BIGINT so the inertia
    sum is order-free), and the layout prunes on top-level cluster
    partitions."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from fresco_hpc_spark.functions.cluster import (
        kmeans_clusters,
        kmeans_train,
    )
    from fresco_hpc_spark.streaming import start_incremental_kmeans_assign

    def vec(i, dim=8):
        return [float((i * 7 + d * 3) % 11) - 5.0 for d in range(dim)]

    rows = [(i, vec(i)) for i in range(30)]
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    cents = kmeans_train(corpus, k=4, iterations=2, max_train_rows=None)

    src = tmp_path / "kin"
    src.mkdir()
    for i, chunk in enumerate([rows[:10], rows[10:20], rows[20:]]):
        pd.DataFrame(
            chunk, columns=["vec_id", "embedding"]
        ).to_parquet(src / f"{i}.parquet", index=False)
        os.utime(src / f"{i}.parquet", (1000000000 + i * 100,) * 2)

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "kstore")
    q = start_incremental_kmeans_assign(
        stream, store, str(tmp_path / "kckpt"), cents, available_now=True,
    )
    q.awaitTermination(180)

    streamed = sorted(
        tuple(r)
        for r in spark.read.parquet(store)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("size"),
            F.sum("d2_micro").cast("bigint").alias("inertia_micro"),
        )
        .collect()
    )
    batch = sorted(
        tuple(r) for r in kmeans_clusters(corpus, cents).collect()
    )
    assert streamed == batch
    assert spark.read.parquet(store).count() == 30
    assert any(d.startswith("cluster=") for d in os.listdir(store))


def test_incremental_kmeans_assign_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replay contract for the k-means store: re-running
    a landed batch rewrites its own (cluster, batch) partitions in
    place — rows, assignments, and distances unchanged; an empty
    replayed batch is a no-op."""
    from fresco_hpc_spark.functions.cluster import kmeans_train
    from fresco_hpc_spark.streaming import process_kmeans_assign_batch

    def vec(i, dim=8):
        return [float((i * 5 + d) % 7) - 3.0 for d in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(12)],
        "vec_id bigint, embedding array<double>",
    )
    cents = kmeans_train(corpus, k=3, iterations=2, max_train_rows=None)
    store = str(tmp_path / "kridx")
    b0 = corpus.filter("vec_id < 6")
    b1 = corpus.filter("vec_id >= 6")
    process_kmeans_assign_batch(b0, 0, store_dir=store, centroids=cents)
    process_kmeans_assign_batch(b1, 1, store_dir=store, centroids=cents)
    baseline = sorted(
        (r.vec_id, r.cluster, r.d2_micro, r._ingest_batch)
        for r in spark.read.parquet(store).collect()
    )
    assert len(baseline) == 12
    process_kmeans_assign_batch(b0, 0, store_dir=store, centroids=cents)
    assert sorted(
        (r.vec_id, r.cluster, r.d2_micro, r._ingest_batch)
        for r in spark.read.parquet(store).collect()
    ) == baseline
    process_kmeans_assign_batch(
        b1.limit(0), 1, store_dir=store, centroids=cents
    )
    assert spark.read.parquet(store).count() == 12


def test_kmeans_store_mid_ingest_serves_drained_prefix(spark, tmp_path):
    """Read-while-ingesting guarantee for the clustering store
    (matching the IVF/text index pins): the per-cluster rollup over
    the store MID-INGEST equals kmeans_clusters over exactly the
    drained prefix, at every prefix, and a concurrent replay of a
    landed batch leaves the served result unchanged."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions.cluster import (
        kmeans_clusters,
        kmeans_train,
    )
    from fresco_hpc_spark.streaming import process_kmeans_assign_batch

    def vec(i, dim=8):
        return [float((i * 7 + d * 3) % 11) - 5.0 for d in range(dim)]

    rows = [(i, vec(i)) for i in range(30)]
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    cents = kmeans_train(corpus, k=4, iterations=2, max_train_rows=None)
    store = str(tmp_path / "kmid")

    def served():
        return sorted(
            tuple(r)
            for r in spark.read.parquet(store)
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("size"),
                F.sum("d2_micro").cast("bigint").alias("inertia_micro"),
            )
            .collect()
        )

    chunks = [rows[:10], rows[10:20], rows[20:]]
    for i, chunk in enumerate(chunks):
        cdf = spark.createDataFrame(
            chunk, "vec_id bigint, embedding array<double>"
        )
        process_kmeans_assign_batch(cdf, i, store_dir=store, centroids=cents)
        prefix = spark.createDataFrame(
            [r for c in chunks[: i + 1] for r in c],
            "vec_id bigint, embedding array<double>",
        )
        want = sorted(
            tuple(r) for r in kmeans_clusters(prefix, cents).collect()
        )
        assert served() == want, f"mid-ingest serve diverged after batch {i}"
        process_kmeans_assign_batch(cdf, i, store_dir=store, centroids=cents)
        assert served() == want


def _semdedup_stream_corpus():
    """Vectors with known SemDeDup structure: a cosine CHAIN a<b<c on
    the x-axis family (cos(a,b) and cos(b,c) >= 0.99, cos(a,c) < 0.99
    — batch drops BOTH b and c, so a survivors-only store would
    resurrect c), a power-of-two scaled exact dup in the y-axis
    cluster, and filler directions far from everything. Ids increase
    in arrival order (the documented greedy-arrival contract under
    which drained == batch bit-for-bit)."""
    import math

    def at(deg, scale=3.0, axis="x"):
        r = math.radians(deg)
        v = [math.cos(r) * scale, math.sin(r) * scale]
        return v if axis == "x" else [v[1], v[0]]

    return [
        # batch 0: chain head + fillers
        (0, at(0.0)),            # a — survives
        (1, at(45.0)),           # far from everything, survives
        (2, at(0.0, axis="y")),  # y-cluster head, survives
        # batch 1: chain middle + y-cluster exact dup
        (10, at(8.0)),           # b — cos(a,b)=cos 8deg≈.9903 -> dropped
        (11, at(0.0, 6.0, "y")),  # 2x scaled copy of 2 -> dropped
        (12, at(70.0, axis="y")),  # survives
        # batch 2: chain tail
        (20, at(16.0)),          # c — cos(b,c)≈.9903 drops it via the
                                 # DROPPED b; cos(a,c)≈.9613 < .99
        (21, at(30.0)),          # survives
    ]


def test_incremental_semdedup_matches_batch_including_chains(spark, tmp_path):
    """Drained incremental SemDeDup == batch semdedup_kmeans
    (streaming/vectors.py start_incremental_semdedup, VERDICT r13
    item 7), including the a<b<c cosine chain that distinguishes a
    store-all-flagged design from a survivors-only store: the batch
    drop rule compares against every smaller id, dropped ones
    included, so c must drop via the already-dropped b."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    from fresco_hpc_spark.functions.cluster import semdedup_kmeans
    from fresco_hpc_spark.streaming import start_incremental_semdedup

    rows = _semdedup_stream_corpus()
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]

    src = tmp_path / "sdin"
    src.mkdir()
    batches = [rows[:3], rows[3:6], rows[6:]]
    for i, chunk in enumerate(batches):
        pd.DataFrame(
            chunk, columns=["vec_id", "embedding"]
        ).to_parquet(src / f"{i}.parquet", index=False)
        os.utime(src / f"{i}.parquet", (1000000000 + i * 100,) * 2)

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "sdstore")
    q = start_incremental_semdedup(
        stream, store, str(tmp_path / "sdckpt"), cents,
        threshold=0.99, available_now=True,
    )
    q.awaitTermination(180)

    stored = spark.read.parquet(store)
    assert stored.count() == len(rows)  # dropped rows stay, flagged
    streamed = sorted(
        (r.vec_id, r.cluster)
        for r in stored.filter("survivor").collect()
    )
    batch = sorted(
        (r.vec_id, r.cluster)
        for r in semdedup_kmeans(corpus, cents, threshold=0.99).collect()
    )
    assert streamed == batch
    # the chain really exercised the dropped-row comparison: b and c
    # both gone, a alive
    alive = {v for v, _ in streamed}
    assert 0 in alive and 10 not in alive and 20 not in alive
    assert 11 not in alive and 2 in alive
    assert any(d.startswith("cluster=") for d in os.listdir(store))


def test_incremental_semdedup_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replay contract for the SemDeDup store: re-running
    a landed batch rewrites its own (cluster, batch) partitions with
    identical rows AND identical survivor decisions (the prior-rows
    filter excludes the replayed batch's own landed rows, so the
    decision inputs replay exactly); an empty replay is a no-op."""
    from fresco_hpc_spark.streaming import process_semdedup_batch

    rows = _semdedup_stream_corpus()
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    store = str(tmp_path / "sdridx")
    b0 = corpus.filter("vec_id < 10")
    b1 = corpus.filter("vec_id >= 10 and vec_id < 20")
    b2 = corpus.filter("vec_id >= 20")
    for i, b in enumerate((b0, b1, b2)):
        process_semdedup_batch(
            b, i, store_dir=store, centroids=cents, threshold=0.99
        )
    snapshot = lambda: sorted(  # noqa: E731
        (r.vec_id, r.cluster, r.survivor, r._ingest_batch)
        for r in spark.read.parquet(store).collect()
    )
    baseline = snapshot()
    assert len(baseline) == len(rows)
    process_semdedup_batch(
        b1, 1, store_dir=store, centroids=cents, threshold=0.99
    )
    assert snapshot() == baseline
    process_semdedup_batch(
        b2.limit(0), 2, store_dir=store, centroids=cents, threshold=0.99
    )
    assert snapshot() == baseline


def test_semdedup_store_mid_ingest_serves_drained_prefix(spark, tmp_path):
    """Read-while-ingesting guarantee for the SemDeDup store (matching
    the k-means/IVF/text pins): filter("survivor") over the store
    MID-INGEST equals batch semdedup_kmeans over exactly the drained
    prefix, at every prefix."""
    from fresco_hpc_spark.functions.cluster import semdedup_kmeans
    from fresco_hpc_spark.streaming import process_semdedup_batch

    rows = _semdedup_stream_corpus()
    cents = [[1.0, 0.0], [0.0, 1.0]]
    store = str(tmp_path / "sdpidx")
    batches = [rows[:3], rows[3:6], rows[6:]]
    seen = []
    for i, chunk in enumerate(batches):
        seen.extend(chunk)
        process_semdedup_batch(
            spark.createDataFrame(
                chunk, "vec_id bigint, embedding array<double>"
            ),
            i, store_dir=store, centroids=cents, threshold=0.99,
        )
        served = sorted(
            (r.vec_id, r.cluster)
            for r in spark.read.parquet(store)
            .filter("survivor").collect()
        )
        batch = sorted(
            (r.vec_id, r.cluster)
            for r in semdedup_kmeans(
                spark.createDataFrame(
                    seen, "vec_id bigint, embedding array<double>"
                ),
                cents, threshold=0.99,
            ).collect()
        )
        assert served == batch, f"prefix {i}"
