"""Sinks: chunked parquet writer, CSV export, output validation
(SURVEY.md §2.1 S8-S10; reference loaders/parquet_loader.py:18-174,
web/src/util/export.ts:10-71).
"""

from __future__ import annotations

import glob

import pytest

from fresco_hpc_spark.sources import (
    export_csv,
    read_csv_tolerant,
    table,
    validate_output,
    write_chunked_parquet,
)
from tests.conftest import SF_SMALL


def test_chunked_parquet_splits_files(spark, tmp_path):
    out = str(tmp_path / "chunked")
    ev = table(spark, SF_SMALL, "events").repartition(1)
    # tiny max_file_bytes forces the size-based split the reference's
    # loader performs (parquet_loader.py:64-89)
    write_chunked_parquet(ev, out, max_file_bytes=20_000)
    files = glob.glob(out + "/*.parquet")
    assert len(files) > 1, "expected multiple chunk files"
    back = spark.read.parquet(out)
    assert back.count() == ev.count()


def test_chunked_parquet_roundtrip_values(spark, tmp_path):
    out = str(tmp_path / "rt")
    ev = table(spark, SF_SMALL, "events")
    write_chunked_parquet(ev, out)
    back = spark.read.parquet(out)
    assert back.exceptAll(ev).count() == 0
    assert ev.exceptAll(back).count() == 0


def test_export_csv_iso_timestamps(spark, tmp_path):
    out = str(tmp_path / "csv")
    ev = table(spark, SF_SMALL, "events").select("event_id", "ts", "event_type")
    export_csv(ev, out)
    files = glob.glob(out + "/*.csv")
    assert files
    header = open(files[0]).readline().strip()
    assert header == "event_id,ts,event_type"
    body = open(files[0]).readlines()[1]
    # ISO-8601 timestamp in the data (export.ts writes ISO dates)
    assert "T" in body.split(",")[1]
    back = read_csv_tolerant(spark, out, header=True)
    assert back.count() == ev.count()


def test_validate_output(spark, tmp_path):
    out = str(tmp_path / "v")
    table(spark, SF_SMALL, "events").write.parquet(out)
    assert validate_output(spark, out, expected_columns=["event_id", "ts"])
    with pytest.raises(ValueError, match="missing expected columns"):
        validate_output(spark, out, expected_columns=["nope"])


def test_wide_store_roundtrip(spark, tmp_path):
    """The serving-shape store leg of wide_table_roundtrip: narrow ETL →
    pivot → WIDE_JOB_SCHEMA-mapped parquet store → read back → the
    chart-layer hourly rollup over the STORED table equals the rollup
    over the in-memory wide frame."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from fresco_hpc_spark import operators as ops
    from fresco_hpc_spark.etl import memory_metrics, raw_mem_from_events
    from fresco_hpc_spark.schema import WIDE_JOB_SCHEMA

    narrow = memory_metrics(
        raw_mem_from_events(table(spark, SF_SMALL, "events"))
    ).withColumn("Value", F.round("Value", 6))
    wide = ops.pivot_long_to_wide(
        narrow,
        ["Job Id", "Host", "Timestamp"],
        event_col="Event",
        value_col="Value",
        events=["memused", "memused_minus_diskcache"],
        agg="first",
    )
    # map into the canonical wide fact-table columns (F1 serving schema)
    stored_cols = wide.select(
        F.col("Timestamp").alias("time"),
        F.col("Host").alias("host"),
        F.col("Job Id").alias("jid"),
        F.col("memused").alias("value_memused"),
        F.col("memused_minus_diskcache").alias("value_memused_minus_diskcache"),
    )
    names = set(WIDE_JOB_SCHEMA.fieldNames())
    assert set(stored_cols.columns) <= names  # subset of the F1 schema
    out = str(tmp_path / "wide_store")
    write_chunked_parquet(stored_cols, out)
    assert validate_output(spark, out, expected_columns=list(stored_cols.columns))

    def rollup(df, t_col, v_col):
        return {
            r["bucket"]: r["avg_v"]
            for r in df.groupBy(F.date_trunc("hour", F.col(t_col)).alias("bucket"))
            .agg(F.round(F.avg(v_col), 6).alias("avg_v"))
            .collect()
        }

    direct = rollup(wide, "Timestamp", "memused")
    stored = rollup(spark.read.parquet(out), "time", "value_memused")
    assert direct == stored
    # and the queries() entry agrees with the same composition
    q = {
        r["bucket"]: r["avg_memused"]
        for r in entrymod.queries()["wide_table_roundtrip"](spark, SF_SMALL).collect()
    }
    assert q == direct


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    """JSONL source/sink: valid lines roundtrip losslessly; malformed
    lines land in _corrupt_record instead of failing the read."""
    from pyspark.sql import types as T

    from fresco_hpc_spark.sources import export_jsonl, read_jsonl_tolerant

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "second"}\n'
        "{broken json line\n"
        '{"doc_id": 3, "text": "third"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    # Spark disallows filtering on ONLY the corrupt column against the
    # raw file scan (documented on the reader); cache first to quarantine
    df = read_jsonl_tolerant(spark, str(src), schema=schema).cache()
    try:
        good = df.filter("_corrupt_record IS NULL")
        bad = df.filter("_corrupt_record IS NOT NULL")
        rows_bad = bad.collect()
        assert good.count() == 3 and len(rows_bad) == 1
        assert rows_bad[0]["_corrupt_record"].startswith("{broken")

        out = tmp_path / "out"
        export_jsonl(good.select("doc_id", "text"), str(out), max_records_per_file=2)
        back = read_jsonl_tolerant(spark, str(out), schema=schema)
        assert sorted(
            (r.doc_id, r.text)
            for r in back.filter("_corrupt_record IS NULL").collect()
        ) == [(1, "hello world"), (2, "second"), (3, "third")]
        # maxRecordsPerFile honored: 3 rows / cap 2 -> at least 2 shards
        import os
        shards = [f for f in os.listdir(out) if f.startswith("part-")]
        assert len(shards) >= 2
    finally:
        df.unpersist()
