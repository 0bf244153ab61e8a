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
