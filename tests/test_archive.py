"""S13 archive sink: zip + sha256 + index.json packaging
(reference generate_archives.py:105-238 semantics)."""

from __future__ import annotations

import hashlib
import json
import os
import zipfile
from datetime import datetime, timezone
from pathlib import Path

from fresco_hpc_spark.sources import generate_archives, write_chunked_parquet, table
from tests.conftest import SF_SMALL


def _make_files(src: Path) -> dict[str, datetime]:
    """Four files across two months spanning a quarter boundary."""
    stamps = {
        "a.parquet": datetime(2024, 1, 10, tzinfo=timezone.utc),
        "b.parquet": datetime(2024, 1, 20, tzinfo=timezone.utc),
        "c.parquet": datetime(2024, 3, 5, tzinfo=timezone.utc),
        "d.parquet": datetime(2024, 4, 1, tzinfo=timezone.utc),
    }
    src.mkdir(parents=True, exist_ok=True)
    for name, ts in stamps.items():
        p = src / name
        p.write_bytes(name.encode() * 100)
        epoch = ts.timestamp()
        os.utime(p, (epoch, epoch))
    return stamps


def test_monthly_and_quarterly_grouping(tmp_path):
    src = tmp_path / "store"
    out = tmp_path / "dest"
    _make_files(src)
    manifest = generate_archives(str(src), str(out))

    by_path = {m["path"]: m for m in manifest}
    assert set(by_path) == {
        "archives/monthly/2024-01.zip",
        "archives/monthly/2024-03.zip",
        "archives/monthly/2024-04.zip",
        "archives/quarterly/2024-Q1.zip",
        "archives/quarterly/2024-Q2.zip",
    }
    assert by_path["archives/monthly/2024-01.zip"]["object_count"] == 2
    assert by_path["archives/quarterly/2024-Q1.zip"]["object_count"] == 3
    assert by_path["archives/quarterly/2024-Q2.zip"]["object_count"] == 1
    # date range covers min/max member mtimes
    q1 = by_path["archives/quarterly/2024-Q1.zip"]
    assert q1["start"].startswith("2024-01-10") and q1["end"].startswith("2024-03-05")


def test_zip_contents_and_checksum(tmp_path):
    src = tmp_path / "store"
    out = tmp_path / "dest"
    _make_files(src)
    manifest = generate_archives(str(src), str(out))
    for entry in manifest:
        archive = out / entry["path"]
        assert archive.exists()
        assert entry["size"] == archive.stat().st_size
        # manifest checksum is the real sha256 of the zip bytes
        assert entry["checksum"] == hashlib.sha256(archive.read_bytes()).hexdigest()
        with zipfile.ZipFile(archive) as zf:
            assert len(zf.namelist()) == entry["object_count"]
            assert all("/" not in n for n in zf.namelist())  # flat names
            zf.testzip()
    # index.json IS the manifest
    index = json.loads((out / "archives" / "index.json").read_text())
    assert index == manifest


def test_empty_source_writes_empty_index(tmp_path):
    src = tmp_path / "empty"
    src.mkdir()
    out = tmp_path / "dest"
    manifest = generate_archives(str(src), str(out))
    assert manifest == []
    assert json.loads((out / "archives" / "index.json").read_text()) == []


def test_archives_spark_store_output(tmp_path, spark):
    """End-to-end with a real Spark sink: chunked parquet store →
    archive packaging over the produced part files."""
    store = tmp_path / "events_store"
    write_chunked_parquet(table(spark, SF_SMALL, "events"), str(store))
    out = tmp_path / "dest"
    manifest = generate_archives(
        str(store), str(out), file_glob="**/*.parquet", quarterly=False
    )
    assert len(manifest) >= 1
    total_members = sum(m["object_count"] for m in manifest)
    n_parts = len(list(store.glob("*.parquet")))
    assert total_members == n_parts >= 1
    # the archived store roundtrips: unzip one archive, read members back
    target = out / manifest[0]["path"]
    extract_dir = tmp_path / "x"
    with zipfile.ZipFile(target) as zf:
        zf.extractall(extract_dir)
    back = spark.read.parquet(str(extract_dir))
    assert back.count() == table(spark, SF_SMALL, "events").count()
