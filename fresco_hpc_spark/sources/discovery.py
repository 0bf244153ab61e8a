"""Source discovery (SURVEY.md §2.1 S5/S6).

The reference's HTTP extractor scrapes an index page for ``YYYY-MM``
folders and downloads ``{block,cpu,mem,llite}.csv`` per folder with a
ThreadPool (extractors/http_extractor.py:19-220); the local extractor
globs ``file_patterns`` with an optional ``folder_pattern`` regex
(extractors/local_extractor.py:14-77). Spark restatement: discovery is a
driver-side METADATA operation (list folders, build the path list), and
the download/read parallelism belongs to Spark tasks — one
``spark.read.csv([paths])`` replaces the ThreadPool."""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

MONTH_FOLDER_RE = re.compile(r"^\d{4}-\d{2}$")


def discover_month_folders(
    spark: SparkSession,
    base_path: str,
    folder_pattern: str | None = None,
) -> list[str]:
    """List ``YYYY-MM`` subfolders of ``base_path`` via the Hadoop
    FileSystem API (works on file://, hdfs://, s3a://), optionally
    filtered by an extra regex — S5's index-page discovery + S6's
    ``folder_pattern``."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(base_path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    extra = re.compile(folder_pattern) if folder_pattern else None
    out = []
    for status in fs.listStatus(jpath):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        if MONTH_FOLDER_RE.match(name) and (extra is None or extra.search(name)):
            out.append(status.getPath().toString())
    return sorted(out)


def discover_files(
    spark: SparkSession,
    folders: list[str],
    file_patterns: list[str],
) -> list[str]:
    """Expand folders × substring file patterns into concrete file paths
    (the reference matches patterns as substrings, file_watcher.py:61-67
    / local_extractor.py). The returned list feeds one distributed read."""
    sc = spark.sparkContext
    out = []
    for folder in folders:
        jpath = sc._jvm.org.apache.hadoop.fs.Path(folder)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        for status in fs.listStatus(jpath):
            if status.isDirectory():
                continue
            name = status.getPath().getName()
            if any(pat in name for pat in file_patterns):
                out.append(status.getPath().toString())
    return sorted(out)
