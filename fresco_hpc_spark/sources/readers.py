"""Sources: parquet / CSV scans (SURVEY.md §2.1 S1-S7).

The reference's download-buffer-insert dance (client.ts:100-163) and
ThreadPool HTTP ingest (http_extractor.py) collapse into plain
``spark.read`` calls — Spark tasks provide the parallelism, and the
DataSource V2 parquet reader pushes filters/projections into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_parquet(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """S1/S2: parquet scan. Accepts a file, directory, glob, or list of
    paths (the pruned-partition-list form the Lambda planner produced,
    lambda_handler.py:313-373 — here Catalyst prunes instead)."""
    if isinstance(path, list):
        return spark.read.parquet(*path)
    return spark.read.parquet(path)


def read_csv_tolerant(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    encoding: str = "UTF-8",
    header: bool = True,
) -> DataFrame:
    """S3: tolerant CSV scan — PERMISSIVE mode keeps malformed rows with
    nulls, reproducing Polars ``ignore_errors=True`` + encoding fallback
    (core/pipeline.py:223-240). Charset is explicit; Spark's reader handles
    latin-1/cp1252 via the ``encoding`` option rather than retry loops."""
    reader = (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("encoding", encoding)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    if isinstance(path, list):
        return reader.csv(path)
    return reader.csv(path)


def _timestamp_cols(path: str) -> tuple[list[str], list[str]]:
    """Classify the parquet file's timestamp columns from the footer only
    (no data read): ``(nanos_cols, naive_cols)``.

    - ``nanos_cols``: TIMESTAMP(NANOS) — Spark cannot read these natively;
      they need the legacy raw-int64 conf.
    - ``naive_cols``: micro/milli/second timestamps with no timezone
      (``isAdjustedToUTC=false``) — Spark reads them as TIMESTAMP_NTZ,
      which rejects casts to numeric and diverges from DuckDB's
      naive-as-UTC TIMESTAMP; they need instant normalization.
    """
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        schema = pq.read_schema(path)
        ts = [f for f in schema if pat.is_timestamp(f.type)]
        return (
            [f.name for f in ts if f.type.unit == "ns"],
            [f.name for f in ts if f.type.unit != "ns" and f.type.tz is None],
        )
    except Exception:  # noqa: BLE001 — non-parquet / remote path: assume none
        return [], []


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table from ``{sf_dir}/{name}.parquet``.

    Timestamp columns are normalized to plain TIMESTAMP (instant) UTC
    regardless of how the file stores them, so every downstream operator
    and every DuckDB oracle (which reads the same file as naive-as-UTC
    TIMESTAMP) sees identical values:

    - nanosecond timestamps are read as raw int64 (legacy conf) and
      truncated to microseconds — lossless for micro-precision data;
    - naive micro/milli timestamps (TIMESTAMP_NTZ to Spark) have their
      wall clock interpreted as UTC via an epoch-anchored timestampdiff,
      which is independent of the session time zone — critical because
      the external driver runs a vanilla session whose zone we don't
      control, and a bare NTZ→TIMESTAMP cast would shift instants there.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols, ntz_cols = _timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    for c in ntz_cols:
        df = df.withColumn(
            c,
            F.expr(
                "timestamp_micros(timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{c}`))"
            ),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load testdata tables and register each as a temp view (the
    reference's composition unit — SURVEY.md §1.1)."""
    out: dict[str, DataFrame] = {}
    for name in names or TESTDATA_TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_jsonl_tolerant(
    spark: SparkSession,
    path: str | list[str],
    schema: "T.StructType | None" = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines source — the interchange format LLM corpora actually
    arrive in (one JSON document per line). PERMISSIVE mode: malformed
    lines land intact in ``corrupt_col`` instead of failing the read, so
    a 100 TB crawl with a few broken shards still ingests; filter
    ``col(corrupt_col).isNotNull()`` to quarantine them. Spark
    restriction: filtering/projecting ONLY ``corrupt_col`` against the
    raw file scan is disallowed (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    cache the parsed relation first when splitting good/bad.

    With an explicit ``schema`` the scan is single-pass; without one
    Spark runs a schema-inference pass first (fine interactively, pass a
    schema in production — inference reads the data twice).
    """
    if schema is not None and corrupt_col not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
        )
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(path, list):
        return reader.json(path)
    return reader.json(path)
