"""End-to-end batch ETL pipeline (SURVEY.md §3.3).

The reference's run: extract files → per-file Polars transform (keyed on
filename) → config-driven generic chain → chunked snappy parquet +
validation (data-pipeline run_pipeline.py:170-256, core/pipeline.py,
parquet_loader.py). Spark restatement: the per-file eager loop with
``gc.collect()`` becomes ONE distributed job — a single tolerant CSV read
over every matching file, one transformer DAG, one partitioned write. At
100 TB the file list is Spark's to parallelize; nothing round-trips
through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from fresco_hpc_spark.etl.generic import CompositeTransformer
from fresco_hpc_spark.etl.transformers import transformer_for_filename
from fresco_hpc_spark.schema import (
    RAW_BLOCK_SCHEMA,
    RAW_CPU_SCHEMA,
    RAW_LLITE_SCHEMA,
    RAW_MEM_SCHEMA,
)
from fresco_hpc_spark.sources.readers import read_csv_tolerant
from fresco_hpc_spark.sources.writers import validate_output, write_chunked_parquet

RAW_SCHEMAS: dict[str, T.StructType] = {
    "block": RAW_BLOCK_SCHEMA,
    "cpu": RAW_CPU_SCHEMA,
    "mem": RAW_MEM_SCHEMA,
    "llite": RAW_LLITE_SCHEMA,
}

LONG_OUTPUT_COLUMNS = ["Job Id", "Host", "Event", "Value", "Units", "Timestamp"]


def run_batch_pipeline(
    spark: SparkSession,
    input_glob: str,
    kind: str,
    output_dir: str,
    generic_config: dict | None = None,
) -> DataFrame:
    """Read every ``{kind}`` CSV matched by ``input_glob``, apply the HPC
    transformer plus the optional config-driven generic chain, write
    chunked snappy parquet, validate, and return the transformed frame.

    ``kind`` ∈ {block, cpu, mem, llite} — same keying as the reference's
    filename dispatch (core/pipeline.py:31-36).
    """
    if kind not in RAW_SCHEMAS:
        raise KeyError(f"unknown pipeline kind {kind!r}; expected {sorted(RAW_SCHEMAS)}")
    raw = read_csv_tolerant(spark, input_glob, schema=RAW_SCHEMAS[kind])
    out = transformer_for_filename(f"{kind}.csv")(raw)
    if generic_config:
        out = CompositeTransformer(generic_config).transform(out)
    write_chunked_parquet(out, output_dir)
    validate_output(spark, output_dir, expected_columns=list(out.columns))
    return out
