"""fresco_hpc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the FRESCO HPC-telemetry platform
(reference: j-mckerracher/fresco-hpc), rebuilt Spark-first.

The reference runs three engines (DuckDB-WASM in the browser, an AWS Lambda
"query planner", and a Polars ETL pipeline). Here all three collapse into
one engine: Spark DataFrames / SQL over partitioned Parquet.

Design rules (enforced throughout):
  * DataFrame API / Spark SQL only — no RDDs in operator paths.
  * Zero row-at-a-time Python UDFs in hot paths; the whole reference surface
    maps to Catalyst-native expressions (SURVEY.md §2.10).
  * No ``collect()`` inside operators. Scalar statistics (percentile bounds,
    min/max for binning) stay distributed as 1-row DataFrames joined via
    ``broadcast`` cross join, so every operator composes lazily and scales.
  * Aggregations are expressed so Catalyst plans map-side partial aggregation;
    filters/projections are plain expressions so parquet pushdown applies.
"""

from fresco_hpc_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
