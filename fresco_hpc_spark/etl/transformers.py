"""HPC ETL transformers — raw monitoring CSVs to the long event schema
(SURVEY.md §2.5 W2/W3, §2.4 A10, §2.7 U1, §2.2 P9/P10).

Faithful Spark restatements of the reference's four Polars transformers
(data-pipeline/.../transformers/hpc_transformers.py):

  * block (13-107):  Δ(rd+wr sectors)/Δt per device → GB/s, summed per node
  * cpu   (110-225): Δjiffies per core, (Δuser+Δnice)/Δtotal·100 per node
  * mem   (228-336): repair chain → memused & memused_minus_diskcache GB
  * nfs   (339-429): Δ(read+write bytes)/Δt per node → MB/s

Semantic traps preserved exactly (SURVEY.md §7.4 traps 5/6/8/9):
  * first-sample rows: block keeps them with rate 0.0; nfs drops them
    (time_delta IS NULL filter); cpu drops them via the delta filter.
  * counter resets (negative deltas): rate 0 for block/nfs; row dropped
    for cpu (user/nice delta >= 0 filter — note total_jiffies_delta > 0
    only, per-column sign is checked on user/nice alone).
  * failed casts / timestamp parses become null then filtered —
    ``try_cast``/``try_to_timestamp`` reproduce Polars strict=False under
    ANSI mode.
  * the mem repair chain order: clip >= 0 → MemFree := min(MemFree,
    MemTotal) → used := Total - Free → FilePages := min(FilePages,
    MemTotal, used) → subtract.

Scale notes: the reference globally sorts each file then windows; in Spark
the ``Window.partitionBy(keys).orderBy(ts)`` supplies per-group ordering —
one shuffle by group key, no global sort. The node-level rollup reuses the
same keys, so AQE can often satisfy it without a second full shuffle.
Everything is Catalyst-native expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SECTOR_SIZE_BYTES = 512
BYTES_TO_GB = 1.0 / (1024**3)
BYTES_TO_MB = 1.0 / (1024 * 1024)
MIN_TIME_DELTA = 0.1
TS_FORMAT = "MM/dd/yyyy HH:mm:ss"  # reference: '%m/%d/%Y %H:%M:%S'
CPU_JIFFY_COLUMNS = ["user", "nice", "system", "idle", "iowait", "irq", "softirq"]

_OUT_COLS = ["Job Id", "Host", "Event", "Value", "Units", "Timestamp"]


def _clean_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """fill_null('unknown') on key columns (hpc_transformers.py:36-38)."""
    for k in keys:
        df = df.withColumn(k, F.coalesce(F.col(k).cast("string"), F.lit("unknown")))
    return df


def _parse_ts(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """jobID normalization + strict=False timestamp parse + null filter
    (hpc_transformers.py:52-61)."""
    return (
        df.withColumn("jobID", F.regexp_replace("jobID", "jobID", "JOB"))
        .withColumn("Timestamp_original", F.try_to_timestamp(F.col(ts_col), F.lit(TS_FORMAT)))
        .filter(F.col("Timestamp_original").isNotNull())
    )


def _deltas(df: DataFrame, group_keys: list[str], value_col: str) -> DataFrame:
    """W2/W3: partitioned lag-diff of a counter column and of time-seconds
    (hpc_transformers.py:72-75). Polars ``.dt.total_seconds()`` is
    fractional; ``cast(timestamp as double)`` gives the same epoch-seconds
    double."""
    w = Window.partitionBy(*group_keys).orderBy("Timestamp_original")
    secs = F.col("Timestamp_original").cast("double")
    return df.withColumn(
        "time_delta_seconds", secs - F.lag(secs).over(w)
    ).withColumn(
        "value_delta", F.col(value_col) - F.lag(F.col(value_col)).over(w)
    )


def _rate(scale: float) -> Column:
    """P10: delta-validity predicate → rate, else 0.0
    (hpc_transformers.py:78-87)."""
    valid = (
        F.col("time_delta_seconds").isNotNull()
        & (F.col("time_delta_seconds") >= MIN_TIME_DELTA)
        & F.col("value_delta").isNotNull()
        & (F.col("value_delta") >= 0)
    )
    return F.when(valid, F.col("value_delta") * scale / F.col("time_delta_seconds")).otherwise(
        F.lit(0.0)
    )


def _standardize(df: DataFrame, event: str, units: str) -> DataFrame:
    """Final 6-column select (hpc_transformers.py:95-101)."""
    return df.select(
        F.col("jobID").alias("Job Id"),
        F.col("node").alias("Host"),
        F.lit(event).alias("Event"),
        F.col("Value").cast("double").alias("Value"),
        F.lit(units).alias("Units"),
        F.col("Timestamp_original").alias("Timestamp"),
    )


def block_io_rates(df: DataFrame) -> DataFrame:
    """Block I/O → node-level disk throughput in GB/s
    (hpc_transformers.py:13-107)."""
    df = _clean_keys(df, ["jobID", "node", "device"])
    df = df.withColumn("rd_sectors", F.col("rd_sectors").try_cast("double")).withColumn(
        "wr_sectors", F.col("wr_sectors").try_cast("double")
    )
    df = df.filter(F.col("rd_sectors").isNotNull() & F.col("wr_sectors").isNotNull())
    df = _parse_ts(df)
    df = df.withColumn("total_sectors", F.col("rd_sectors") + F.col("wr_sectors"))
    df = _deltas(df, ["jobID", "node", "device"], "total_sectors")
    df = df.withColumn("Value_device_rate", _rate(SECTOR_SIZE_BYTES * BYTES_TO_GB))
    node = (
        df.groupBy("jobID", "node", "Timestamp_original")
        .agg(F.sum("Value_device_rate").alias("Value"))
    )
    return _standardize(node, "block", "GB/s")


def cpu_user_percent(df: DataFrame) -> DataFrame:
    """CPU jiffy counters → node-level user CPU %
    (hpc_transformers.py:110-225)."""
    df = _clean_keys(df, ["jobID", "node", "device"])
    for c in CPU_JIFFY_COLUMNS:
        df = df.withColumn(c, F.col(c).try_cast("double"))
    all_valid: Column = F.lit(True)
    for c in CPU_JIFFY_COLUMNS:  # pl.fold all-not-null (lines 138-143)
        all_valid = all_valid & F.col(c).isNotNull()
    df = df.filter(all_valid)
    df = _parse_ts(df)
    total = None
    for c in CPU_JIFFY_COLUMNS:  # sum_horizontal (line 166)
        total = F.col(c) if total is None else total + F.col(c)
    df = df.withColumn("total_jiffies", total)

    w = Window.partitionBy("jobID", "node", "device").orderBy("Timestamp_original")
    for c in ["user", "nice", "total_jiffies"]:
        df = df.withColumn(f"{c}_delta", F.col(c) - F.lag(F.col(c)).over(w))
    # valid-delta filter (lines 182-190): drops first samples AND resets
    df = df.filter(
        F.col("total_jiffies_delta").isNotNull()
        & (F.col("total_jiffies_delta") > 0)
        & F.col("user_delta").isNotNull()
        & F.col("nice_delta").isNotNull()
        & (F.col("user_delta") >= 0)
        & (F.col("nice_delta") >= 0)
    )
    node = (
        df.groupBy("jobID", "node", "Timestamp_original")
        .agg(
            F.sum("user_delta").alias("user_delta_sum"),
            F.sum("nice_delta").alias("nice_delta_sum"),
            F.sum("total_jiffies_delta").alias("total_jiffies_delta_sum"),
        )
    )
    pct = F.when(
        F.col("total_jiffies_delta_sum") > 0,
        (F.col("user_delta_sum") + F.col("nice_delta_sum"))
        / F.col("total_jiffies_delta_sum")
        * 100.0,
    ).otherwise(F.lit(0.0))
    node = node.withColumn("Value", F.least(F.greatest(pct, F.lit(0.0)), F.lit(100.0)))
    return _standardize(node, "cpuuser", "CPU %")


def memory_metrics(df: DataFrame) -> DataFrame:
    """Memory → memused + memused_minus_diskcache in GB; two output rows per
    input row via union — the reference's manual unpivot
    (hpc_transformers.py:228-336; repair chain 277-302, order-sensitive)."""
    df = _clean_keys(df, ["jobID", "node"])
    for c in ["MemTotal", "MemFree", "FilePages"]:
        df = df.withColumn(c, F.col(c).try_cast("double"))
    df = df.filter(
        F.col("MemTotal").isNotNull()
        & F.col("MemFree").isNotNull()
        & F.col("FilePages").isNotNull()
    )
    df = _parse_ts(df)
    # repair chain — order matters (SURVEY.md §7.4 trap 9)
    for c in ["MemTotal", "MemFree", "FilePages"]:
        df = df.withColumn(c, F.greatest(F.col(c), F.lit(0.0)))  # clip(0, None)
    df = df.withColumn("MemFree", F.least("MemFree", "MemTotal"))
    df = df.withColumn("memory_used", F.col("MemTotal") - F.col("MemFree"))
    df = df.withColumn("FilePages", F.least("FilePages", "MemTotal", "memory_used"))
    df = df.withColumn("memused_value", F.col("memory_used") * BYTES_TO_GB).withColumn(
        "memused_minus_diskcache_value",
        (F.col("memory_used") - F.col("FilePages")) * BYTES_TO_GB,
    )
    # U1 (pl.concat, line 330) as a single-pass stack() unpivot: the
    # reference concatenates two derived frames, which in Spark would scan
    # and repair the input twice; stack emits both Event rows from one
    # pass (SURVEY §2.7's own idiomatic mapping).
    stacked = df.select(
        F.col("jobID").alias("Job Id"),
        F.col("node").alias("Host"),
        F.expr(
            "stack(2, 'memused', memused_value, "
            "'memused_minus_diskcache', memused_minus_diskcache_value) "
            "AS (Event, Value)"
        ),
        F.col("Timestamp_original").alias("Timestamp"),
    )
    return stacked.select(
        "Job Id",
        "Host",
        "Event",
        F.col("Value").cast("double").alias("Value"),
        F.lit("GB").alias("Units"),
        "Timestamp",
    )


def nfs_rates(df: DataFrame) -> DataFrame:
    """NFS/Lustre byte counters → MB/s per (job, node)
    (hpc_transformers.py:339-429). Unlike block, first samples are DROPPED
    (time_delta IS NULL filter, line 414) and there is no device rollup —
    output keeps per-sample rows."""
    df = _clean_keys(df, ["jobID", "node"])
    df = df.withColumn("read_bytes", F.col("read_bytes").try_cast("double")).withColumn(
        "write_bytes", F.col("write_bytes").try_cast("double")
    )
    df = df.filter(F.col("read_bytes").isNotNull() & F.col("write_bytes").isNotNull())
    df = _parse_ts(df)
    df = df.withColumn("total_bytes", F.col("read_bytes") + F.col("write_bytes"))
    df = _deltas(df, ["jobID", "node"], "total_bytes")
    df = df.withColumn("Value", _rate(BYTES_TO_MB))
    df = df.filter(F.col("time_delta_seconds").isNotNull())
    return _standardize(df, "nfs", "MB/s")


_BY_FILENAME = {
    "block": block_io_rates,
    "cpu": cpu_user_percent,
    "mem": memory_metrics,
    "llite": nfs_rates,
}


def transformer_for_filename(filename: str):
    """Dispatch on source filename, mirroring the pipeline's keying on
    {block,cpu,mem,llite}.csv (core/pipeline.py:31-36, 69-78)."""
    stem = filename.rsplit("/", 1)[-1].split(".")[0].lower()
    for key, fn in _BY_FILENAME.items():
        if key in stem:
            return fn
    raise KeyError(f"no transformer for file {filename!r}")
