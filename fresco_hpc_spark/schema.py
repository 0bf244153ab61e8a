"""Canonical schemas and column metadata.

Re-expresses the reference's single-source-of-truth schema constant
(web/src/utils/schema.ts:13-47, DDL at web/src/util/client.ts:66-89) and the
ETL long-event output schema (data-pipeline/.../loaders/parquet_loader.py:176-179)
as Spark ``StructType``s, plus the column category / unit metadata the charts
key on (schema.ts:162-207, web/src/components/vgplot.tsx:34-41).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- F1: the wide 22-column job-telemetry fact table -----------------------

WIDE_JOB_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("submit_time", T.TimestampType(), True),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("timelimit", T.DoubleType(), True),
        T.StructField("nhosts", T.LongType(), True),
        T.StructField("ncores", T.LongType(), True),
        T.StructField("account", T.StringType(), True),
        T.StructField("queue", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("jid", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("jobname", T.StringType(), True),
        T.StructField("exitcode", T.StringType(), True),
        T.StructField("host_list", T.StringType(), True),
        T.StructField("username", T.StringType(), True),
        T.StructField("value_cpuuser", T.DoubleType(), True),
        T.StructField("value_gpu", T.DoubleType(), True),
        T.StructField("value_memused", T.DoubleType(), True),
        T.StructField("value_memused_minus_diskcache", T.DoubleType(), True),
        T.StructField("value_nfs", T.DoubleType(), True),
        T.StructField("value_block", T.DoubleType(), True),
    ]
)

# --- F2: the long/narrow ETL event schema ----------------------------------

LONG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("Job Id", T.StringType(), True),
        T.StructField("Host", T.StringType(), True),
        T.StructField("Event", T.StringType(), True),
        T.StructField("Value", T.DoubleType(), True),
        T.StructField("Units", T.StringType(), True),
        T.StructField("Timestamp", T.TimestampType(), True),
    ]
)

# --- F3: raw HPC monitoring CSV schemas (read as strings; transformers
#         cast with null-on-failure, matching Polars strict=False) ----------

def _raw(cols: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in cols])


RAW_BLOCK_SCHEMA = _raw(["jobID", "node", "device", "timestamp", "rd_sectors", "wr_sectors"])
RAW_CPU_SCHEMA = _raw(
    ["jobID", "node", "device", "timestamp", "user", "nice", "system", "idle", "iowait", "irq", "softirq"]
)
RAW_MEM_SCHEMA = _raw(["jobID", "node", "timestamp", "MemTotal", "MemFree", "FilePages"])
RAW_LLITE_SCHEMA = _raw(["jobID", "node", "timestamp", "read_bytes", "write_bytes"])

# --- column metadata (schema.ts:162-207; vgplot.tsx:34-41) -----------------

COLUMN_CATEGORIES: dict[str, str] = {
    "time": "time", "submit_time": "time", "start_time": "time", "end_time": "time",
    "jid": "job", "jobname": "job", "username": "job", "account": "job",
    "queue": "job", "exitcode": "job",
    "nhosts": "resource", "ncores": "resource", "host": "resource",
    "host_list": "resource", "unit": "resource", "timelimit": "resource",
    "value_cpuuser": "performance", "value_gpu": "performance",
    "value_memused": "performance", "value_memused_minus_diskcache": "performance",
    "value_nfs": "performance", "value_block": "performance",
}

NUMERIC_COLUMNS = [
    "timelimit", "nhosts", "ncores", "value_cpuuser", "value_gpu",
    "value_memused", "value_memused_minus_diskcache", "value_nfs", "value_block",
]
TEMPORAL_COLUMNS = ["time", "submit_time", "start_time", "end_time"]
CATEGORICAL_COLUMNS = [
    "account", "queue", "host", "jid", "unit", "jobname", "exitcode",
    "host_list", "username",
]

METRIC_UNITS: dict[str, str] = {
    "value_cpuuser": "CPU %",
    "value_gpu": "GPU %",
    "value_memused": "GB",
    "value_memused_minus_diskcache": "GB",
    "value_nfs": "MB/s",
    "value_block": "GB/s",
}

METRIC_COLUMNS = list(METRIC_UNITS)
