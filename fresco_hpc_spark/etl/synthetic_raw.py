"""Deterministic raw-CSV-shaped frames derived from the ``events`` table.

The reference's ETL consumes raw TACC-Stats CSVs (FIXTURES.md F3). The
driver's testdata has no such files, so for the differential-oracle gate we
*derive* raw-shaped string frames from ``events`` with deterministic
expressions — including injected malformed timestamps / non-numeric values
(exercising the strict=False null-then-filter paths) and counter resets
(random-sign deltas) — and run the real transformers on them. The DuckDB
oracles replicate the same derivation + transformation in SQL.

Group-key design: ``node`` encodes the full ``user_id`` so each (job, node)
group is one user; ``device``/second are derived from ``event_id`` so
timestamps are unique within every window partition (deterministic lag
order — SURVEY.md §7.4 trap 3 applied to windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BASE_TS = "TIMESTAMP'2024-01-01 00:00:00'"


def _ts_string(seconds_expr: str, bad_mod: int = 89) -> F.Column:
    """MM/dd/yyyy HH:mm:ss string, malformed every ``bad_mod`` rows."""
    return (
        F.when(F.col("event_id") % bad_mod == 0, F.lit("not a date"))
        .otherwise(
            F.date_format(
                F.expr(f"timestampadd(SECOND, CAST({seconds_expr} AS INT), {_BASE_TS})"),
                "MM/dd/yyyy HH:mm:ss",
            )
        )
        .alias("timestamp")
    )


def _counter(scale: float, bad_mod: int | None = None) -> F.Column:
    """Numeric-string counter column; optionally malformed every
    ``bad_mod`` rows."""
    base = F.round(F.col("value") * scale).cast("bigint").cast("string")
    if bad_mod is None:
        return base
    return F.when(F.col("event_id") % bad_mod == 0, F.lit("garbage")).otherwise(base)


def raw_block_from_events(events: DataFrame) -> DataFrame:
    return events.select(
        F.concat(F.lit("jobID"), (F.col("user_id") % 50).cast("string")).alias("jobID"),
        F.concat(F.lit("node"), F.col("user_id").cast("string")).alias("node"),
        F.concat(F.lit("dev"), (F.col("event_id") % 4).cast("string")).alias("device"),
        _ts_string("event_id DIV 4"),
        _counter(100, bad_mod=97).alias("rd_sectors"),
        _counter(50).alias("wr_sectors"),
    )


def raw_cpu_from_events(events: DataFrame) -> DataFrame:
    return events.select(
        F.concat(F.lit("jobID"), (F.col("user_id") % 50).cast("string")).alias("jobID"),
        F.concat(F.lit("node"), F.col("user_id").cast("string")).alias("node"),
        F.concat(F.lit("cpu"), (F.col("event_id") % 4).cast("string")).alias("device"),
        _ts_string("event_id DIV 4"),
        _counter(10, bad_mod=97).alias("user"),
        _counter(5).alias("nice"),
        _counter(3).alias("system"),
        _counter(20).alias("idle"),
        _counter(2).alias("iowait"),
        _counter(1).alias("irq"),
        _counter(0.5).alias("softirq"),
    )


def raw_mem_from_events(events: DataFrame) -> DataFrame:
    # MemFree sometimes exceeds MemTotal and sometimes goes negative;
    # FilePages sometimes exceeds memory_used — exercises every branch of
    # the repair chain (hpc_transformers.py:277-302).
    memfree_scale = F.when(F.col("event_id") % 5 == 0, F.lit(1200000.0)).otherwise(
        F.lit(700000.0)
    )
    filepages_scale = F.when(F.col("event_id") % 3 == 0, F.lit(900000.0)).otherwise(
        F.lit(200000.0)
    )
    return events.select(
        F.concat(F.lit("jobID"), (F.col("user_id") % 50).cast("string")).alias("jobID"),
        F.concat(F.lit("node"), F.col("user_id").cast("string")).alias("node"),
        _ts_string("event_id"),
        _counter(1000000, bad_mod=97).alias("MemTotal"),
        F.round(F.col("value") * memfree_scale - 50000).cast("bigint").cast("string").alias("MemFree"),
        F.round(F.col("value") * filepages_scale).cast("bigint").cast("string").alias("FilePages"),
    )


def raw_llite_from_events(events: DataFrame) -> DataFrame:
    return events.select(
        F.concat(F.lit("jobID"), (F.col("user_id") % 50).cast("string")).alias("jobID"),
        F.concat(F.lit("node"), F.col("user_id").cast("string")).alias("node"),
        _ts_string("event_id"),
        _counter(1000000, bad_mod=97).alias("read_bytes"),
        _counter(500000).alias("write_bytes"),
    )
