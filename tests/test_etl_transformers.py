"""Edge-semantics tests for the HPC ETL transformers (SURVEY.md §7.4 traps
5/6/8/9) using hand-crafted fixtures: first samples, counter resets,
malformed timestamps/values, and the mem repair chain."""

from __future__ import annotations

import pytest

from fresco_hpc_spark.etl import (
    block_io_rates,
    cpu_user_percent,
    memory_metrics,
    nfs_rates,
    transformer_for_filename,
)
from fresco_hpc_spark.schema import RAW_BLOCK_SCHEMA, RAW_LLITE_SCHEMA, RAW_MEM_SCHEMA


def test_block_first_sample_keeps_row_with_zero_rate(spark):
    rows = [
        ("jobID1", "n1", "d1", "01/01/2024 00:00:00", "1000", "1000"),
        ("jobID1", "n1", "d1", "01/01/2024 00:00:10", "2048000", "2048000"),
    ]
    df = spark.createDataFrame(rows, RAW_BLOCK_SCHEMA)
    out = {r["Timestamp"].second: r["Value"] for r in block_io_rates(df).collect()}
    assert out[0] == 0.0  # first sample kept, rate 0 (hpc_transformers.py:86)
    # Δ(total) = (2048000+2048000-2000) sectors * 512 B / 2^30 / 10 s
    assert out[10] == pytest.approx((4096000 - 2000) * 512 / 1024**3 / 10)


def test_block_counter_reset_rate_zero(spark):
    rows = [
        ("j", "n", "d", "01/01/2024 00:00:00", "5000", "5000"),
        ("j", "n", "d", "01/01/2024 00:00:10", "10", "10"),  # reset → negative Δ
    ]
    df = spark.createDataFrame(rows, RAW_BLOCK_SCHEMA)
    out = sorted(r["Value"] for r in block_io_rates(df).collect())
    assert out == [0.0, 0.0]


def test_block_malformed_rows_dropped(spark):
    rows = [
        ("j", "n", "d", "01/01/2024 00:00:00", "abc", "1"),     # bad numeric
        ("j", "n", "d", "99/99/9999 00:00:10", "1", "1"),       # bad timestamp
        ("j", "n", "d", "01/01/2024 00:00:20", "1", "1"),       # good
    ]
    df = spark.createDataFrame(rows, RAW_BLOCK_SCHEMA)
    assert block_io_rates(df).count() == 1


def test_block_jobid_normalized_and_nulls_filled(spark):
    rows = [(None, None, None, "01/01/2024 00:00:00", "1", "1")]
    df = spark.createDataFrame(rows, RAW_BLOCK_SCHEMA)
    r = block_io_rates(df).collect()[0]
    assert r["Job Id"] == "unknown" and r["Host"] == "unknown"
    rows = [("jobID42", "n", "d", "01/01/2024 00:00:00", "1", "1")]
    r = block_io_rates(spark.createDataFrame(rows, RAW_BLOCK_SCHEMA)).collect()[0]
    assert r["Job Id"] == "JOB42"


def test_cpu_drops_first_sample_and_resets(spark):
    cols = ["jobID", "node", "device", "timestamp", "user", "nice", "system",
            "idle", "iowait", "irq", "softirq"]
    rows = [
        ("j", "n", "c0", "01/01/2024 00:00:00", "100", "10", "5", "1000", "1", "1", "1"),
        ("j", "n", "c0", "01/01/2024 00:00:10", "200", "20", "5", "1800", "1", "1", "1"),
        ("j", "n", "c0", "01/01/2024 00:00:20", "50", "5", "5", "100", "1", "1", "1"),  # reset
    ]
    df = spark.createDataFrame(rows, ", ".join(f"`{c}` string" for c in cols))
    out = cpu_user_percent(df).collect()
    # first sample dropped (null deltas), reset dropped (negative user delta)
    assert len(out) == 1
    r = out[0]
    # (Δuser+Δnice)/Δtotal·100 = (100+10)/910·100
    assert r["Value"] == pytest.approx((100 + 10) / 910 * 100)
    assert r["Event"] == "cpuuser" and r["Units"] == "CPU %"


def test_mem_repair_chain_order(spark):
    # MemFree > MemTotal must be clamped BEFORE used is computed;
    # FilePages > used must be clamped before the subtraction.
    rows = [("j", "n", "01/01/2024 00:00:00",
             str(8 * 1024**3), str(10 * 1024**3), str(9 * 1024**3))]
    df = spark.createDataFrame(rows, RAW_MEM_SCHEMA)
    out = {r["Event"]: r["Value"] for r in memory_metrics(df).collect()}
    # MemFree := min(10G, 8G) = 8G → used = 0 → FilePages := min(9G, 8G, 0) = 0
    assert out["memused"] == 0.0
    assert out["memused_minus_diskcache"] == 0.0


def test_mem_negative_values_clipped(spark):
    rows = [("j", "n", "01/01/2024 00:00:00",
             str(8 * 1024**3), str(-5), str(2 * 1024**3))]
    df = spark.createDataFrame(rows, RAW_MEM_SCHEMA)
    out = {r["Event"]: r["Value"] for r in memory_metrics(df).collect()}
    assert out["memused"] == pytest.approx(8.0)          # free clipped to 0
    assert out["memused_minus_diskcache"] == pytest.approx(6.0)  # 8G - 2G cache


def test_mem_two_rows_per_input(spark):
    rows = [("j", "n", "01/01/2024 00:00:00", "1000", "400", "100")] * 3
    df = spark.createDataFrame(rows, RAW_MEM_SCHEMA)
    assert memory_metrics(df).count() == 6


def test_nfs_drops_first_sample(spark):
    rows = [
        ("j", "n", "01/01/2024 00:00:00", "0", "0"),
        ("j", "n", "01/01/2024 00:00:10", str(10 * 1024**2), "0"),
    ]
    df = spark.createDataFrame(rows, RAW_LLITE_SCHEMA)
    out = nfs_rates(df).collect()
    assert len(out) == 1  # first sample dropped (hpc_transformers.py:414)
    assert out[0]["Value"] == pytest.approx(1.0)  # 10 MB / 10 s


def test_transformer_dispatch():
    assert transformer_for_filename("2024-01/block.csv") is block_io_rates
    assert transformer_for_filename("cpu.csv") is cpu_user_percent
    assert transformer_for_filename("mem.csv") is memory_metrics
    assert transformer_for_filename("llite.csv") is nfs_rates
    with pytest.raises(KeyError):
        transformer_for_filename("unknown.csv")
