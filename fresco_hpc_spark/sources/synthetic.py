"""Synthetic wide-table generator (SURVEY.md §2.1 S12).

The reference seeds demo data with
``INSERT ... SELECT ts + random()*(ts2-ts1), 'demo-'||i, ... FROM
generate_series(1, N)`` (web/src/utils/schema.ts:271-310; JS-loop variant
query_builder.tsx:126-178). This restatement replaces ``random()`` with an
explicit LCG keyed on the row id so the output is deterministic and
oracle-checkable — ``spark.range`` is the ``generate_series`` analogue and
the generator is embarrassingly parallel (no shuffle, no driver loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LCG_A = 1_103_515_245
_LCG_C = 12_345
_LCG_M = 2_147_483_648  # 2^31


def _lcg(expr, salt: int):
    """Deterministic pseudo-random in [0, 2^31): one LCG step of id+salt.
    id*A + C stays far below 2^63 for any realistic row count."""
    return ((expr + F.lit(salt)) * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M)


def synthetic_job_data(
    spark: SparkSession,
    n: int,
    start: str = "2024-01-01 00:00:00",
    window_days: int = 30,
) -> DataFrame:
    """N demo rows of the wide job schema's core columns, deterministic."""
    i = F.col("id")
    frac_t = _lcg(i, 0) / F.lit(float(_LCG_M))
    frac_v = _lcg(i, 7) / F.lit(float(_LCG_M))
    frac_m = _lcg(i, 13) / F.lit(float(_LCG_M))
    offset = (frac_t * F.lit(window_days * 86400)).cast("bigint")
    base = F.lit(start).cast("timestamp")
    # timestamp_seconds(unix_timestamp(base) + offset): TZ-safe round trip
    # (both conversions use the session timezone)
    ts = F.timestamp_seconds(F.unix_timestamp(base) + offset)
    return spark.range(1, n + 1).select(
        ts.alias("time"),
        F.concat(F.lit("demo-"), i.cast("string")).alias("jid"),
        F.concat(F.lit("NODE"), (i % 16).cast("string")).alias("host"),
        F.concat(F.lit("user"), (i % 25).cast("string")).alias("username"),
        (i % 4 + 1).cast("bigint").alias("nhosts"),
        ((i % 4 + 1) * 16).cast("bigint").alias("ncores"),
        # reference: CASE WHEN random()<0.9 THEN '0' ELSE '1' (schema.ts:299)
        F.when(_lcg(i, 3) % 10 < 9, F.lit("0")).otherwise(F.lit("1")).alias("exitcode"),
        F.round(frac_v * 100, 6).alias("value_cpuuser"),
        F.round(frac_m * 256, 6).alias("value_memused"),
    )


SYNTHETIC_ORACLE_SQL_TEMPLATE = """
    SELECT
        TIMESTAMP '{start}'
            + to_seconds(CAST(floor(((i + 0) * 1103515245 + 12345) % 2147483648
                              / 2147483648.0 * {window_seconds}) AS BIGINT)) AS time,
        'demo-' || CAST(i AS VARCHAR) AS jid,
        'NODE' || CAST(i % 16 AS VARCHAR) AS host,
        'user' || CAST(i % 25 AS VARCHAR) AS username,
        CAST(i % 4 + 1 AS BIGINT) AS nhosts,
        CAST((i % 4 + 1) * 16 AS BIGINT) AS ncores,
        CASE WHEN ((i + 3) * 1103515245 + 12345) % 2147483648 % 10 < 9
             THEN '0' ELSE '1' END AS exitcode,
        ROUND(((i + 7) * 1103515245 + 12345) % 2147483648 / 2147483648.0 * 100, 6)
            AS value_cpuuser,
        ROUND(((i + 13) * 1103515245 + 12345) % 2147483648 / 2147483648.0 * 256, 6)
            AS value_memused
    FROM generate_series(1, {n}) AS t(i)
"""
