"""Driver contract: entry / queries / oracle_sql.

Each key in ``queries()`` is an operator from SURVEY.md §2 (or an added
LLM-data-pipeline operator), implemented via the fresco_hpc_spark library;
``oracle_sql()`` holds the equivalent ANSI SQL DuckDB runs on the same
parquet tables. Aggregate/computed columns are aliased identically on both
sides, and float aggregates are rounded to 6 decimals on BOTH sides so the
order-insensitive value hash is robust to summation-order ulp drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fresco_hpc_spark import operators as ops
from fresco_hpc_spark.sources import table

Query = Callable[[SparkSession, str], DataFrame]

# Flagship window over the events table (data spans 2024-01-01..2024-01-30).
_WINDOW = ("2024-01-05 00:00:00", "2024-01-12 00:00:00")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.2 slice 0): time-bound + hourly
    AVG/MIN/MAX/COUNT of a metric — P2 + A2 — on sf0.001."""
    events = table(spark, "/root/testdata/sf0.001", "events")
    return ops.hourly_agg(
        ops.time_bound(events, *_WINDOW, time_col="ts"), "value", time_col="ts"
    )


# --- query implementations -------------------------------------------------


def q_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.hourly_agg(table(spark, sf_dir, "events"), "value", time_col="ts")


def q_time_bound_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = ops.time_bound(table(spark, sf_dir, "events"), *_WINDOW, time_col="ts")
    return ops.hourly_agg(ev, "value", time_col="ts")


def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.column_stats(table(spark, sf_dir, "events"), "value")


def q_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.availability(table(spark, sf_dir, "events"), "value", time_col="ts")


def q_time_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.time_extent(table(spark, sf_dir, "events"), time_col="ts", with_count=True)


def q_profile_agg_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.profile_agg(table(spark, sf_dir, "events"), "value", granularity="day", time_col="ts")


def q_global_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.global_percentiles(table(spark, sf_dir, "lineitem"), "l_extendedprice", [0.01, 0.25, 0.5, 0.75, 0.99])


def q_percentile_trimmed_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.percentile_trimmed_hourly_agg(table(spark, sf_dir, "events"), "value", time_col="ts")


def q_iqr_trim_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    trimmed = ops.iqr_trim(table(spark, sf_dir, "lineitem"), "l_extendedprice")
    return trimmed.agg(
        F.count(F.lit(1)).alias("trimmed_count"),
        F.round(F.avg("l_extendedprice"), 6).alias("trimmed_avg"),
        F.min("l_extendedprice").alias("trimmed_min"),
        F.max("l_extendedprice").alias("trimmed_max"),
    )


def q_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.category_counts(table(spark, sf_dir, "events"), "event_type")


def q_topn_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.topn_others(table(spark, sf_dir, "events"), "user_id", n=10)


def q_histogram_bin_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.histogram_bin_index(table(spark, sf_dir, "lineitem"), "l_extendedprice", bins=50)


def q_histogram_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.histogram_range_join(table(spark, sf_dir, "lineitem"), "l_extendedprice", bins=50)


def queries() -> dict[str, Query]:
    return {
        "hourly_agg": q_hourly_agg,
        "time_bound_hourly": q_time_bound_hourly,
        "column_stats": q_column_stats,
        "availability": q_availability,
        "time_extent": q_time_extent,
        "profile_agg_day": q_profile_agg_day,
        "global_percentiles": q_global_percentiles,
        "percentile_trimmed_hourly": q_percentile_trimmed_hourly,
        "iqr_trim_agg": q_iqr_trim_agg,
        "category_counts": q_category_counts,
        "topn_others": q_topn_others,
        "histogram_bin_index": q_histogram_bin_index,
        "histogram_range_join": q_histogram_range_join,
    }


# --- DuckDB oracles --------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    w0, w1 = _WINDOW
    return {
        "hourly_agg": """
            SELECT date_trunc('hour', ts) AS bucket,
                   ROUND(AVG(value), 6) AS avg_value,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value,
                   COUNT(*) AS count_value
            FROM events
            WHERE ts IS NOT NULL AND value IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "time_bound_hourly": f"""
            SELECT date_trunc('hour', ts) AS bucket,
                   ROUND(AVG(value), 6) AS avg_value,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value,
                   COUNT(*) AS count_value
            FROM events
            WHERE ts BETWEEN TIMESTAMP '{w0}' AND TIMESTAMP '{w1}'
              AND ts IS NOT NULL AND value IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "column_stats": """
            SELECT MIN(value) AS min_value, MAX(value) AS max_value,
                   COUNT(*) AS total_count,
                   COUNT(CASE WHEN value IS NULL THEN 1 END) AS null_count
            FROM events
        """,
        "availability": """
            SELECT COUNT(*) AS available_count
            FROM events
            WHERE value IS NOT NULL AND value != 0 AND ts IS NOT NULL
        """,
        "time_extent": """
            SELECT MIN(ts) AS min_time, MAX(ts) AS max_time, COUNT(*) AS row_count
            FROM events
        """,
        "profile_agg_day": """
            SELECT date_trunc('day', ts) AS bucket,
                   ROUND(AVG(value), 6) AS avg_value,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value,
                   ROUND(STDDEV(value), 6) AS stddev_value,
                   ROUND(SUM(value), 6) AS sum_value,
                   ROUND(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY value), 6) AS q25,
                   ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value), 6) AS median,
                   ROUND(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY value), 6) AS q75,
                   COUNT(*) AS count_value
            FROM events
            WHERE ts IS NOT NULL AND value IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "global_percentiles": """
            SELECT ROUND(PERCENTILE_CONT(0.01) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p01,
                   ROUND(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p25,
                   ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p50,
                   ROUND(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p75,
                   ROUND(PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p99
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
        """,
        "percentile_trimmed_hourly": """
            WITH base AS (
                SELECT ts, value FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
            ), percentiles AS (
                SELECT PERCENTILE_CONT(0.01) WITHIN GROUP (ORDER BY value) AS p_low,
                       PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY value) AS p_high
                FROM base
            )
            SELECT date_trunc('hour', t.ts) AS bucket,
                   ROUND(AVG(t.value), 6) AS avg_value,
                   MIN(t.value) AS min_value,
                   MAX(t.value) AS max_value,
                   COUNT(*) AS count_value
            FROM base t, percentiles p
            WHERE t.value BETWEEN p.p_low AND p.p_high
            GROUP BY 1 ORDER BY 1
        """,
        "iqr_trim_agg": """
            WITH bounds_q AS (
                SELECT PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS q25,
                       PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS q75
                FROM lineitem WHERE l_extendedprice IS NOT NULL
            ), bounds AS (
                SELECT q25 - (q75 - q25) * 1.5 AS lower_b, q75 + (q75 - q25) * 1.5 AS upper_b
                FROM bounds_q
            )
            SELECT COUNT(*) AS trimmed_count,
                   ROUND(AVG(l_extendedprice), 6) AS trimmed_avg,
                   MIN(l_extendedprice) AS trimmed_min,
                   MAX(l_extendedprice) AS trimmed_max
            FROM lineitem t, bounds b
            WHERE t.l_extendedprice BETWEEN b.lower_b AND b.upper_b
        """,
        "category_counts": """
            SELECT event_type AS category, COUNT(*) AS count
            FROM events WHERE event_type IS NOT NULL
            GROUP BY 1 ORDER BY count DESC, category ASC
        """,
        "topn_others": """
            WITH counts AS (
                SELECT user_id AS category, COUNT(*) AS count
                FROM events WHERE user_id IS NOT NULL GROUP BY 1
            ), ranked AS (
                SELECT category, count,
                       ROW_NUMBER() OVER (ORDER BY count DESC, category ASC) AS rank
                FROM counts
            )
            SELECT category, count FROM (
                SELECT CASE WHEN rank <= 10 THEN CAST(category AS VARCHAR) ELSE 'Others' END AS category,
                       CAST(SUM(count) AS BIGINT) AS count
                FROM ranked
                GROUP BY 1
            )
            ORDER BY CASE WHEN category = 'Others' THEN 1 ELSE 0 END, count DESC, category ASC
        """,
        "histogram_bin_index": """
            WITH data_range AS (
                SELECT MIN(l_extendedprice) AS min_val, MAX(l_extendedprice) AS max_val
                FROM lineitem WHERE l_extendedprice IS NOT NULL
            ), bin_width AS (
                SELECT min_val, max_val, (max_val - min_val) / 50 AS width FROM data_range
            ), binned_data AS (
                SELECT l_extendedprice AS v,
                       CASE WHEN bw.width = 0 THEN 0
                            ELSE LEAST(49, FLOOR((l_extendedprice - bw.min_val) / NULLIF(bw.width, 0)))
                       END AS bin_index,
                       bw.min_val, bw.width
                FROM lineitem d, bin_width bw
                WHERE d.l_extendedprice IS NOT NULL
            )
            SELECT CAST(bin_index AS BIGINT) AS bin_index,
                   min_val + bin_index * width AS bin_start,
                   min_val + (bin_index + 1) * width AS bin_end,
                   COUNT(*) AS count,
                   ROUND(AVG(v), 6) AS avg_value
            FROM binned_data
            GROUP BY bin_index, min_val, width
            ORDER BY bin_index
        """,
        "histogram_range_join": """
            WITH stats AS (
                SELECT MIN(l_extendedprice) AS min_val, MAX(l_extendedprice) AS max_val
                FROM lineitem WHERE l_extendedprice IS NOT NULL
            ), bins AS (
                SELECT g.bin_index,
                       s.min_val + (s.max_val - s.min_val) * g.bin_index / 50 AS bin_start,
                       s.min_val + (s.max_val - s.min_val) * (g.bin_index + 1) / 50 AS bin_end
                FROM generate_series(0, 49) g(bin_index), stats s
            )
            SELECT b.bin_start, b.bin_end, COUNT(t.l_extendedprice) AS count
            FROM bins b
            LEFT JOIN lineitem t
              ON t.l_extendedprice >= b.bin_start AND t.l_extendedprice < b.bin_end
            WHERE t.l_extendedprice IS NOT NULL OR b.bin_index = 49
            GROUP BY b.bin_index, b.bin_start, b.bin_end
            ORDER BY b.bin_start
        """,
    }
