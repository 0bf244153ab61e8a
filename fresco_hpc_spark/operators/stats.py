"""Column statistics / availability probes (SURVEY.md §2.4 A1, A11, A12;
§2.2 P4).

These are the per-chart preflight queries the reference issues before
rendering (DatabaseQueries.ts:68-114, vgplot.tsx:184-219). Each is a single
hash-aggregate with map-side partial aggregation; at scale they read only
the probed column (parquet column pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, col: str) -> DataFrame:
    """A1: ``MIN, MAX, COUNT(*), null-count`` of one column
    (DatabaseQueries.ts:68-88)."""
    return df.agg(
        F.min(col).alias("min_value"),
        F.max(col).alias("max_value"),
        F.count(F.lit(1)).alias("total_count"),
        F.count(F.when(F.col(col).isNull(), 1)).alias("null_count"),
    )


def availability(df: DataFrame, col: str, time_col: str = "time") -> DataFrame:
    """P4: count of usable rows — non-null, non-zero metric with a non-null
    time (DatabaseQueries.ts:93-114, vgplot.tsx:202-219)."""
    usable = (
        F.col(col).isNotNull() & (F.col(col) != 0) & F.col(time_col).isNotNull()
    )
    return df.filter(usable).agg(F.count(F.lit(1)).alias("available_count"))


def time_extent(df: DataFrame, time_col: str = "time", with_count: bool = False) -> DataFrame:
    """A11: min/max of the time column for plot domains
    (histogram.tsx:65-72, query_builder.tsx:333-337)."""
    aggs = [
        F.min(time_col).alias("min_time"),
        F.max(time_col).alias("max_time"),
    ]
    if with_count:
        aggs.append(F.count(F.lit(1)).alias("row_count"))
    return df.agg(*aggs)


def not_null(df: DataFrame, *cols: str) -> DataFrame:
    """P3: the null-guard predicate prefixed to nearly every reference view
    (DatabaseQueries.ts:81 etc.)."""
    pred: Column = F.lit(True)
    for c in cols:
        pred = pred & F.col(c).isNotNull()
    return df.filter(pred)


def linear_trend(
    df: DataFrame,
    key_col: str,
    x: Column,
    y_col: str,
) -> DataFrame:
    """Per-key least-squares trend line — slope/intercept/r² via the
    built-in regression aggregates (``regr_slope`` etc., map-side
    combinable sufficient statistics: one groupBy, no second pass).
    The chart layer's trend overlay; ``x`` is any numeric expression
    (e.g. hours since a fixed origin keeps slopes in a readable range).
    """
    return (
        df.filter(F.col(y_col).isNotNull())
        .select(F.col(key_col), x.alias("_x"), F.col(y_col).alias("_y"))
        .groupBy(key_col)
        .agg(
            F.round(F.regr_slope("_y", "_x"), 6).alias("slope"),
            F.round(F.regr_intercept("_y", "_x"), 6).alias("intercept"),
            F.round(F.regr_r2("_y", "_x"), 6).alias("r2"),
            F.regr_count("_y", "_x").alias("n_points"),
        )
        .orderBy(key_col)
    )
