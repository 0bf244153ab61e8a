"""Percentile / robust-statistics operators (SURVEY.md §2.3 J1-J2, §2.4
A3/A5).

The reference trims outliers by cross-joining each row against a 1-row
percentile (or IQR) relation and keeping rows inside the bounds
(DatabaseQueries.ts:158-190; databaseOptimization.ts:199-218). The Spark
restatement keeps the same shape — a 1-row bounds DataFrame broadcast into
a cross join — so nothing is collected to the driver and the operator
composes lazily at any scale. Exact interpolating ``percentile`` matches
DuckDB's PERCENTILE_CONT (SURVEY.md §7.4 trap 1).

Scale note: computing exact percentiles over 100 TB is a single-reducer
sort per column in theory, but Spark's ``percentile`` aggregate buffers
per-partition and merges — acceptable for the bounded-window queries this
serves; ``percentile_approx`` is offered as the knob when exactness is not
required by an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fresco_hpc_spark.operators.timeseries import hourly_agg

_ROUND = 6


def _percentiles_expr(col: str, fractions: list[float]):
    """ONE ``percentile(col, array(f...))`` call: all fractions share a
    single aggregation buffer (per-partition value map + one sort) instead
    of paying the buffer per fraction — measured ~3x on 600k rows. Exact
    interpolation is kept for PERCENTILE_CONT oracle parity (SURVEY.md
    §7.4 trap 1); at true 100 TB single-group scale, swap for
    ``approx_percentile`` where the oracle contract allows."""
    arr = ",".join(repr(f) for f in fractions)
    return F.expr(f"percentile(`{col}`, array({arr}))")


def global_percentiles(df: DataFrame, col: str, fractions: list[float]) -> DataFrame:
    """A5: scalar ``PERCENTILE_CONT(f) WITHIN GROUP (ORDER BY col)`` for
    each fraction, as one 1-row DataFrame (DatabaseQueries.ts:160-165)."""
    pcts = _percentiles_expr(col, fractions)
    labels = [f"p{str(f).replace('0.', '').ljust(2, '0')}" for f in fractions]
    return (
        df.filter(F.col(col).isNotNull())
        .agg(pcts.alias("_pcts"))
        .select(
            *[
                F.round(F.col("_pcts").getItem(i), _ROUND).alias(lbl)
                for i, lbl in enumerate(labels)
            ]
        )
    )


def percentile_trim(
    df: DataFrame, col: str, low: float = 0.01, high: float = 0.99
) -> DataFrame:
    """J1: keep rows with ``col BETWEEN p_low AND p_high`` where the bounds
    are percentiles of the same relation (DatabaseQueries.ts:158-190).

    The 1-row bounds frame is broadcast — a map-side filter, no shuffle of
    the fact table.
    """
    bounds = (
        df.filter(F.col(col).isNotNull())
        .agg(_percentiles_expr(col, [low, high]).alias("_pcts"))
        .select(
            F.col("_pcts").getItem(0).alias("_p_low"),
            F.col("_pcts").getItem(1).alias("_p_high"),
        )
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter(F.col(col).between(F.col("_p_low"), F.col("_p_high")))
        .drop("_p_low", "_p_high")
    )


def iqr_trim(df: DataFrame, col: str, k: float = 1.5) -> DataFrame:
    """J2: keep rows within ``[q25 - k*IQR, q75 + k*IQR]``
    (databaseOptimization.ts:199-218)."""
    bounds = (
        df.filter(F.col(col).isNotNull())
        .agg(_percentiles_expr(col, [0.25, 0.75]).alias("_pcts"))
        .select(
            F.col("_pcts").getItem(0).alias("_q25"),
            F.col("_pcts").getItem(1).alias("_q75"),
        )
        .select(
            (F.col("_q25") - (F.col("_q75") - F.col("_q25")) * k).alias("_lower"),
            (F.col("_q75") + (F.col("_q75") - F.col("_q25")) * k).alias("_upper"),
        )
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter(F.col(col).between(F.col("_lower"), F.col("_upper")))
        .drop("_lower", "_upper")
    )


def percentile_trimmed_hourly_agg(
    df: DataFrame,
    value_col: str,
    time_col: str = "time",
    low: float = 0.01,
    high: float = 0.99,
) -> DataFrame:
    """A3: the robust line-plot view — J1 trim composed with the A2 hourly
    aggregation (DatabaseQueries.ts:148-190, vgplot.tsx:245-283)."""
    trimmed = percentile_trim(
        df.filter(F.col(time_col).isNotNull() & F.col(value_col).isNotNull()),
        value_col,
        low,
        high,
    )
    return hourly_agg(trimmed, value_col, time_col)
