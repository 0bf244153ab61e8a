"""Projection operators: casts, scaling, zero-fill healing (SURVEY.md §2.2
P6/P7/P8).

These are pure narrow transformations — no shuffle, fully pipelined inside
whole-stage codegen, and column pruning still reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE_FACTOR = 1_000_000  # reference: tiny-value ×1e6 scaling (ChartUtils.ts:42-46)


def cast_double_view(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """P6: ``CAST(col AS DOUBLE) AS col_double`` for BIGINT histogram
    sources (DatabaseQueries.ts:195-213)."""
    out = out_col or f"{col}_double"
    return df.filter(F.col(col).isNotNull()).select(F.col(col).cast("double").alias(out))


def scaled_view(df: DataFrame, col: str, factor: float = SCALE_FACTOR, out_col: str | None = None) -> DataFrame:
    """P7: ``col * 1e6 AS col_scaled`` for tiny metric values
    (DatabaseQueries.ts:218-237; trigger logic ChartUtils.ts:42-46)."""
    out = out_col or f"{col}_scaled"
    return df.filter(F.col(col).isNotNull()).select((F.col(col) * factor).alias(out))


def should_scale(min_val: float | None, max_val: float | None) -> bool:
    """ChartUtils.ts:42-46: scale when both bounds are tiny (<0.01)."""
    if min_val is None or max_val is None:
        return False
    return abs(min_val) < 0.01 and abs(max_val) < 0.01


def zero_fill_missing(df: DataFrame, expected_cols: list[str], fill: float = 0.0) -> DataFrame:
    """P8: schema healing — add missing expected metric columns as a
    constant (``SELECT *, 0 as value_gpu ...``, useDataLoader.ts:104-142)."""
    out = df
    for c in expected_cols:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(fill).cast("double"))
    return out
