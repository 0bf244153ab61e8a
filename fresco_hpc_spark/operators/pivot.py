"""Long↔wide reshaping (SURVEY.md §1.1).

The reference stores ETL output in the long/narrow event format
(``Job Id, Host, Event, Value, Units, Timestamp`` —
data-pipeline/.../loaders/parquet_loader.py:176-179) while the analytics
side queries the wide 22-column fact table; the wide table is a pivot of
the narrow one. The unpivot direction appears in the memory transformer
(one input row → two Event rows, hpc_transformers.py:310-330).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_long_to_wide(
    df: DataFrame,
    keys: list[str],
    event_col: str = "Event",
    value_col: str = "Value",
    events: list[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """groupBy(keys).pivot(event).agg(value) with EXPLICIT event values.

    Passing ``events`` matters at scale: without it Spark runs an extra
    distinct job over the whole input just to discover the pivot columns.
    The reference's event vocabulary is small and known (block, cpuuser,
    memused, memused_minus_diskcache, nfs), so declare it.
    """
    aggfn = {"first": F.first, "avg": F.avg, "sum": F.sum, "max": F.max}[agg]
    p = df.groupBy(*keys)
    pivoted = (
        p.pivot(event_col, events) if events is not None else p.pivot(event_col)
    )
    return pivoted.agg(aggfn(value_col))


def unpivot_wide_to_long(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    event_col: str = "Event",
    value_col: str = "Value",
) -> DataFrame:
    """Wide → narrow via ``stack`` (the U1 manual-unpivot generalized:
    hpc_transformers.py:310-330 does this with pl.concat of two selects).
    One narrow projection per input row — no shuffle at all."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stack_expr = f"stack({len(value_cols)}, {pairs}) as (`{event_col}`, `{value_col}`)"
    return df.select(*keys, F.expr(stack_expr))
