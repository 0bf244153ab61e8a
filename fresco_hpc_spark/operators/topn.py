"""Categorical frequency / Top-N + "Others" rollup (SURVEY.md §2.4 A6/A7,
§2.5 W1, §2.6 O2).

The reference ranks categories by count with a global ROW_NUMBER window and
folds rank > N into an 'Others' bucket sorted last
(DatabaseQueries.ts:242-287, 359-404; vgplot.tsx:554-603).

Scale note: the window runs over the *aggregated* category counts (one row
per category), never the fact table — so the global ROW_NUMBER sort touches
thousands of rows, not billions. A deterministic tie-breaker (category value)
is added in both engine and oracle (SURVEY.md §7.4 trap 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OTHERS_LABEL = "Others"


def category_counts(df: DataFrame, col: str) -> DataFrame:
    """A6: ``GROUP BY col -> COUNT(*) ORDER BY count DESC``
    (DatabaseQueries.ts:252-259). Tie-broken by category for determinism."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("category"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("category"))
    )


def topn_others(df: DataFrame, col: str, n: int = 10) -> DataFrame:
    """A7: top-N categories by count, remainder rolled into 'Others'
    (sorted last), counts summed (DatabaseQueries.ts:242-287).

    Two-phase: (1) distributed count per category (map-side combine), then
    (2) rank + fold on the small aggregated frame.
    """
    counts = category_counts(df, col)
    w = Window.orderBy(F.desc("count"), F.asc("category"))
    ranked = counts.withColumn("rank", F.row_number().over(w))
    # Explicit string cast: under ANSI mode (Spark 4 default) resolving
    # when(..., <bigint>).otherwise('Others') would cast 'Others' to BIGINT
    # and fail at runtime; the oracle likewise CASTs to VARCHAR.
    folded = (
        ranked.withColumn(
            "category",
            F.when(F.col("rank") <= n, F.col("category").cast("string")).otherwise(
                F.lit(OTHERS_LABEL)
            ),
        )
        .groupBy("category")
        .agg(F.sum("count").alias("count"))
    )
    return folded.orderBy(
        F.when(F.col("category") == OTHERS_LABEL, F.lit(1)).otherwise(F.lit(0)),
        F.desc("count"),
        F.asc("category"),
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-group top-k by count (absent in the reference, whose W1 ranking
    is global-only): count per (group, key), then row_number partitioned by
    group. The window input is the pre-aggregated count relation — one
    shuffle for the agg, one for the (tiny) per-group rank — never a sort
    of raw rows. Ties break on key for determinism, like topn_others."""
    counts = (
        df.filter(F.col(group_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("count"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("count"), F.asc("key"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("grp", "rank")
    )
