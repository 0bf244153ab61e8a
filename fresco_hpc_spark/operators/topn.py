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


def nucleus_top_p(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    p: float = 0.9,
) -> DataFrame:
    """Top-p ("nucleus") category selection per group: the smallest set
    of categories — taken in (count desc, category asc) order — whose
    combined share reaches ``p`` of the group's rows. The coverage-mass
    counterpart of top-N: a mixing pipeline asks "which languages cover
    95% of this source" / "which domains cover 90% of the crawl", where
    a fixed N either over- or under-selects per group.

    Selection rule (the oracle contract): a category is kept while the
    cumulative count BEFORE it is still short of ``p·total`` — so the
    category that crosses the threshold is included and coverage is
    always ≥ p (for p > 0). All mass arithmetic stays in exact BIGINT
    cumulative counts; only the reported shares divide.

    Scale shape: one partial-aggregated groupBy builds the per-(group,
    category) counts; the rank/cumsum window then runs over DISTINCT
    categories per group — bounded by the category domain, not the row
    count (same contract as ``topk_per_group``). The group total is a
    whole-partition window over the SAME partitioning (no totals join
    — which would also silently drop a NULL group, the null-group bug
    class the keyed-join operators guard against; a window partition
    keeps NULL as its own group natively).
    """
    from pyspark.sql import Window

    if not (0.0 < p <= 1.0):
        raise ValueError(f"p must be in (0, 1], got {p}")
    counts = df.groupBy(group_col, cat_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("cnt").desc(), F.col(cat_col).asc()
    )
    ranked = (
        counts.withColumn(
            "_total", F.sum("cnt").over(Window.partitionBy(group_col))
        )
        .withColumn("nucleus_rank", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "_cum",
            F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        ranked.filter(
            (F.col("_cum") - F.col("cnt")).cast("double")
            < F.lit(float(p)) * F.col("_total")
        )
        .select(
            group_col,
            cat_col,
            "cnt",
            "nucleus_rank",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
            F.round(F.col("_cum") / F.col("_total"), 6).alias("cum_share"),
        )
        .orderBy(group_col, "nucleus_rank")
    )
