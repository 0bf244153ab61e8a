"""Histogram operators — both reference variants, faithfully (SURVEY.md
§2.4 A8/A9, §2.3 J3/J4, §7.4 trap 4).

A9 (bin-index, databaseOptimization.ts:222-264): clamps with
``LEAST(bins-1, FLOOR(...))`` so the max value lands in the last bin; emits
every non-empty bin. O(n) — one projection + one small groupBy. This is the
scale path.

A8 (generated-bins range join, DatabaseQueries.ts:292-354): joins rows to a
``generate_series`` bin table on ``col >= bin_start AND col < bin_end``; the
max value matches NO bin (last bin_end == max, predicate is strict <), empty
bins are dropped EXCEPT the last bin which always appears (the
``t.col IS NOT NULL OR bin_index = bins-1`` escape). The two variants are
deliberately NOT unified — their edge semantics differ and each has an
oracle.

Scale note for A8: the reference's plan is ``bins LEFT JOIN fact`` — at
100 TB an outer join that streams the *bin* side is wrong. The rewrite keeps
identical output semantics but inner-joins the fact table against the
broadcast 50-row bin table (map-side nested-loop, no shuffle of the fact),
aggregates, then restores the always-present last bin on the tiny
aggregated side. Bin-edge arithmetic uses the exact same double expressions
as the reference SQL so results are bit-identical to the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROUND = 6


def _stats(df: DataFrame, col: str) -> DataFrame:
    return df.filter(F.col(col).isNotNull()).agg(
        F.min(col).alias("_min_val"), F.max(col).alias("_max_val")
    )


def histogram_bin_index(df: DataFrame, col: str, bins: int = 50) -> DataFrame:
    """A9: equal-width histogram via clamped bin index
    (databaseOptimization.ts:222-264). Returns
    (bin_index, bin_start, bin_end, count, avg_value) for non-empty bins."""
    stats = _stats(df, col).select(
        F.col("_min_val"),
        ((F.col("_max_val") - F.col("_min_val")) / bins).alias("_width"),
    )
    c = F.col(col)
    bin_index = F.when(F.col("_width") == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((c - F.col("_min_val")) / F.nullif(F.col("_width"), F.lit(0))),
        )
    )
    binned = (
        df.filter(c.isNotNull())
        .crossJoin(F.broadcast(stats))
        .withColumn("bin_index", bin_index.cast("bigint"))
    )
    return (
        binned.groupBy("bin_index", "_min_val", "_width")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.round(F.avg(col), _ROUND).alias("avg_value"),
        )
        .select(
            "bin_index",
            (F.col("_min_val") + F.col("bin_index") * F.col("_width")).alias("bin_start"),
            (F.col("_min_val") + (F.col("bin_index") + 1) * F.col("_width")).alias("bin_end"),
            "count",
            "avg_value",
        )
        .orderBy("bin_index")
    )


def histogram_range_join(df: DataFrame, col: str, bins: int = 50) -> DataFrame:
    """A8: generated-bin histogram with the reference's exact edge semantics
    (DatabaseQueries.ts:292-354). Returns (bin_start, bin_end, count)."""
    spark = df.sparkSession
    # bins table: same arithmetic shape as the reference SQL —
    # min + (max-min) * i / bins — so double rounding matches the oracle.
    bin_table = (
        spark.range(bins)
        .withColumnRenamed("id", "bin_index")
        .crossJoin(F.broadcast(_stats(df, col)))
        .select(
            "bin_index",
            (
                F.col("_min_val")
                + (F.col("_max_val") - F.col("_min_val")) * F.col("bin_index") / bins
            ).alias("bin_start"),
            (
                F.col("_min_val")
                + (F.col("_max_val") - F.col("_min_val")) * (F.col("bin_index") + 1) / bins
            ).alias("bin_end"),
        )
    )
    c = F.col(col)
    matched = (
        df.filter(c.isNotNull())
        .join(
            F.broadcast(bin_table),
            (c >= F.col("bin_start")) & (c < F.col("bin_end")),
            "inner",
        )
        .groupBy("bin_index", "bin_start", "bin_end")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    # Restore the always-present last bin (count 0 when unmatched) on the
    # tiny aggregated side — semantics of the reference's LEFT JOIN + WHERE.
    last_bin = (
        bin_table.filter(F.col("bin_index") == bins - 1)
        .join(matched.select("bin_index"), "bin_index", "left_anti")
        .withColumn("count", F.lit(0).cast("bigint"))
    )
    return (
        matched.unionByName(last_bin)
        .select("bin_start", "bin_end", "count")
        .orderBy("bin_start")
    )


def histogram2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_bins: int = 10,
    y_bins: int = 10,
) -> DataFrame:
    """2-D equal-width histogram (heatmap bins): the A9 clamped-index
    scheme applied per axis, counts per (x_bin, y_bin) cell. Same scale
    shape as the 1-D variant — one stats pass (min/max per axis,
    broadcast 1-row frame), one projection, one small groupBy whose
    cardinality is x_bins × y_bins regardless of input size."""
    stats = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).agg(
        F.min(x_col).alias("_xmin"),
        ((F.max(x_col) - F.min(x_col)) / x_bins).alias("_xw"),
        F.min(y_col).alias("_ymin"),
        ((F.max(y_col) - F.min(y_col)) / y_bins).alias("_yw"),
    )

    def idx(c, mn, w, nb):
        return F.when(F.col(w) == 0, F.lit(0)).otherwise(
            F.least(
                F.lit(nb - 1),
                F.floor((F.col(c) - F.col(mn)) / F.nullif(F.col(w), F.lit(0))),
            )
        )

    return (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            idx(x_col, "_xmin", "_xw", x_bins).cast("bigint").alias("x_bin"),
            idx(y_col, "_ymin", "_yw", y_bins).cast("bigint").alias("y_bin"),
        )
        .groupBy("x_bin", "y_bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("x_bin", "y_bin")
    )


def equi_depth_histogram(df: DataFrame, col: str, bins: int = 10) -> DataFrame:
    """EQUI-DEPTH histogram — the frequency-balanced complement of the
    two equal-WIDTH histograms above (A8/A9), and the shape optimizer
    statistics and quantile visualizations actually want: bin edges at
    the i/bins percentiles, so every bin holds ~n/bins rows regardless
    of the value distribution (an equal-width histogram of a
    heavy-tailed column puts 99% of rows in one bar).

    Built entirely on the distributed order-statistics machinery:
    bounds come from ``distributed_exact_percentiles`` (no single-node
    value buffer), rows are labeled by the same map-side rounded-bound
    ``when()`` chain as :func:`~fresco_hpc_spark.operators.percentiles.
    quantile_bucket` (bounds rounded HALF_UP at 6 dp, so an oracle
    recomputing them with its own PERCENTILE_CONT lands on identical
    literals; equal values always share a bin), then ONE
    partial-aggregated groupBy emits per-bin count/min/max. Ties at a
    bound can make bins uneven — that is the standard equi-depth
    semantics, not an error. NULLs are excluded.

    Scale shape: two bounded bounds jobs at build time + a map-side
    projection + one groupBy(bin) with ``bins`` groups. No sort of the
    data, no window, nothing proportional to n on any single task.
    """
    from fresco_hpc_spark.operators.percentiles import quantile_bucket

    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    nonnull = df.filter(F.col(col).isNotNull())
    if bins == 1:
        # degenerate single bin: no bounds to compute (an empty
        # fraction list would crash the percentile machinery — r7
        # review); one bin holds every non-null row
        labeled = nonnull.withColumn("bin", F.lit(1).cast("bigint"))
    else:
        fractions = [i / bins for i in range(1, bins)]
        labeled = quantile_bucket(nonnull, col, fractions, label_col="bin")
    return (
        labeled.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min(col), 6).alias("min_value"),
            F.round(F.max(col), 6).alias("max_value"),
        )
        .orderBy("bin")
    )
