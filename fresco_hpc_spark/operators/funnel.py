"""Event-sequence analytics: ordered funnels and cohort retention.

Not present in the reference (its events are telemetry samples, not
user journeys) but first-class for any events table of this shape —
the SURVEY §2 closing-row convention: absent-in-reference operators a
complete engine must still provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: how many keys performed step[0], then step[1]
    STRICTLY AFTER their first step[0], and so on. One row out:
    ``(step, step_name, n_keys)`` per stage.

    Plan shape: stage i is the per-key MIN timestamp of events of
    type steps[i] that fall after the key's stage-(i-1) timestamp — a
    filter + groupBy per stage joined on the key. Every join is on the
    high-cardinality key (no skew hot spot); each stage's relation only
    shrinks, so later joins are broadcast-able at any corpus size.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached: DataFrame | None = None
    out_rows = []
    for i, step in enumerate(steps):
        stage = df.filter(F.col(type_col) == step).select(
            F.col(key_col), F.col(time_col).alias("_t")
        )
        if reached is not None:
            stage = (
                stage.join(reached, key_col)
                .filter(F.col("_t") > F.col("_prev"))
                .select(key_col, "_t")
            )
        reached = (
            stage.groupBy(key_col).agg(F.min("_t").alias("_prev"))
        )
        out_rows.append(
            reached.agg(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.lit(step).alias("step_name"),
                F.count(F.lit(1)).alias("n_keys"),
            )
        )
    result = out_rows[0]
    for r in out_rows[1:]:
        result = result.unionByName(r)
    return result.orderBy("step")


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Cohort retention triangle: keys grouped by their FIRST-seen
    bucket (the cohort); for each later bucket, how many of that cohort
    were active again. ``(cohort, offset, n_active)`` with offset in
    buckets since the cohort's start.

    Two shuffles total: the first-seen min per key, then one distinct
    count over (cohort, offset). Both key on high-cardinality columns;
    the output is a triangle bounded by (buckets)² — tiny at any scale.
    """
    units = {"day": 86400, "hour": 3600}
    if bucket not in units:
        raise ValueError(
            f"cohort_retention supports bucket in {sorted(units)}, got {bucket!r} "
            "(calendar-varying units like week/month have no fixed seconds "
            "divisor for the offset arithmetic)"
        )
    unit = units[bucket]
    b = F.date_trunc(bucket, F.col(time_col))
    seen = df.filter(F.col(time_col).isNotNull()).select(
        F.col(key_col), b.alias("_b")
    )
    first = seen.groupBy(key_col).agg(F.min("_b").alias("_cohort"))
    offset = (
        (F.col("_b").cast("long") - F.col("_cohort").cast("long")) / unit
    ).cast("bigint")
    return (
        seen.join(first, key_col)
        .select(F.col("_cohort").alias("cohort"), offset.alias("offset"), key_col)
        .distinct()
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort", "offset")
    )
