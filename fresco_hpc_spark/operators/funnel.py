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


def attribution_linear(
    events: DataFrame,
    conv_type: str = "purchase",
    touch_type: str = "click",
    lookback_hours: int = 24,
    time_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Linear multi-touch attribution: every conversion splits one unit
    of credit EQUALLY across the same user's touches inside the
    lookback window ending at the conversion — the marketing-analytics
    standard between last-touch (operators/joins.py asof_join answers
    that) and data-driven models. Returns per-user totals:
    ``(user_id, conversions, touches, attributed_micro)``.

    Credit arithmetic is exact integers: each touch of an n-touch
    conversion earns ``1_000_000 div n`` micro-credits (remainders are
    DROPPED, deterministically — a conversion contributes at most 1e6,
    short by n-1 micro-units at worst; both engines truncate
    identically on non-negative operands). Conversions with NO touch in
    the window still count in ``conversions`` (left join keeps them)
    and contribute zero credit.

    Scale shape: the window match is the bucketized point-in-interval
    equi-join (operators/joins.py interval_join — never a
    BroadcastNestedLoopJoin); per-conversion touch counts and per-user
    rollups are two partially-aggregated groupBys."""
    from fresco_hpc_spark.operators.joins import interval_join

    if lookback_hours < 1:
        raise ValueError(f"lookback_hours must be >= 1, got {lookback_hours}")
    convs = events.filter(F.col(type_col) == conv_type).select(
        F.col("event_id").alias("conv_id"),
        F.col(user_col).alias("user_id"),
        (
            F.col(time_col) - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
        ).alias("win_start"),
        F.col(time_col).alias("win_end"),
    )
    touches = events.filter(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("user_id"),
        F.col("event_id").alias("touch_id"),
        F.col(time_col).alias("touch_ts"),
    )
    matched = interval_join(
        touches,
        convs,
        time_col="touch_ts",
        start_col="win_start",
        end_col="win_end",
        keys=["user_id"],
        bucket_seconds=int(lookback_hours) * 3600,
    )
    per_conv = matched.groupBy("user_id", "conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches")
    )
    credited = per_conv.select(
        "user_id",
        "conv_id",
        "n_touches",
        F.expr("1000000L div n_touches").alias("credit_micro"),
    )
    all_convs = convs.select("user_id", "conv_id")
    per_user = (
        all_convs.join(credited.drop("user_id"), "conv_id", "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("conversions"),
            F.sum(F.coalesce(F.col("n_touches"), F.lit(0))).cast(
                "bigint"
            ).alias("touches"),
            F.sum(
                F.coalesce(
                    F.col("credit_micro") * F.col("n_touches"),
                    F.lit(0).cast("bigint"),
                )
            ).cast("bigint").alias("attributed_micro"),
        )
    )
    return per_user.orderBy("user_id")
