"""Change-data-capture shapes: slowly-changing-dimension (SCD type-2)
history construction.

Beyond the reference surface (SURVEY.md §2.3's closing row: fact-level
join/merge machinery is "available for free in Spark" — a complete
engine should ship it): a pipeline that snapshots mutable entities
(user state, document metadata, device attributes) needs the
event-stream → validity-interval transform. ``scd2_history`` builds the
classic type-2 dimension — one row per (key, attribute-state) episode
with ``valid_from``/``valid_to``/``is_current`` — from an append-only
change log, entirely with windowed lag/lead (no self-join, no MERGE
loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 history from a change log: per key, consecutive rows whose
    tracked attributes are unchanged COLLAPSE into one episode; each
    episode carries ``valid_from`` (its first timestamp), ``valid_to``
    (the next episode's start, NULL while current), ``is_current``, and
    a per-key ``version`` number.

    Semantics: rows are ordered by (``ts_col``, ``tie_cols``) within
    each key — pass a unique tie-breaker (an event id) when timestamps
    can collide, otherwise episode boundaries on tied timestamps are
    engine-defined. Attribute comparison is NULL-SAFE (NULL → NULL is
    "unchanged"; NULL → value is a change), matching SQL's
    IS DISTINCT FROM — the same null-group discipline as the library's
    keyed joins. The first row per key always opens an episode.

    Scale shape: ONE hash shuffle on the key columns serves the whole
    operator — the change-detection lag, the episode lead, and the
    version row_number all share the identical (partition, order)
    spec, and the intermediate filter preserves the partitioning, so
    Catalyst plans a single Exchange and a single Sort (plan-pinned in
    test_plan_quality). Per-task memory is bounded by the per-key
    change-log length — the same contract as the ETL lag-diff family
    (W2/W3); a key's history never crosses executors.
    """
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    tie_cols = tie_cols or []
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tie_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.lag(F.col(ts_col)).over(w).isNull()
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))

    episodes = df.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        *[F.col(c) for c in tie_cols],
        changed.alias("_chg"),
    ).filter(F.col("_chg"))

    w2 = Window.partitionBy(*key_cols).orderBy(
        F.col("valid_from").asc(), *[F.col(c).asc() for c in tie_cols]
    )
    return (
        episodes.select(
            *key_cols,
            *attr_cols,
            "valid_from",
            F.lead(F.col("valid_from")).over(w2).alias("valid_to"),
            F.row_number().over(w2).cast("bigint").alias("version"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy(*key_cols, "version")
    )
