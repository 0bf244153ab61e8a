"""Join strategies (SURVEY.md §2.3 closing row: the reference has no
fact-to-fact equi-joins — "available for free in Spark if needed". A
complete engine needs them, so they are first-class here, each shaped for
its scale profile.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ small dimension with an explicit broadcast: the dimension
    ships to every executor once, the fact table never shuffles. The
    right shape whenever |dim| fits in executor memory (dimension tables,
    stats frames) — at 100 TB the alternative is shuffling the fact."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def large_equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Big ⋈ big: no hint — Catalyst picks sort-merge (or shuffled-hash)
    and AQE splits skewed partitions at runtime
    (spark.sql.adaptive.skewJoin.enabled, set in session.py). Both sides
    shuffle on the key once; co-locating repeated joins is what bucketed
    tables are for."""
    return left.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS: rows of ``left`` with a match in ``right``; right side
    deduplicates during the join, nothing from it is projected."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT EXISTS: rows of ``left`` without a match in ``right``."""
    return left.join(right, on=on, how="left_anti")
