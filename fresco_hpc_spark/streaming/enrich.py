"""Stream-static enrichment — the remaining Structured Streaming join
surface next to the stateful family: a streaming fact joined against a
static dimension.

Semantics worth pinning (and the reason this thin wrapper exists as a
named, tested operator): Structured Streaming re-evaluates the STATIC
side on every micro-batch — a dimension read from parquet is re-read,
so slowly-changing dims are picked up between batches without restarts
(eventual, not transactional); the broadcast hint keeps the per-batch
join map-side (no shuffle of the stream), which is the only sane shape
when the fact side is unbounded. Left join preserves unmatched stream
rows with NULL dim columns — facts never drop because a dimension row
is late. A drained enriched stream equals the batch join exactly
(pinned in test_streaming)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Join a streaming DataFrame against a static dimension with a
    broadcast hint. ``how`` is restricted to the stream-static-safe
    left/inner (right/full would need the unbounded side on the
    preserved side of a static relation — unsupported by SS)."""
    if how not in ("left", "inner"):
        raise ValueError(
            f"stream-static join supports left/inner, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    return stream_df.join(F.broadcast(dim_df), keys, how)
