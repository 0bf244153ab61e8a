"""TTL result cache (SURVEY.md §4; reference databaseOptimization.ts:14-97)."""

from __future__ import annotations

from fresco_hpc_spark.plans import QueryCache
from fresco_hpc_spark.sources import table
from tests.conftest import SF_SMALL


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_hit_miss_and_ttl_eviction(spark):
    clock = FakeClock()
    cache = QueryCache(ttl_seconds=300, clock=clock)
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return table(spark, SF_SMALL, "events").groupBy("event_type").count()

    k = QueryCache.key("category_counts", col="event_type", sf=SF_SMALL)
    df1 = cache.get_or_compute(k, compute)
    df2 = cache.get_or_compute(k, compute)
    assert df1 is df2 and calls["n"] == 1
    assert (cache.hits, cache.misses) == (1, 1)

    clock.t = 301.0  # past TTL → recompute
    df3 = cache.get_or_compute(k, compute)
    assert calls["n"] == 2 and df3 is not df1
    assert len(cache) == 1
    cache.clear()
    assert len(cache) == 0


def test_key_is_param_order_insensitive():
    assert QueryCache.key("q", a=1, b=2) == QueryCache.key("q", b=2, a=1)
    assert QueryCache.key("q", a=1) != QueryCache.key("q", a=2)
