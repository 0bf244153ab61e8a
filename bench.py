"""Benchmark runner — executes every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a write to the `noop` sink: every output column
is fully computed and materialized with zero sink cost. (A count() would
let Catalyst prune the final projection — e.g. global_percentiles' count
plan drops the percentile aggregates entirely, timing an empty agg.) A
warmup run of the flagship query primes the JVM/codegen so the numbers
reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from fresco_hpc_spark.session import get_spark

    spark = get_spark("fresco-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    # warmup: flagship hourly agg primes JVM/codegen/file-cache
    force(next(iter(qs.values()))(spark, sf_dir))

    # two passes, report the min per query: steady-state execution time,
    # insulated from one-off codegen compilation and GC pauses
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}
    for _ in range(passes):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            elapsed = round(time.perf_counter() - t0, 4)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_query_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
