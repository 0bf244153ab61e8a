"""EWMA scale measurement (VERDICT r4 item 3).

Two implementations of the same recurrence:

* ``ewma`` — JVM higher-order fold; per-element ``concat`` copies the
  accumulator array, so it is O(n²) per key (ADVICE r4);
* ``ewma_scan`` — Arrow-batched per-key scan, O(n), bit-identical
  output (test_operators pins the equivalence).

This harness times both at growing rows-per-key so the crossover and
the scan's linearity are measured, not asserted. The fold is only run
at sizes where its quadratic cost stays civil.

Usage: python tools/stress_ewma.py
Prints one JSON line per config and a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def series(spark, n_rows: int, n_keys: int):
    """n_rows synthetic points spread over n_keys keys, shuffled order."""
    return (
        spark.range(n_rows)
        .select(
            (F.col("id") % n_keys).alias("k"),
            (F.lit(1_700_000_000) + (F.col("id") / n_keys).cast("long")).alias("t"),
            ((F.xxhash64("id") % 10_000 + 10_000) % 10_000 / 100.0).alias("v"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )


def main() -> None:
    from fresco_hpc_spark.operators import ewma, ewma_scan
    from fresco_hpc_spark.session import get_spark

    spark = get_spark("stress-ewma")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn, df):
        t0 = time.perf_counter()
        fn(df, "k", "v", time_col="t").write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 2)

    out = []
    # fold: quadratic — rows/key is the axis that hurts
    for n, keys in ((10_000, 1), (30_000, 1), (30_000, 30)):
        df = series(spark, n, keys)
        out.append(
            {"impl": "fold", "rows": n, "keys": keys,
             "rows_per_key": n // keys, "sec": run(ewma, df)}
        )
        print(json.dumps(out[-1]), flush=True)
    # scan: linear — includes the 1e6-rows-per-single-key target and a
    # 4e6-row multi-key config (32 tasks in flight)
    for n, keys in ((1_000_000, 1), (2_000_000, 1), (4_000_000, 32)):
        df = series(spark, n, keys)
        out.append(
            {"impl": "scan", "rows": n, "keys": keys,
             "rows_per_key": n // keys, "sec": run(ewma_scan, df)}
        )
        print(json.dumps(out[-1]), flush=True)
    scans = [o for o in out if o["impl"] == "scan" and o["keys"] == 1]
    print(
        json.dumps(
            {
                "summary": True,
                "scan_2x_rows_time_ratio": round(
                    scans[1]["sec"] / scans[0]["sec"], 2
                ),
                "note": "ratio ~2 = linear; fold at 3e4 rows/key vs 1e4 shows the quadratic blowup",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
