"""sf1-equivalent stress + skew probe for the events window family
(VERDICT r02 items 6-7): asof_join, session_stats, interval_join,
gap_fill.

Part 1 — growth: blow events up 10x (sf0.1 -> ~sf1 row counts) with
MUTUALLY DISTINCT copies (shifted user ids so per-key series lengths —
and thus window state — stay constant while rows scale), write both
corpora to parquet, time each operator at 1x vs 10x in one session.
A healthy window plan grows ~linearly; the session prints the growth
factor per operator plus cumulative spill.

Part 2 — skew: a deliberately hot-keyed corpus (ONE user owns ~50% of
all events) through the same operators, reporting the straggler ratio
(max task time / median task time of the heaviest stage). These are
per-key window plans: a single key's rows MUST land in one task, so the
mitigation is not salting (ordering would break) but the composite-key
split documented in SCALE.md — e.g. sessionize by (user, day) when keys
are unbounded, which the day-bucketed variant here demonstrates.

Usage: python tools/stress_events.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from fresco_hpc_spark.operators import (
        asof_join,
        gap_fill,
        interval_join,
        session_stats,
    )
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import table

    spark = get_spark("events-stress")
    spark.sparkContext.setLogLevel("ERROR")
    ui, app = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId

    def spill_bytes() -> int:
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
            ) as r:
                stages = json.load(r)
            return sum(
                int(s.get("memoryBytesSpilled", 0)) + int(s.get("diskBytesSpilled", 0))
                for s in stages
            )
        except Exception:
            return -1

    def straggler_ratio() -> float:
        """max/median task duration of the longest completed stage —
        the skew signal (a uniform stage sits near 1-2x)."""
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete&details=true&taskStatus=SUCCESS",
                timeout=20,
            ) as r:
                stages = json.load(r)
            worst = max(
                stages,
                key=lambda s: int(s.get("executorRunTime", 0)),
                default=None,
            )
            if not worst:
                return -1.0
            durs = sorted(
                t.get("duration", 0) for t in (worst.get("tasks") or {}).values()
            )
            if not durs:
                return -1.0
            med = durs[len(durs) // 2] or 1
            return round(durs[-1] / med, 1)
        except Exception:
            return -1.0

    ev = table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="events-stress-")

    # 10x: copies shift user_id AND time (by i days) so each copy adds new
    # keys with the SAME per-key series length — row count scales 10x,
    # per-window state does not (the scale model of "more users, more
    # hosts", which is how telemetry actually grows).
    parts = [ev]
    for i in range(1, 10):
        parts.append(
            ev.select(
                (F.col("event_id") + i * 100_000_000).alias("event_id"),
                (F.col("ts") + F.make_interval(days=F.lit(i))).alias("ts"),
                (F.col("user_id") + i * 10_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    ev10 = parts[0]
    for p in parts[1:]:
        ev10 = ev10.unionByName(p)

    paths = {}
    for name, df in [("ev1", ev), ("ev10", ev10)]:
        p = os.path.join(tmp, name)
        df.write.mode("overwrite").parquet(p)
        paths[name] = p

    def rd(p):
        return spark.read.parquet(p)

    def bench(name, fn):
        best, n = None, 0
        for _ in range(2):  # min of 2: steady-state, not codegen warmup
            t0 = time.perf_counter()
            n = fn().count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        best = round(best, 2)
        print(f"{name:28s} {best:7.2f}s  rows={n}")
        return best

    def suite(d):
        purchases = d.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = d.filter(F.col("event_type") == "click").select("user_id", "ts")
        # intervals: per-user sessions from the same data = realistic
        # fact-to-fact point-in-interval load
        iv = session_stats(d, "user_id", ts_col="ts", value_col="value",
                           gap_seconds=1800).select(
            "user_id", "session_start", "session_end"
        )
        r = {}
        r["asof_join"] = bench(
            "asof_join", lambda: asof_join(
                purchases, clicks, on="user_id", left_ts="ts", right_cols=[]
            )
        )
        r["session_stats"] = bench(
            "session_stats", lambda: session_stats(
                d, "user_id", ts_col="ts", value_col="value", gap_seconds=1800
            )
        )
        r["interval_join"] = bench(
            "interval_join", lambda: interval_join(
                purchases, iv, "ts", "session_start", "session_end",
                keys=["user_id"],
            )
        )
        r["gap_fill"] = bench(
            "gap_fill", lambda: gap_fill(
                d.filter(F.col("event_type") == "click"),
                "user_id", time_col="ts", value_col="value",
            )
        )
        return r

    results = {}
    # warmup: run the whole suite once untimed so the 1x pass doesn't
    # absorb JVM/codegen compilation (first run of this script measured
    # 10x FASTER than 1x for that reason)
    print("--- warmup")
    suite(rd(paths["ev1"]))
    for scale, key in [("1x", "ev1"), ("10x", "ev10")]:
        d = rd(paths[key])
        print(f"--- {scale}: events={d.count()}")
        results[scale] = suite(d)
    print("--- growth (10x data)")
    for k in results["1x"]:
        a, b = results["1x"][k], results["10x"][k]
        print(f"{k:24s} {a:6.2f}s -> {b:7.2f}s   {b / max(a, 0.01):5.1f}x")
    print("cumulative spill bytes:", spill_bytes())

    # ---- Part 2: hot key. One user owns ~50% of events.
    hot = ev.withColumn(
        "user_id",
        F.when(F.pmod(F.col("event_id"), F.lit(2)) == 0, F.lit(1)).otherwise(
            F.col("user_id")
        ),
    )
    hp = os.path.join(tmp, "hot")
    hot.write.mode("overwrite").parquet(hp)
    d = rd(hp)
    print(f"--- skew: one user holds {d.filter('user_id = 1').count()} of {d.count()} rows")
    skew = suite(d)
    print("straggler ratio (max/median task, heaviest stage):", straggler_ratio())

    # composite-key mitigation demo: sessionize by (user, day) — legal
    # whenever sessions cannot span day boundaries (or a session-stitching
    # pass merges the seam) — splits the hot key across 30 tasks
    t0 = time.perf_counter()
    n = session_stats(
        d.withColumn("user_day", F.concat_ws("|", "user_id", F.to_date("ts"))),
        "user_day", ts_col="ts", value_col="value", gap_seconds=1800,
    ).count()
    dt = round(time.perf_counter() - t0, 2)
    print(f"{'session_stats(user,day)':28s} {dt:7.2f}s  rows={n}  (vs {skew['session_stats']:.2f}s hot-keyed)")
    spark.stop()


if __name__ == "__main__":
    main()
