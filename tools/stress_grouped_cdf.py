"""Grouped-CDF scale exhibit (round 7): measure the r6 verdict's top
finding directly — a per-group ``cume_dist`` window puts EACH GROUP on
one task (with G groups, every window partition holds ~n/G rows), while
``grouped_value_cdf`` computes the identical decile relation through
range-partitioned distributed order statistics whose per-task work is
bounded by a range partition, never a group.

Both implementations run over the same synthetic relation (n rows,
G groups, md5-derived uniform doubles — fully deterministic) and their
outputs are asserted EQUAL before timing is reported. Per run we record
wall-clock, the max-task share of the heaviest stage (the straggler
signature of a group-per-task sort), and cumulative spill.

Usage: GCDF_GROUPS=G python tools/stress_grouped_cdf.py [rows...]
(default 2e6 2e7; G default 5). The window path's PARALLELISM is bounded
by G — the collapse the grouped path removes shows at small G (the
events table has ~5 event types; a 2-group sweep makes it stark locally).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_GROUPS = int(os.environ.get("GCDF_GROUPS", "5"))
PROBES = [round(0.1 * i, 1) for i in range(1, 11)]


def _stages(ui: str, app: str) -> list[dict]:
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            return json.load(r)
    except Exception:
        return []


def _spill(stages: list[dict]) -> int:
    return sum(
        int(s.get("memoryBytesSpilled", 0)) + int(s.get("diskBytesSpilled", 0))
        for s in stages
    )


def _max_task_ratio(ui: str, app: str, new_stages: list[dict]) -> float:
    """max/median task duration of the heaviest new stage."""
    try:
        if not new_stages:
            return -1.0
        heaviest = max(new_stages, key=lambda s: int(s.get("executorRunTime", 0)))
        sid, att = heaviest["stageId"], heaviest["attemptId"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/taskList?length=2000",
            timeout=10,
        ) as r:
            tasks = json.load(r)
        durs = sorted(int(t.get("duration", 0)) for t in tasks if t.get("duration"))
        if not durs:
            return -1.0
        return round(durs[-1] / max(durs[len(durs) // 2], 1), 2)
    except Exception:
        return -1.0


def window_cdf(df):
    """The RETIRED shape: per-group cume_dist window (one task/group)."""
    w = Window.partitionBy("g").orderBy("v")
    return (
        df.select("g", "v", F.round(F.cume_dist().over(w), 6).alias("cdf"))
        .filter(F.col("cdf").isin(PROBES))
        .groupBy("g", "cdf")
        .agg(F.round(F.max("v"), 6).alias("value_at"))
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [2_000_000, 20_000_000]

    from fresco_hpc_spark.operators import grouped_value_cdf
    from fresco_hpc_spark.session import get_spark

    spark = get_spark("grouped-cdf-stress")
    spark.sparkContext.setLogLevel("ERROR")
    ui, app = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId

    out: dict[str, dict] = {}
    for n in sizes:
        df = (
            spark.range(n)
            .select(
                F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(N_GROUPS)))
                .alias("g"),
                (
                    F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
                    .cast("double")
                    / F.lit(float(2**60))
                ).alias("v"),
            )
            .repartition(32)
        )
        df.write.mode("overwrite").parquet(f"/tmp/gcdf_{n}")
        src = spark.read.parquet(f"/tmp/gcdf_{n}")

        results = {}
        for label, fn in (
            ("window", window_cdf),
            ("grouped", lambda d: grouped_value_cdf(d, ["g"], "v")),
        ):
            before = _stages(ui, app)
            seen = {(s["stageId"], s["attemptId"]) for s in before}
            t0 = time.perf_counter()
            rows = sorted(tuple(r) for r in fn(src).collect())
            sec = round(time.perf_counter() - t0, 2)
            after = _stages(ui, app)
            new = [s for s in after if (s["stageId"], s["attemptId"]) not in seen]
            results[label] = {
                "sec": sec,
                "spill_mb": round(max(0, _spill(after) - _spill(before)) / 1e6, 1),
                "straggler_ratio": _max_task_ratio(ui, app, new),
                "rows": rows,
            }
        assert results["window"]["rows"] == results["grouped"]["rows"], (
            "implementations disagree"
        )
        out[f"n{n}"] = {
            k: {m: v for m, v in r.items() if m != "rows"}
            for k, r in results.items()
        }
        print(json.dumps({f"n{n}": out[f"n{n}"]}), flush=True)
    print(json.dumps({"summary": True, "groups": N_GROUPS}))
    spark.stop()


if __name__ == "__main__":
    main()
