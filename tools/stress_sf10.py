"""sf10-equivalent stress (VERDICT r5 item 7): one decade beyond
tools/stress_spans.py for the span-surgery, bigram-LM, and
prefix-containment operators — 10x and 100x the sf0.1 documents table
(~50k and ~500k docs), recording wall-clock, cumulative shuffle spill,
and the straggler ratio (max/median task duration of the heaviest
stage the run created, same metric as tools/stress_token_skew.py).

Corpus shape per operator:
- remove_dup_spans / bigram_logprob: salted NEAR-DUP replicas (each
  replica appends one salt word) — same vocabulary, gram-heavy, the
  worst realistic shape: the model/winner relations face fingerprints
  shared by up to 100 documents while rows scale 100x.
- containment_prefix: replicas rewritten with replica-DISTINCT words
  (every word prefixed by its replica tag). With near-dup replicas the
  OUTPUT itself is quadratic (every 100-replica group emits C(100,2)
  pairs), which measures pair materialization, not candidate
  generation; the realistic 100 TB scale-up is more distinct
  documents, and distinct-vocabulary replicas model exactly that.

Usage: python tools/stress_sf10.py [sf_dir] [mults...]
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


def _straggler(ui: str, app: str, new_stages: list[dict]) -> float:
    """max/median task duration of the heaviest stage among new_stages."""
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [10, 100]

    from fresco_hpc_spark.functions import (
        bigram_logprob_score,
        ngram_containment_pairs_prefix,
        remove_duplicate_ngram_spans,
    )
    from fresco_hpc_spark.session import (
        get_spark,
        input_bytes_of,
        tune_shuffle_partitions,
    )
    from fresco_hpc_spark.sources import table

    spark = get_spark("sf10-stress")
    spark.sparkContext.setLogLevel("ERROR")
    ui, app = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.trim(F.col("text")) != ""
    )
    tmp = tempfile.mkdtemp(prefix="sf10-stress-")
    out: dict[str, dict] = {}

    def replicate(mult: int, distinct_vocab: bool) -> str:
        rep = docs.crossJoin(
            spark.range(mult).select(F.col("id").alias("rep"))
        )
        if distinct_vocab:
            words = F.split(F.trim(F.col("text")), r"\s+")
            text = F.array_join(
                F.transform(
                    words,
                    lambda w: F.concat(F.lit("r"), F.col("rep"), F.lit("_"), w),
                ),
                " ",
            )
        else:
            text = F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" salt"), F.col("rep"))
            )
        path = os.path.join(
            tmp, f"x{mult}_{'dv' if distinct_vocab else 'nd'}"
        )
        rep.select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
            text.alias("text"),
        ).write.mode("overwrite").parquet(path)
        return path

    runs = [
        ("remove_dup_spans", False, lambda d: remove_duplicate_ngram_spans(d, n=8)),
        ("bigram_logprob", False, lambda d: bigram_logprob_score(d)),
        (
            "containment_prefix",
            True,
            lambda d: ngram_containment_pairs_prefix(d, n=3, threshold=0.9),
        ),
    ]
    for mult in mults:
        for distinct_vocab in (False, True):
            if not any(dv == distinct_vocab for _, dv, _ in runs):
                continue
            path = replicate(mult, distinct_vocab)
            corpus = spark.read.parquet(path)
            n = corpus.count()
            # VERDICT r6 item 5: size shuffle partitions from the
            # replicated corpus's bytes instead of the fixed local
            # default (32 constant partitions drove the r6 run's 60 GB
            # containment spill). shuffle_ratio=50 is measured for the
            # shingle exploders AGAINST SNAPPY PARQUET bytes: the gram
            # relations blow up ~8x over raw text, and snappy text
            # compresses ~6x, so in-flight shuffle ≈ 50x on-disk input
            # (ratio=8 still floored at 2x cores and left 33 GB of
            # spill at x100; see SCALE.md §sf10 for the ladder).
            # SPARK_GRAFT_STRESS_PARTITIONS pins the count for ladder
            # measurements (the 32/64/256 spill ladder in SCALE.md)
            pin = os.environ.get("SPARK_GRAFT_STRESS_PARTITIONS")
            if pin:
                spark.conf.set("spark.sql.shuffle.partitions", pin)
                parts = int(pin)
            else:
                parts = tune_shuffle_partitions(
                    spark, input_bytes_of(path), shuffle_ratio=50.0
                )
            print(json.dumps({"tuned_partitions": parts, "mult": mult}), flush=True)
            for label, dv, fn in runs:
                if dv != distinct_vocab:
                    continue
                before = _stages(ui, app)
                seen = {(s["stageId"], s["attemptId"]) for s in before}
                t0 = time.perf_counter()
                fn(corpus).write.format("noop").mode("overwrite").save()
                sec = round(time.perf_counter() - t0, 2)
                after = _stages(ui, app)
                new = [
                    s
                    for s in after
                    if (s["stageId"], s["attemptId"]) not in seen
                ]
                out[f"{label}_x{mult}"] = {
                    "docs": n,
                    "sec": sec,
                    "spill_mb": round(
                        max(0, _spill(after) - _spill(before)) / 1e6, 1
                    ),
                    "straggler_ratio": _straggler(ui, app, new),
                }
                print(
                    json.dumps({f"{label}_x{mult}": out[f"{label}_x{mult}"]}),
                    flush=True,
                )
    growth = {}
    if len(mults) >= 2:
        lo, hi = mults[0], mults[-1]
        for label, _, _ in runs:
            a, b = out.get(f"{label}_x{lo}"), out.get(f"{label}_x{hi}")
            if a and b:
                growth[label] = round(b["sec"] / max(a["sec"], 0.01), 2)
    print(json.dumps({"summary": True, "mults": mults, "growth": growth}))
    spark.stop()


if __name__ == "__main__":
    main()
