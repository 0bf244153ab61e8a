"""sf1-equivalent stress for the round-5 span-dedup family: blow the
documents table up 10× (sf0.1 → ~sf1 row counts, 50k docs) and time
paragraph_dedup, duplicate_ngram_spans, and remove_duplicate_ngram_spans
at 1× vs 10×, with cumulative spill from the UI REST API. Confirms the
fingerprint-shuffle operators grow near-linearly (their working sets are
token-linear: paragraphs, grams, covered positions) and that nothing
spills pathologically when the gram relation is 10× wider.

The 10× corpus repeats each document with a distinct id and a
per-replica salt word appended, so replicas are near-dup (not exact)
at the paragraph level and gram-heavy at the span level — the
worst realistic shape for both operators.

Usage: python tools/stress_spans.py [sf_dir]
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
    from fresco_hpc_spark.functions import (
        duplicate_ngram_spans,
        paragraph_dedup,
        remove_duplicate_ngram_spans,
    )
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import table

    spark = get_spark("spans-stress")
    spark.sparkContext.setLogLevel("ERROR")
    ui, app = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId

    def spill_bytes() -> int:
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete",
                timeout=10,
            ) as r:
                stages = json.load(r)
            return sum(
                int(s.get("memoryBytesSpilled", 0))
                + int(s.get("diskBytesSpilled", 0))
                for s in stages
            )
        except Exception:
            return -1

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # 12-word paragraph injection (same segmentation as the driver query)
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_paras = F.ceil(F.size(words) / F.lit(12.0)).cast("int")
    seg = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_paras - 1),
            lambda c: F.array_join(F.slice(words, c * 12 + 1, 12), " "),
        ),
        "\n",
    )
    segmented = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id", seg.alias("text")
    )

    tmp = tempfile.mkdtemp(prefix="spans-stress-")
    out = {}
    for mult in (1, 10):
        rep = (
            segmented.crossJoin(
                spark.range(mult).select(F.col("id").alias("rep"))
            )
            .select(
                (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
                F.when(F.col("rep") == 0, F.col("text"))
                .otherwise(
                    F.concat(F.col("text"), F.lit("\nsalt"), F.col("rep"))
                )
                .alias("text"),
            )
        )
        path = os.path.join(tmp, f"x{mult}")
        rep.write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)
        n = corpus.count()
        for label, fn in (
            ("paragraph_dedup", lambda d: paragraph_dedup(d)),
            ("dup_ngram_spans", lambda d: duplicate_ngram_spans(d, n=8)),
            ("remove_dup_spans", lambda d: remove_duplicate_ngram_spans(d, n=8)),
        ):
            s0 = spill_bytes()
            t0 = time.perf_counter()
            fn(corpus).write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 2)
            out[f"{label}_x{mult}"] = {
                "docs": n,
                "sec": sec,
                "spill_mb": round(max(0, spill_bytes() - s0) / 1e6, 1),
            }
            print(json.dumps({label: out[f"{label}_x{mult}"]}), flush=True)
    growth = {
        lbl: round(out[f"{lbl}_x10"]["sec"] / out[f"{lbl}_x1"]["sec"], 2)
        for lbl in ("paragraph_dedup", "dup_ngram_spans", "remove_dup_spans")
    }
    print(json.dumps({"summary": True, "growth_10x": growth}))
    spark.stop()


if __name__ == "__main__":
    main()
