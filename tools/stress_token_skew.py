"""Token-join skew probe for the vocabulary-join operators (round 4).

``tf_idf_top_terms`` and ``unigram_logprob_score`` join per-document
tokens against a vocabulary relation on the token key. On natural text
the token distribution is Zipfian — the head word appears in nearly
every document, so the join key is maximally skewed. This harness runs
both operators on the deterministic Zipf corpus (head token df ≈ n_docs)
and on a matched uniform corpus, comparing wall-clock and the straggler
ratio (max/median task time of the longest stage) with AQE's skew-join
handling on (the session default) — the design question being whether
the hot token key serializes a task at scale.

Usage: python tools/stress_token_skew.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_straggler(ui: str, app: str) -> float:
    """max/median task duration of the heaviest completed stage."""
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
        heaviest = max(stages, key=lambda s: int(s.get("executorRunTime", 0)))
        sid, att = heaviest["stageId"], heaviest["attemptId"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/taskList?length=1000",
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    tokens_per_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from fresco_hpc_spark.functions import tf_idf_top_terms, unigram_logprob_score
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources.synthetic import zipf_corpus

    spark = get_spark("token-skew")
    spark.sparkContext.setLogLevel("ERROR")
    ui, app = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId

    for label, is_zipf in (("zipf", True), ("uniform", False)):
        corpus = zipf_corpus(spark, n_docs, tokens_per_doc, zipf=is_zipf)
        corpus = corpus.persist()
        corpus.count()
        for name, fn in (
            ("tfidf", lambda: tf_idf_top_terms(corpus, k=5)),
            ("unigram_lp", lambda: unigram_logprob_score(corpus)),
        ):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(
                f"{label:8s} {name:11s} {best:6.2f}s "
                f"straggler_ratio={_stage_straggler(ui, app)}"
            )
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
