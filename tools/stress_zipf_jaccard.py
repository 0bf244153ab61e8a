"""Zipf-vs-uniform measurement for the two exact-Jaccard variants
(VERDICT r02 item 8).

SCALE.md's round-2 claim — "on a Zipfian df distribution the prefix
filter excludes the head tokens whose df² fan-out dominates and wins;
on near-uniform df the plain join wins" — was measured only on the
near-uniform synthetic corpus. This harness builds a natural-text-like
ZIPFIAN corpus (word ranks drawn from an inverse-CDF Zipf sampler,
deterministic md5-based uniforms, JVM-side expressions only) plus a
matched UNIFORM corpus of the same shape, and times both variants on
both, printing candidate-pair counts alongside wall-clock so the
crossover is visible in the join size, not just seconds.

Also demonstrates the shared build relation (_tokens_with_stats): the
(doc, token, n_tokens, df) relation is persisted ONCE and both variants
run from the same cached DataFrame.

Usage: python tools/stress_zipf_jaccard.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, n_docs: int, tokens_per_doc: int, zipf: bool):
    """Thin wrapper over the package generator (sources/synthetic.py
    ``zipf_corpus``) — promoted there in round 4 so the bench suite's
    ``ngram_jaccard_*_zipf`` queries share the exact corpus this harness
    measures."""
    from fresco_hpc_spark.sources.synthetic import zipf_corpus

    return zipf_corpus(spark, n_docs, tokens_per_doc, zipf=zipf)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    tokens_per_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from pyspark import StorageLevel
    from fresco_hpc_spark.functions.dedup import (
        _tokens_with_stats,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )
    from fresco_hpc_spark.session import get_spark

    spark = get_spark("zipf-jaccard")
    spark.sparkContext.setLogLevel("ERROR")

    for label, zipf in [("zipf", True), ("uniform", False)]:
        corpus = build_corpus(spark, n_docs, tokens_per_doc, zipf)
        corpus = corpus.persist(StorageLevel.MEMORY_AND_DISK)
        corpus.count()

        # df-distribution fingerprint + plain-join candidate mass Σ df²
        stats = _tokens_with_stats(corpus, "text", "doc_id", 1)
        dfs = stats.select("token", "df").distinct()
        summary = dfs.agg(
            F.count(F.lit(1)).alias("vocab"),
            F.max("df").alias("max_df"),
            F.expr("percentile(df, 0.5)").alias("med_df"),
            F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
        ).collect()[0]
        print(
            f"--- {label}: docs={n_docs} vocab={summary.vocab} "
            f"max_df={summary.max_df} med_df={summary.med_df:.0f} "
            f"sum_df2={summary.sum_df2} (plain-join candidate mass)"
        )

        # shared build relation: persist once, both variants reuse it via
        # Spark's cache (their plans rebuild the same lineage, which hits
        # the InMemoryRelation)
        stats = stats.persist(StorageLevel.MEMORY_AND_DISK)
        stats.count()
        for name, fn in [
            ("plain", lambda: ngram_jaccard_pairs(corpus, threshold=0.5, max_token_freq=10**9)),
            ("prefix", lambda: ngram_jaccard_pairs_prefix(corpus, threshold=0.5)),
        ]:
            best, n = None, 0
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn().count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{label:8s} {name:7s} {best:7.2f}s  pairs={n}")
        stats.unpersist()
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
