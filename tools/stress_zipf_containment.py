"""Zipf-vs-uniform measurement for the two exact-CONTAINMENT variants
(VERDICT r5 item 2) — the containment twin of stress_zipf_jaccard.py.

The plain ``ngram_containment_pairs`` shares the Σ df² token self-join
with plain Jaccard; ``ngram_containment_pairs_prefix`` replaces it with
the ASYMMETRIC prefix filter (prefix of the smaller side × full token
list of the larger side), whose candidate mass is Σ prefix_df·df — on a
Zipfian distribution the head tokens land in almost no prefix, so the
df² head that dominates the plain join disappears. This harness builds
the same Zipf/uniform corpora as the Jaccard stress (shared generator:
sources/synthetic.py ``zipf_corpus``) and times both variants on both,
printing the candidate-mass fingerprints next to wall-clock.

The plain variant runs UNCAPPED (max_token_freq=10⁹) so both compute
the identical exact relation — the comparison is candidate generation,
not recall.

Usage: python tools/stress_zipf_containment.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    tokens_per_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from pyspark import StorageLevel
    from fresco_hpc_spark.functions.dedup import (
        _tokens_with_stats,
        ngram_containment_pairs,
        ngram_containment_pairs_prefix,
    )
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources.synthetic import zipf_corpus

    spark = get_spark("zipf-containment")
    spark.sparkContext.setLogLevel("ERROR")

    threshold = 0.8
    for label, zipf in [("zipf", True), ("uniform", False)]:
        corpus = zipf_corpus(spark, n_docs, tokens_per_doc, zipf=zipf)
        corpus = corpus.persist(StorageLevel.MEMORY_AND_DISK)
        corpus.count()

        # candidate-mass fingerprints: plain = Σ df², prefix = Σ pdf·df
        stats = _tokens_with_stats(corpus, "text", "doc_id", 1)
        from pyspark.sql import Window

        rk = F.row_number().over(
            Window.partitionBy("doc").orderBy(F.col("df").asc(), F.col("token").asc())
        )
        plen = F.col("n_tokens") - F.ceil(F.lit(threshold) * F.col("n_tokens")) + 1
        pdf = (
            stats.withColumn("rk", rk)
            .filter(F.col("rk") <= plen)
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("pdf"))
        )
        dfs = stats.select("token", "df").distinct()
        mass = (
            dfs.join(pdf, "token", "left")
            .agg(
                F.count(F.lit(1)).alias("vocab"),
                F.max("df").alias("max_df"),
                F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
                F.sum(F.coalesce(F.col("pdf"), F.lit(0)) * F.col("df")).alias(
                    "sum_pdf_df"
                ),
            )
            .collect()[0]
        )
        print(
            f"--- {label}: docs={n_docs} vocab={mass.vocab} max_df={mass.max_df} "
            f"plain-mass(sum_df2)={mass.sum_df2} "
            f"prefix-mass(sum_pdf_df)={mass.sum_pdf_df} "
            f"ratio={mass.sum_df2 / max(mass.sum_pdf_df, 1):.1f}x"
        )

        for name, fn in [
            (
                "plain",
                lambda: ngram_containment_pairs(
                    corpus, n=1, threshold=threshold, max_token_freq=10**9
                ),
            ),
            (
                "prefix",
                lambda: ngram_containment_pairs_prefix(
                    corpus, n=1, threshold=threshold
                ),
            ),
        ]:
            best, n = None, 0
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn().count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{label:8s} {name:7s} {best:7.2f}s  pairs={n}")
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
