"""Phrase-index scale stress: build the positional inverted index over
sf10/sf100-equivalent Zipf corpora (50k / 500k docs vs the sf0.1
documents table's ~5k) and measure build cost, probe cost, and the
pruning ratio — the three numbers that decide whether the index pays
for itself at 100 TB.

Usage: python tools/stress_phrase_index.py [mults...]   (default 10 100)
Run ALONE — wall-clock numbers are polluted by concurrent Spark work.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from fresco_hpc_spark.functions import build_text_index, phrase_search_index
    from fresco_hpc_spark.functions.search import _py_bucket
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import zipf_corpus

    mults = [int(m) for m in (sys.argv[1:] or ["10", "100"])]
    base_docs = 5_000  # ≈ the sf0.1 documents table
    spark = get_spark("stress-phrase", shuffle_partitions=64)
    n_buckets = 64

    for mult in mults:
        n_docs = base_docs * mult
        docs = zipf_corpus(spark, n_docs, tokens_per_doc=60)
        t0 = time.perf_counter()
        build_text_index(
            docs, "stress_phrase_idx", text_col="text", id_col="doc_id",
            n_buckets=n_buckets,
        )
        build_s = round(time.perf_counter() - t0, 2)
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED stress_phrase_idx")
            .filter("col_name = 'Location'")
            .collect()[0]["data_type"]
        ).replace("file:", "")
        idx_bytes = du(loc)
        n_postings = spark.table("stress_phrase_idx").count()

        for phrase in ("w1 w2", "w100 w200"):
            probed = {
                _py_bucket(t, n_buckets) for t in phrase.split()
            }
            probed_bytes = sum(
                du(os.path.join(loc, f"_bkt={b}"))
                for b in probed
                if os.path.isdir(os.path.join(loc, f"_bkt={b}"))
            )
            t1 = time.perf_counter()
            n_hits = phrase_search_index(
                spark.table("stress_phrase_idx"), phrase, n_buckets=n_buckets
            ).count()
            q_s = round(time.perf_counter() - t1, 2)
            print(
                f"mult={mult} docs={n_docs} postings={n_postings} "
                f"index_mb={idx_bytes / 1e6:.1f} build_s={build_s} "
                f"phrase={phrase!r} hits={n_hits} query_s={q_s} "
                f"read_fraction={probed_bytes / idx_bytes:.4f}"
            )
    spark.sql("DROP TABLE IF EXISTS stress_phrase_idx")
    spark.stop()


if __name__ == "__main__":
    main()
