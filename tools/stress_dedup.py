"""sf1-equivalent dedup-family stress: blow documents/embeddings up 10x
(sf0.1 -> ~sf1 row counts), write the corpus to parquet, and time the
dedup/ANN operators at 1x vs 10x in one session. Confirms the growth
curve stays near-linear and the persisted LSH relations don't spill
pathologically (peak memory/spill read from the UI REST API).

Usage: python tools/stress_dedup.py [sf_dir]
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
        dedup_corpus,
        dup_clusters,
        embedding_near_dup_pairs,
        exact_dedup,
        minhash_dup_pairs,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
        simhash_dup_pairs,
    )
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import table

    spark = get_spark("dedup-stress")
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

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    tmp = tempfile.mkdtemp(prefix="dedup-stress-")

    def blow_up(df, id_col, factor, perturb):
        parts = [df]
        for i in range(1, factor):
            c = df.select(
                (F.col(id_col) + i * 10_000_000).alias(id_col),
                *[perturb(i, c) for c in df.columns if c != id_col],
            )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # copies must be MUTUALLY DISTINCT documents, or the corpus becomes
    # 5000 ten-member near-dup cliques and the measurement is dominated by
    # the O(true pairs) output instead of candidate generation (first run
    # of this script: simhash emitted 11M pairs, minhash grew 10.6x).
    # Replacing every 3rd word with a copy-specific token makes EVERY
    # 3-gram shingle differ from the source and from sibling copies,
    # keeping dup density constant while rows scale 10x.
    def remix(i: int, c: str):
        words = F.split(F.col(c), " ")
        mixed = F.transform(
            words,
            lambda w, j: F.when(j % 3 == 2, F.lit(f"x{i}")).otherwise(w),
        )
        return F.array_join(mixed, " ").alias(c)

    docs10 = blow_up(docs, "doc_id", 10, remix)

    # embedding copies get a per-copy deterministic sign-flip pattern:
    # cosine is scale-invariant (a scalar multiple would still be an
    # exact dup) but sign flips on ~half the dims decorrelate copies, so
    # dup density stays constant while rows scale 10x
    dim = len(emb.select("embedding").head()[0])

    def flip(i: int, c: str):
        if i == 0:
            return F.col(c).alias(c)
        signs = [
            1.0 if ((j * 2654435761 + i * 40503) >> 3) % 2 else -1.0
            for j in range(dim)
        ]
        return F.zip_with(
            F.col(c), F.array(*[F.lit(s) for s in signs]), lambda a, b: a * b
        ).alias(c)

    emb10 = blow_up(emb, "vec_id", 10, flip)

    paths = {}
    for name, df in [("docs1", docs), ("docs10", docs10), ("emb1", emb), ("emb10", emb10)]:
        p = os.path.join(tmp, name)
        df.write.mode("overwrite").parquet(p)
        paths[name] = p

    def rd(p):
        return spark.read.parquet(p)

    def bench(name, fn):
        t0 = time.perf_counter()
        n = fn().count()
        dt = round(time.perf_counter() - t0, 2)
        print(f"{name:28s} {dt:7.2f}s  rows={n}")
        return dt

    results = {}
    for scale, d_key, e_key in [("1x", "docs1", "emb1"), ("10x", "docs10", "emb10")]:
        d, e = rd(paths[d_key]), rd(paths[e_key])
        nrows = d.count()
        print(f"--- {scale}: documents={nrows} embeddings={e.count()}")
        r = {}
        r["exact_dedup"] = bench("exact_dedup", lambda: exact_dedup(d))
        r["dedup_corpus"] = bench("dedup_corpus", lambda: dedup_corpus(d))
        r["minhash"] = bench("minhash_dup_pairs", lambda: minhash_dup_pairs(d, threshold=0.5))
        r["simhash"] = bench("simhash_dup_pairs", lambda: simhash_dup_pairs(d, max_hamming=3))
        r["ngram_jaccard"] = bench(
            "ngram_jaccard_pairs", lambda: ngram_jaccard_pairs(d, n=3, threshold=0.5)
        )
        r["ngram_prefix"] = bench(
            "ngram_jaccard_prefix",
            lambda: ngram_jaccard_pairs_prefix(d, n=3, threshold=0.5),
        )
        r["dup_clusters"] = bench(
            "dup_clusters(minhash)",
            lambda: dup_clusters(
                minhash_dup_pairs(d, threshold=0.5).select("doc_a", "doc_b")
            ),
        )
        r["embedding_near_dups"] = bench(
            "embedding_near_dups", lambda: embedding_near_dup_pairs(e, threshold=0.999)
        )
        r["near_dups_auto_planes"] = bench(
            "near_dups(auto planes)",
            lambda: embedding_near_dup_pairs(
                e, threshold=0.999, target_bucket_size=64
            ),
        )
        results[scale] = r
    print("--- growth (10x data)")
    for k in results["1x"]:
        a, b = results["1x"][k], results["10x"][k]
        print(f"{k:24s} {a:6.2f}s -> {b:7.2f}s   {b / max(a, 0.01):5.1f}x")
    print("cumulative spill bytes:", spill_bytes())
    spark.stop()


if __name__ == "__main__":
    main()
