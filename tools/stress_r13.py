"""Scale stress for the round-13 family: cluster-blocked SemDeDup and
the hybrid-retrieval serving pipeline — measured at sf0.1 AND the
×50-embeddings / ×20-documents corpora from tools/stress_r11
.build_scaled, with the deterministic evidence SCALE.md records
(shuffle MB, task counts, stragglers; seconds secondary).

Headline claims under test:
1. semdedup_kmeans's pair work is Σ_c n_c² — with a FIXED k it
   degrades as the corpus grows (exactly like a fixed LSH plane count,
   SCALE.md sf1 stress), and k is the knob: scaling k with the corpus
   (constant target cluster size) holds per-cluster work bounded.
   Both regimes are measured side by side at ×50.
2. The serving side of corpus_retrieval_v1 is index reads plus
   bounded-relation stages: with the text/IVF indexes AT REST, the
   BM25 + IVF + RRF + MMR chain's shuffle stays ~KB-sized and its
   seconds near-flat while the corpus grows ×20/×50 — the build cost
   scales, the serving cost does not.

Run ALONE (no concurrent Spark):

    python tools/stress_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.stress_r11 import (  # noqa: E402
    _measured,
    build_scaled,
)


def _serving_pass(spark, docs, emb, text_index, ivf_index, centroids):
    """One full serving invocation over PRE-BUILT indexes: BM25 top-20
    ⊕ IVF top-20 → RRF top-10 → MMR top-5 (the q_corpus_retrieval_v1
    chain minus the builds)."""
    from fresco_hpc_spark.functions import (
        bm25_search_table,
        ivf_query_index,
        mmr_diversify,
        reciprocal_rank_fusion,
    )

    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    lex = bm25_search_table(spark, text_index, "fast table scan query", 20)
    sem = ivf_query_index(
        spark.table(ivf_index), qv, centroids, k=20, nprobe=4
    ).withColumnRenamed("vec_id", "doc_id")
    fused = reciprocal_rank_fusion(
        [(lex, "score_micro", "lex_rank"), (sem, "cosine_sim", "sem_rank")],
        id_col="doc_id",
        top_k=10,
    )
    cand = fused.select(
        "doc_id", (F.col("rrf_micro") / 1e6).alias("rrf_score")
    ).join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    return mmr_diversify(
        cand, m=5, lam=0.7, id_col="doc_id",
        vec_col="embedding", rel_col="rrf_score",
    ).collect()


def main() -> None:
    from fresco_hpc_spark.functions import (
        build_text_index,
        ivf_train_centroids,
        kmeans_train,
        semdedup_kmeans,
        unit_normalize,
    )
    from fresco_hpc_spark.functions.vectors import ivf_build_index
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-r13")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stress_r13_")
    print(f"== building scaled corpora under {tmp}")
    docs_path, emb_path = build_scaled(spark, sf_dir, tmp)
    emb_1x = table(spark, sf_dir, "embeddings")
    emb_50x = spark.read.parquet(emb_path)
    docs_1x = table(spark, sf_dir, "documents")
    docs_20x = spark.read.parquet(docs_path)
    n1, n50 = emb_1x.count(), emb_50x.count()
    print(f"embeddings {n1} -> {n50}; documents {docs_1x.count()} -> "
          f"{docs_20x.count()}")

    # --- claim 1: semdedup pair work vs the k knob ------------------
    print("== semdedup_kmeans")
    unit_1x = unit_normalize(emb_1x.select("vec_id", "embedding"))
    cents8 = kmeans_train(unit_1x, k=8, iterations=2, max_train_rows=None)
    _measured(
        spark, "semdedup 1x k=8",
        lambda: semdedup_kmeans(
            emb_1x.select("vec_id", "embedding"), cents8, 0.999,
            materialize=True,
        ).count(),
    )
    unit_50x = unit_normalize(emb_50x.select("vec_id", "embedding"))
    cents8b = kmeans_train(unit_50x, k=8, iterations=2)
    _measured(
        spark, "semdedup x50 k=8 (FIXED k — the degrading regime)",
        lambda: semdedup_kmeans(
            emb_50x.select("vec_id", "embedding"), cents8b, 0.999,
            materialize=True,
        ).count(),
    )
    # the knob: constant target cluster size (~n/500) => k scales
    k_scaled = max(8, n50 // 500)
    cents_scaled = kmeans_train(unit_50x, k=k_scaled, iterations=2)
    _measured(
        spark, f"semdedup x50 k={k_scaled} (scaled k — bounded clusters)",
        lambda: semdedup_kmeans(
            emb_50x.select("vec_id", "embedding"), cents_scaled, 0.999,
            materialize=True,
        ).count(),
    )

    # --- claim 2: serving cost vs corpus size -----------------------
    print("== retrieval serving (indexes pre-built, query-side only)")
    ivf_1x = ivf_train_centroids(
        emb_1x, n_cells=8, iterations=2,
        seed_bucket_col=F.pmod(F.col("vec_id"), F.lit(8)),
        max_train_rows=None,
    )
    build_text_index(docs_1x, "sr13_text_1x", n_buckets=32)
    ivf_build_index(emb_1x, ivf_1x, "sr13_ivf_1x")
    _measured(
        spark, "serving 1x",
        lambda: _serving_pass(
            spark, docs_1x, emb_1x, "sr13_text_1x", "sr13_ivf_1x", ivf_1x
        ),
    )
    ivf_big = ivf_train_centroids(
        emb_50x, n_cells=8, iterations=2,
        seed_bucket_col=F.pmod(F.col("vec_id"), F.lit(8)),
    )
    build_text_index(docs_20x, "sr13_text_big", n_buckets=32)
    ivf_build_index(emb_50x, ivf_big, "sr13_ivf_big")
    _measured(
        spark, "serving x20 docs / x50 emb",
        lambda: _serving_pass(
            spark, docs_20x, emb_50x, "sr13_text_big", "sr13_ivf_big",
            ivf_big,
        ),
    )
    for t in ("sr13_text_1x", "sr13_text_1x_docstats", "sr13_ivf_1x",
              "sr13_text_big", "sr13_text_big_docstats", "sr13_ivf_big"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
