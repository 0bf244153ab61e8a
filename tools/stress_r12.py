"""Scale stress for the round-12 family: k-means clustering,
lightweight coreset, OPQ-lite rotation+encode, and RRF fusion —
measured at sf0.1 (bench scale) AND the ×20 documents / ×50 embeddings
corpus from tools/stress_r11.build_scaled, with the deterministic
evidence SCALE.md records (shuffle bytes, task counts, stragglers;
seconds as labeled secondary color).

Headline claims under test:
1. kmeans_train's max_train_rows bound keeps per-iteration Lloyd cost
   FLAT once the corpus outgrows the cap (the deterministic id-hash
   subset), while kmeans_assign / kmeans_clusters scale linearly with
   a shuffle bounded by k rows per task (map-side partial agg).
2. lightweight_coreset adds one 1-row broadcast total + a
   TakeOrderedAndProject — no corpus-sized exchange beyond the
   assignment scan.
3. rotate_vectors + pq_encode (the OPQ chain) stays map-only: zero
   shuffle regardless of corpus size.
4. reciprocal_rank_fusion's cost is the RETRIEVALS: the fusion join
   itself touches Σ top-N rows and its exchange stays ~KB-sized while
   the corpus grows ×20.

Run ALONE (no concurrent Spark):

    python tools/stress_r12.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.stress_r11 import (  # noqa: E402
    DOC_FACTOR,
    EMB_FACTOR,
    _measured,
    build_scaled,
)


def main() -> None:
    from fresco_hpc_spark.functions import (
        brute_force_knn,
        kmeans_assign,
        kmeans_clusters,
        kmeans_train,
        lightweight_coreset,
        pq_encode,
        pq_train_codebooks,
        reciprocal_rank_fusion,
        rotate_vectors,
        rr_perm_signs,
        tfidf_search,
    )
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "stress-r12",
        shuffle_partitions=32,
        extra_confs={"spark.ui.retainedStages": "50000"},
    )
    tmp = tempfile.mkdtemp(prefix="stress_r12_")
    print(f"building scaled corpora (docs x{DOC_FACTOR}, emb x{EMB_FACTOR})…")
    docs_path, emb_path = build_scaled(spark, sf_dir, tmp)
    docs1 = table(spark, sf_dir, "documents")
    emb1 = table(spark, sf_dir, "embeddings")
    docsN = spark.read.parquet(docs_path)
    embN = spark.read.parquet(emb_path)
    n1, nN = emb1.count(), embN.count()
    d1, dN = docs1.count(), docsN.count()
    print(f"embeddings: {n1} -> {nN}; documents: {d1} -> {dN}")

    # --- 1. k-means: capped training flat, assignment linear --------
    cents = {}
    for label, df in (("1x", emb1), (f"{EMB_FACTOR}x", embN)):
        out = {}
        _measured(
            spark,
            f"kmeans_train capped@100k {label}",
            lambda df=df, out=out: out.update(
                c=kmeans_train(df, k=8, iterations=2)
            ),
        )
        cents[label] = out["c"]
    for label, df in (("1x", emb1), (f"{EMB_FACTOR}x", embN)):
        _measured(
            spark,
            f"kmeans_assign+clusters {label}",
            lambda df=df, c=cents[label]: kmeans_clusters(df, c).collect(),
        )

    # --- 2. coreset: broadcast total + TakeOrdered ------------------
    for label, df in (("1x", emb1), (f"{EMB_FACTOR}x", embN)):
        _measured(
            spark,
            f"lightweight_coreset n=1000 {label}",
            lambda df=df, c=cents[label]: lightweight_coreset(
                df, c, n_sample=1000
            ).collect(),
        )

    # --- 3. OPQ chain: rotation is free, encode map-only ------------
    perm, signs = rr_perm_signs(64, 41)
    for label, df in (("1x", emb1), (f"{EMB_FACTOR}x", embN)):
        rot = rotate_vectors(df, perm, signs)
        out = {}
        _measured(
            spark,
            f"opq train(capped)+encode {label}",
            lambda rot=rot, out=out: out.update(
                n=pq_encode(
                    rot,
                    pq_train_codebooks(rot, m=8, n_codes=16, iterations=2),
                ).count()
            ),
        )

    # --- 4. RRF: fusion cost is the retrievals ----------------------
    qv = [float(x) for x in emb1.filter(F.col("vec_id") == 0)
          .select("embedding").head()[0]]
    for label, ddf, edf in (
        ("1x", docs1, emb1),
        (f"{DOC_FACTOR}x/{EMB_FACTOR}x", docsN, embN),
    ):
        lex = tfidf_search(ddf, "fast table scan query", top_k=20)
        sem = brute_force_knn(edf, qv, k=20).withColumnRenamed(
            "vec_id", "doc_id"
        )
        _measured(
            spark,
            f"rank_fusion {label}",
            lambda lex=lex, sem=sem: reciprocal_rank_fusion(
                [(lex, "cosine_sim", "lr"), (sem, "cosine_sim", "sr")],
                id_col="doc_id",
            ).collect(),
        )
        # fusion-only: pre-materialized legs, measure just the join
        lexm = lex.localCheckpoint()
        semm = sem.localCheckpoint()
        _measured(
            spark,
            f"rank_fusion fusion-only {label}",
            lambda lexm=lexm, semm=semm: reciprocal_rank_fusion(
                [(lexm, "cosine_sim", "lr"), (semm, "cosine_sim", "sr")],
                id_col="doc_id",
            ).collect(),
        )

    # sanity: assignment totals match corpus sizes
    a1 = kmeans_assign(emb1, cents["1x"]).count()
    aN = kmeans_assign(embN, cents[f"{EMB_FACTOR}x"]).count()
    print(f"assigned rows: {a1} / {n1}, {aN} / {nN}")
    spark.stop()


if __name__ == "__main__":
    main()
