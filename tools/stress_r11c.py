"""Scale stress for the round-11 THIRD wave: HLL vs KMV build shape,
label propagation, JL random projection, weighted quantiles — measured
at sf0.1 (bench scale) AND a ×20 documents / ×50 embeddings corpus
(tools/stress_r11.build_scaled's growth model), with the deterministic
evidence SCALE.md records (shuffle bytes, task counts, stragglers;
seconds only as labeled secondary color).

The headline claim under test: the HLL register build's shuffle is
bounded by groups × 2^b CELLS (map-side MAX partials) while the KMV
build's shuffle carries the deduped (group, hash) DISTINCT SET — at a
growing-vocabulary corpus KMV's exchange grows linearly and HLL's must
plateau at the sketch size. Run ALONE (no concurrent Spark):

    python tools/stress_r11c.py [sf_dir]
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
        ann_rp_rerank_topk,
        hll_sketch,
        kmv_sketch,
        knn_graph_blocked,
        rp_project,
    )
    from fresco_hpc_spark.functions.text import token_count
    from fresco_hpc_spark.operators import weighted_quantiles
    from fresco_hpc_spark.operators.graph import label_propagation
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "stress-r11c",
        shuffle_partitions=32,
        extra_confs={"spark.ui.retainedStages": "50000"},
    )
    tmp = tempfile.mkdtemp(prefix="stress_r11c_")
    print(f"building scaled corpora (docs x{DOC_FACTOR}, emb x{EMB_FACTOR})…")
    docs_path, emb_path = build_scaled(spark, sf_dir, tmp)
    docs1 = table(spark, sf_dir, "documents")
    emb1 = table(spark, sf_dir, "embeddings")
    docsN = spark.read.parquet(docs_path)
    embN = spark.read.parquet(emb_path)
    print(f"docs {docs1.count()} -> {docsN.count()}; "
          f"emb {emb1.count()} -> {embN.count()}")

    def toks(d):
        return d.select(
            "source",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("tok"),
        ).filter(F.col("tok") != "")

    def lin(label, m1, mN, factor):
        r = (mN / m1) / factor if m1 > 0 else float("nan")
        print(f"  {label}: {m1:.3f} -> {mN:.3f} MB @ x{factor} "
              f"=> per-row ratio {r:.2f}")

    # --- sketch builds: HLL registers vs KMV distinct set ---------------
    print("[sketch builds over source-token vocabulary]")
    k1 = _measured(spark, "kmv_sketch 1x", lambda: kmv_sketch(
        toks(docs1), "tok", "source", k=64, salt="s11c").count())
    kN = _measured(spark, f"kmv_sketch x{DOC_FACTOR}", lambda: kmv_sketch(
        toks(docsN), "tok", "source", k=64, salt="s11c").count())
    h1 = _measured(spark, "hll_sketch 1x", lambda: hll_sketch(
        toks(docs1), "tok", "source", b=9, salt="s11c").count())
    hN = _measured(spark, f"hll_sketch x{DOC_FACTOR}", lambda: hll_sketch(
        toks(docsN), "tok", "source", b=9, salt="s11c").count())
    lin("kmv shuffle", k1[0], kN[0], DOC_FACTOR)
    lin("hll shuffle", h1[0], hN[0], DOC_FACTOR)
    print(f"  hll/kmv shuffle at x{DOC_FACTOR}: {hN[0] / kN[0]:.3f}")

    # --- label propagation over the kNN graph ---------------------------
    # LPA's scale claim is about ITS per-round shuffles at |E| — grow
    # the edge relation by disjoint id-shifted copies of the 1x kNN
    # graph (same degree structure; building a 100k-vector blocked kNN
    # graph here would only measure the quadratic edge build).
    print("[label_propagation, 3 rounds]")
    from tools.stress_r11 import SHIFT

    e1 = knn_graph_blocked(emb1, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    ).localCheckpoint(eager=True)
    eN = e1
    for i in range(1, EMB_FACTOR):
        eN = eN.unionByName(e1.select(
            (F.col("src") + i * SHIFT).alias("src"),
            (F.col("dst") + i * SHIFT).alias("dst"),
        ))
    eN = eN.repartition(32).localCheckpoint(eager=True)
    v1 = emb1.select(F.col("vec_id").alias("id"))
    vN = embN.select(F.col("vec_id").alias("id"))
    l1 = _measured(spark, "lpa 1x", lambda: label_propagation(
        e1, v1, rounds=3).count())
    lN = _measured(spark, f"lpa x{EMB_FACTOR}", lambda: label_propagation(
        eN, vN, rounds=3).count())
    lin("lpa shuffle", l1[0], lN[0], EMB_FACTOR)

    # --- JL projection + RP-ANN -----------------------------------------
    print("[rp_project / ann_rp_rerank_topk]")
    p1 = _measured(spark, "rp_project 1x", lambda: rp_project(
        emb1, out_dim=40).count())
    pN = _measured(spark, f"rp_project x{EMB_FACTOR}", lambda: rp_project(
        embN, out_dim=40).count())
    print(f"  rp_project shuffle (expected ~0): {p1[0]:.3f} / {pN[0]:.3f} MB")
    a1 = _measured(spark, "ann_rp 1x", lambda: ann_rp_rerank_topk(
        emb1, query_id=0, out_dim=40, shortlist=200, k=10).count())
    aN = _measured(spark, f"ann_rp x{EMB_FACTOR}", lambda: ann_rp_rerank_topk(
        embN, query_id=0, out_dim=40, shortlist=200, k=10).count())
    lin("ann_rp shuffle (TakeOrdered partials, sublinear)", a1[0], aN[0],
        EMB_FACTOR)

    # --- TF-IDF VSM search + normalization -------------------------------
    print("[tfidf_search / normalize_text]")
    from fresco_hpc_spark.functions import normalize_text, tfidf_search

    t1 = _measured(spark, "tfidf_search 1x", lambda: tfidf_search(
        docs1, "fast table scan query", top_k=20).count())
    tN = _measured(spark, f"tfidf_search x{DOC_FACTOR}", lambda: tfidf_search(
        docsN, "fast table scan query", top_k=20).count())
    lin("tfidf shuffle (tf + df + vocab joins — grows with corpus, "
        "never pairs)", t1[0], tN[0], DOC_FACTOR)
    n1 = _measured(spark, "normalize_text 1x", lambda: normalize_text(
        docs1).count())
    nN = _measured(spark, f"normalize_text x{DOC_FACTOR}",
                   lambda: normalize_text(docsN).count())
    print(f"  normalize_text shuffle (expected ~0): "
          f"{n1[0]:.3f} / {nN[0]:.3f} MB")

    # --- weighted quantiles ----------------------------------------------
    print("[weighted_quantiles (token-mass length cutoffs)]")
    def wq(d):
        return weighted_quantiles(
            d.select("source", "n_chars",
                     token_count(F.col("text")).cast("double").alias("w")),
            "n_chars", "w", "source",
        ).count()
    w1 = _measured(spark, "weighted_quantiles 1x", lambda: wq(docs1))
    wN = _measured(spark, f"weighted_quantiles x{DOC_FACTOR}",
                   lambda: wq(docsN))
    lin("wq shuffle (bounded by distinct (group,value))", w1[0], wN[0],
        DOC_FACTOR)

    spark.stop()


if __name__ == "__main__":
    main()
