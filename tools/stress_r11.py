"""sf1-equivalent stress for the round-10/11 operator family (VERDICT
r10 item 5): DSIR, int8 ANN, PQ encode/ADC/rerank, BM25, and the
composed IVF×PQ index, each measured at sf0.1 (bench scale) AND at a
scaled corpus — documents ×20 (100k docs) and embeddings ×50 (100k
vectors) — with the deterministic evidence SCALE.md records:

- shuffle bytes + task counts at both scales → linearity ratio
  (metric_Nx / metric_1x) / N, ≈1.0 for an operator whose exchanges
  grow with the corpus and ≈0 for map-only/broadcast shapes;
- worst straggler (max/median task time over heavy stages) at the
  scaled corpus — skew evidence;
- at-rest bytes for every compressed store (int8, PQ codes, IVF×PQ
  cells) vs the float32 parquet baseline, and the probed/touched
  fraction for the partition-pruned readers (IVF×PQ cells, BM25 token
  buckets).

Scaling model follows tools/stress_sf1_suite.py (growth, not naive
duplication): document copies remix every 3rd word with a copy token
(dup density constant), embedding copies apply a per-copy deterministic
sign-flip (cosine decorrelated, norms preserved). Seconds appear only
as labeled secondary color. Run ALONE (no concurrent Spark):

    python tools/stress_r11.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.stress_r10 import _stage_metrics, _worst_straggler  # noqa: E402

DOC_FACTOR = 20
EMB_FACTOR = 50
SHIFT = 10_000_000


def _du(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    )


def _completed_ids(spark):
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        return {s["stageId"] for s in _json.load(r)}


def build_scaled(spark, sf_dir: str, tmp: str) -> tuple[str, str]:
    """Write the ×DOC_FACTOR documents and ×EMB_FACTOR embeddings
    corpora as parquet (scans then read files, like production)."""
    from fresco_hpc_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")

    def remix(i):
        mixed = F.transform(
            words,
            lambda w, j: F.when(j % 3 == 2, F.lit(f"x{i}")).otherwise(w),
        )
        return docs.select(
            (F.col("doc_id") + i * SHIFT).alias("doc_id"),
            F.array_join(mixed, " ").alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    big_docs = docs
    for i in range(1, DOC_FACTOR):
        big_docs = big_docs.unionByName(remix(i))
    docs_path = tmp + "/docs_big"
    big_docs.repartition(32).write.mode("overwrite").parquet(docs_path)

    emb = table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])

    def flip(i):
        signs = [
            1.0 if ((j * 2654435761 + i * 40503) >> 3) % 2 else -1.0
            for j in range(dim)
        ]
        return emb.select(
            (F.col("vec_id") + i * SHIFT).alias("vec_id"),
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(s) for s in signs]),
                lambda a, b: (a * b).cast("float"),
            ).alias("embedding"),
            "label",
        )

    big_emb = emb
    for i in range(1, EMB_FACTOR):
        big_emb = big_emb.unionByName(flip(i))
    emb_path = tmp + "/emb_big"
    big_emb.repartition(32).write.mode("overwrite").parquet(emb_path)
    return docs_path, emb_path


def _measured(spark, label: str, thunk):
    """(shuffle MB, tasks, straggler, seconds) for one forced action."""
    before = _stage_metrics(spark)
    ids = _completed_ids(spark)
    t0 = time.perf_counter()
    thunk()
    sec = time.perf_counter() - t0
    after = _stage_metrics(spark)
    strag = _worst_straggler(spark, ids)
    sh = (after[0] - before[0]) / 1e6
    tk = after[1] - before[1]
    print(
        f"  {label}: shuffle={sh:.2f} MB, tasks={tk}, "
        f"straggler={strag:.2f}, sec={sec:.1f}"
    )
    return sh, tk, strag, sec


def main() -> None:
    from fresco_hpc_spark.functions import (
        ann_topk_int8,
        bm25_search_table,
        build_text_index,
        dsir_logweights,
        ivf_train_centroids,
        ivfpq_build_index,
        ivfpq_query_index,
        kn_logprob_score,
        pq_adc_rerank_topk,
        pq_adc_topk,
        pq_encode,
        pq_train_codebooks,
        quantize_embeddings_int8,
        trigram_logprob_score,
    )
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "stress-r11",
        shuffle_partitions=32,
        extra_confs={"spark.ui.retainedStages": "50000"},
    )
    tmp = tempfile.mkdtemp(prefix="stress_r11_")
    print(f"building scaled corpora (docs x{DOC_FACTOR}, emb x{EMB_FACTOR})…")
    docs_path, emb_path = build_scaled(spark, sf_dir, tmp)
    docs1 = table(spark, sf_dir, "documents")
    emb1 = table(spark, sf_dir, "embeddings")
    docsN = spark.read.parquet(docs_path)
    embN = spark.read.parquet(emb_path)
    n_docs1, n_docsN = docs1.count(), docsN.count()
    n_emb1, n_embN = emb1.count(), embN.count()
    print(f"docs {n_docs1} -> {n_docsN}; emb {n_emb1} -> {n_embN}")

    def lin(label, m1, mN, factor):
        r = (mN / m1) / factor if m1 > 0 else float("nan")
        print(f"  {label} linearity: {m1:.2f} -> {mN:.2f} MB @ x{factor} "
              f"=> per-row ratio {r:.2f}")

    # --- DSIR ------------------------------------------------------------
    print("[dsir_logweights] (512-bucket broadcast model, map-only features)")
    t1 = docs1.filter(F.col("source").isin("src0", "src1"))
    tN = docsN.filter(F.col("source").isin("src0", "src1"))
    s1 = _measured(spark, f"1x ({n_docs1} docs)",
                   lambda: dsir_logweights(docs1, t1, n_buckets=512).count())
    sN = _measured(spark, f"{DOC_FACTOR}x ({n_docsN} docs)",
                   lambda: dsir_logweights(docsN, tN, n_buckets=512).count())
    lin("dsir shuffle", s1[0], sN[0], DOC_FACTOR)

    # --- int8 quantization + compressed scan ------------------------------
    print("[int8 quantize + ann_topk_int8]")
    emb1.select("vec_id", "embedding").write.mode("overwrite").parquet(
        tmp + "/emb1_f32")
    quantize_embeddings_int8(emb1).write.mode("overwrite").parquet(
        tmp + "/emb1_q8")
    quantize_embeddings_int8(embN).write.mode("overwrite").parquet(
        tmp + "/embN_q8")
    f32_1, q8_1 = _du(tmp + "/emb1_f32"), _du(tmp + "/emb1_q8")
    f32_N, q8_N = _du(emb_path), _du(tmp + "/embN_q8")
    print(f"  at rest 1x: f32={f32_1/1e6:.2f} MB q8={q8_1/1e6:.2f} MB "
          f"ratio={f32_1/q8_1:.1f}x; {EMB_FACTOR}x: f32={f32_N/1e6:.2f} "
          f"q8={q8_N/1e6:.2f} ratio={f32_N/q8_N:.1f}x")
    qz1 = spark.read.parquet(tmp + "/emb1_q8")
    qzN = spark.read.parquet(tmp + "/embN_q8")
    probe = [int(x) for x in qz1.filter("vec_id = 0").head()["codes"]]
    i1 = _measured(spark, "scan 1x",
                   lambda: ann_topk_int8(qz1, probe, k=10).collect())
    iN = _measured(spark, f"scan {EMB_FACTOR}x",
                   lambda: ann_topk_int8(qzN, probe, k=10).collect())
    lin("int8 scan shuffle", max(i1[0], 1e-9), max(iN[0], 1e-9), EMB_FACTOR)

    # --- PQ train/encode/ADC/rerank ---------------------------------------
    print("[pq encode + adc + rerank] (production path: bounded training)")
    t0 = time.perf_counter()
    cbs = pq_train_codebooks(embN, m=8, n_codes=16, iterations=2)
    print(f"  train on {n_embN} vecs: sec={time.perf_counter()-t0:.1f} "
          f"(bounded by max_train_rows=100k)")
    pq_encode(embN, cbs).write.mode("overwrite").parquet(tmp + "/embN_pq")
    pq_N = _du(tmp + "/embN_pq")
    print(f"  codes at rest {EMB_FACTOR}x: {pq_N/1e6:.2f} MB "
          f"(f32 {f32_N/1e6:.2f} MB, {f32_N/pq_N:.1f}x)")
    codesN = spark.read.parquet(tmp + "/embN_pq")
    qv = [float(x) for x in emb1.filter("vec_id = 0").head()["embedding"]]
    a1 = _measured(
        spark, "adc 1x",
        lambda: pq_adc_topk(pq_encode(emb1, cbs), qv, cbs, k=10).collect())
    aN = _measured(spark, f"adc {EMB_FACTOR}x (stored codes)",
                   lambda: pq_adc_topk(codesN, qv, cbs, k=10).collect())
    rN = _measured(
        spark, f"adc+rerank {EMB_FACTOR}x",
        lambda: pq_adc_rerank_topk(
            codesN, embN, qv, cbs, k=10, shortlist=100).collect())

    # --- IVF×PQ composed index --------------------------------------------
    print("[ivfpq index] (production path: xxhash seeds, bounded training)")
    t0 = time.perf_counter()
    cents = ivf_train_centroids(embN, n_cells=8, iterations=2)
    print(f"  ivf train: sec={time.perf_counter()-t0:.1f}")
    spark.sql("DROP TABLE IF EXISTS stress_ivfpq_idx")
    t0 = time.perf_counter()
    ivfpq_build_index(embN, cents, cbs, "stress_ivfpq_idx")
    print(f"  build: sec={time.perf_counter()-t0:.1f}")
    loc = (
        spark.sql("DESCRIBE EXTENDED stress_ivfpq_idx")
        .filter("col_name='Location'")
        .first()["data_type"]
        .replace("file:", "")
    )
    store = _du(loc)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    probes = [i for i, _ in sorted(
        enumerate(cents), key=lambda t: (-cos(t[1], qv), t[0]))[:4]]
    probed = sum(_du(os.path.join(loc, f"_cell={c}")) for c in probes)
    print(f"  store={store/1e6:.2f} MB over 8 cells (f32 {f32_N/1e6:.2f} MB,"
          f" {f32_N/store:.1f}x smaller); nprobe=4 reads "
          f"{probed/1e6:.2f} MB = {100*probed/store:.1f}% of store "
          f"= {100*probed/f32_N:.1f}% of raw corpus bytes")
    q1 = _measured(
        spark, f"query {EMB_FACTOR}x",
        lambda: ivfpq_query_index(
            spark.table("stress_ivfpq_idx"), embN, qv, cents, cbs,
            k=10, nprobe=4, shortlist=100).collect())
    spark.sql("DROP TABLE IF EXISTS stress_ivfpq_idx")

    # --- BM25 over the stored index ---------------------------------------
    print("[bm25] (token-bucket partitioned index + docstats sidecar)")
    spark.sql("DROP TABLE IF EXISTS stress_bm25_idx")
    t0 = time.perf_counter()
    build_text_index(docsN, "stress_bm25_idx", n_buckets=32)
    print(f"  build on {n_docsN} docs: sec={time.perf_counter()-t0:.1f}")
    iloc = (
        spark.sql("DESCRIBE EXTENDED stress_bm25_idx")
        .filter("col_name='Location'")
        .first()["data_type"]
        .replace("file:", "")
    )
    itotal = _du(iloc)
    res = bm25_search_table(
        spark, "stress_bm25_idx", "fast table scan query", top_k=20)
    b1 = _measured(spark, f"query {DOC_FACTOR}x", lambda: res.collect())
    post_files = [f for f in res.inputFiles() if "docstats" not in f]
    touched = sum(os.path.getsize(f.replace("file:", "")) for f in post_files)
    dstats = _du(iloc.rsplit("/", 1)[0] + "/stress_bm25_idx_docstats")
    print(f"  index={itotal/1e6:.2f} MB; 4-term query touches "
          f"{touched/1e6:.3f} MB postings + {dstats/1e6:.3f} MB docstats "
          f"({100*(touched+dstats)/itotal:.1f}% of index bytes)")
    spark.sql("DROP TABLE IF EXISTS stress_bm25_idx")
    spark.sql("DROP TABLE IF EXISTS stress_bm25_idx_docstats")

    # --- trigram + KN LM scores --------------------------------------------
    print("[trigram_logprob / kn_logprob]")
    g1 = _measured(spark, f"trigram 1x ({n_docs1} docs)",
                   lambda: trigram_logprob_score(docs1).count())
    gN = _measured(spark, f"trigram {DOC_FACTOR}x",
                   lambda: trigram_logprob_score(docsN).count())
    lin("trigram shuffle", g1[0], gN[0], DOC_FACTOR)
    k1 = _measured(spark, f"kn 1x ({n_docs1} docs)",
                   lambda: kn_logprob_score(docs1).count())
    kN = _measured(spark, f"kn {DOC_FACTOR}x",
                   lambda: kn_logprob_score(docsN).count())
    lin("kn shuffle", k1[0], kN[0], DOC_FACTOR)

    # --- sketches + learned classifier (second r11 wave) -------------------
    from fresco_hpc_spark.functions import (
        cms_sketch,
        kmv_sketch,
        kmv_union_intersect,
        quality_classifier_train,
    )

    print("[kmv / cms sketches]")

    def doc_toks(d):
        return d.select(
            "source",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("tok"),
        ).filter(F.col("tok") != "")

    s1k = _measured(
        spark, "kmv build 1x",
        lambda: kmv_sketch(doc_toks(docs1), "tok", "source", k=64).count())
    sNk = _measured(
        spark, f"kmv build {DOC_FACTOR}x",
        lambda: kmv_sketch(doc_toks(docsN), "tok", "source", k=64).count())
    lin("kmv build shuffle", max(s1k[0], 1e-9), max(sNk[0], 1e-9), DOC_FACTOR)
    skN = kmv_sketch(doc_toks(docsN), "tok", "source", k=64)
    _measured(
        spark, f"kmv pairwise set-algebra {DOC_FACTOR}x (190 pairs, sketch-only)",
        lambda: kmv_union_intersect(skN, k=64, group_col="source").count())
    c1 = _measured(
        spark, "cms build 1x",
        lambda: cms_sketch(doc_toks(docs1), "tok", d=4, w=256).count())
    cN = _measured(
        spark, f"cms build {DOC_FACTOR}x",
        lambda: cms_sketch(doc_toks(docsN), "tok", d=4, w=256).count())
    print(f"  cms sketch rows: 1x<=1024 actual bounded; shuffle "
          f"{c1[0]:.3f} -> {cN[0]:.3f} MB (counter matrix is d*w groups — "
          f"map-side combine absorbs the corpus growth)")

    print("[quality_classifier] (3 rounds, 256 buckets)")
    y1 = docs1.withColumn("y", F.col("source").isin("src0", "src1").cast("int"))
    yN = docsN.withColumn("y", F.col("source").isin("src0", "src1").cast("int"))
    q1c = _measured(
        spark, "train 1x",
        lambda: quality_classifier_train(y1, "y", n_buckets=256, iterations=3))
    qNc = _measured(
        spark, f"train {DOC_FACTOR}x",
        lambda: quality_classifier_train(yN, "y", n_buckets=256, iterations=3))
    lin("classifier train shuffle", q1c[0], qNc[0], DOC_FACTOR)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print("done")


if __name__ == "__main__":
    main()
