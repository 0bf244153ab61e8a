"""Deterministic scale evidence for the round-10 work (VERDICT r9
items 5/7): the boilerplate_remove shuffle shape under a maximally
skewed banner key, and merge_into_store's zorder_cols= re-clustering
measured on parquet footers.

Everything printed is a COUNT or BYTE measurement — partition-invariant
and host-noise-free (seconds appear only where labeled, as secondary
color). Run ALONE (no concurrent Spark):

    python tools/stress_r10.py
"""

from __future__ import annotations

import glob
import json as _json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _stage_metrics(spark):
    """Cumulative (shuffle read+write bytes, tasks) across completed
    stages — the bench.py measurement, deterministic for a fixed plan."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        stages = _json.load(r)
    shuffle = sum(
        int(s.get("shuffleWriteBytes", 0)) + int(s.get("shuffleReadBytes", 0))
        for s in stages
    )
    tasks = sum(int(s.get("numCompleteTasks", 0)) for s in stages)
    return shuffle, tasks


def _worst_straggler(spark, before_ids):
    """Max over new stages of (max/median task duration), heavy stages
    only (median >= 20 ms) — the token-skew probe's metric."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        new = {s["stageId"] for s in _json.load(r)} - before_ids
    worst = 0.0
    for sid in new:
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/0/taskSummary"
                "?quantiles=0.0,0.5,1.0",
                timeout=10,
            ) as r:
                s = _json.load(r)
        except Exception:
            continue
        if "duration" not in s:
            continue
        _lo, med, hi = s["duration"]
        if med < 20:
            continue
        worst = max(worst, hi / med if med else float("inf"))
    return worst


def _stage_ids(spark):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        return {s["stageId"] for s in _json.load(r)}


def _skew_corpus(spark, n_docs: int):
    """Worst-case banner skew: HALF the corpus is one mega-source whose
    every page carries the same 3-line banner (the hot (source, line)
    key holds n_docs*3/2 occurrences); the other half spreads over 50
    ordinary sources with unique bodies. Body lines are per-doc unique
    12-word sequences."""
    body = F.concat_ws(
        " ",
        F.lit("unique body words for page"),
        F.col("id").cast("string"),
        F.lit("filler alpha beta gamma delta epsilon"),
    )
    banner = (
        "sign up for the mega newsletter today\n"
        "all content copyright mega corporation\n"
        "cookie policy applies to this site"
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("mega"))
        .otherwise(F.concat(F.lit("src"), (F.col("id") % 50).cast("string")))
        .alias("source"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit(banner + "\n"), body, F.lit("\n"), body),
        )
        .otherwise(F.concat(body, F.lit("\n"), body))
        .alias("text"),
    )


def boilerplate_skew_section(spark) -> None:
    """The docstring's scale claim, measured: the hot banner key never
    concentrates (the distinct pre-shuffle hashes (grp, fp, doc), so a
    banner on every page of one source spreads uniformly over tasks —
    straggler ratio ~1), the frequency relation after the second
    partial-agg groupBy is tiny, and total shuffle grows linearly in
    rows (the per-SF trend row), not in banner multiplicity."""
    from fresco_hpc_spark.functions import boilerplate_remove

    for n_docs in (50_000, 500_000):
        corpus = _skew_corpus(spark, n_docs)
        n_lines = corpus.select(
            F.posexplode(F.split("text", r"\n"))
        ).count()
        before_sh, before_t = _stage_metrics(spark)
        before_ids = _stage_ids(spark)
        out = boilerplate_remove(corpus, min_docs=3)
        kept = out.agg(
            F.sum("n_lines").alias("nl"), F.sum("n_kept").alias("nk")
        ).first()
        sh, t = _stage_metrics(spark)
        strag = _worst_straggler(spark, before_ids)
        # the frequency relation: distinct (grp, fp) pairs that clear
        # min_docs — the ONLY thing the second shuffle keys on
        boiler_rows = (
            corpus.select(
                "doc_id",
                F.col("source").alias("grp"),
                F.explode(F.split("text", r"\n")).alias("line"),
            )
            .select(
                "grp",
                F.md5(
                    F.trim(F.regexp_replace(F.lower("line"), r"\s+", " "))
                ).alias("fp"),
                "doc_id",
            )
            .distinct()
            .groupBy("grp", "fp")
            .count()
            .filter(F.col("count") >= 3)
            .count()
        )
        print(
            f"boilerplate_skew n_docs={n_docs}: lines={n_lines} "
            f"(hot banner key = {n_docs // 2 * 3} occurrences, "
            f"{100 * (n_docs // 2 * 3) / n_lines:.0f}% of a naive "
            f"per-key partitioning) -> boiler relation={boiler_rows} rows; "
            f"lines_in={kept['nl']} kept={kept['nk']}; "
            f"shuffle={(sh - before_sh) / 1e6:.1f} MB "
            f"tasks={t - before_t} straggler={strag:.2f}"
        )


def merge_zorder_section(spark, tmp: str) -> None:
    """zorder_cols= on the CDC merge, measured on real parquet footers:
    fraction of row groups whose min/max stats intersect a ~4% 2-D box,
    for (a) a freshly z-ordered store, (b) the same store after a merge
    WITH re-clustering, (c) after a merge WITHOUT. The 100 TB claim is
    (b) ~= (a) while (c) decays toward unpruned."""
    import pyarrow.parquet as pq

    from fresco_hpc_spark.plans import merge_into_store

    hc = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hc.get("parquet.block.size")
    hc.set("parquet.block.size", str(64 * 1024))
    try:
        n = 500_000
        base = spark.range(n).select(
            F.col("id").alias("event_id"),
            F.lit("2024-01-05 03:00:00").cast("timestamp").alias("time"),
            (F.pmod(F.hash("id"), F.lit(10_000)) / 100.0).alias("x"),
            (F.pmod(F.hash(F.col("id") * 31 + 7), F.lit(10_000)) / 100.0)
            .alias("y"),
        )
        batch = (
            base.filter(F.col("event_id") % 100 == 0)
            .withColumn("x", (F.col("x") + 7.0) % 100.0)
            .withColumn("op", F.lit("upsert"))
        )
        lo, hi = 40.0, 60.0

        def frac(path):
            total = hit = 0
            for f in glob.glob(path + "/*.parquet"):
                md = pq.ParquetFile(f).metadata
                names = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    sx = rg.column(names["x"]).statistics
                    sy = rg.column(names["y"]).statistics
                    total += 1
                    if (sx.min <= hi and sx.max >= lo
                            and sy.min <= hi and sy.max >= lo):
                        hit += 1
            return hit, total

        results = {}
        for mode, zcols in (("with_zorder", ["x", "y"]), ("without", None)):
            store = os.path.join(tmp, f"store_{mode}")
            merge_into_store(
                spark, store, base.withColumn("op", F.lit("upsert")),
                ["event_id"], zorder_cols=["x", "y"],
            )
            [part] = glob.glob(store + "/year=*/month=*/day=*/hour=*")
            results[f"fresh_{mode}"] = frac(part)
            merge_into_store(
                spark, store, batch, ["event_id"], zorder_cols=zcols
            )
            results[f"merged_{mode}"] = frac(part)
        for k, (h, t) in results.items():
            print(
                f"merge_zorder {k}: row-groups intersecting 4% box = "
                f"{h}/{t} ({100 * h / t:.1f}%)"
            )
    finally:
        if old_block is None:
            hc.unset("parquet.block.size")
        else:
            hc.set("parquet.block.size", old_block)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def quantization_section(spark, sf_dir: str, tmp: str) -> None:
    """int8 at-rest compression + BM25 index-I/O fraction + DSIR
    relation geometry — the SCALE.md round-10-additions numbers."""
    import __spark_entry__ as entrymod
    from fresco_hpc_spark.functions import (
        bm25_search_table,
        build_text_index,
        dsir_logweights,
        quantize_embeddings_int8,
    )
    from fresco_hpc_spark.functions.sampling import _dsir_features

    emb = entrymod.table(spark, sf_dir, "embeddings")
    emb.select("vec_id", "embedding").write.mode("overwrite").parquet(
        tmp + "/emb_f32"
    )
    quantize_embeddings_int8(emb).write.mode("overwrite").parquet(
        tmp + "/emb_q8"
    )
    f32, q8 = _du(tmp + "/emb_f32"), _du(tmp + "/emb_q8")
    print(
        f"int8: float parquet={f32 / 1e6:.2f} MB, codes+scale="
        f"{q8 / 1e6:.2f} MB, ratio={f32 / q8:.1f}x, n={emb.count()}"
    )

    docs = entrymod.table(spark, sf_dir, "documents")
    build_text_index(docs, "r10_stress_idx", n_buckets=32)
    loc = (
        spark.sql("DESCRIBE EXTENDED r10_stress_idx")
        .filter("col_name='Location'")
        .first()["data_type"]
        .replace("file:", "")
    )
    total = _du(loc)
    res = bm25_search_table(
        spark, "r10_stress_idx", "fast table scan query", top_k=20
    )
    post_files = [f for f in res.inputFiles() if "docstats" not in f]
    touched = sum(
        os.path.getsize(f.replace("file:", "")) for f in post_files
    )
    stats = _du(loc.rsplit("/", 1)[0] + "/r10_stress_idx_docstats")
    print(
        f"bm25: index={total / 1e6:.2f} MB over 32 buckets; 4-term query "
        f"touches {len(post_files)} bucket files = {touched / 1e6:.3f} MB "
        f"postings + {stats / 1e6:.3f} MB docstats "
        f"({100 * (touched + stats) / total:.1f}% of index bytes)"
    )
    spark.sql("DROP TABLE IF EXISTS r10_stress_idx")
    spark.sql("DROP TABLE IF EXISTS r10_stress_idx_docstats")

    from pyspark.sql import functions as F

    target = docs.filter(F.col("source").isin("src0", "src1"))
    b0, _ = _stage_metrics(spark)
    n = dsir_logweights(docs, target, n_buckets=512).count()
    b1, _ = _stage_metrics(spark)
    nf = _dsir_features(docs, "text", "doc_id").count()
    print(
        f"dsir: {nf} feature occurrences -> 512-bucket broadcast model "
        f"-> {n} doc weights; shuffle={(b1 - b0) / 1e6:.1f} MB"
    )


def main() -> None:
    import tempfile

    from fresco_hpc_spark.session import get_spark

    spark = get_spark(
        "stress-r10",
        shuffle_partitions=32,
        extra_confs={"spark.ui.retainedStages": "50000"},
    )
    tmp = tempfile.mkdtemp(prefix="stress_r10_")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    boilerplate_skew_section(spark)
    merge_zorder_section(spark, tmp)
    quantization_section(spark, sf_dir, tmp)


if __name__ == "__main__":
    main()
