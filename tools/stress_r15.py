"""Stress-scale evidence for the r14/r15 rewrites (VERDICT r14 item 2).

The sf0.1 bench cannot validate at-scale claims: the 8-core suite BEAT
the 32-core suite there (203.9 vs 237.6 s) because every query is
scheduling-bound at ~600 k rows. This harness reruns the top r14
rewrites — and the r15 token-id remap — on the ×20-documents corpus
(multi-file, 32 parquet files, the stress_r11.build_scaled pattern) and
on adversarially skewed Zipf corpora, recording the deterministic
evidence SCALE.md keeps (shuffle MB, task counts, straggler ratios;
seconds secondary). OLD shapes are loaded from the pre-rewrite git
blobs (committed beside this tool as tools/_r15_old/) so the comparison
runs the genuine prior code, not a reconstruction.

Sections (run ALONE, no concurrent Spark):

    python tools/stress_r15.py helpers   # _spread/_fan_out/widen_exchange no-op proof
    python tools/stress_r15.py bloom     # r14 LUT vs old explode+join+groupBy shape
    python tools/stress_r15.py stats     # r14 df join-back vs old token window (Zipf skew)
    python tools/stress_r15.py bpe       # r14 lead()-window trainer vs old self-join rounds
    python tools/stress_r15.py pairs     # r15 bigint token ids vs string shingle join keys

For the 8-vs-32-core scaling ratio, run the `pairs` section twice:

    SPARK_GRAFT_CPUS=32 python tools/stress_r15.py pairs
    SPARK_GRAFT_CPUS=8  python tools/stress_r15.py pairs
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.stress_r11 import _measured, build_scaled  # noqa: E402

#: fixed staging dir so the 8- and 32-core invocations reuse one build
STAGE_DIR = "/tmp/stress_r15_corpus"

#: (module-name, path-in-repo, pre-rewrite commit) — the OLD code under
#: comparison, extracted from git history at load time
_OLD_BLOBS = {
    "r13_bloom": ("fresco_hpc_spark/functions/bloom.py", "b58103f^"),
    "r13_dedup": ("fresco_hpc_spark/functions/dedup.py", "0c14084^"),
    "r13_search": ("fresco_hpc_spark/functions/search.py", "0c14084^"),
    # r14-close dedup: string join keys everywhere (pre token-id remap)
    "r14_dedup": ("fresco_hpc_spark/functions/dedup.py", "9c38478^"),
}


def _load_old(name: str):
    """Import a pre-rewrite module version from git history. Its
    ``from fresco_hpc_spark...`` imports resolve against the CURRENT
    package (shared helpers kept their signatures), so the old
    operator bodies run verbatim."""
    path, rev = _OLD_BLOBS[name]
    src = subprocess.run(
        ["git", "show", f"{rev}:{path}"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    tmp = f"/tmp/_stress_r15_{name}.py"
    with open(tmp, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(f"_old_{name}", tmp)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _spark():
    from fresco_hpc_spark.session import get_spark

    spark = get_spark("stress-r15")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _scaled_docs(spark) -> str:
    """Build (or reuse) the ×20 documents corpus as 32 parquet files."""
    docs_path = STAGE_DIR + "/docs_big"
    if not os.path.isdir(docs_path):
        os.makedirs(STAGE_DIR, exist_ok=True)
        print("building ×20 documents corpus…")
        build_scaled(spark, "/root/testdata/sf0.1", STAGE_DIR)
    return docs_path




def section_helpers() -> None:
    """The scale-adaptive helpers must be IDENTITY on a multi-file
    corpus (no repartition sneaks into a 100 TB layout) and
    widen_exchange must honor a cluster-sized shuffle.partitions."""
    spark = _spark()
    docs_path = _scaled_docs(spark)
    big = spark.read.parquet(docs_path)
    print(f"corpus: {len(big.inputFiles())} files")

    import __spark_entry__ as m
    from fresco_hpc_spark.functions.text import _fan_out
    from fresco_hpc_spark.session import widen_exchange

    assert m._spread(big) is big, "_spread must be identity on ≥cores files"
    print("PASS _spread is identity on the 32-file corpus (no exchange added)")
    assert _fan_out(big) is big, "_fan_out must be identity on ≥cores files"
    print("PASS _fan_out is identity on the 32-file corpus")

    # cluster-like conf: the pinned width must follow the CONF, not the
    # local core count (no local[32] constant)
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        plan = widen_exchange(
            big.select("doc_id", "source"), "source"
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "200" in plan, plan[:500]
        print("PASS widen_exchange pins the conf width (200) on a 32-core local master")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    plan = widen_exchange(
        big.select("doc_id", "source"), "source"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "32" in plan
    print("PASS widen_exchange floors at defaultParallelism when conf is small")
    spark.stop()


def section_bloom() -> None:
    """r14 bloom_decontaminate rewrite at ×20: the old shape exploded k
    positions per gram and shuffled (doc, token) through a groupBy; the
    LUT shape is fully map-side. Claim: the shuffle gap GROWS with the
    corpus (old shuffles k× the gram stream, new shuffles only the
    surviving-doc aggregate)."""
    spark = _spark()
    docs_path = _scaled_docs(spark)
    old_bloom = _load_old("r13_bloom")
    from fresco_hpc_spark.functions.bloom import bloom_decontaminate

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for label, path in (
        ("1x", "/root/testdata/sf0.1"),
        ("20x", None),
    ):
        if path:
            from fresco_hpc_spark.sources import table

            docs = table(spark, path, "documents")
        else:
            docs = spark.read.parquet(docs_path)
        train = docs.filter(F.col("doc_id") % 7 != 0)
        ev = docs.filter(F.col("doc_id") % 7 == 0).limit(500)
        for shape, fn in (
            ("old-join", old_bloom.bloom_decontaminate),
            ("new-LUT", bloom_decontaminate),
        ):
            _measured(
                spark,
                f"bloom {label} {shape}",
                lambda fn=fn, t=train, e=ev: force(fn(t, e)),
            )
    spark.stop()


def section_stats() -> None:
    """r14 _tokens_with_stats rewrite under Zipf skew, scaled ×5 past
    the exhibit size: the OLD token-partitioned window puts every
    occurrence of a stop-shingle on ONE task (straggler grows with the
    head df); the join-back partial-aggregates the df count map-side.
    Deterministic evidence: straggler ratio of the heaviest stage."""
    spark = _spark()
    from fresco_hpc_spark.functions.dedup import _tokens_with_stats
    from fresco_hpc_spark.sources.synthetic import zipf_corpus

    old_dedup = _load_old("r13_dedup")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # Two regimes. (a) The Zipf exhibit corpus: MANY moderately hot
    # tokens — partitions balance, both shapes behave. (b) The
    # boilerplate regime the r14 claim is actually about: ONE token in
    # every document (df = n_docs) while everything else is unique —
    # the token window must sort that key's whole occurrence list on
    # one task (straggler grows with n_docs), the join-back
    # partial-aggregates it map-side (bounded).
    corpora = []
    corpora.append(
        ("zipf 4000x60 n=3", zipf_corpus(spark, 4_000, 60, zipf=True), 3)
    )
    n_docs = 2_000_000
    boiler = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit("the"),
                *[
                    F.concat(F.lit(f"u{j}_"), F.col("id").cast("string"))
                    for j in range(7)
                ],
            ).alias("text"),
        )
        .repartition(32)
    )
    corpora.append((f"boilerplate {n_docs}x8 n=1", boiler, 1))
    for label, corpus, n in corpora:
        corpus = corpus.localCheckpoint(eager=True)
        for shape, fn in (
            ("old-window", old_dedup._tokens_with_stats),
            ("new-joinback", _tokens_with_stats),
        ):
            _measured(
                spark,
                f"stats {label} {shape}",
                lambda fn=fn, c=corpus, n=n: force(fn(c, "text", "doc_id", n)),
            )
    spark.stop()


def section_bpe() -> None:
    """r14 BPE trainer rewrite at ×20: the old trainer ran a per-round
    self-join + anti-join + union over the pair relation; the new one
    is lead() window arithmetic over one reused per-doc exchange.
    Rounds are sequential by algorithm — the claim is per-round cost,
    so both train the same 5 merges on the same corpus."""
    spark = _spark()
    docs_path = _scaled_docs(spark)
    old_search = _load_old("r13_search")
    from fresco_hpc_spark.functions.search import bpe_merges

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for label, docs in (
        ("1x", None),
        ("20x", spark.read.parquet(docs_path)),
    ):
        if docs is None:
            from fresco_hpc_spark.sources import table

            docs = table(spark, "/root/testdata/sf0.1", "documents")
        docs = docs.localCheckpoint(eager=True)
        for shape, fn in (
            ("old-selfjoin", old_search.bpe_merges),
            ("new-window", bpe_merges),
        ):
            _measured(
                spark,
                f"bpe {label} {shape} (k=5)",
                lambda fn=fn, d=docs: force(fn(d, k=5)),
            )
    spark.stop()


def section_pairs() -> None:
    """r15 token-id remap at ×20 on the REAL near-dup corpus: the
    candidate + verify joins keyed on xxhash64 BIGINTs vs the r14
    string shingle keys — same relations, 8-byte vs word-shingle join
    keys. Run under SPARK_GRAFT_CPUS=32 and =8 for the core-scaling
    ratio (the heavy verify stages must scale ≥ ~2 on 4× the cores,
    unlike the sf0.1 bench where nothing does)."""
    from pyspark import StorageLevel

    spark = _spark()
    cores = spark.sparkContext.defaultParallelism
    docs_path = _scaled_docs(spark)
    docs = spark.read.parquet(docs_path)

    import fresco_hpc_spark.functions.dedup as d

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # string path (the r14 shape): ranked relation + prefix body
    from pyspark.sql import Window

    toks = d._tokens_with_stats(docs, "text", "doc_id", 3)
    rk = F.row_number().over(
        Window.partitionBy("doc").orderBy(F.col("df").asc(), F.col("token").asc())
    )
    ranked_str = toks.withColumn("rk", rk).persist(StorageLevel.MEMORY_AND_DISK)
    _measured(
        spark,
        f"pairs 20x cores={cores} string-keys (jaccard prefix)",
        lambda: force(d._prefix_jaccard_pairs(ranked_str, "token", 0.5)),
    )
    _measured(
        spark,
        f"pairs 20x cores={cores} string-keys (containment prefix)",
        lambda: force(d._prefix_containment_pairs(ranked_str, "token", 0.8)),
    )
    ranked_str.unpersist()

    hranked, clean = d._hashed_ranked(docs, "text", "doc_id", 3)
    assert clean, "collision audit must pass on the 64-bit hash at ×20"
    print("  collision audit clean at ×20 (xxhash64 injective on this corpus)")
    _measured(
        spark,
        f"pairs 20x cores={cores} bigint-ids (jaccard prefix)",
        lambda: force(d._prefix_jaccard_pairs(hranked, "tid", 0.5)),
    )
    _measured(
        spark,
        f"pairs 20x cores={cores} bigint-ids (containment prefix)",
        lambda: force(d._prefix_containment_pairs(hranked, "tid", 0.8)),
    )
    hranked.unpersist()
    spark.stop()


SECTIONS = {
    "helpers": section_helpers,
    "bloom": section_bloom,
    "stats": section_stats,
    "bpe": section_bpe,
    "pairs": section_pairs,
}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else None
    if which not in SECTIONS:
        print(f"usage: python tools/stress_r15.py {{{'|'.join(SECTIONS)}}}")
        raise SystemExit(2)
    SECTIONS[which]()


if __name__ == "__main__":
    main()
