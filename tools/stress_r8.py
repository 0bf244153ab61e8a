"""Deterministic scale evidence for the round-8 work and the round-7
third wave that SCALE.md lacked rows for (VERDICT r7 items 6/7):
ks_drift exact-vs-quantized, merge_into_store touched-partition I/O,
the reporting quartet's relation geometry, source_overlap /
event_transitions / clustering_knn, and the AQE-skew-join vs
salted_join head-to-head.

Everything printed is a COUNT or BYTE measurement — partition-invariant
and host-noise-free (seconds appear only where labeled, as secondary
color). Run ALONE (no concurrent Spark):

    python tools/stress_r8.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def ks_section(spark) -> None:
    """Exact vs bounded-grid KS on CONTINUOUS values at sf10-equivalent
    (2M rows, ~2M distinct doubles, 20 groups): the exact operator's
    densify is G·D rows; the quantized path's biggest relation is the
    tie-collapsed counts plus G·(2·bins) probes. Also measures the real
    gap against the emitted bound."""
    from fresco_hpc_spark.operators.percentiles import (
        ks_vs_rest,
        ks_vs_rest_quantized,
    )

    n, g, bins = 2_000_000, 20, 64
    base = spark.range(n).select(
        F.pmod(F.hash(F.col("id")), F.lit(g)).cast("string").alias("grp"),
        (
            F.pmod(F.hash(F.col("id") * 7 + 13), F.lit(1_000_000_000))
            / F.lit(1e6)
        ).alias("v"),
    )
    d = base.select("v").distinct().count()
    counts_rows = base.groupBy("grp", "v").count().count()
    t0 = time.time()
    quant = ks_vs_rest_quantized(base, "grp", "v", bins=bins).collect()
    tq = time.time() - t0
    t0 = time.time()
    exact = {r["grp"]: r["ks_d"] for r in ks_vs_rest(base, "grp", "v").collect()}
    te = time.time() - t0
    gaps = [(exact[r["grp"]] - r["ks_d"], r["ks_err_bound"]) for r in quant]
    worst = max(gaps, key=lambda p: p[0])
    probe_rows = g * 2 * bins  # upper bound; dedupe only shrinks it
    print(
        f"ks_quantized: n={n} G={g} D={d} -> exact densify G*D={g * d} rows; "
        f"quantized biggest relation={counts_rows}+<= {probe_rows} probe rows "
        f"(x{g * d / (counts_rows + probe_rows):.0f} smaller); "
        f"max (D_exact - D_quant)={worst[0]:.6f} vs bound={worst[1]:.6f}; "
        f"all gaps in [0, bound]: {all(0 <= a <= b + 1e-9 for a, b in gaps)}; "
        f"seconds (noisy): quant={tq:.1f} exact={te:.1f}"
    )


def merge_section(spark, sf_dir: str, tmp: str) -> None:
    """merge_into_store I/O contract: bytes/files rewritten vs the whole
    store when the batch touches a handful of hours — the number that
    holds at 100 TB is the FRACTION."""
    from fresco_hpc_spark.plans import merge_into_store, write_partitioned_store
    from fresco_hpc_spark.sources import table

    store = os.path.join(tmp, "merge_store")
    ev = table(spark, sf_dir, "events").select(
        F.col("ts").alias("time"), "event_id", "user_id", "value"
    )
    write_partitioned_store(ev, store)
    total_bytes, total_files = du(store), sum(
        len(fs) for _, _, fs in os.walk(store)
    )
    scope = ev.filter((F.dayofmonth("time") == 3) & (F.hour("time") < 5))
    batch = scope.withColumn("value", F.col("value") * 2).withColumn(
        "op", F.lit("upsert")
    )
    n_batch = batch.count()
    before = {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(store)
        for f in fs
    }
    swapped = merge_into_store(spark, store, batch, ["event_id"], time_col="time")
    after = {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(store)
        for f in fs
    }
    rewritten = [p for p in after if p not in before or after[p] != before[p]]
    rw_bytes = sum(os.path.getsize(p) for p in rewritten)
    print(
        f"merge_into_store: batch={n_batch} rows touching {len(swapped)} of "
        f"{sum(1 for _ in set(os.path.dirname(p) for p in before))} hour dirs; "
        f"rewrote {len(rewritten)}/{total_files} files, "
        f"{rw_bytes}/{total_bytes} bytes "
        f"({rw_bytes / total_bytes:.4f} of the store)"
    )


def reporting_section(spark, sf_dir: str) -> None:
    """The reporting quartet's relation geometry — what each plan
    shuffles/broadcasts, independent of seconds."""
    from fresco_hpc_spark.sources import table

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    n_li, n_o, n_c = li.count(), orders.count(), cust.count()
    n_n = table(spark, sf_dir, "nation").count()
    n_r = table(spark, sf_dir, "region").count()
    print(
        f"revenue_by_nation: fact joins shuffle lineitem={n_li} x orders={n_o} "
        f"on orderkey; broadcast dims customer={n_c} nation={n_n} region={n_r} "
        f"(dims/fact = {(n_c + n_n + n_r) / n_li:.4f})"
    )
    months = (
        orders.select(F.date_trunc("month", "o_orderdate").alias("m"))
        .distinct()
        .count()
    )
    print(
        f"revenue_monthly_yoy: YoY self-join relation = {months} month rows "
        f"(constant-bounded; facts aggregated first)"
    )
    print(
        f"rfm_segments: per-customer agg = {n_c} rows from {n_li} lineitems "
        f"(x{n_li / n_c:.1f} reduction before any window); quantile bounds "
        "are driver-side literals (distributed_exact_percentiles)"
    )
    basket = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .count()
    )
    mass = basket.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("m")
    ).collect()[0]["m"]
    dp = li.select("l_partkey").distinct().count()
    print(
        f"basket_pairs: candidate mass sum C(order_size,2)={int(mass)} vs "
        f"distinct-parts^2={dp * dp} (x{dp * dp / mass:.0f} reduction: pairs "
        "are generated per order, never across the catalog)"
    )


def third_wave_section(spark, sf_dir: str) -> None:
    """source_overlap / event_transitions / clustering_knn relation
    sizes at bench scale."""
    from fresco_hpc_spark.functions import knn_graph_blocked
    from fresco_hpc_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    fp = docs.select(
        "source", F.md5(F.trim(F.lower(F.col("text")))).alias("f")
    ).distinct()
    n_fp = fp.count()
    pair_mass = (
        fp.groupBy("f")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")).alias("m"))
        .collect()[0]["m"]
    )
    n_docs = docs.count()
    print(
        f"source_overlap: pair stream = sum df^2 over shared fingerprints = "
        f"{pair_mass} vs corpus^2={n_docs * n_docs} "
        f"(x{n_docs * n_docs / pair_mass:.0f} smaller; df = sources per "
        "fingerprint, bounded by #sources)"
    )
    ev = table(spark, sf_dir, "events")
    mx = (
        ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    )
    states = ev.select("event_type").distinct().count()
    print(
        f"event_transitions: max per-key history={mx} (per-task window "
        f"bound); output <= states^2+nulls = {states * states} rows"
    )
    emb = table(spark, sf_dir, "embeddings")
    und = (
        knn_graph_blocked(emb, k=5)
        .select(
            F.least("vec_id", "neighbor_id").alias("a"),
            F.greatest("vec_id", "neighbor_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.select(F.col("a").alias("v")).unionAll(
        und.select(F.col("b").alias("v"))
    ).groupBy("v").count()
    m = und.count()
    wedge_id = deg.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    print(
        f"clustering_knn: edges={m}; id-orientation wedge mass={int(wedge_id)} "
        f"vs degree-orientation bound O(m*sqrt(m))={int(m * m ** 0.5)} — "
        "the operator generates wedges from the lower-degree endpoint"
    )


def skew_section(spark) -> None:
    """AQE skew-join vs salted_join head-to-head on a deliberately
    skewed key (VERDICT r7 item 7): 2M-row left with 50% of rows on ONE
    key, 10k-key dim right. Deterministic evidence: identical outputs,
    per-partition row bounds before/after salting, and the executed
    plan's skew markers. Seconds printed as secondary color only."""
    from fresco_hpc_spark.operators import salted_join

    n, hot_share, n_keys, n_salts = 2_000_000, 0.5, 10_000, 16
    left = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(n_keys)))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        top = left.groupBy("k").count().orderBy(F.desc("count")).first()

        def run_and_mark(df):
            # the executed plan must be read off the query execution
            # that actually RAN (df.count() builds its own plan whose
            # isFinalPlan would stay false on df itself)
            df.collect()
            return "skew=true" in df._jdf.queryExecution().executedPlan().toString()

        t0 = time.time()
        plain = left.join(right, "k")
        n_plain = plain.count()
        skew_default = run_and_mark(
            left.join(right, "k").filter("dim % 7 = 0").select("payload")
        )
        t_plain = time.time() - t0
        # WHEN does the built-in suffice? AQE's OptimizeSkewedJoin needs
        # (a) the hot partition above skewedPartitionThresholdInBytes
        # (default 256 MB — our 16 MB hot key is invisible until the
        # threshold drops) and (b) a downstream that does NOT reuse the
        # join's hash partitioning: splitting duplicates the partition,
        # so a same-key or global aggregation right after the join
        # suppresses the split entirely (forceOptimizeSkewedJoin
        # included) — exactly the pipeline shape where a hot key hurts
        # twice. Salting keeps working there.
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        try:
            m_map = run_and_mark(
                left.join(right, "k").filter("dim % 7 = 0").select("payload")
            )
            m_other = run_and_mark(
                left.join(right, "k")
                .groupBy((F.col("payload") % 100).alias("g"))
                .agg(F.sum("dim"))
            )
            m_same = run_and_mark(
                left.join(right, "k").groupBy("k").agg(F.sum("dim"))
            )
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
            m_same_forced = run_and_mark(
                left.join(right, "k").groupBy("k").agg(F.sum("dim"))
            )
        finally:
            spark.conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            )
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
            spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
        t0 = time.time()
        salted = salted_join(left, right, on="k", n_salts=n_salts)
        n_salted = salted.count()
        t_salted = time.time() - t0
        # the deterministic skew numbers: biggest shuffle key group
        salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
        max_salted = (
            left.withColumn("s", salt)
            .groupBy("k", "s")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        same = (
            plain.exceptAll(salted).count() == 0
            and salted.exceptAll(plain).count() == 0
        )
        print(
            f"skew_join: hot key={top['k']} holds {top['count']}/{n} rows "
            f"({top['count'] / n:.2f}); AQE skew-split: default-threshold="
            f"{skew_default} (16MB hot partition < 256MB default); at 1MB "
            f"threshold: map-only={m_map}, other-key agg={m_other}, "
            f"SAME-key agg={m_same} (forced={m_same_forced}); "
            f"salted max (key,salt) group={max_salted} "
            f"(x{top['count'] / max_salted:.1f} smaller task bound); "
            f"outputs identical={same} ({n_plain} rows both); "
            f"seconds (noisy): plain+AQE={t_plain:.1f} salted={t_salted:.1f}"
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def straggler_section(spark, sf_dir: str) -> None:
    """Straggler ratios for the r7 third wave + reporting quartet
    (VERDICT r7 item 6): run each registered query, then pull the Spark
    REST taskSummary (duration quantiles) for every stage it executed
    and report the WORST stage's max/median task-duration ratio plus
    that stage's task count. A ratio near 1 means no task dominates its
    stage — the skew evidence seconds can't give. Millisecond-scale
    stages are noise-prone; the ratio matters on the heavy stages, so
    stages with median < 20 ms are skipped."""
    import json as _json
    import urllib.request

    import __spark_entry__ as entrymod

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stage_ids() -> set[int]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            return {s["stageId"] for s in _json.load(r)}

    def summary(sid: int):
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/0/taskSummary"
                "?quantiles=0.0,0.5,1.0",
                timeout=10,
            ) as r:
                return _json.load(r)
        except Exception:
            return None

    names = [
        "ks_drift", "source_overlap", "event_transitions", "clustering_knn",
        "revenue_by_nation", "revenue_monthly_yoy", "rfm_segments",
        "basket_pairs",
    ]
    qs = entrymod.queries()
    for name in names:
        before = stage_ids()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        new_stages = stage_ids() - before
        worst = None
        for sid in new_stages:
            s = summary(sid)
            if not s or "duration" not in s:
                continue
            lo, med, hi = s["duration"]
            if med < 20:
                continue
            ratio = hi / med if med else float("inf")
            if worst is None or ratio > worst[0]:
                worst = (ratio, int(med), int(hi), sid)
        if worst:
            print(
                f"straggler {name}: worst stage max/median task duration "
                f"= {worst[0]:.2f} (median {worst[1]} ms, max {worst[2]} ms)"
            )
        else:
            print(f"straggler {name}: all stages sub-20ms-median (trivial)")


def main() -> None:
    import tempfile

    from fresco_hpc_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-r8", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="stress_r8_")
    ks_section(spark)
    merge_section(spark, sf_dir, tmp)
    reporting_section(spark, sf_dir)
    third_wave_section(spark, sf_dir)
    skew_section(spark)
    straggler_section(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
