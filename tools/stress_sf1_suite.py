"""Full-suite bench at sf1-equivalent scale (VERDICT r03 item 7).

SCALE.md's sweep covers sf0.001→0.1 for all queries and sf1-equivalent
stress for the dedup/events families only. This harness materializes an
sf1-EQUIVALENT dataset (10× the sf0.1 row counts) into a temp dir with
every table the suite reads, runs the ENTIRE ``queries()`` suite on it
bench-style (noop sink, warmup, min of 2 passes), and prints one JSON
report plus the per-query growth vs a supplied sf0.1 bench_out.json.

Scaling model (the "more hosts / more docs" growth real ingest has —
NOT naive row duplication, which would corrupt the measurements):

- ``events``: 10 copies with shifted event_id/user_id — new users, same
  time range and per-user series shape (window state per key constant).
- ``documents``: copy i replaces every 3rd word with a copy-specific
  token (tools/stress_dedup.py rationale: keeps dup density constant —
  verbatim copies would turn the corpus into 10-member cliques and
  measure O(true pairs) output instead of candidate generation).
- ``embeddings``: per-copy deterministic sign-flip pattern (cosine
  decorrelated, norm preserved, dup density constant).
- ``lineitem/orders/customer/part``: shifted join keys, consistent
  within a copy (l_orderkey↔o_orderkey, o_custkey↔c_custkey,
  l_partkey↔p_partkey) so joins match copy-to-copy and fan-out scales
  linearly.
- ``region/nation/supplier``: dimension tables, copied as-is.

Usage: python tools/stress_sf1_suite.py [sf_dir] [bench_out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

FACTOR = 10
SHIFT = 10_000_000


def _union_copies(df, make_copy):
    out = df
    for i in range(1, FACTOR):
        out = out.unionByName(make_copy(i))
    return out


def build_sf1(spark, sf_dir: str, out_dir: str) -> None:
    from fresco_hpc_spark.sources import table

    def rd(name):
        return table(spark, sf_dir, name)

    # --- events: new users per copy, same time range
    ev = rd("events")
    events = _union_copies(
        ev,
        lambda i: ev.select(
            (F.col("event_id") + i * SHIFT).alias("event_id"),
            "ts",
            (F.col("user_id") + i * SHIFT).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    )

    # --- documents: remix every 3rd word with a copy token
    docs = rd("documents")

    def remix(i):
        words = F.split(F.col("text"), " ")
        mixed = F.transform(
            words, lambda w, j: F.when(j % 3 == 2, F.lit(f"x{i}")).otherwise(w)
        )
        return docs.select(
            (F.col("doc_id") + i * SHIFT).alias("doc_id"),
            F.array_join(mixed, " ").alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    documents = _union_copies(docs, remix)

    # --- embeddings: deterministic sign flips per copy
    emb = rd("embeddings")
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

    embeddings = _union_copies(emb, flip)

    # --- fact/bridge tables: consistent key shifts per copy
    li = rd("lineitem")
    lineitem = _union_copies(
        li,
        lambda i: li.withColumn("l_orderkey", F.col("l_orderkey") + i * SHIFT)
        .withColumn("l_partkey", F.col("l_partkey") + i * SHIFT)
        .withColumn("l_suppkey", F.col("l_suppkey")),
    )
    od = rd("orders")
    orders = _union_copies(
        od,
        lambda i: od.withColumn("o_orderkey", F.col("o_orderkey") + i * SHIFT)
        .withColumn("o_custkey", F.col("o_custkey") + i * SHIFT),
    )
    cu = rd("customer")
    customer = _union_copies(
        cu, lambda i: cu.withColumn("c_custkey", F.col("c_custkey") + i * SHIFT)
    )
    pa = rd("part")
    part = _union_copies(
        pa, lambda i: pa.withColumn("p_partkey", F.col("p_partkey") + i * SHIFT)
    )

    scaled = {
        "events": events,
        "documents": documents,
        "embeddings": embeddings,
        "lineitem": lineitem,
        "orders": orders,
        "customer": customer,
        "part": part,
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, df in scaled.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name in ("region", "nation", "supplier"):
        shutil.copy(
            os.path.join(sf_dir, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    base_bench = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as entrymod
    from fresco_hpc_spark.session import get_spark

    spark = get_spark("sf1-suite")
    spark.sparkContext.setLogLevel("ERROR")

    # suffix "sf1": queries that size themselves by the dir's sf token
    # (the zipf Jaccard pair) must see bench scale, not the 0.01 fallback
    tmp = tempfile.mkdtemp(prefix="suite_", suffix="sf1")
    try:
        t0 = time.perf_counter()
        build_sf1(spark, sf_dir, tmp)
        print(f"# sf1 build: {time.perf_counter() - t0:.1f}s -> {tmp}", file=sys.stderr)

        def force(df):
            df.write.format("noop").mode("overwrite").save()

        qs = entrymod.queries()
        force(next(iter(qs.values()))(spark, tmp))  # warmup
        timings: dict[str, float] = {}
        for _ in range(2):
            for name, fn in qs.items():
                t0 = time.perf_counter()
                force(fn(spark, tmp))
                dt = round(time.perf_counter() - t0, 3)
                if name not in timings or dt < timings[name]:
                    timings[name] = dt
        report = {
            "sf": "1-equivalent (10x sf0.1)",
            "total_sec": round(sum(timings.values()), 2),
            "queries": timings,
        }
        if base_bench and os.path.exists(base_bench):
            with open(base_bench) as f:
                base = json.load(f)["queries"]
            growth = {
                k: round(v / base[k], 2)
                for k, v in timings.items()
                if k in base and base[k] > 0.05
            }
            report["growth_vs_sf01"] = dict(
                sorted(growth.items(), key=lambda kv: -kv[1])
            )
        print(json.dumps(report, indent=1))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
