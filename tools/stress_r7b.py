"""Deterministic scale evidence for the round-7 second-wave operators
(pagerank_knn, fuzzy_match_parts, source_divergence, scd2_user_state,
length_buckets, interpolate_values, nucleus_langs, phrase_search).

Everything printed here is a COUNT or BYTE measurement — partition-
invariant and host-noise-free (unlike seconds), so the numbers are
reproducible evidence for SCALE.md. Run:

    python tools/stress_r7b.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("stress-r7b", shuffle_partitions=16)

    # 1. phrase_search: the I/O contract — probed-partition bytes vs the
    # whole index (the pruning ratio IS the scan saving at any scale)
    from fresco_hpc_spark.functions import build_text_index
    from fresco_hpc_spark.functions.search import _py_bucket

    docs = table(spark, sf_dir, "documents")
    build_text_index(docs, "stress_text_index", n_buckets=32)
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED stress_text_index")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    ).replace("file:", "")
    total_b = du(loc)
    probed = {_py_bucket(t, 32) for t in ("fast", "table")}
    probed_b = sum(du(os.path.join(loc, f"_bkt={b}")) for b in probed)
    n_postings = spark.table("stress_text_index").count()
    print(
        f"phrase_search: postings={n_postings} index_bytes={total_b} "
        f"probed_bytes={probed_b} read_fraction={probed_b / total_b:.4f} "
        f"(2 tokens / 32 buckets)"
    )

    # 2. pagerank: per-iteration work is |E| join rows + |V| agg rows;
    # integer mass movement between the last two iterations bounds the
    # convergence error
    from fresco_hpc_spark.functions import knn_graph_blocked
    from fresco_hpc_spark.operators import pagerank_fixed_point

    emb = table(spark, sf_dir, "embeddings")
    edges = knn_graph_blocked(emb, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    verts = emb.select(F.col("vec_id").alias("id"))
    n_e, n_v = edges.count(), verts.count()
    r2 = pagerank_fixed_point(edges, verts, iterations=2).withColumnRenamed(
        "pagerank", "p2"
    )
    r3 = pagerank_fixed_point(edges, verts, iterations=3).withColumnRenamed(
        "pagerank", "p3"
    )
    moved = (
        r2.join(r3, "id")
        .agg(F.sum(F.abs(F.col("p3") - F.col("p2"))).alias("l1"))
        .collect()[0]["l1"]
    )
    print(
        f"pagerank_knn: V={n_v} E={n_e} per-iter join rows=E agg rows=V; "
        f"L1 rank movement iter2->iter3 = {moved:.6f} (of total mass 1)"
    )

    # 3. fuzzy blocking: candidate mass Σ block_df² over distinct names
    # vs the unblocked distinct² and the id-level n²
    part = table(spark, sf_dir, "part")
    names = (
        part.select(F.lower(F.trim(F.col("p_name"))).alias("name"))
        .filter(F.col("name").isNotNull() & (F.col("name") != ""))
    )
    n_rows = names.count()
    dn = names.distinct().withColumn(
        "block", F.split(F.col("name"), r"\s+").getItem(0)
    )
    n_distinct = dn.count()
    mass = (
        dn.groupBy("block")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * F.col("d")).alias("m"))
        .collect()[0]["m"]
    )
    print(
        f"fuzzy_match: rows={n_rows} distinct_names={n_distinct} "
        f"blocked candidate mass Σdf²={mass} vs distinct²={n_distinct**2} "
        f"vs id-level n²={n_rows**2} "
        f"(reduction ×{n_rows**2 / mass:.0f} over naive)"
    )

    # 4. source KL: the token stream vs the vocabulary-sized relations
    # every join/agg after the first groupBy touches
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
    ).filter(F.col("t") != "")
    stream = toks.count()
    gt = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"),
        )
        .filter(F.col("t") != "")
        .groupBy("source", "t")
        .count()
        .count()
    )
    print(
        f"source_divergence: token stream={stream} rows; post-agg "
        f"(group,token) relation={gt} rows — every downstream join is "
        f"{gt / stream:.4f} of the stream"
    )

    # 5. scd2 + interpolate: per-key history bound (the per-task memory
    # contract) and the episode compression ratio
    from fresco_hpc_spark.operators import scd2_history

    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    per_key = ev.groupBy("user_id").count()
    mx = per_key.agg(F.max("count")).collect()[0][0]
    n_ev = ev.count()
    n_ep = scd2_history(
        ev, ["user_id"], "ts", ["event_type"], tie_cols=["event_id"]
    ).count()
    print(
        f"scd2/interpolate: events={n_ev} max per-key history={mx} "
        f"(per-task bound); episodes={n_ep} "
        f"(compression ×{n_ev / n_ep:.2f})"
    )

    spark.sql("DROP TABLE IF EXISTS stress_text_index")
    spark.stop()


def second_wave(sf_dir: str | None = None) -> None:
    """Deterministic evidence for the round-7 third-batch operators:
    triangle wedge mass under degree vs id orientation, SNM candidate
    linearity, collocation pair-stream size. Run:

        python -c "import tools.stress_r7b as s; s.second_wave()" [sf]
    """
    from fresco_hpc_spark.session import get_spark
    from fresco_hpc_spark.sources import table
    from fresco_hpc_spark.functions import knn_graph_blocked

    sf_dir = sf_dir or (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    )
    spark = get_spark("stress-r7b2", shuffle_partitions=16)

    # triangles: wedge mass Σ outdeg² under DEGREE orientation vs the
    # naive ID orientation — the quantity the join actually generates
    emb = table(spark, sf_dir, "embeddings")
    edges = knn_graph_blocked(emb, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    und = (
        edges.filter("src <> dst")
        .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
        .distinct()
    )
    deg = (
        und.selectExpr("a AS v").unionAll(und.selectExpr("b AS v"))
        .groupBy("v").count()
    )
    j = (
        und.join(deg.selectExpr("v AS a", "count AS da"), "a")
        .join(deg.selectExpr("v AS b", "count AS db"), "b")
    )
    # out-degree per vertex under each orientation, then Σ d²
    def wedge_mass(orient_expr: str) -> int:
        out = j.selectExpr(f"{orient_expr} AS u").groupBy("u").count()
        return out.selectExpr("sum(count * count) AS m").collect()[0]["m"]

    m_deg = wedge_mass(
        "CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END"
    )
    m_id = wedge_mass("a")
    n_und = und.count()
    print(
        f"triangles: undirected edges={n_und}; wedge mass Σoutdeg²: "
        f"degree-oriented={m_deg} vs id-oriented={m_id} "
        f"(ratio {m_id / m_deg:.2f}×; gap grows with skew — on a "
        f"power-law graph id-orientation is unbounded)"
    )

    # sorted-neighborhood: candidates are strictly linear (≤ w·n)
    part = table(spark, sf_dir, "part")
    n_names = (
        part.selectExpr("lower(trim(p_name)) AS n")
        .filter("n IS NOT NULL AND n <> ''").distinct().count()
    )
    from fresco_hpc_spark.operators import sorted_neighborhood_pairs

    n_pairs = sorted_neighborhood_pairs(part, "p_name", window=3).count()
    print(
        f"sorted_neighborhood: distinct names={n_names}, window=3 -> "
        f"candidates={n_pairs} (≤ 3·n; vs blocking's Σdf² this is "
        f"distribution-independent)"
    )

    # collocations: pair stream is N·max_gap, never N²
    docs = table(spark, sf_dir, "documents")
    n_tok = (
        docs.selectExpr(
            "explode(split(trim(lower(text)), '\\\\s+')) AS t"
        ).filter("t <> ''").count()
    )
    from fresco_hpc_spark.functions.search import tokenize_positions

    p = tokenize_positions(docs).filter("token <> ''")
    a = p.selectExpr("doc_id", "pos + 1 AS p1").unionAll(
        p.selectExpr("doc_id", "pos + 2 AS p1")
    )
    stream = a.join(
        p.selectExpr("doc_id", "pos AS p1"), ["doc_id", "p1"]
    ).count()
    print(
        f"collocations: tokens={n_tok}, max_gap=2 -> pair stream="
        f"{stream} rows ({stream / n_tok:.2f}·N; tokens² would be "
        f"{n_tok}²)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
    second_wave()


def powerlaw_wedges(n_vertices: int = 100_000, n_edges: int = 500_000) -> None:
    """Adversarial orientation measurement: a Zipf-target graph whose
    mega-hubs sit at the SMALLEST ids — the worst case for naive
    id-ordered triangle orientation (the hub keeps every edge outgoing
    and generates deg² wedges) and the case the degree-ordered
    orientation exists for. Deterministic md5-driven construction, so
    the numbers are reproducible. Run:

        python -c "import tools.stress_r7b as s; s.powerlaw_wedges()"
    """
    from fresco_hpc_spark.session import get_spark

    spark = get_spark("stress-wedges", shuffle_partitions=32)
    e = spark.range(n_edges).select(
        # src uniform over vertices, dst Zipf-concentrated on low ids
        (
            F.pmod(
                F.conv(F.substring(F.md5(F.concat(F.lit("s"), "id")), 1, 15), 16, 10)
                .cast("bigint"),
                F.lit(n_vertices),
            )
        ).alias("src"),
        F.floor(
            F.pow(
                F.lit(float(n_vertices)),
                F.pmod(
                    F.conv(F.substring(F.md5(F.concat(F.lit("d"), "id")), 1, 15), 16, 10)
                    .cast("bigint"),
                    F.lit(1_000_003),
                )
                / F.lit(1_000_003.0),
            )
        ).cast("bigint").alias("dst"),
    )
    und = (
        e.filter("src <> dst")
        .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
        .distinct()
    )
    deg = (
        und.selectExpr("a AS v").unionAll(und.selectExpr("b AS v"))
        .groupBy("v").count()
    )
    j = (
        und.join(deg.selectExpr("v AS a", "count AS da"), "a")
        .join(deg.selectExpr("v AS b", "count AS db"), "b")
    )

    def wedge_mass(orient_expr: str) -> int:
        out = j.selectExpr(f"{orient_expr} AS u").groupBy("u").count()
        return out.selectExpr("sum(count * count) AS m").collect()[0]["m"]

    m_deg = wedge_mass(
        "CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END"
    )
    m_id = wedge_mass("a")
    n_und = und.count()
    mx = deg.agg(F.max("count")).collect()[0][0]
    print(
        f"powerlaw: undirected edges={n_und} max degree={mx}; "
        f"wedge mass Σoutdeg²: degree-oriented={m_deg} vs "
        f"id-oriented={m_id} (×{m_id / m_deg:.1f} blow-up avoided)"
    )
    spark.stop()
