"""Unit tests for the round-7 operator additions: the graph family
(PageRank ± weights, triangles, clustering coefficients, cluster-hub
resolution), record linkage (blocked fuzzy matching, sorted
neighborhood, end-to-end name resolution), distribution QA (KL
divergence, source overlap, KS drift, seasonal baseline), CDC (SCD2
history), the search family (phrase index, collocations), and the
data-quality audits (FK integrity, transitions, interpolation,
nucleus/length bucketing).

Oracle parity for the registered queries is covered by the full_parity
sweep; these tests pin hand-checkable closed-form semantics and the
determinism contracts (integer fixed-point, partition invariance,
null-group survival)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _pagerank(spark, edges, vertices, **kw):
    from fresco_hpc_spark.operators import pagerank_fixed_point

    e = spark.createDataFrame(edges, ["src", "dst"])
    v = spark.createDataFrame([(x,) for x in vertices], ["id"])
    return pagerank_fixed_point(e, v, **kw)


def test_pagerank_cycle_is_uniform(spark):
    # A 4-cycle is already the fixed point: base + d·(S/N) = S/N exactly
    # in the integer recurrence (no floor loss: every quantity divides).
    out = {
        r["id"]: r["pagerank"]
        for r in _pagerank(
            spark, [(1, 2), (2, 3), (3, 4), (4, 1)], [1, 2, 3, 4]
        ).collect()
    }
    assert out == {1: 0.25, 2: 0.25, 3: 0.25, 4: 0.25}


def test_pagerank_star_hub_dominates_and_mass_bounded(spark):
    # 4 leaves all point at a hub; the hub points back at one leaf.
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)]
    rows = _pagerank(spark, edges, [0, 1, 2, 3, 4]).collect()
    pr = {r["id"]: r["pagerank"] for r in rows}
    assert pr[0] == max(pr.values())
    assert pr[0] > 2 * pr[2]
    # leaves 2..4 are symmetric (no in-edges: base rank only)
    assert pr[2] == pr[3] == pr[4]
    # leaf 1 gets the hub's share on top of base
    assert pr[1] > pr[2]
    # total mass never exceeds 1 (floor losses + dropped dangling mass
    # only shrink it)
    assert sum(pr.values()) <= 1.0 + 1e-9


def test_pagerank_dangling_vertex_keeps_base_rank(spark):
    # vertex 9 has no out-edges (dangling) and no in-edges: it must
    # still appear, holding exactly the base term after one iteration.
    out = {
        r["id"]: r["pagerank"]
        for r in _pagerank(spark, [(1, 2)], [1, 2, 9], iterations=1).collect()
    }
    assert set(out) == {1, 2, 9}
    # base = ((3e12 div 20) div 3) / 1e12 = 0.05
    assert out[9] == 0.05
    assert out[1] == 0.05  # no in-edges either
    # 2 receives 1's full share: base + 17*(S div 3) div 20
    assert out[2] == pytest.approx(0.05 + 0.85 / 3, abs=1e-9)


def test_pagerank_is_partition_invariant(spark):
    # integer arithmetic ⇒ bit-identical results under any partitioning
    from fresco_hpc_spark.operators import pagerank_fixed_point

    edges = [(i, (i * 7) % 23) for i in range(23)] + [
        (i, (i + 1) % 23) for i in range(23)
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    v = spark.createDataFrame([(x,) for x in range(23)], ["id"])
    a = pagerank_fixed_point(e, v).collect()
    b = pagerank_fixed_point(e.repartition(7), v.repartition(3)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pagerank_rejects_bad_params(spark):
    from fresco_hpc_spark.operators import pagerank_fixed_point

    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    v = spark.createDataFrame([(1,), (2,)], ["id"])
    with pytest.raises(ValueError):
        pagerank_fixed_point(e, v, iterations=-1)
    with pytest.raises(ValueError):
        pagerank_fixed_point(e, v, damping_num=20, damping_den=20)


def test_fuzzy_match_blocks_and_thresholds(spark):
    from fresco_hpc_spark.operators import fuzzy_match_names

    df = spark.createDataFrame(
        [
            ("Red Widget",),
            ("red widget",),  # normalizes into the same name (cnt=2)
            ("red widgit",),  # 1 edit away
            ("red bolt",),    # same block, far (5 edits from widget)
            ("blue bolt",),   # different block: never a candidate
            (None,),
            ("   ",),
        ],
        ["name"],
    )
    rows = fuzzy_match_names(df, "name", max_dist=2).collect()
    pairs = {(r["name_a"], r["name_b"]): r for r in rows}
    assert set(pairs) == {("red widget", "red widgit")}
    r = pairs[("red widget", "red widgit")]
    assert r["dist"] == 1 and r["cnt_a"] == 2 and r["cnt_b"] == 1
    assert r["block"] == "red"
    # widening the threshold admits the in-block far pair, still never
    # the cross-block one
    rows5 = fuzzy_match_names(df, "name", max_dist=6).collect()
    names = {(r["name_a"], r["name_b"]) for r in rows5}
    assert ("red bolt", "red widget") in names
    assert not any("blue" in a or "blue" in b for a, b in names)


def test_fuzzy_match_rejects_negative_threshold(spark):
    from fresco_hpc_spark.operators import fuzzy_match_names

    with pytest.raises(ValueError):
        fuzzy_match_names(
            spark.createDataFrame([("x",)], ["name"]), "name", max_dist=-1
        )


def test_source_divergence_identical_groups_are_zero(spark):
    from fresco_hpc_spark.functions import source_token_divergence

    df = spark.createDataFrame(
        [("a", "x y x"), ("b", "x y x"), ("a", "z"), ("b", "z")],
        ["source", "text"],
    )
    rows = source_token_divergence(df).collect()
    out = {r["source"]: r for r in rows}
    assert out["a"]["kl_divergence"] == 0.0 == out["b"]["kl_divergence"]
    assert out["a"]["n_tokens"] == 4 and out["a"]["vocab"] == 3


def test_source_divergence_disjoint_groups_are_ln2(spark):
    import math

    from fresco_hpc_spark.functions import source_token_divergence

    # A emits only x, B only y, equal mass: p=1, q=1/2 ⇒ KL = ln 2
    df = spark.createDataFrame(
        [("a", "x x"), ("b", "y y")], ["source", "text"]
    )
    out = {
        r["source"]: r["kl_divergence"]
        for r in source_token_divergence(df).collect()
    }
    assert out["a"] == pytest.approx(math.log(2), abs=1e-6)
    assert out["b"] == pytest.approx(math.log(2), abs=1e-6)


def test_scd2_collapses_and_chains(spark):
    from datetime import datetime

    from fresco_hpc_spark.operators import scd2_history

    t = lambda s: datetime(2024, 1, s)
    df = spark.createDataFrame(
        [
            (1, t(1), "a", 10),
            (1, t(2), "a", 11),  # unchanged -> collapses into episode 1
            (1, t(3), "b", 12),  # change -> episode 2
            (1, t(4), None, 13),  # b -> NULL is a change (episode 3)
            (1, t(5), None, 14),  # NULL -> NULL unchanged
            (1, t(6), "b", 15),  # NULL -> b is a change (episode 4)
            (2, t(1), "x", 16),  # second key: independent history
        ],
        "k int, ts timestamp, state string, eid int",
    )
    rows = scd2_history(df, ["k"], "ts", ["state"], tie_cols=["eid"]).collect()
    k1 = [r for r in rows if r["k"] == 1]
    assert [r["state"] for r in k1] == ["a", "b", None, "b"]
    assert [r["version"] for r in k1] == [1, 2, 3, 4]
    assert [r["valid_from"].day for r in k1] == [1, 3, 4, 6]
    # each episode's valid_to is the next one's valid_from; last is open
    assert [r["valid_to"].day if r["valid_to"] else None for r in k1] == [3, 4, 6, None]
    assert [r["is_current"] for r in k1] == [False, False, False, True]
    k2 = [r for r in rows if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["is_current"] and k2[0]["version"] == 1


def test_scd2_rejects_empty_specs(spark):
    from fresco_hpc_spark.operators import scd2_history

    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        scd2_history(df, [], "ts", ["a"])
    with pytest.raises(ValueError):
        scd2_history(df, ["k"], "ts", [])


def test_length_bucket_profile_balanced_and_waste(spark):
    from fresco_hpc_spark.functions import length_bucket_profile

    docs = spark.createDataFrame(
        [("w " * n,) for n in (1, 2, 3, 4, 5, 6, 7, 8)] + [("",), ("   ",)],
        ["text"],
    )
    rows = length_bucket_profile(docs, bins=4).collect()
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4]
    # equi-depth on 1..8 with 4 bins: two docs per bucket; blank docs excluded
    assert [r["n_docs"] for r in rows] == [2, 2, 2, 2]
    assert rows[0]["min_tokens"] == 1 and rows[0]["max_tokens"] == 2
    # waste for lengths {1,2} padded to 2: 1 - 3/4
    assert rows[0]["padding_waste"] == 0.25
    assert rows[3]["min_tokens"] == 7 and rows[3]["max_tokens"] == 8
    assert rows[3]["padding_waste"] == pytest.approx(1 - 15 / 16, abs=1e-9)


def test_length_bucket_profile_single_bin_and_guard(spark):
    from fresco_hpc_spark.functions import length_bucket_profile

    docs = spark.createDataFrame([("a b",), ("c d",)], ["text"])
    rows = length_bucket_profile(docs, bins=1).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 2
    assert rows[0]["padding_waste"] == 0.0  # identical lengths: no padding
    with pytest.raises(ValueError):
        length_bucket_profile(docs, bins=0)


def test_interpolate_linear_midpoint_and_edges(spark):
    from datetime import datetime

    from fresco_hpc_spark.operators import interpolate_linear

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    df = spark.createDataFrame(
        [
            # key 1: interpolate between (0s, 0.0) and (10s, 10.0)
            (1, t(0), 0.0, 1),
            (1, t(4), None, 2),
            (1, t(10), 10.0, 3),
            # key 2: leading null -> back-fill, trailing null -> forward-fill
            (2, t(0), None, 4),
            (2, t(5), 7.0, 5),
            (2, t(9), None, 6),
            # key 3: all null -> stays null
            (3, t(0), None, 7),
        ],
        "k int, ts timestamp, v double, eid int",
    )
    out = {
        r["eid"]: (r["value_interp"], r["is_interp"])
        for r in interpolate_linear(
            df, "k", time_col="ts", value_col="v", tie_cols=["eid"]
        ).collect()
    }
    assert out[1] == (0.0, False)  # non-null passthrough
    assert out[2] == (4.0, True)   # 0 + (10-0) * 4/10
    assert out[4] == (7.0, True)   # back-fill
    assert out[6] == (7.0, True)   # forward-fill
    assert out[7] == (None, True)  # no observations at all


def test_interpolate_linear_duplicate_timestamp_guard(spark):
    from datetime import datetime

    from fresco_hpc_spark.operators import interpolate_linear

    ts = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, ts, 2.0, 1), (1, ts, None, 2), (1, ts, 8.0, 3)],
        "k int, ts timestamp, v double, eid int",
    )
    out = {
        r["eid"]: r["value_interp"]
        for r in interpolate_linear(
            df, "k", time_col="ts", value_col="v", tie_cols=["eid"]
        ).collect()
    }
    # t1 == t0: the guard returns the previous observation, not NaN/inf
    assert out[2] == 2.0


def test_nucleus_top_p_threshold_inclusion(spark):
    from fresco_hpc_spark.operators import nucleus_top_p

    rows = (
        [("g", "a")] * 50 + [("g", "b")] * 30 + [("g", "c")] * 15
        + [("g", "d")] * 5
    )
    df = spark.createDataFrame(rows, ["grp", "cat"])
    out = nucleus_top_p(df, "grp", "cat", p=0.8).collect()
    # a (0 < 80) and b (50 < 80) kept; c's cumulative-before is exactly
    # 80 -> excluded (coverage already reached p)
    assert [(r["cat"], r["nucleus_rank"]) for r in out] == [("a", 1), ("b", 2)]
    assert out[0]["share"] == 0.5 and out[1]["cum_share"] == 0.8
    # p=1 keeps every category
    assert len(nucleus_top_p(df, "grp", "cat", p=1.0).collect()) == 4
    with pytest.raises(ValueError):
        nucleus_top_p(df, "grp", "cat", p=0.0)


def test_nucleus_top_p_tie_break_is_category_order(spark):
    from fresco_hpc_spark.operators import nucleus_top_p

    df = spark.createDataFrame(
        [("g", "z"), ("g", "y"), ("g", "x")], ["grp", "cat"]
    )
    out = nucleus_top_p(df, "grp", "cat", p=0.5).collect()
    # all counts tie at 1: deterministic (cnt desc, cat asc) order keeps
    # x then y (cum-before 1/3 < 1/2), never z
    assert [r["cat"] for r in out] == ["x", "y"]


def test_phrase_search_index_semantics(spark):
    from fresco_hpc_spark.functions import build_text_index, phrase_search_index

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "cat sat cat sat cat"),
            (3, "the dog"),
            (4, "a a a a"),
            (5, "  The CAT  sat  "),  # normalization: lower + trim + \s+
        ],
        ["doc_id", "text"],
    )
    build_text_index(docs, "t_search_idx", n_buckets=8)
    idx = spark.table("t_search_idx")

    out = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search_index(idx, "cat sat", n_buckets=8).collect()
    }
    assert out == {1: (1, 1), 2: (2, 0), 5: (1, 1)}
    # overlapping matches of a duplicate-token phrase all count
    out4 = phrase_search_index(idx, "a a", n_buckets=8).collect()
    assert [(r["doc_id"], r["n_matches"], r["first_pos"]) for r in out4] == [
        (4, 3, 0)
    ]
    # single-token phrase degenerates to a postings count
    out1 = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search_index(idx, "the", n_buckets=8).collect()
    }
    assert out1 == {1: 2, 3: 1, 5: 1}
    # absent phrase: empty relation, stable schema
    assert phrase_search_index(idx, "zebra stampede", n_buckets=8).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        phrase_search_index(idx, "   ", n_buckets=8)
    spark.sql("DROP TABLE IF EXISTS t_search_idx")


def test_bm25_matches_reference_and_needs_sidecar(spark):
    """BM25 over the stored index equals a from-scratch Python
    reference (same k1=1.2 / b=0.75, always-positive idf, micro-unit
    quantization with HALF_UP), multi-term docs outrank single-term
    ones of similar length, and a pre-sidecar index (props stripped)
    raises instead of silently mis-scoring."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pytest as _pt

    from fresco_hpc_spark.functions import bm25_search_table, build_text_index

    texts = {
        1: "spark shuffle join",
        2: "spark spark spark filter scan",
        3: "join order and the broadcast join plan",
        4: "totally unrelated words here",
        5: "spark join",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    build_text_index(docs, "t_bm25_idx", n_buckets=8)
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score_micro"], r["rank"])
        for r in bm25_search_table(
            spark, "t_bm25_idx", "spark join", top_k=10
        ).collect()
    }

    toks = {i: t.lower().split() for i, t in texts.items()}
    n, total = len(toks), sum(len(w) for w in toks.values())
    ref = {}
    for term in ("join", "spark"):
        df_t = sum(term in w for w in toks.values())
        idf = math.log((2 * (n + 1)) / (2 * df_t + 1))
        for i, w in toks.items():
            tf = w.count(term)
            if not tf:
                continue
            s = idf * (
                (tf * 2.2)
                / (tf + 1.2 * (0.25 + 0.75 * ((len(w) * n) / total)))
            )
            u = int(
                Decimal(repr(s * 1_000_000)).quantize(
                    Decimal("1"), ROUND_HALF_UP
                )
            )
            nm, sm = ref.get(i, (0, 0))
            ref[i] = (nm + 1, sm + u)
    order = sorted(ref, key=lambda i: (-ref[i][1], i))
    expected = {
        i: (ref[i][0], ref[i][1], order.index(i) + 1) for i in ref
    }
    assert got == expected
    # both-terms doc 5 beats the single-term docs 2 and 3
    assert got[5][2] < got[2][2] and got[5][2] < got[3][2]
    # an index without the stats sidecar properties must refuse
    spark.sql(
        "ALTER TABLE t_bm25_idx UNSET TBLPROPERTIES "
        "('fresco.n_docs', 'fresco.total_len')"
    )
    with _pt.raises(ValueError, match="docstats"):
        bm25_search_table(spark, "t_bm25_idx", "spark join")
    spark.sql("DROP TABLE IF EXISTS t_bm25_idx")
    spark.sql("DROP TABLE IF EXISTS t_bm25_idx_docstats")


def test_phrase_search_bucket_hash_matches_jvm(spark):
    # the driver-side bucket twin must agree with the JVM expression for
    # every token it will ever prune on — divergence silently reads the
    # WRONG partition and returns an empty (not wrong-valued) result
    from fresco_hpc_spark.functions.dedup import _h60
    from fresco_hpc_spark.functions.search import _SALT, _py_bucket

    toks = ["cat", "the", "fast", "table", "naïve", "域", "x" * 100]
    df = spark.createDataFrame([(t,) for t in toks], ["token"])
    jvm = {
        r["token"]: r["b"]
        for r in df.select(
            "token",
            F.pmod(
                _h60(F.concat(F.lit(_SALT), F.col("token"))), F.lit(32)
            ).alias("b"),
        ).collect()
    }
    for t in toks:
        assert _py_bucket(t, 32) == jvm[t], t


def test_nucleus_and_divergence_keep_null_groups(spark):
    # the recurring null-group bug class (ADVICE r6/r7): a NULL group
    # must form its own group, never silently vanish through a totals
    # join — both operators compute totals as partition windows
    from fresco_hpc_spark.functions import source_token_divergence
    from fresco_hpc_spark.operators import nucleus_top_p

    df = spark.createDataFrame(
        [(None, "a"), (None, "a"), (None, "b"), ("g", "c")],
        ["grp", "cat"],
    )
    out = nucleus_top_p(df, "grp", "cat", p=0.6).collect()
    null_rows = [r for r in out if r["grp"] is None]
    assert [(r["cat"], r["cnt"]) for r in null_rows] == [("a", 2)]

    docs = spark.createDataFrame(
        [(None, "x x"), ("s", "y y")], ["source", "text"]
    )
    kl = {r["source"]: r["kl_divergence"]
          for r in source_token_divergence(docs).collect()}
    assert None in kl and "s" in kl
    import math

    assert kl[None] == pytest.approx(math.log(2), abs=1e-6)


def test_cluster_hub_resolution_picks_central_member(spark):
    # a 4-leaf star plus an isolated pair: the star's hub (everything
    # points at it after symmetrization... by pagerank) must be chosen,
    # while the pair resolves by the doc-id tie-break (symmetric 2-node
    # graph: identical integer ranks by construction)
    from pyspark.sql import Window

    from fresco_hpc_spark.functions import dup_clusters
    from fresco_hpc_spark.operators import pagerank_fixed_point
    from pyspark.sql import functions as SF

    pairs = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 10), (20, 21)],
        ["doc_a", "doc_b"],
    )
    adj = pairs.select(
        SF.col("doc_a").alias("src"), SF.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(SF.col("doc_b").alias("src"), SF.col("doc_a").alias("dst"))
    )
    verts = adj.select(SF.col("src").alias("id")).distinct()
    pr = pagerank_fixed_point(adj, verts)
    clusters = dup_clusters(pairs)
    joined = clusters.join(pr, clusters["doc"] == pr["id"]).drop("id")
    w = Window.partitionBy("cluster_id").orderBy(
        SF.desc("pagerank"), SF.asc("doc")
    )
    hubs = {
        r["cluster_id"]: r["doc"]
        for r in joined.withColumn("rn", SF.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert hubs[1] == 10   # the star's center, not min-id 1
    assert hubs[20] == 20  # symmetric pair: tie broken by id


def test_triangle_enumerate_known_graphs(spark):
    from fresco_hpc_spark.operators import triangle_enumerate

    # K4: 4 triangles; plus noise (self-loop, duplicate/reversed edges)
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    noisy = k4 + [(1, 1), (2, 1), (3, 1)]
    df = spark.createDataFrame(noisy, ["src", "dst"])
    tris = [tuple(r) for r in triangle_enumerate(df).collect()]
    assert tris == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]
    # a path has no triangles
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    assert triangle_enumerate(path).count() == 0


def test_sorted_neighborhood_exact_ordinals_across_tiny_partitions(spark):
    # the hard case for distributed SNM: more range partitions than
    # names, so neighbor chains SPAN partitions — the ordinal+gap
    # equi-join must still find exactly the sorted-order pairs
    from fresco_hpc_spark.operators import sorted_neighborhood_pairs

    names = ["delta", "alpha", "echo", "bravo", "golf", "charlie", "foxtrot"]
    df = spark.createDataFrame([(n,) for n in names], ["name"]).repartition(5)
    out = sorted_neighborhood_pairs(df, "name", window=3).collect()
    got = {(r["name_a"], r["name_b"], r["gap"]) for r in out}
    s = sorted(names)
    want = {
        (s[i], s[i + g], g)
        for i in range(len(s))
        for g in range(1, 4)
        if i + g < len(s)
    }
    assert got == want
    # dist column is the true edit distance
    for r in out:
        if (r["name_a"], r["name_b"]) == ("alpha", "bravo"):
            assert r["dist"] == 5


def test_sorted_neighborhood_guards(spark):
    from fresco_hpc_spark.operators import sorted_neighborhood_pairs

    df = spark.createDataFrame([("x",)], ["name"])
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "name", window=0)


def test_collocation_pmi_hand_computed(spark):
    import math

    from fresco_hpc_spark.functions import collocation_pmi

    # "a b" always adjacent; "x"/"y" never co-occur within the window
    df = spark.createDataFrame(
        [(1, "a b x"), (2, "a b y"), (3, "a b x"), (4, "a b y")],
        ["doc_id", "text"],
    )
    out = collocation_pmi(df, max_gap=1, min_count=2, top_n=10).collect()
    rows = {(r["tok_a"], r["tok_b"]): r for r in out}
    # N=12 tokens; adjacent-pair stream M=8; c_ab(a,b)=4, c_a=c_b=4
    r = rows[("a", "b")]
    assert (r["c_ab"], r["c_a"], r["c_b"]) == (4, 4, 4)
    want = round(math.log((4 * 12 * 12) / (8 * 4 * 4)), 6)
    assert r["pmi"] == want
    # "b x" occurs twice (docs 1 and 3): kept, with its own exact counts
    assert (rows[("b", "x")]["c_ab"], rows[("b", "x")]["c_b"]) == (2, 2)
    # "x" and "y" never co-occur within the window at any count
    assert ("x", "y") not in rows and ("y", "x") not in rows
    # PMI ties break on (tok_a, tok_b): "a b" leads
    assert out[0]["tok_a"] == "a" and out[0]["tok_b"] == "b"


def test_collocation_pmi_guards(spark):
    from fresco_hpc_spark.functions import collocation_pmi

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        collocation_pmi(df, max_gap=0)
    with pytest.raises(ValueError):
        collocation_pmi(df, min_count=0)


def test_source_overlap_matrix_hand_computed(spark):
    from fresco_hpc_spark.functions import source_overlap_matrix

    df = spark.createDataFrame(
        [
            ("s1", "a b c d"),     # shingles: {a b c, b c d}
            ("s2", "a b c x"),     # {a b c, b c x} -> shares 1 with s1
            ("s3", "p q r s"),     # disjoint
            (None, "a b c d"),     # NULL source excluded
        ],
        ["source", "text"],
    )
    rows = {(r["source_a"], r["source_b"]): r
            for r in source_overlap_matrix(df, n=3).collect()}
    # complete matrix over non-null sources: C(3,2) pairs, zeros included
    assert set(rows) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r12 = rows[("s1", "s2")]
    assert (r12["n_a"], r12["n_b"], r12["n_shared"]) == (2, 2, 1)
    assert r12["jaccard"] == pytest.approx(1 / 3, abs=1e-6)
    assert rows[("s1", "s3")]["n_shared"] == 0
    assert rows[("s1", "s3")]["jaccard"] == 0.0
    with pytest.raises(ValueError):
        source_overlap_matrix(df, n=0)


def test_local_clustering_known_graphs(spark):
    from fresco_hpc_spark.operators import local_clustering_coefficient

    # K4: every vertex has degree 3 and sits in 3 triangles -> c = 1
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b],
        ["src", "dst"],
    )
    out = {r["id"]: r for r in local_clustering_coefficient(k4).collect()}
    assert all(
        (out[v]["degree"], out[v]["n_triangles"], out[v]["clustering"])
        == (3, 3, 1.0)
        for v in range(4)
    )
    # path 1-2-3: middle vertex degree 2 but no triangle -> 0; leaves
    # have degree 1 -> 0 by convention
    path = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    outp = {r["id"]: r["clustering"]
            for r in local_clustering_coefficient(path).collect()}
    assert outp == {1: 0.0, 2: 0.0, 3: 0.0}


def test_fk_audit_counts_orphans_and_nulls(spark):
    from fresco_hpc_spark.operators import fk_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, 98), (5, None)], ["id", "fk"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    rows = fk_audit([("child->parent", child, "fk", parent, "pk")]).collect()
    r = rows[0]
    assert r["relationship"] == "child->parent"
    assert (r["n_rows"], r["n_null_fk"], r["n_orphans"], r["n_missing_keys"]) \
        == (5, 1, 2, 2)
    assert r["orphan_rate"] == 0.4
    with pytest.raises(ValueError):
        fk_audit([])


def test_transition_matrix_counts_and_null_states(spark):
    from datetime import datetime

    from fresco_hpc_spark.operators import transition_matrix

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    df = spark.createDataFrame(
        [
            (1, t(1), "a", 1),
            (1, t(2), "b", 2),   # a -> b
            (1, t(3), "a", 3),   # b -> a
            (1, t(4), None, 4),  # a -> NULL (null is a real state)
            (1, t(5), "a", 5),   # NULL -> a
            (2, t(1), "b", 6),   # first event per key: no transition
            (2, t(2), "a", 7),   # b -> a
        ],
        "k int, ts timestamp, s string, eid int",
    )
    rows = transition_matrix(df, "k", "s", time_col="ts", tie_cols=["eid"])
    got = {(r["prev_state"], r["state"]): (r["n"], r["prob"])
           for r in rows.collect()}
    assert got[("a", "b")] == (1, 0.5)
    assert got[("a", None)] == (1, 0.5)
    assert got[("b", "a")] == (2, 1.0)
    assert got[(None, "a")] == (1, 1.0)  # null prev normalizes correctly
    assert len(got) == 4


def test_ks_vs_rest_hand_computed(spark):
    from fresco_hpc_spark.operators.percentiles import ks_vs_rest

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)], ["g", "v"]
    )
    out = {r["g"]: r for r in ks_vs_rest(df, "g", "v").collect()}
    # disjoint supports: D = 1 for both, attained first at v = 2
    assert out["a"]["ks_d"] == 1.0 and out["a"]["ks_at"] == 2.0
    assert out["b"]["ks_d"] == 1.0 and out["b"]["ks_at"] == 2.0
    assert out["a"]["n_group"] == 2

    # identical distributions: D = 0
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)], ["g", "v"]
    )
    out2 = {r["g"]: r["ks_d"] for r in ks_vs_rest(same, "g", "v").collect()}
    assert out2 == {"a": 0.0, "b": 0.0}

    # a group that IS the corpus has no rest-sample: NULL statistic
    solo = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["g", "v"])
    rows = ks_vs_rest(solo, "g", "v").collect()
    assert len(rows) == 1 and rows[0]["ks_d"] is None
    assert rows[0]["n_group"] == 2


def test_ks_quantized_bound_holds_and_never_overshoots(spark):
    """The r8 bounded-grid KS contract: for every group,
    0 ≤ D_exact − D̂ ≤ ks_err_bound — D̂ never overshoots (every probe
    is a real evaluation point) and underestimates by at most
    (n/n_rest)·(1/bins + 1/n_group). Data is adversarial on purpose:
    a NULL group, wildly unequal group sizes, heavy ties, and enough
    distinct values to span several range partitions at the test
    session's shuffle_partitions=4 (the r8 ReuseExchange regression
    only manifested once probe offsets crossed partition boundaries)."""
    import random

    from fresco_hpc_spark.operators.percentiles import (
        ks_vs_rest,
        ks_vs_rest_quantized,
    )

    rng = random.Random(8)
    rows = []
    rows += [("big_a", rng.gauss(50.0, 10.0)) for _ in range(900)]
    rows += [("big_b", rng.gauss(55.0, 12.0)) for _ in range(700)]
    rows += [("ties", float(rng.choice([40, 50, 60]))) for _ in range(300)]
    rows += [(None, rng.uniform(0.0, 100.0)) for _ in range(150)]
    rows += [("tiny", 52.25) for _ in range(12)]
    df = spark.createDataFrame(rows, "g string, v double")
    for bins in (4, 16):
        exact = {r["g"]: r for r in ks_vs_rest(df, "g", "v", round_to=9).collect()}
        quant = {
            r["g"]: r
            for r in ks_vs_rest_quantized(
                df, "g", "v", bins=bins, round_to=9
            ).collect()
        }
        assert set(exact) == set(quant)
        for g, e in exact.items():
            q = quant[g]
            assert q["n_group"] == e["n_group"]
            gap = e["ks_d"] - q["ks_d"]
            assert -2e-9 <= gap <= q["ks_err_bound"] + 2e-9, (g, bins, gap, q)


def test_ks_quantized_small_concentrated_group_is_detected(spark):
    """The counterexample that rules out a pooled-only grid: a small
    group concentrated at ONE value strictly inside a quiet pooled
    region. The per-group equi-depth edges include that value (every
    group quantile equals it), so D̂ captures the drift that pooled
    edges alone would miss entirely."""
    from fresco_hpc_spark.operators.percentiles import (
        ks_vs_rest,
        ks_vs_rest_quantized,
    )

    rows = [("rest", 1.0)] * 250 + [("rest", 3.0)] * 650 + [("g", 2.0)] * 100
    df = spark.createDataFrame(rows, "g string, v double")
    exact = {r["g"]: r for r in ks_vs_rest(df, "g", "v", round_to=9).collect()}
    quant = {
        r["g"]: r
        for r in ks_vs_rest_quantized(df, "g", "v", bins=4, round_to=9).collect()
    }
    # exact: F_g(2) = 1 vs F_rest(2) = 250/900
    assert abs(exact["g"]["ks_d"] - (1.0 - 250.0 / 900.0)) < 1e-9
    # the group's own edges all equal 2.0, so the quantized statistic is
    # EXACT here — while every pooled bins=4 edge is 1.75/3.0-ish and a
    # pooled-only grid would have reported ~0.28 at best
    assert abs(quant["g"]["ks_d"] - exact["g"]["ks_d"]) < 1e-9
    assert quant["g"]["ks_at"] == 2.0


def test_ks_vs_reference_hand_computed(spark):
    """One-sample quantized KS closed forms: a group identical to the
    reference grid scores ~0 at every edge; a group entirely above the
    reference max has F_g = 0 at every edge, so D̂ = max_j |0 − j/B| = 1
    at the last edge; values tied with an edge count toward that edge
    (strictly-below binning); a group BELOW every edge has F_g = 1
    throughout, max gap at the FIRST edge (min-edge tie-break is what
    makes it the first)."""
    from fresco_hpc_spark.operators.percentiles import ks_vs_reference

    edges = [10.0, 20.0, 30.0, 40.0]  # implied ref CDF: .25 .5 .75 1
    rows = (
        [("match", v) for v in (10.0, 20.0, 30.0, 40.0)]
        + [("above", 50.0), ("above", 60.0)]
        + [("below", 1.0), ("below", 2.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in ks_vs_reference(df, "g", "v", edges).collect()}
    assert out["match"]["ks_d"] == 0.0
    assert out["above"]["ks_d"] == 1.0 and out["above"]["ks_at"] == 40.0
    # below: |1 - j/4| max at j=1 -> 0.75, at edge 10.0
    assert out["below"]["ks_d"] == 0.75 and out["below"]["ks_at"] == 10.0
    assert out["below"]["n_group"] == 2


def test_quantile_normalize_contracts(spark):
    """The calibration transform's closed forms: (a) normalizing a
    group ONTO ITS OWN exact quantile edges is (approximately) the
    identity at every point — exactly at the edges; (b) the output is
    monotone in the input within a group; (c) the group max always
    maps to the reference max (p = 1); (d) ties collapse to one output
    row sharing one p."""
    from fresco_hpc_spark.operators.percentiles import (
        distributed_exact_percentiles,
        quantile_normalize,
    )

    vals = [float(v) for v in range(1, 33)]  # 1..32: i/16 quantiles exact
    df = spark.createDataFrame(
        [("g", v) for v in vals] + [("g", 32.0)], "g string, v double"
    )  # duplicate max: a tie
    edges = distributed_exact_percentiles(df, "v", [i / 16 for i in range(17)])
    out = quantile_normalize(df, ["g"], "v", edges).collect()
    by_v = {r["v"]: r["value_norm"] for r in out}
    assert len(out) == 32  # tie collapsed
    assert by_v[32.0] == 32.0  # p = 1 -> reference max
    # self-normalization ~identity: every point within one inter-edge gap
    assert all(abs(by_v[v] - v) <= 2.0 + 1e-9 for v in vals)
    # exact identity where the cume fraction hits an edge fraction
    norm_sorted = [by_v[v] for v in sorted(by_v)]
    assert norm_sorted == sorted(norm_sorted)  # monotone

    # shifted group onto a [0,16] uniform reference: min->~0 bucket,
    # max->16 exactly
    ref = [float(i) for i in range(17)]
    df2 = spark.createDataFrame(
        [("a", 100.0 + i) for i in range(8)], "g string, v double"
    )
    out2 = {r["v"]: r["value_norm"] for r in quantile_normalize(
        df2, ["g"], "v", ref
    ).collect()}
    assert out2[107.0] == 16.0
    assert out2[100.0] == 2.0  # p = 1/8 -> Q(0.125) = 2.0 on uniform ref


def test_ks_quantized_solo_group_and_empty(spark):
    from fresco_hpc_spark.operators.percentiles import ks_vs_rest_quantized

    solo = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    rows = ks_vs_rest_quantized(solo, "g", "v", bins=8).collect()
    assert len(rows) == 1
    assert rows[0]["ks_d"] is None and rows[0]["ks_err_bound"] is None
    assert rows[0]["n_group"] == 2

    empty = spark.createDataFrame(
        [("a", None)], "g string, v double"
    ).filter("v IS NOT NULL")
    out = ks_vs_rest_quantized(empty, "g", "v", bins=8)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "g", "n_group", "ks_d", "ks_at", "ks_err_bound",
    ]


def test_seasonal_profile_flags_slot_anomalies(spark):
    from datetime import datetime

    from fresco_hpc_spark.operators import seasonal_profile

    # hour 0: 15-point tight cluster around 10 plus one wild outlier —
    # the slot must be large enough that the outlier cannot mask
    # itself (a single outlier among n points caps its own z at
    # (n−1)/√n, so |z| > 3 needs n ≥ 11); hour 1: constant (zero
    # variance -> NULL std, zero anomalies by contract)
    rows = [
        (datetime(2024, 1, d, 0), 10.0 + (d % 5) * 0.01) for d in range(1, 16)
    ] + [(datetime(2024, 1, 16, 0), 1000.0)]
    rows += [(datetime(2024, 1, d, 1), 5.0) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["hour_of_day"]: r for r in seasonal_profile(df, "value").collect()}
    assert out[0]["n"] == 16 and out[0]["n_anomalies"] == 1
    assert out[0]["anomaly_rate"] == 0.0625
    assert out[1]["n"] == 5 and out[1]["std_value"] is None
    assert out[1]["n_anomalies"] == 0


def test_phrase_search_table_resolves_bucket_count(spark):
    from fresco_hpc_spark.functions import (
        build_text_index,
        phrase_search_index,
        phrase_search_table,
    )

    docs = spark.createDataFrame([(1, "x y z"), (2, "y z w")], ["doc_id", "text"])
    build_text_index(docs, "t_props_idx", n_buckets=5)
    # catalog-resolved search needs no bucket count and finds matches
    out = phrase_search_table(spark, "t_props_idx", "y z").collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    # the footgun the property closes: a mismatched count prunes the
    # wrong partition and silently returns empty
    wrong = phrase_search_index(
        spark.table("t_props_idx"), "y z", n_buckets=32
    ).count()
    assert wrong == 0
    # a table without the property is rejected, not silently searched
    spark.sql("CREATE TABLE t_noprops AS SELECT * FROM t_props_idx")
    import pytest as _pt

    with _pt.raises(ValueError):
        phrase_search_table(spark, "t_noprops", "y z")
    spark.sql("DROP TABLE IF EXISTS t_props_idx")
    spark.sql("DROP TABLE IF EXISTS t_noprops")


def test_ensure_text_index_skips_fresh_rebuilds_stale(spark):
    """The r8 build/query split contract: ensure_text_index is a no-op
    when the stored fingerprint matches (phrase queries stop paying the
    one-time build), rebuilds when the corpus fingerprint changes
    (regenerated data at the same path must not serve stale postings),
    and rebuilds when the requested bucket count differs (the stored
    parameter is part of the index identity)."""
    from fresco_hpc_spark.functions import ensure_text_index, phrase_search_table

    docs_v1 = spark.createDataFrame(
        [(1, "old corpus text"), (2, "more old text")], ["doc_id", "text"]
    )
    assert ensure_text_index(docs_v1, "t_ensure_idx", n_buckets=5, fingerprint="v1")
    assert not ensure_text_index(
        docs_v1, "t_ensure_idx", n_buckets=5, fingerprint="v1"
    )
    # stale fingerprint: rebuilt from the NEW corpus, old postings gone
    docs_v2 = spark.createDataFrame(
        [(1, "fresh corpus text"), (2, "more fresh text")], ["doc_id", "text"]
    )
    assert ensure_text_index(docs_v2, "t_ensure_idx", n_buckets=5, fingerprint="v2")
    assert phrase_search_table(spark, "t_ensure_idx", "old").count() == 0
    assert phrase_search_table(spark, "t_ensure_idx", "fresh").count() == 2
    # same fingerprint, different bucket count: parameter mismatch rebuilds
    assert ensure_text_index(docs_v2, "t_ensure_idx", n_buckets=7, fingerprint="v2")
    assert phrase_search_table(spark, "t_ensure_idx", "fresh").count() == 2
    # fingerprint=None keeps the unconditional-rebuild behavior
    assert ensure_text_index(docs_v2, "t_ensure_idx", n_buckets=7, fingerprint=None)
    # ADVICE r8: fingerprints with quotes/backslashes must still match
    # their stored form on the second call (the old code stored a
    # sanitized variant but compared raw, so these rebuilt every time)
    gnarly = "path='/x/y'\\z + 42 rows"
    assert ensure_text_index(docs_v2, "t_ensure_idx", n_buckets=7, fingerprint=gnarly)
    assert not ensure_text_index(
        docs_v2, "t_ensure_idx", n_buckets=7, fingerprint=gnarly
    )
    spark.sql("DROP TABLE IF EXISTS t_ensure_idx")


def test_ensure_text_index_heals_missing_bm25_sidecar(spark):
    """ADVICE r10: an index stamped canonical by pre-BM25 code (no
    fresco.n_docs / fresco.total_len props, no _docstats sidecar) must
    read as STALE — otherwise it is 'fresh' forever on fingerprint match
    alone and bm25_search_table hard-fails with ValueError instead of
    self-healing like the raw-vs-sha256 fingerprint upgrade did."""
    from fresco_hpc_spark.functions import bm25_search_table, ensure_text_index

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        ["doc_id", "text"],
    )
    assert ensure_text_index(docs, "t_heal_idx", n_buckets=5, fingerprint="v1")
    # simulate the pre-r10 on-disk state: strip the doc-stats props and
    # drop the sidecar, keeping the (matching) fingerprint stamp
    spark.sql(
        "ALTER TABLE t_heal_idx UNSET TBLPROPERTIES "
        "('fresco.n_docs', 'fresco.total_len')"
    )
    spark.sql("DROP TABLE IF EXISTS t_heal_idx_docstats")
    # fingerprint still matches — but the index must rebuild anyway…
    assert ensure_text_index(docs, "t_heal_idx", n_buckets=5, fingerprint="v1")
    # …after which bm25 works and a further call is a pure no-op
    assert bm25_search_table(spark, "t_heal_idx", "beta", top_k=5).count() == 2
    assert not ensure_text_index(
        docs, "t_heal_idx", n_buckets=5, fingerprint="v1"
    )
    # dropping ONLY the sidecar table (props intact) also heals
    spark.sql("DROP TABLE IF EXISTS t_heal_idx_docstats")
    assert ensure_text_index(docs, "t_heal_idx", n_buckets=5, fingerprint="v1")
    assert bm25_search_table(spark, "t_heal_idx", "beta", top_k=5).count() == 2
    spark.sql("DROP TABLE IF EXISTS t_heal_idx")
    spark.sql("DROP TABLE IF EXISTS t_heal_idx_docstats")


def test_index_build_query_stamp_contract(spark):
    """Cross-contract pin (VERDICT r9 item 2): the registered build
    exhibit (q_index_build_text) must stamp the SAME canonical
    fingerprint form ensure_text_index compares, so the registered
    phrase query that follows it in suite order is a pure query — no
    silent rebuild. The r9 regression was exactly this one call site:
    the exhibit stamped the raw fingerprint string while ensure()
    compared sha256(raw), so phrase_search re-tokenized the corpus on
    every invocation (0.42 s → 1.40 s in BENCH_r09)."""
    import __spark_entry__ as entry
    from fresco_hpc_spark.functions import (
        canonical_fingerprint,
        ensure_text_index,
    )
    from tests.conftest import SF_SMALL as sf_dir

    entry.q_index_build_text(spark, sf_dir).collect()
    docs = entry.table(spark, sf_dir, "documents")
    fp = entry._docs_fingerprint(docs, sf_dir)
    # the stored property IS the canonical form…
    props = {
        r["key"]: r["value"]
        for r in spark.sql("SHOW TBLPROPERTIES entry_text_index").collect()
    }
    assert props["fresco.fingerprint"] == canonical_fingerprint(fp)
    # …so ensure() with the same raw fingerprint is a no-op
    assert not ensure_text_index(
        docs, "entry_text_index", n_buckets=32, fingerprint=fp
    )
    spark.sql("DROP TABLE IF EXISTS entry_text_index")


def test_name_resolution_unions_both_generators(spark):
    # "rwd cat" has a typo IN the blocking key: first-token blocking
    # can never pair it, but it sorts adjacent to "red cat" — the union
    # of the two generators is what resolves the full chain
    # red bat — red cat — rwd cat into one cluster.
    from fresco_hpc_spark.functions import dup_clusters
    from fresco_hpc_spark.operators import (
        fuzzy_match_names,
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [("red bat",), ("red cat",), ("rwd cat",), ("zebra zone",)],
        ["p_name"],
    )
    blocked = fuzzy_match_names(df, "p_name", max_dist=4).select(
        "name_a", "name_b"
    )
    snm = (
        sorted_neighborhood_pairs(df, "p_name", window=3)
        .filter(F.col("dist") <= 4)
        .select("name_a", "name_b")
    )
    bset = {tuple(r) for r in blocked.collect()}
    sset = {tuple(r) for r in snm.collect()}
    assert ("red cat", "rwd cat") not in bset  # blocking blind spot
    assert ("red cat", "rwd cat") in sset      # SNM catches it
    pairs = (
        blocked.unionByName(snm).distinct()
        .selectExpr("name_a AS doc_a", "name_b AS doc_b")
    )
    clusters = {
        r["doc"]: r["cluster_id"] for r in dup_clusters(pairs).collect()
    }
    assert clusters["red bat"] == clusters["red cat"] == clusters["rwd cat"] \
        == "red bat"
    assert "zebra zone" not in clusters  # singleton: resolves to itself


def test_weighted_pagerank_follows_weight_mass(spark):
    from fresco_hpc_spark.operators import pagerank_fixed_point

    # vertex 1 splits rank between 2 (weight 0.9) and 3 (weight 0.1);
    # unweighted would split evenly — the weighted ranks must order
    # 2 > 3, and negative-weight edges contribute nothing
    e = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.1), (2, 1, 1.0), (3, 1, 1.0),
         (1, 4, -0.5)],  # negative: clamped to zero, never flows
        ["src", "dst", "w"],
    )
    v = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], ["id"])
    pr = {
        r["id"]: r["pagerank"]
        for r in pagerank_fixed_point(e, v, weight_col="w").collect()
    }
    assert pr[2] > pr[3]
    # 4's only in-edge is negative-weight: base rank only, like a
    # vertex with no in-edges at all
    base_only = pagerank_fixed_point(
        spark.createDataFrame([(1, 2, 1.0)], ["src", "dst", "w"]),
        v, weight_col="w",
    ).collect()
    base4 = {r["id"]: r["pagerank"] for r in base_only}[4]
    assert pr[4] == base4
    # equal weights reproduce the unweighted recurrence exactly
    eq = spark.createDataFrame(
        [(1, 2, 0.5), (1, 3, 0.5), (2, 3, 0.5)], ["src", "dst", "w"]
    )
    vv = spark.createDataFrame([(i,) for i in (1, 2, 3)], ["id"])
    weighted = sorted(
        map(tuple, pagerank_fixed_point(eq, vv, weight_col="w").collect())
    )
    unweighted = sorted(
        map(tuple, pagerank_fixed_point(eq.drop("w"), vv).collect())
    )
    assert weighted == unweighted


def test_ks_vs_rest_null_group_is_real(spark):
    # a NULL group must get a real KS statistic against the rest, not
    # fall through a null-dropping join to the NULL-statistic branch
    from fresco_hpc_spark.operators.percentiles import ks_vs_rest

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("b", 3.0), ("b", 4.0)], ["g", "v"]
    )
    out = {r["g"]: r for r in ks_vs_rest(df, "g", "v").collect()}
    assert out[None]["ks_d"] == 1.0 and out[None]["ks_at"] == 2.0
    assert out["b"]["ks_d"] == 1.0


def _lpa_reference(edges, verts, rounds):
    """Tiny driver-side synchronous LPA — the semantics contract the
    distributed operator must reproduce exactly."""
    nbrs: dict[int, list[int]] = {v: [] for v in verts}
    for s, d in edges:
        if s != d:
            nbrs[s].append(d)
            nbrs[d].append(s)
    labels = {v: v for v in verts}
    for _ in range(rounds):
        nxt = {}
        for v in verts:
            counts: dict[int, int] = {}
            for n in set(nbrs[v]):
                lab = labels[n]
                counts[lab] = counts.get(lab, 0) + 1
            if counts:
                best = max(counts.values())
                nxt[v] = min(l for l, c in counts.items() if c == best)
            else:
                nxt[v] = v
        labels = nxt
    return labels


def test_label_propagation_matches_reference(spark):
    """Two cliques joined by a bridge plus an isolated vertex: the
    distributed synchronous LPA must equal a driver-side reference
    round for round (min-label tie-break, isolated keeps own label),
    and be partition-invariant."""
    from fresco_hpc_spark.operators.graph import label_propagation

    cliq_a = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    cliq_b = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    edges = cliq_a + cliq_b + [(4, 10)]
    verts = [1, 2, 3, 4, 10, 11, 12, 13, 99]

    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    v = spark.createDataFrame([(x,) for x in verts], "id bigint")
    for rounds in (1, 3):
        got = {
            r.id: r.community
            for r in label_propagation(e, v, rounds=rounds).collect()
        }
        want = _lpa_reference(edges, verts, rounds)
        assert got == want, (rounds, got, want)
    # partition invariance: same labeling under a different layout
    got8 = {
        r.id: r.community
        for r in label_propagation(e.repartition(8), v.repartition(3), rounds=3).collect()
    }
    assert got8 == _lpa_reference(edges, verts, 3)
    # cliques resolve to their min id; the isolate keeps its own label
    assert got8[99] == 99
    assert len({got8[x] for x in (1, 2, 3)}) == 1

    with pytest.raises(ValueError, match="rounds"):
        label_propagation(e, v, rounds=0)
