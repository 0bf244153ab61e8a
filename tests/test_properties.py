"""Property-based invariants (hypothesis) for the operator library.

Each property is an algebraic fact that must hold for ANY input, not just
the testdata: histogram counts partition the rows, top-N preserves mass,
dedup group sizes sum to the corpus, pivot∘unpivot is identity.
Examples are kept small — every example is a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fresco_hpc_spark import operators as ops
from fresco_hpc_spark.functions import exact_dedup

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# allow_subnormal=False: interpolating between 0.0 and a subnormal (e.g.
# 5e-324) lands on a halfway point below the subnormal granularity, where
# numpy and the JVM legitimately round to different neighbors — an IEEE
# edge with no correct answer, not an engine discrepancy (hypothesis
# found vals=[0.0×5, 1.0, 5e-324] flipping a percentile bound by 1 ulp)
finite_doubles = st.floats(
    min_value=-1e6,
    max_value=1e6,
    allow_nan=False,
    allow_infinity=False,
    allow_subnormal=False,
)


@given(vals=st.lists(finite_doubles, min_size=1, max_size=60))
@_settings
def test_histogram_counts_partition_rows(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    rows = ops.histogram_bin_index(df, "x", bins=7).collect()
    assert sum(r["count"] for r in rows) == len(vals)
    assert all(0 <= r.bin_index <= 6 for r in rows)


@given(
    cats=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=1,
        max_size=80,
    ),
    n=st.integers(min_value=1, max_value=5),
)
@_settings
def test_topn_others_preserves_mass(spark, cats, n):
    df = spark.createDataFrame([(c,) for c in cats], "cat string")
    rows = ops.topn_others(df, "cat", n=n).collect()
    assert sum(r["count"] for r in rows) == len(cats)
    names = [r.category for r in rows]
    assert len(names) == len(set(names))
    assert len([x for x in names if x != "Others"]) <= n
    if "Others" in names:  # Others sorts last (O2)
        assert names[-1] == "Others"


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab \t"), min_size=0, max_size=20
        ),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_exact_dedup_group_sizes_sum_to_corpus(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = exact_dedup(df).collect()
    assert sum(r.n_copies for r in rows) == len(texts)
    # canonical ids are distinct document ids
    ids = [r.canonical_id for r in rows]
    assert len(ids) == len(set(ids))


@given(
    vals=st.lists(
        st.tuples(finite_doubles, finite_doubles), min_size=1, max_size=30
    )
)
@_settings
def test_pivot_unpivot_roundtrip(spark, vals):
    wide = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(vals)],
        "id long, m1 double, m2 double",
    )
    long = ops.unpivot_wide_to_long(wide, ["id"], ["m1", "m2"])
    back = ops.pivot_long_to_wide(
        long, ["id"], event_col="Event", value_col="Value", events=["m1", "m2"]
    )
    assert back.count() == wide.count()
    assert back.exceptAll(wide).count() == 0


@given(vals=st.lists(finite_doubles, min_size=2, max_size=60))
@_settings
def test_percentile_trim_matches_linear_interpolation(spark, vals):
    # differential: Spark's exact percentile == numpy linear interpolation
    # (PERCENTILE_CONT semantics), and trim keeps exactly the in-bounds rows
    import numpy as np

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    kept = sorted(r.x for r in ops.percentile_trim(df, "x", 0.25, 0.75).collect())
    lo = float(np.percentile(vals, 25, method="linear"))
    hi = float(np.percentile(vals, 75, method="linear"))
    want = sorted(v for v in vals if lo <= v <= hi)
    assert kept == want

@given(
    left=st.lists(
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 3600)),
        min_size=1, max_size=20,
    ),
    right=st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.integers(0, 3600),
            st.integers(0, 100),
        ),
        min_size=0, max_size=20, unique_by=lambda t: (t[0], t[1]),
    ),
)
@_settings
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """Differential oracle for asof_join: pandas merge_asof (backward,
    ties-match) on the same (key, ts) data must produce identical matched
    timestamps and payloads. Right (key, ts) pairs are unique so the
    nearest match is well-defined in both engines."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    ldf = pd.DataFrame(
        {
            "k": [k for k, _ in left],
            "ts": [base + pd.Timedelta(seconds=s) for _, s in left],
        }
    )
    ldf["id"] = range(len(ldf))
    rdf = pd.DataFrame(
        {
            "k": [k for k, _, _ in right],
            "ts": [base + pd.Timedelta(seconds=s) for _, s, _ in right],
            "v": [v for _, _, v in right],
        }
    )

    sl = spark.createDataFrame(ldf[["id", "k", "ts"]])
    if len(rdf):
        sr = spark.createDataFrame(rdf)
    else:
        sr = spark.createDataFrame([], "k string, ts timestamp, v bigint")
    got = {
        r["id"]: r["v"]
        for r in ops.asof_join(sl, sr, on="k", left_ts="ts").collect()
    }

    if len(rdf) == 0:
        assert all(v is None for v in got.values())
        return
    want_df = pd.merge_asof(
        ldf.sort_values("ts", kind="stable"),
        rdf.sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward",
    )
    for _, row in want_df.iterrows():
        wv = None if pd.isna(row["v"]) else int(row["v"])
        assert got[row["id"]] == wv, (row["id"], got[row["id"]], wv)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
def test_codec_roundtrip_arbitrary_images(w, h, data):
    """PNG and BMP encode→decode is the identity for arbitrary pixel
    content and dimensions (including odd widths, where BMP row padding
    bites), and the concatenated-BMP container splits losslessly."""
    from fresco_hpc_spark.functions.codecs import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
        split_bmp_frames,
    )

    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * 3, max_size=w * h * 3,
            )
        )
    )
    assert decode_png(encode_png(w, h, rgb)) == (w, h, rgb)
    bmp = encode_bmp(w, h, rgb)
    assert decode_bmp(bmp) == (w, h, rgb)
    frames = split_bmp_frames(bmp * 3)
    assert len(frames) == 3 and all(f == bmp for f in frames)


@settings(max_examples=40, deadline=None)
@given(
    tokens=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=80
    ),
    chunk=st.integers(min_value=2, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunking_covers_every_token_with_exact_overlap(
    spark, tokens, chunk, overlap_frac
):
    """chunk_documents invariants for arbitrary docs/window shapes:
    concatenating chunks with the overlap removed reproduces the
    document exactly (no token lost or duplicated beyond the declared
    overlap), and every chunk except the last is full."""
    from fresco_hpc_spark.functions import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    text = " ".join(f"t{v}_{i}" for i, v in enumerate(tokens))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_index,
    )
    words = text.split()
    # every chunk sits at its declared stride offset with the exact
    # window content, and together the windows cover every position
    covered = set()
    for r in rows:
        start = r.chunk_index * stride
        assert r.chunk_text.split() == words[start : start + chunk]
        covered.update(range(start, min(start + chunk, len(words))))
    assert covered == set(range(len(words)))
    for r in rows[:-1]:
        assert r.n_tokens == chunk  # only the last chunk may be short


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
            " ".join
        ),
        min_size=2,
        max_size=20,
    ),
    # 0.54 floats above its exact integer product for many sizes — the
    # prefix-length / length-filter 1e-9 slack case (r6 review finding)
    threshold=st.sampled_from([0.4, 0.54, 0.67]),
)
@_settings
def test_prefix_jaccard_equals_plain_on_any_corpus(spark, texts, threshold):
    """Prefix + positional filtering is LOSSLESS for any corpus: the
    PPJoin variant must return exactly the plain self-join's relation.
    Single-letter tokens from a tiny alphabet maximize df collisions and
    tie-heavy rank orders — the hardest case for the pruning bounds."""
    from fresco_hpc_spark.functions import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    plain = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, n=1, threshold=threshold, max_token_freq=10**9
        ).collect()
    }
    pref = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs_prefix(df, n=1, threshold=threshold).collect()
    }
    assert plain == pref


@given(
    vals=st.lists(finite_doubles, min_size=1, max_size=40),
    alpha=st.floats(min_value=0.05, max_value=0.95),
)
@_settings
def test_ewma_matches_python_reference(spark, vals, alpha):
    from datetime import datetime, timedelta

    from fresco_hpc_spark.operators import ewma

    t0 = datetime(2024, 1, 1)
    rows = [("k", t0 + timedelta(seconds=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = [
        r.ewma
        for r in ewma(df, "k", "v", alpha=alpha).orderBy("ts").collect()
    ]
    # HALF_UP at 6 dp, matching Spark's F.round / DuckDB's ROUND —
    # Python's built-in round() is banker's and disagrees on exact .5
    # boundaries (hypothesis found 0.75 * 0.96875 = 0.7265625 exactly)
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    s, exp = None, []
    for v in vals:
        s = v if s is None else alpha * v + (1.0 - alpha) * s
        exp.append(r6(s))
    assert got == exp


@given(w=st.floats(min_value=0.0, max_value=5.0))
@_settings
def test_weighted_repeat_multiplicity_bounds(spark, w):
    """Every row appears either floor(w) or ceil(w) times (exactly w
    when w is integral), and copy indices are dense from 0."""
    import math

    from fresco_hpc_spark.functions import weighted_repeat

    df = spark.createDataFrame(
        [(i,) for i in range(30)], "doc_id bigint"
    )
    out = weighted_repeat(df, "doc_id", w).groupBy("doc_id").count().collect()
    lo, hi = math.floor(w), math.ceil(w)
    counts = {r.doc_id: r["count"] for r in out}
    for n in counts.values():
        assert n in (lo, hi) and n > 0
    # rows with zero copies are absent entirely
    assert len(counts) <= 30


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
            " ".join
        ),
        min_size=2,
        max_size=16,
    ),
    # 0.54 / 0.67 / 0.81 are thresholds whose float product rounds
    # ABOVE the exact integer for many doc sizes (0.54·450 →
    # 243.000…03) — the case the prefix-length 1e-9 slack exists for
    threshold=st.sampled_from([0.5, 0.54, 0.67, 0.7, 0.81, 0.9]),
)
@_settings
def test_prefix_containment_equals_plain_on_any_corpus(spark, texts, threshold):
    """The ASYMMETRIC prefix filter is lossless for any corpus and any
    threshold: the prefix variant must return exactly the uncapped plain
    self-join's relation. Single-letter tokens from a tiny alphabet
    maximize df collisions and equal-size ties — the hardest case for
    the smaller-side ordering and the positional bound."""
    from fresco_hpc_spark.functions import (
        ngram_containment_pairs,
        ngram_containment_pairs_prefix,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    plain = {
        (r.doc_a, r.doc_b): (r.n_common, r.containment_a, r.containment_b)
        for r in ngram_containment_pairs(
            df, n=1, threshold=threshold, max_token_freq=10**9
        ).collect()
    }
    pref = {
        (r.doc_a, r.doc_b): (r.n_common, r.containment_a, r.containment_b)
        for r in ngram_containment_pairs_prefix(
            df, n=1, threshold=threshold
        ).collect()
    }
    assert plain == pref


@given(
    lens=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
    budget=st.integers(min_value=1, max_value=40),
)
@_settings
def test_pack_texts_offsets_partition_the_bins(spark, lens, budget):
    """For any corpus and budget: every document lands in exactly one
    bin, per-bin offsets are the exclusive prefix sums of member token
    counts (offsets[0] == 0, last offset + last n == bin n_tokens), and
    bin token totals sum to the corpus total."""
    from fresco_hpc_spark.functions import pack_texts

    rows = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(lens)]
    df = (
        spark.createDataFrame(rows, "doc_id bigint, text string")
        .selectExpr("'s' AS source", "doc_id", "text")
    )
    out = pack_texts(df, budget).collect()
    seen_docs = []
    total = 0
    for r in out:
        ids = [int(x) for x in r.doc_ids.split(",")]
        offs = [int(x) for x in r.offsets.split(",")]
        seen_docs += ids
        total += r.n_tokens
        assert r.n_docs == len(ids) == len(offs)
        assert offs[0] == 0
        # offsets are the exclusive running sum of member counts
        member_counts = [lens[i] for i in ids]
        run = 0
        for o, c in zip(offs, member_counts):
            assert o == run
            run += c
        assert run == r.n_tokens
    assert sorted(seen_docs) == list(range(len(lens)))
    assert total == sum(lens)


@given(
    n=st.integers(min_value=1, max_value=6),
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=5),
)
@_settings
def test_cap_per_group_cap_and_determinism(spark, n, sizes):
    """For any group sizes and cap: every group keeps min(size, n) rows,
    ranks are dense from 1, and the output is identical under a
    different input partitioning (selection is content-stable)."""
    from fresco_hpc_spark.functions import cap_per_group

    rows = []
    base = 0
    for g, sz in enumerate(sizes):
        rows += [(f"g{g}", base + i) for i in range(sz)]
        base += 1000
    df = spark.createDataFrame(rows, "source string, doc_id bigint")
    out = sorted(
        (r.source, r.cap_rank, r.doc_id)
        for r in cap_per_group(df, n, prefilter_factor=2).collect()
    )
    re_out = sorted(
        (r.source, r.cap_rank, r.doc_id)
        for r in cap_per_group(df.repartition(7), n, prefilter_factor=2).collect()
    )
    assert out == re_out
    per_group = {}
    for g, rk, _ in out:
        per_group.setdefault(g, []).append(rk)
    for g, sz in enumerate(sizes):
        ranks = per_group[f"g{g}"]
        assert sorted(ranks) == list(range(1, min(sz, n) + 1))


@given(
    vals=st.lists(finite_doubles, min_size=1, max_size=50),
    fracs=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
@_settings
def test_grouped_percentiles_match_global_path(spark, vals, fracs):
    """The r7 grouped distributed order statistics and the r2 global
    driver-side path are two implementations of the same PERCENTILE_CONT
    definition — on a single group they must agree bit-for-bit for ANY
    values (ties, negatives, single element) and ANY fractions
    (including 0.0 and 1.0)."""
    from fresco_hpc_spark.operators import grouped_exact_percentiles
    from fresco_hpc_spark.operators.percentiles import (
        distributed_exact_percentiles,
    )

    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "g string, v double"
    ).repartition(5)
    fracs = sorted(fracs)
    grouped = {
        r.fraction: r.value
        for r in grouped_exact_percentiles(df, ["g"], "v", fracs).collect()
    }
    global_ = dict(zip(fracs, distributed_exact_percentiles(df, "v", fracs)))
    assert set(grouped) == set(global_)
    for f in fracs:
        assert grouped[f] == global_[f], (f, grouped[f], global_[f])


@given(
    n=st.integers(min_value=1, max_value=60),
    k=st.integers(min_value=1, max_value=10),
    parts=st.integers(min_value=1, max_value=7),
)
@_settings
def test_weighted_sample_is_partition_invariant(spark, n, k, parts):
    """The A-Res sample is a pure function of (ids, weights, k) — the
    md5 coin and the order-statistic prefilter make it independent of
    physical partitioning and row order, and its size is exactly
    min(k, n) per group."""
    from fresco_hpc_spark.functions import weighted_sample_k

    rows = [(i, "g%d" % (i % 3), float(1 + (i * 7) % 11)) for i in range(n)]
    df1 = spark.createDataFrame(rows, "id bigint, g string, w double")
    df2 = spark.createDataFrame(list(reversed(rows)), "id bigint, g string, w double").repartition(parts)
    pick = lambda df: sorted(  # noqa: E731
        (r.g, r.id, r.sample_rank)
        for r in weighted_sample_k(
            df, k=k, weight_col="w", id_col="id", group_col="g"
        ).collect()
    )
    s1, s2 = pick(df1), pick(df2)
    assert s1 == s2
    from collections import Counter

    sizes = Counter(g for g, _, _ in s1)
    group_n = Counter(g for _, g, _ in rows)
    for g, gn in group_n.items():
        assert sizes[g] == min(k, gn)


@given(
    vals=st.lists(
        st.one_of(finite_doubles, st.none()), min_size=1, max_size=40
    )
)
@_settings
def test_interpolation_is_bounded_by_neighbors(spark, vals):
    # For ANY series: every interpolated value lies within the closed
    # range of the two observations it is drawn between (convexity of
    # the linear form), healed rows are exactly the null rows, and
    # non-null rows pass through unchanged.
    from datetime import datetime, timedelta

    from fresco_hpc_spark.operators import interpolate_linear

    base = datetime(2024, 1, 1)
    rows = [
        (1, base + timedelta(seconds=13 * i), v, i)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, v double, eid int"
    )
    out = sorted(
        interpolate_linear(
            df, "k", time_col="ts", value_col="v", tie_cols=["eid"]
        ).collect(),
        key=lambda r: r["eid"],
    )
    obs = [(i, v) for i, v in enumerate(vals) if v is not None]
    for r in out:
        i, v = r["eid"], vals[r["eid"]]
        assert r["is_interp"] == (v is None)
        if v is not None:
            assert r["value_interp"] == v
            continue
        prev = [(j, x) for j, x in obs if j < i]
        nxt = [(j, x) for j, x in obs if j > i]
        if not prev and not nxt:
            assert r["value_interp"] is None
        elif not prev:
            assert r["value_interp"] == nxt[0][1]
        elif not nxt:
            assert r["value_interp"] == prev[-1][1]
        else:
            lo = min(prev[-1][1], nxt[0][1])
            hi = max(prev[-1][1], nxt[0][1])
            assert lo - 1e-6 <= r["value_interp"] <= hi + 1e-6


@given(
    states=st.lists(
        st.one_of(st.sampled_from(["a", "b", "c"]), st.none()),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_scd2_episodes_reconstruct_the_log(spark, states):
    # For ANY change log: episodes tile the key's timeline (each
    # valid_to equals the next valid_from), versions are 1..n, exactly
    # one row is current, and replaying "state at time t" through the
    # episodes reproduces the original log's state at every event time.
    from datetime import datetime, timedelta

    from fresco_hpc_spark.operators import scd2_history

    base = datetime(2024, 1, 1)
    rows = [
        (1, base + timedelta(minutes=i), s, i) for i, s in enumerate(states)
    ]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, state string, eid int"
    )
    eps = sorted(
        scd2_history(df, ["k"], "ts", ["state"], tie_cols=["eid"]).collect(),
        key=lambda r: r["version"],
    )
    assert [e["version"] for e in eps] == list(range(1, len(eps) + 1))
    assert sum(e["is_current"] for e in eps) == 1 and eps[-1]["is_current"]
    for a, b in zip(eps, eps[1:]):
        assert a["valid_to"] == b["valid_from"]
    # collapse-correctness: consecutive episodes always differ in state
    for a, b in zip(eps, eps[1:]):
        assert a["state"] != b["state"] or (
            a["state"] is None) != (b["state"] is None)
    # point-in-time replay reproduces the log
    for i, s in enumerate(states):
        t = base + timedelta(minutes=i)
        live = [
            e for e in eps
            if e["valid_from"] <= t and (e["valid_to"] is None or t < e["valid_to"])
        ]
        assert len(live) == 1 and live[0]["state"] == s


@given(
    names=st.lists(
        st.sampled_from(
            ["red cat", "red car", "red bat", "blue cat", "blue cap", "red"]
        ),
        min_size=1,
        max_size=12,
    ),
    t1=st.integers(min_value=0, max_value=2),
)
@_settings
def test_fuzzy_threshold_is_monotone(spark, names, t1):
    # Widening max_dist can only ADD pairs (threshold monotonicity),
    # and every reported distance respects its threshold.
    from fresco_hpc_spark.operators import fuzzy_match_names

    df = spark.createDataFrame([(n,) for n in names], ["name"])
    small = fuzzy_match_names(df, "name", max_dist=t1).collect()
    big = fuzzy_match_names(df, "name", max_dist=t1 + 2).collect()
    small_pairs = {(r["name_a"], r["name_b"]): r["dist"] for r in small}
    big_pairs = {(r["name_a"], r["name_b"]): r["dist"] for r in big}
    assert set(small_pairs) <= set(big_pairs)
    assert all(d <= t1 for d in small_pairs.values())
    for k, d in small_pairs.items():
        assert big_pairs[k] == d  # distance itself is threshold-free


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_triangle_enumeration_matches_brute_force(spark, edges):
    # the degree-ordered orientation must find EXACTLY the brute-force
    # triangle set of the underlying simple undirected graph, each once
    from itertools import combinations

    from fresco_hpc_spark.operators import triangle_enumerate

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = sorted(tuple(r) for r in triangle_enumerate(df).collect())
    und = {frozenset((a, b)) for a, b in edges if a != b}
    verts = sorted({v for e in und for v in e})
    want = sorted(
        (a, b, c)
        for a, b, c in combinations(verts, 3)
        if {frozenset((a, b)), frozenset((a, c)), frozenset((b, c))} <= und
    )
    assert got == want


@given(
    seed=st.integers(min_value=0, max_value=10**6),
    c=st.integers(min_value=2, max_value=9),
)
@_settings
def test_weighted_pagerank_is_weight_scale_invariant(spark, seed, c):
    # Rank splits are RATIOS of weights: scaling every weight by the
    # same constant leaves floor((r·cw)/(cΣw)) = floor((r·w)/Σw)
    # unchanged, PROVIDED quantization stays exact — use weights that
    # are exact multiples of the 1e-6 quantum so round(c·w·1e6) =
    # c·round(w·1e6).
    from fresco_hpc_spark.operators import pagerank_fixed_point

    rnd = seed
    edges = []
    for i in range(12):
        rnd = (rnd * 1103515245 + 12345) % (2**31)
        dst = rnd % 7
        rnd = (rnd * 1103515245 + 12345) % (2**31)
        w = ((rnd % 20) + 1) / 1000.0  # exact at 1e-6 quantum
        edges.append((i % 7, dst, w))
    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    v = spark.createDataFrame([(i,) for i in range(7)], ["id"])
    a = sorted(map(tuple, pagerank_fixed_point(e, v, weight_col="w").collect()))
    e2 = e.withColumn("w", e["w"] * c)
    b = sorted(map(tuple, pagerank_fixed_point(e2, v, weight_col="w").collect()))
    assert a == b


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=1, max_value=4),
)
@_settings
def test_bpe_merges_match_sequential_greedy(spark, texts, k):
    """The distributed BPE loop (shifted self-join pair counts +
    chain-alternation overlap resolution) must reproduce the SEQUENTIAL
    greedy algorithm exactly — same merge pair each step (count DESC,
    a, b tie-break) and same left-to-right non-overlapping application,
    including self-pair chains ('x x x x' merges positions 0 and 2).
    A 4-symbol alphabet forces heavy ties and long self-runs."""
    from fresco_hpc_spark.functions import bpe_merges

    def reference(docs, k, min_count):
        seqs = [d.lower().strip().split() for d in docs]
        merges = []
        for step in range(1, k + 1):
            counts = {}
            for s in seqs:
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + 1
            cand = sorted(
                ((c, a, b) for (a, b), c in counts.items() if c >= min_count),
                key=lambda t: (-t[0], t[1], t[2]),
            )
            if not cand:
                break
            c, a, b = cand[0]
            merges.append((step, a, b, c))
            new_seqs = []
            for s in seqs:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + " " + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                new_seqs.append(out)
            seqs = new_seqs
        return merges

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).repartition(4)
    got = [
        (r["step"], r["unit_a"], r["unit_b"], r["pair_count"])
        for r in bpe_merges(df, k=k, min_count=2).orderBy("step").collect()
    ]
    assert got == reference(texts, k, 2)

    # the APPLY side: bpe_segment's final units per doc must equal the
    # sequential greedy segmentation exactly, in order
    from fresco_hpc_spark.functions import bpe_segment

    def reference_units(docs, k, min_count):
        seqs = [d.lower().strip().split() for d in docs]
        merges = reference(docs, k, min_count)
        for _, a, b, _c in merges:
            new_seqs = []
            for s in seqs:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + " " + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                new_seqs.append(out)
            seqs = new_seqs
        return {i: s for i, s in enumerate(seqs)}

    units = bpe_segment(df, k=k, min_count=2).orderBy("doc_id", "pos").collect()
    per_doc = {}
    for r in units:
        per_doc.setdefault(r["doc_id"], []).append(r["unit"])
    assert per_doc == reference_units(texts, k, 2)


@given(
    vals=st.lists(finite_doubles, min_size=1, max_size=80),
    accuracy=st.sampled_from([10, 100, 10000]),
)
@_settings
def test_approx_percentiles_certificate_vs_exact(spark, vals, accuracy):
    """approx_percentiles_certified must (a) self-certify on any input
    — within_bound true for every fraction, including coarse
    accuracy=10 sketches and heavy-tie inputs — (b) return actual data
    values whose true rank is within the published n/accuracy (+1)
    budget of the target, re-checked here against numpy, and (c) be
    monotone in the fraction."""
    import numpy as np

    from fresco_hpc_spark.operators import approx_percentiles_certified

    fractions = [0.25, 0.5, 0.9]
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(4)
    rows = approx_percentiles_certified(df, "v", fractions, accuracy=accuracy).collect()
    assert [r["fraction"] for r in rows] == fractions
    arr = np.sort(np.array(vals))
    n = len(arr)
    prev = -float("inf")
    for r in rows:
        assert r["within_bound"], r
        assert r["n_values"] == n
        assert r["approx_value"] in vals  # GK returns real data points
        lo = float(np.count_nonzero(arr < r["approx_value"])) + 1
        hi = float(np.count_nonzero(arr <= r["approx_value"]))
        budget = n / accuracy + 1
        assert lo <= r["fraction"] * n + budget
        assert hi >= r["fraction"] * n - budget
        assert r["approx_value"] >= prev
        prev = r["approx_value"]


@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", None]), finite_doubles),
        min_size=1,
        max_size=60,
    ),
    accuracy=st.sampled_from([10, 1000]),
)
@_settings
def test_grouped_approx_percentiles_certificate_per_group(spark, data, accuracy):
    """The grouped sketch certificate must hold PER GROUP — each group
    judged against its own n_g/accuracy budget (never the corpus's) —
    with NULL treated as a real group and returned values drawn from
    that group's own data."""
    import numpy as np

    from fresco_hpc_spark.operators import grouped_approx_percentiles_certified

    fractions = [0.5, 0.9]
    df = spark.createDataFrame(data, "g string, v double").repartition(4)
    rows = grouped_approx_percentiles_certified(
        df, ["g"], "v", fractions, accuracy=accuracy
    ).collect()
    by_group = {}
    for g, v in data:
        by_group.setdefault(g, []).append(v)
    seen = set()
    for r in rows:
        seen.add((r["g"], r["fraction"]))
        vals = np.sort(np.array(by_group[r["g"]]))
        n = len(vals)
        assert r["within_bound"], r
        assert r["n_values"] == n
        assert r["approx_value"] in by_group[r["g"]]
        budget = n / accuracy + 1
        lo = float(np.count_nonzero(vals < r["approx_value"])) + 1
        hi = float(np.count_nonzero(vals <= r["approx_value"]))
        assert lo <= r["fraction"] * n + budget
        assert hi >= r["fraction"] * n - budget
    assert seen == {(g, f) for g in by_group for f in fractions}


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),   # value
            st.floats(min_value=0.001, max_value=50.0,
                      allow_nan=False, allow_infinity=False,
                      allow_subnormal=False),          # fractional weight
        ),
        min_size=1,
        max_size=50,
    ),
    q=st.sampled_from([0.25, 0.5, 0.75, 0.9]),
)
@_settings
def test_weighted_quantile_matches_python_reference(spark, data, q):
    """ADVICE r11 hardening: for ARBITRARY fractional weights the lower
    weighted quantile must equal a driver-side integer replay of the
    micro-quantized fold — the pick is the smallest value whose
    cumulative micro-weight reaches ceil-compared q-mass, regardless of
    accumulation order (the operator quantizes before any sum, so float
    associativity cannot flip a boundary)."""
    from decimal import ROUND_HALF_UP, Decimal

    from fresco_hpc_spark.operators import weighted_quantiles

    df = spark.createDataFrame(
        [("g", float(v), float(w)) for v, w in data],
        "g string, v double, w double",
    )
    out = weighted_quantiles(
        df.repartition(7), "v", "w", "g", qs=(q,)
    ).first()

    # integer replay: per-value micro weights, ordered fold
    acc: dict[float, int] = {}
    for v, w in data:
        micro = int(
            Decimal(repr(w * 1_000_000)).quantize(
                Decimal("1"), ROUND_HALF_UP
            )
        )
        acc[float(v)] = acc.get(float(v), 0) + micro
    total = sum(acc.values())
    q_micro = int(round(q * 1_000_000))
    cum, pick = 0, None
    for v in sorted(acc):
        cum += acc[v]
        if cum * 1_000_000 >= q_micro * total:
            pick = v
            break
    col = f"wq_{int(round(q * 100)):02d}"
    assert out[col] == pick, (data, q, out[col], pick)
    assert abs(out["total_weight"] - total / 1e6) < 1e-6


@given(
    vals=st.lists(finite_doubles, min_size=2, max_size=20),
    seed=st.integers(min_value=1, max_value=10_000),
)
@_settings
def test_rotation_is_an_isometry_and_involutive_on_norms(spark, vals, seed):
    """rr_perm_signs/rotate_vectors: for ANY vector and ANY seed the
    rotated vector is a signed permutation of the input (same component
    multiset up to sign) — the exact-isometry property the OPQ chain
    rests on — and NULL vectors stay NULL."""
    from fresco_hpc_spark.functions import rotate_vectors, rr_perm_signs

    dim = len(vals)
    perm, signs = rr_perm_signs(dim, seed)
    df = spark.createDataFrame(
        [(0, [float(v) for v in vals]), (1, None)],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r.vec_id: r.embedding for r in
            rotate_vectors(df, perm, signs).collect()}
    got = rows[0]
    assert sorted(abs(x) for x in got) == sorted(abs(v) for v in vals)
    assert got == [signs[i] * vals[perm[i]] for i in range(dim)]
    assert rows[1] is None
