"""Tests for the LLM-data-pipeline operators: dedup recall/precision vs
exact Jaccard, SimHash near-dup detection, ANN recall vs brute force."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from fresco_hpc_spark.functions import (
    brute_force_knn,
    lsh_ann_topk,
    minhash_dup_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
    token_count,
)
from fresco_hpc_spark.functions.text import text_stats
from tests.conftest import SF_MED, SF_SMALL


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    return entrymod._docs_with_dups(spark, SF_SMALL).cache()


def test_minhash_finds_true_near_dups(spark, docs_with_dups):
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs_with_dups, n=3, threshold=0.7).collect()
    }
    est = {
        (r.doc_a, r.doc_b)
        for r in minhash_dup_pairs(docs_with_dups, threshold=0.5).collect()
    }
    assert exact, "fixture should contain true near-dup pairs"
    recall = len(exact & est) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.2f} too low"


def test_minhash_estimates_close_to_true_jaccard(spark, docs_with_dups):
    true_j = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs_with_dups, n=3, threshold=0.3).collect()
    }
    est_j = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_dup_pairs(docs_with_dups, threshold=0.3).collect()
    }
    common = set(true_j) & set(est_j)
    assert common
    errs = [abs(true_j[p] - est_j[p]) for p in common]
    assert sum(errs) / len(errs) < 0.15  # 64 hashes → stderr ≈ 1/√64 ≈ 0.125


def test_simhash_finds_exact_dups(spark, docs_with_dups):
    # exact copies have identical simhash (hamming 0) and must all appear
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_dup_pairs(docs_with_dups).collect()
    }
    base_ids = {r.doc_id for r in docs_with_dups.filter("doc_id < 1000000").collect()}
    expected = {(i, i + 1000000) for i in base_ids if i % 10 == 0}
    missing = expected - set(pairs)
    assert not missing, f"simhash missed exact dups: {sorted(missing)[:5]}"
    assert all(pairs[p] == 0 for p in expected)


def test_ann_recall_vs_brute_force(spark):
    """VERDICT r5 item 6: recall@10 >= 0.8 on the sf0.1 embeddings —
    the near-orthogonal worst case for hyperplane LSH (top cosine
    ~0.33) — reached by probing Hamming radius 3 around the query's
    6-plane signature (tuned, deterministic planes)."""
    from fresco_hpc_spark.sources import table

    emb = table(spark, SF_MED, "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    exact = [r.vec_id for r in brute_force_knn(emb, qv, k=10).collect()]
    approx = [
        r.vec_id
        for r in lsh_ann_topk(emb, qv, k=10, num_planes=6, probe_hamming=3).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert exact[0] == 0  # the query vector itself is its own top hit
    assert recall >= 0.8, f"ANN recall {recall} too low"


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("two words",), ("a  b   c",)], "text string"
    )
    out = [r[0] for r in df.select(token_count("text")).collect()]
    assert out == [0, 0, 1, 2, 3]


def test_text_stats_empty_doc(spark):
    df = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    r = text_stats(df).collect()[0]
    assert r.n_words == 0 and r.n_chars == 0 and r.quality_score is not None


def test_dup_clusters_transitive_chain(spark):
    # chain 1-2-3-4-5 has diameter 4: closing it requires real iteration,
    # not a fixed two-round propagation
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["doc_a", "doc_b"]
    )
    from fresco_hpc_spark.functions import dup_clusters

    got = {r.doc: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_corpus_keeps_canonical(spark, docs_with_dups):
    from fresco_hpc_spark.functions import dedup_corpus

    total = docs_with_dups.count()
    deduped = dedup_corpus(docs_with_dups)
    n_exact_copies = docs_with_dups.filter("doc_id >= 1000000 AND doc_id < 2000000").count()
    assert deduped.count() == total - n_exact_copies
    # every surviving id is the min of its content group → none of the
    # +1e6 exact-copy ids survive
    assert deduped.filter("doc_id >= 1000000 AND doc_id < 2000000").count() == 0


def test_ivf_ann_recall_vs_brute_force(spark):
    from fresco_hpc_spark.functions import (
        brute_force_knn,
        ivf_ann_topk,
        ivf_train_centroids,
    )
    from fresco_hpc_spark.sources import table

    emb = table(spark, SF_MED, "embeddings")
    query = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    centroids = ivf_train_centroids(emb, n_cells=8, iterations=2)
    assert len(centroids) == 8 and len(centroids[0]) == 64
    exact = [r.vec_id for r in brute_force_knn(emb, query, k=10).collect()]
    # probing half the cells must recover the true top-10 (VERDICT r5
    # item 6: >= 0.8 on the sf0.1 embeddings; measured 1.0)
    approx = [r.vec_id for r in ivf_ann_topk(emb, query, centroids, k=10, nprobe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, f"IVF recall {recall} too low"
    # the query vector itself (cell always probed: its own centroid ranks first)
    assert 0 in approx


def test_dup_clusters_deep_chain_converges(spark):
    # 61-node path graph (diameter 60, shuffled edge order): plain
    # min-label propagation would need 60 rounds; large-star/small-star
    # closes it in O(log^2 n) — well inside the default 20-round budget
    import random

    edges = [(i, i + 1) for i in range(60)]
    random.Random(7).shuffle(edges)
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    from fresco_hpc_spark.functions import dup_clusters

    got = {r.doc: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {i: 0 for i in range(61)}


def test_dup_clusters_raises_on_exhausted_iterations(spark):
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], ["doc_a", "doc_b"]
    )
    from fresco_hpc_spark.functions import dup_clusters

    with _pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iterations=1)


def test_dup_clusters_self_pairs_and_empty(spark):
    from fresco_hpc_spark.functions import dup_clusters

    pairs = spark.createDataFrame([(7, 7), (1, 2)], ["doc_a", "doc_b"])
    got = {r.doc: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {7: 7, 1: 1, 2: 1}

    empty = pairs.filter("doc_a < 0")
    assert dup_clusters(empty).collect() == []


def test_ngram_prefix_equals_plain(spark, docs_with_dups):
    """Prefix filtering is lossless: the PPJoin-style variant returns the
    exact same pair relation as the plain token self-join."""
    from fresco_hpc_spark.functions import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    plain = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs_with_dups, n=3, threshold=0.5, max_token_freq=10**9
        ).collect()
    }
    pref = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs_prefix(
            docs_with_dups, n=3, threshold=0.5
        ).collect()
    }
    assert plain == pref and len(plain) > 0


def test_near_dup_auto_planes_keeps_recall(spark):
    """target_bucket_size scales the plane count with the corpus; exact
    duplicates still land in one bucket (sign patterns identical), so
    recall at threshold~1 stays 1 while buckets shrink."""
    import pyspark.sql.functions as F

    from fresco_hpc_spark.functions import embedding_near_dup_pairs
    from fresco_hpc_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    fixed = embedding_near_dup_pairs(corpus, threshold=0.999, num_planes=8)
    auto = embedding_near_dup_pairs(
        corpus, threshold=0.999, num_planes=8, target_bucket_size=16
    )
    fixed_pairs = {(r.id_a, r.id_b) for r in fixed.collect()}
    auto_pairs = {(r.id_a, r.id_b) for r in auto.collect()}
    # every injected exact copy is recovered by both
    expected = {(v, v + 100000) for v in range(0, 500, 10)}
    assert expected <= fixed_pairs
    assert expected <= auto_pairs


def test_hash_sample_deterministic_and_partition_invariant(spark):
    from fresco_hpc_spark.functions import hash_sample
    from fresco_hpc_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    a = {r.doc_id for r in hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(17), 0.3, "doc_id")
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < docs.count()
    # rate is approximately honored (md5 is uniform)
    assert abs(len(a) / docs.count() - 0.3) < 0.1


def test_stratified_sample_rates_independent_per_stratum(spark):
    from fresco_hpc_spark.functions import stratified_hash_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], "id bigint, s string"
    )
    from pyspark.sql import functions as F

    kept = stratified_hash_sample(df, "id", "s", {"a": 1.0, "b": 0.2})
    counts = {r.s: r.n for r in kept.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 1000  # rate 1.0 keeps everything
    assert abs(counts["b"] / 1000 - 0.2) < 0.06


def test_repetition_stats_known_values(spark):
    from fresco_hpc_spark.functions import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b c a b c"),     # shingles: abc bca cab abc -> 1 dup of 4
            (2, "w x y z"),          # all shingles distinct
            (3, "q q q q"),          # one distinct shingle of 2; top word 1.0
            (4, "one two"),          # too short for shingles
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].dup_shingle_frac == 0.25
    assert rows[2].dup_shingle_frac == 0.0
    assert rows[3].dup_shingle_frac == 0.5 and rows[3].top_word_share == 1.0
    assert rows[4].dup_shingle_frac is None and rows[4].n_words == 2


def test_corpus_split_stable_under_corpus_growth(spark):
    """A document's split never changes when the corpus around it does —
    the anti-leakage property: membership is a pure key function."""
    from fresco_hpc_spark.functions import corpus_split
    from fresco_hpc_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    full = {
        r.doc_id: r.split for r in corpus_split(docs, "doc_id", 0.2).collect()
    }
    subset = docs.filter("doc_id % 3 = 0")
    sub = {
        r.doc_id: r.split for r in corpus_split(subset, "doc_id", 0.2).collect()
    }
    assert all(full[k] == v for k, v in sub.items())
    assert {"train", "eval"} == set(full.values())


def test_token_budget_sample_binds_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import token_budget_sample
    from fresco_hpc_spark.functions.text import token_count
    from fresco_hpc_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    kept = token_budget_sample(
        docs, 500, token_count(F.col("text")).cast("bigint"), "doc_id", "source"
    )
    rows = kept.select("source", "doc_id", "_cum_tokens").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert max(r._cum_tokens for r in rs) <= 500  # budget respected
    # partition-invariant determinism
    again = token_budget_sample(
        docs.repartition(13), 500, token_count(F.col("text")).cast("bigint"),
        "doc_id", "source",
    )
    assert {r.doc_id for r in rows} == {r.doc_id for r in again.collect()}
    # a smaller budget admits a strict subset
    small = token_budget_sample(
        docs, 200, token_count(F.col("text")).cast("bigint"), "doc_id", "source"
    )
    assert {r.doc_id for r in small.collect()} <= {r.doc_id for r in rows}


def test_ngram_decontaminate_hand_computed(spark):
    """A train doc sharing a 4-gram with the eval doc is flagged with the
    exact distinct-overlap count; clean and too-short docs emit 0."""
    from fresco_hpc_spark.functions import ngram_decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    train = spark.createDataFrame(
        [
            # shares "the quick brown fox" and "quick brown fox jumps"
            (1, "see the quick brown fox jumps away"),
            (2, "completely different words here entirely now"),
            (3, "too short"),  # < 4 words: no n-grams at all
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: (r.n_overlap, r.contaminated)
           for r in ngram_decontaminate(train, eval_df, n=4).collect()}
    assert out == {1: (2, True), 2: (0, False), 3: (0, False)}


def test_quality_rules_each_rule_isolated(spark):
    """Each rule rejects exactly its own violation; the conjunction is
    kept only when all pass."""
    from fresco_hpc_spark.functions import quality_rules

    good = "the quick brown fox jumps over the lazy dog and runs to the big red barn for food today ok"
    docs = spark.createDataFrame(
        [
            (1, good, "en"),                                      # passes all
            (2, "short words only here", "en"),                   # min_words
            (3, " ".join(["internationalization"] * 25), "en"),   # word_len + stopword
            (4, good, "zh"),                                      # lang
        ],
        "doc_id bigint, text string, lang string",
    )
    out = {r.doc_id: r for r in quality_rules(docs).collect()}
    assert out[1].kept
    assert not out[2].rule_min_words and not out[2].kept
    assert not out[3].rule_word_len and not out[3].rule_has_stopword
    assert not out[4].rule_lang and out[4].rule_min_words and not out[4].kept


def test_quality_rule_exprs_matches_quality_rules(spark):
    """The in-line filter form (quality_rule_exprs, used by
    corpus_curation_v5's gate since r14) and the projected gate
    relation (quality_rules) must agree rule-for-rule on every
    boundary case — single source of truth pin."""
    from fresco_hpc_spark.functions import quality_rule_exprs, quality_rules

    good = "the quick brown fox jumps over the lazy dog and runs to the big red barn for food today ok"
    docs = spark.createDataFrame(
        [
            (1, good, "en"),
            (2, "short words only here", "en"),
            (3, " ".join(["internationalization"] * 25), "en"),
            (4, good, "zh"),
            (5, "", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )
    exprs = quality_rule_exprs("text", "lang")
    inline = {
        r.doc_id: tuple(r[k] for k in exprs)
        for r in docs.select("doc_id", *[v.alias(k) for k, v in exprs.items()]).collect()
    }
    gate = {
        r.doc_id: tuple(r[k] for k in exprs)
        for r in quality_rules(docs).collect()
    }
    assert inline == gate


def test_class_centroids_hand_computed(spark):
    from fresco_hpc_spark.functions import class_centroids

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 3.0]),
            (0, [3.0, 2.0, 1.0]),
            (1, [0.0, 4.0, 0.0]),
        ],
        "label int, embedding array<double>",
    )
    out = {r.label: r for r in class_centroids(df).collect()}
    assert out[0].centroid == [2.0, 1.0, 2.0] and out[0].n_members == 2
    assert out[0].centroid_norm == 3.0
    assert out[1].centroid == [0.0, 4.0, 0.0] and out[1].n_members == 1
    assert out[1].centroid_norm == 4.0


def test_class_centroids_null_embeddings_deterministic(spark):
    """ADVICE r03: NULL embeddings must contribute to neither the mean
    nor n_members, and n_members must be deterministic (max over
    per-dim counts, not first)."""
    from fresco_hpc_spark.functions import class_centroids

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (0, None),
            (0, [3.0, 2.0]),
            (1, None),
            (1, [5.0, 12.0]),
        ],
        "label int, embedding array<double>",
    ).repartition(4)
    out = {r.label: r for r in class_centroids(df).collect()}
    assert out[0].centroid == [2.0, 1.0] and out[0].n_members == 2
    assert out[1].centroid == [5.0, 12.0] and out[1].n_members == 1
    assert out[1].centroid_norm == 13.0


def test_redact_pii_hand_computed(spark):
    from fresco_hpc_spark.functions import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org now"),
            (2, "host 192.168.0.1 dials 555-123-4567"),
            (3, "clean text with no identifiers"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (2, 0, 0)
    assert out[1].redacted == "mail <EMAIL> and <EMAIL> now"
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 1, 1)
    assert out[2].redacted == "host <IP> dials <PHONE>"
    assert out[3].redacted == "clean text with no identifiers"


def test_chunk_documents_hand_computed(spark):
    from fresco_hpc_spark.functions import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 words
            (2, "a b c"),                               # shorter than one chunk
        ],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by = {}
    for r in out:
        by.setdefault(r.doc_id, []).append(r)
    # doc 1: stride 3 -> starts 0,3,6 cover w0..w9 (last window w6..w9)
    c1 = sorted(by[1], key=lambda r: r.chunk_index)
    assert [r.chunk_text for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert [r.n_tokens for r in c1] == [4, 4, 4]
    # consecutive chunks share exactly `overlap` words
    assert c1[0].chunk_text.split()[-1] == c1[1].chunk_text.split()[0]
    # doc 2: one chunk, itself
    assert [(r.chunk_index, r.n_tokens, r.chunk_text) for r in by[2]] == [
        (0, 3, "a b c")
    ]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_pair_generators_leave_no_persisted_rdds(spark, docs_with_dups):
    """VERDICT r03 item 3 (persist leaks): with materialize=True the
    build-side cache is released after the eager checkpoint; with the
    lazy default no persist is ever taken. Either way a long-lived
    session accumulates nothing in executor storage."""
    from fresco_hpc_spark.functions import (
        minhash_dup_pairs,
        ngram_jaccard_pairs,
        simhash_dup_pairs,
    )

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    # materialize the module fixture's own .cache() before baselining
    docs_with_dups.count()
    base = n_persisted()
    # lazy default: plan composes, executing it persists nothing.
    # One-sided check: the async ContextCleaner may CONCURRENTLY free
    # blocks left by earlier test files between the baseline and this
    # assert (observed in full-suite runs), so the count may shrink —
    # only growth would be a leak.
    lazy = ngram_jaccard_pairs(docs_with_dups, n=3, threshold=0.5)
    lazy.count()
    assert n_persisted() <= base
    # materialized: the BUILD-side persist is released before return; the
    # one block a call may add is the result's own eager checkpoint (it
    # IS the materialized result the caller holds — ContextCleaner frees
    # it when the caller drops the reference). The r03 leak showed up as
    # TWO retained blocks per call (checkpoint + build cache).
    for fn in (minhash_dup_pairs, simhash_dup_pairs):
        before = n_persisted()
        fn(docs_with_dups, materialize=True).count()
        assert n_persisted() - before <= 1


def test_tfidf_top_terms_hand_computed(spark):
    """Ranking is by the rounded score with (tf desc, df asc, token asc)
    tiebreak: within doc 1, 'apple' (tf=3) outranks 'banana' (tf=2)
    outranks the corpus-wide 'the' (tf=2 but df=3 — rarer wins on
    score). Scores use smooth idf ln((N+1)/(df+1)) + 1."""
    import math

    from fresco_hpc_spark.functions import tf_idf_top_terms

    df = spark.createDataFrame(
        [
            (1, "the apple apple apple banana banana the"),
            (2, "the cherry"),
            (3, "the date"),
        ],
        "doc_id bigint, text string",
    )
    out = tf_idf_top_terms(df, k=2).collect()
    d1 = [r for r in out if r.doc_id == 1]
    assert [(r.term_rank, r.token, r.tf, r.df) for r in d1] == [
        (1, "apple", 3, 1),
        (2, "banana", 2, 1),
    ]
    # smooth idf: apple df=1, N=3 -> 3 * (ln(4/2) + 1)
    assert abs(d1[0].tf_idf - round(3 * (math.log(2.0) + 1), 6)) < 1e-9
    # doc 2: 'cherry' (df=1) must outrank 'the' (df=3) despite equal tf
    d2 = [r for r in out if r.doc_id == 2]
    assert [r.token for r in d2] == ["cherry", "the"]


def test_tfidf_rank_is_monotonic_in_score(spark):
    """ADVICE r4 regression: a tf=1 rare term must outrank a tf=2
    everywhere-term when its score is higher. Corpus of 9 docs where
    'the' appears in all 9 (idf=1): doc 1 holds 'the the rare' — score
    'rare' = ln(10/2)+1 ≈ 2.609 > score 'the' = 2.0, so 'rare' takes
    rank 1 despite the lower tf. tf-first ranking would invert this."""
    from fresco_hpc_spark.functions import tf_idf_top_terms

    rows = [(1, "the the rare")] + [(i, "the") for i in range(2, 10)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = tf_idf_top_terms(df, k=2).collect()
    d1 = [(r.term_rank, r.token) for r in out if r.doc_id == 1]
    assert d1 == [(1, "rare"), (2, "the")]
    scores = {r.token: r.tf_idf for r in out if r.doc_id == 1}
    assert scores["rare"] > scores["the"]


def test_tfidf_empty_and_whitespace_documents(spark):
    from fresco_hpc_spark.functions import tf_idf_top_terms

    df = spark.createDataFrame(
        [(1, "only doc with words"), (2, ""), (3, "   ")],
        "doc_id bigint, text string",
    )
    out = tf_idf_top_terms(df, k=10).collect()
    # empty/whitespace docs produce no terms but still count toward N
    assert {r.doc_id for r in out} == {1}
    assert all(r.df == 1 for r in out)


def test_unigram_logprob_hand_computed(spark):
    """Self-scored model over {a:3, b:1, c:1}: total=5, vocab=3, so
    P(a)=(3+1)/8, P(b)=P(c)=(1+1)/8. Means replicate the micro-unit
    integer arithmetic exactly."""
    import math

    from fresco_hpc_spark.functions import unigram_logprob_score

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob_score(df).collect()}

    def u(p):  # micro-unit contribution, HALF_UP like both engines
        from decimal import ROUND_HALF_UP, Decimal
        return int(Decimal(math.log(p) * 1e6).quantize(0, ROUND_HALF_UP))

    exp1 = round((u(0.5) + u(0.5) + u(0.25)) / (1e6 * 3), 6)
    exp2 = round((u(0.5) + u(0.25)) / (1e6 * 2), 6)
    assert out[1].mean_logprob == exp1 and out[1].n_tokens == 3
    assert out[2].mean_logprob == exp2 and out[2].n_tokens == 2


def test_unigram_logprob_reference_corpus_and_unseen_tokens(spark):
    """Scoring against a separate reference corpus: tokens unseen in the
    reference get the +1 Laplace mass, and a gibberish doc scores below
    an in-domain doc."""
    from fresco_hpc_spark.functions import unigram_logprob_score

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id bigint, text string",
    )
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zzz qqq xxx")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob_score(df, reference=ref).collect()}
    assert out[1].mean_logprob > out[2].mean_logprob
    # every token of doc 2 is unseen: P = 1/(total+vocab) = 1/65
    import math
    assert abs(out[2].mean_logprob - round(round(math.log(1 / 65) * 1e6) / 1e6, 6)) < 2e-6


def test_cross_corpus_dedup_finds_planted_pairs(spark):
    """Every planted (train, incoming) duplicate must be recovered, no
    within-corpus pair may appear, and exact copies estimate 1.0."""
    from fresco_hpc_spark.functions import minhash_dup_pairs_between

    train = spark.createDataFrame(
        [
            (i, f"unique document number {i} with shared filler words "
                f"alpha bravo charlie delta echo foxtrot {i} golf hotel")
            for i in range(40)
        ],
        "doc_id bigint, text string",
    )
    incoming = spark.createDataFrame(
        [
            # ids 1000+: exact copies of train docs 0..9
            *[(1000 + i, f"unique document number {i} with shared filler words "
                         f"alpha bravo charlie delta echo foxtrot {i} golf hotel")
              for i in range(10)],
            # 2000: unrelated content
            (2000, "completely different text about oranges and bicycles "
                   "riding through autumn rain with umbrellas and maps"),
        ],
        "doc_id bigint, text string",
    )
    pairs = minhash_dup_pairs_between(
        train, incoming, threshold=0.5, materialize=True
    ).collect()
    found = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs}
    for i in range(10):
        assert found.get((i, 1000 + i)) == 1.0, f"missing planted pair {i}"
    assert all(a < 1000 <= b for a, b in found), "non-cross pair emitted"
    assert not any(b == 2000 for _, b in found), "unrelated doc matched"


def test_cross_corpus_dedup_no_persist_leak(spark, docs_with_dups):
    from fresco_hpc_spark.functions import minhash_dup_pairs_between

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    docs_with_dups.count()
    before = n_persisted()
    minhash_dup_pairs_between(
        docs_with_dups, docs_with_dups.limit(20), materialize=True
    ).count()
    # both banded persists released; only the result's own checkpoint may
    # remain (see test_pair_generators_leave_no_persisted_rdds)
    assert n_persisted() - before <= 1


def test_minhash_index_store_roundtrip(spark, tmp_path):
    """The incremental-ingest flow end-to-end: build the band index for
    the existing corpus, store it as parquet, reload, and dedup a new
    batch against the LOADED index — identical pairs to the direct
    two-corpus computation, with the existing text never re-read."""
    from fresco_hpc_spark.functions import (
        minhash_band_index,
        minhash_dup_pairs_between,
    )

    def doc(i):
        # word i interleaved throughout: different docs share almost no
        # 3-gram shingles, so only planted verbatim copies pair up
        return (f"w{i} alpha w{i} bravo w{i} charlie w{i} delta w{i} echo "
                f"w{i} foxtrot w{i} golf w{i} hotel w{i} india w{i}")

    train = spark.createDataFrame(
        [(i, doc(i)) for i in range(30)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [(1000 + i, doc(i)) for i in range(5)], "doc_id bigint, text string"
    )
    direct = minhash_dup_pairs_between(train, batch, threshold=0.5).collect()

    idx_path = str(tmp_path / "band_index")
    minhash_band_index(train).write.parquet(idx_path)
    loaded = spark.read.parquet(idx_path)
    via_index = minhash_dup_pairs_between(
        loaded, batch, threshold=0.5, left_is_index=True
    ).collect()

    key = lambda r: (r.doc_a, r.doc_b, r.est_jaccard)  # noqa: E731
    assert sorted(map(key, direct)) == sorted(map(key, via_index))
    assert {(r.doc_a, r.doc_b) for r in direct} == {(i, 1000 + i) for i in range(5)}


def test_vocab_stats_hand_computed(spark):
    """tf/df/coverage on a tiny corpus with a tie broken by token order."""
    from fresco_hpc_spark.functions import vocab_stats

    df = spark.createDataFrame(
        [(1, "b b a"), (2, "a c b")], "doc_id bigint, text string"
    )
    rows = vocab_stats(df, top_n=2).collect()
    # counts: b tf=3 df=2, a tf=2 df=2, c tf=1 df=1; total 6
    assert [(r.token_rank, r.token, r.tf, r.df) for r in rows] == [
        (1, "b", 3, 2),
        (2, "a", 2, 2),
    ]
    assert rows[0].frac == 0.5 and rows[0].cum_frac == 0.5
    assert rows[1].frac == round(2 / 6, 6)
    assert rows[1].cum_frac == round(5 / 6, 6)


def test_semantic_dedup_greedy_semantics(spark):
    """Greedy pairwise rule on a 3-chain a~b~c (but a!~c): b is dropped
    (pair with smaller a) and c is ALSO dropped (pair with smaller b,
    even though b itself was dropped) — min-id survivor only. An
    unrelated vector survives untouched."""
    from fresco_hpc_spark.functions import semantic_dedup

    # colinear chain: 1,2,3 identical direction (cosine 1.0 pairwise);
    # 9 orthogonal
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),
        (3, [0.5, 0.0, 0.0]),
        (9, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = sorted(
        r.vec_id for r in semantic_dedup(df, threshold=0.999, num_planes=4).collect()
    )
    assert out == [1, 9]


def test_temperature_mixture_flattens_sources(spark):
    """T=1 keeps natural proportions (uniform rate across sources);
    higher T boosts the small source's keep rate relative to the head
    source; rates never exceed 1."""
    from fresco_hpc_spark.functions import temperature_mixture_sample

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")

    def rates(t):
        out = temperature_mixture_sample(
            df, "doc_id", "source", temperature=t, target_fraction=0.5
        )
        return {
            r.source: r.rate
            for r in out.select("source", "sample_rate")
            .withColumnRenamed("sample_rate", "rate")
            .distinct()
            .collect()
        }

    r1 = rates(1.0)
    # T=1: p_s = n_s/total -> rate = target_fraction for every source
    assert abs(r1["big"] - 0.5) < 1e-6 and abs(r1["small"] - 0.5) < 1e-6
    r4 = rates(4.0)
    assert r4["small"] > r4["big"]  # flattening boosts the tail source
    assert r4["small"] <= 1.0
    # expected keep counts track the rates (md5 coin is ~uniform)
    out4 = temperature_mixture_sample(
        df, "doc_id", "source", temperature=4.0, target_fraction=0.5
    )
    kept = {
        r.source: r.n
        for r in out4.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert abs(kept["big"] / 900 - r4["big"]) < 0.08
    assert abs(kept["small"] / 100 - r4["small"]) < 0.15


def test_temperature_mixture_keeps_null_stratum(spark):
    """r7 sweep of the join-null class: a NULL source is a legitimate
    stratum — counted, weighted, and sampled with its own rate — not
    silently dropped by the rate join."""
    from fresco_hpc_spark.functions import temperature_mixture_sample

    rows = [(i, "big") for i in range(300)] + [
        (1000 + i, None) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = temperature_mixture_sample(
        df, "doc_id", "source", temperature=1.0, target_fraction=0.5
    )
    kept = {
        r.source: r.n
        for r in out.groupBy("source").count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    # T=1 -> rate 0.5 for every stratum including NULL; md5 coin ~uniform
    assert None in kept, "NULL stratum dropped by the rate join"
    assert abs(kept[None] / 100 - 0.5) < 0.15
    assert abs(kept["big"] / 300 - 0.5) < 0.1
    rates = {
        r.source: r.sample_rate
        for r in out.select("source", "sample_rate").distinct().collect()
    }
    assert abs(rates[None] - 0.5) < 1e-6


def test_weighted_repeat_multiplicity(spark):
    """Integer weights repeat exactly; fractional weights repeat in
    expectation; weight < 1 downsamples; column weights per source."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import weighted_repeat

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(1000)],
        "doc_id bigint, source string",
    )
    # exact integer weight: every row exactly 3 copies, idx 0..2
    out3 = weighted_repeat(df, "doc_id", 3.0)
    assert out3.count() == 3000
    assert out3.groupBy("doc_id").count().filter("count != 3").count() == 0
    assert {r.copy_idx for r in out3.filter("doc_id = 0").collect()} == {0, 1, 2}
    # fractional: expectation 1.5x
    n15 = weighted_repeat(df, "doc_id", 1.5).count()
    assert abs(n15 / 1000 - 1.5) < 0.08
    # sub-1 weight: deterministic thinning
    n05 = weighted_repeat(df, "doc_id", 0.5).count()
    assert abs(n05 / 1000 - 0.5) < 0.08
    # per-source column weight: a x2, b x0 (dropped entirely)
    wcol = F.when(F.col("source") == "a", 2.0).otherwise(0.0)
    outw = weighted_repeat(df, "doc_id", wcol)
    assert outw.filter("source = 'b'").count() == 0
    assert outw.filter("source = 'a'").count() == 1000


def test_paragraph_dedup_hand_computed(spark):
    """Corpus-wide first occurrence wins (global order = min (doc, idx)):
    the shared 'header x' paragraph survives only in doc 1; doc 3, made
    entirely of seen paragraphs, comes back with clean_text '' but keeps
    its row. Matching is on the normalized form (case/whitespace)."""
    from fresco_hpc_spark.functions import paragraph_dedup

    df = spark.createDataFrame(
        [
            (1, "header x\nbody one\nfooter z"),
            (2, "HEADER   X\nbody two\nfooter z"),
            (3, "header x\nfooter z"),
            (4, "\n\n"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert out[1].n_paras == 3 and out[1].n_kept == 3
    assert out[1].clean_text == "header x\nbody one\nfooter z"
    # doc 2 keeps only its unique body; normalized header matched doc 1's
    assert out[2].n_paras == 3 and out[2].n_kept == 1
    assert out[2].clean_text == "body two"
    assert out[3].n_kept == 0 and out[3].clean_text == ""
    # all-empty doc: no non-empty paragraphs at all -> absent from output
    # (nothing to profile), same contract as tokenize-family operators
    assert 4 not in out


def test_paragraph_dedup_keeps_intra_doc_order(spark):
    """Survivors rejoin in original paragraph order even when the dropped
    ones interleave."""
    from fresco_hpc_spark.functions import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "dup\nalpha\ndup2\nbeta"), (0, "dup\ndup2")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    # doc 0 wins both shared paragraphs (lower doc id)
    assert out[0].clean_text == "dup\ndup2"
    assert out[1].clean_text == "alpha\nbeta"


def test_boilerplate_remove_hand_computed(spark):
    """The frequency rule, hand-checked: a line occurring in >= min_docs
    DISTINCT docs of the SAME group is stripped everywhere (even its
    first copy — the contrast with paragraph_dedup); a line shared by
    fewer docs survives; repeats within ONE doc don't count toward the
    threshold; the same line in another group is untouched; NULL groups
    form one group of their own (null-safe key)."""
    import pytest as _pt

    from fresco_hpc_spark.functions import boilerplate_remove

    df = spark.createDataFrame(
        [
            # source A: header in 3 docs -> boilerplate at min_docs=3
            (1, "A", "visit us\nalpha text\nquoted line"),
            (2, "A", "VISIT   US\nbeta text\nquoted line"),
            (3, "A", "visit us\ngamma text"),
            # chorus twice in ONE doc: 1 distinct doc, kept both times
            (4, "A", "chorus\nverse one\nchorus"),
            # doc that is ALL boilerplate
            (5, "A", "visit us"),
            # source B has the same header once: different group, kept
            (6, "B", "visit us\ndelta text"),
            # NULL group: the shared line reaches min_docs among NULLs
            (7, None, "null banner\none"),
            (8, None, "null banner\ntwo"),
            (9, None, "null banner\nthree"),
        ],
        "doc_id bigint, source string, text string",
    )
    out = {r.doc_id: r for r in boilerplate_remove(df, min_docs=3).collect()}
    # header stripped from ALL THREE A-docs, including the first
    assert out[1].clean_text == "alpha text\nquoted line"
    assert out[2].clean_text == "beta text\nquoted line"
    assert out[3].clean_text == "gamma text"
    assert (out[1].n_lines, out[1].n_kept) == (3, 2)
    # 'quoted line' is in only 2 docs -> kept
    assert "quoted line" in out[1].clean_text and "quoted line" in out[2].clean_text
    # intra-doc repeats don't count: both chorus copies survive in order
    assert out[4].clean_text == "chorus\nverse one\nchorus"
    # fully-boilerplate doc keeps its row, hollowed out
    assert (out[5].n_lines, out[5].n_kept, out[5].clean_text) == (1, 0, "")
    # same header in source B: only 1 B-doc has it -> kept
    assert out[6].clean_text == "visit us\ndelta text"
    # NULL-source docs group together; their banner is stripped
    assert out[7].clean_text == "one"
    assert out[8].clean_text == "two"
    assert out[9].clean_text == "three"
    with _pt.raises(ValueError, match="min_docs"):
        boilerplate_remove(df, min_docs=1)


def test_duplicate_ngram_spans_hand_computed(spark):
    """3-grams: doc 1 and doc 2 share 'a b c' and 'b c d' (both their
    grams), doc 3 shares nothing, doc 4 is too short for any gram."""
    from fresco_hpc_spark.functions import duplicate_ngram_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # grams: 'a b c', 'b c d' — both shared
            (2, "x a b c d y"),      # grams: 'x a b', 'a b c', 'b c d', 'c d y'
            (3, "p q r s"),          # grams unique
            (4, "too short"),        # 2 tokens < n -> zero grams
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in duplicate_ngram_spans(df, n=3).collect()}
    assert (out[1].n_grams, out[1].n_dup_grams, out[1].dup_frac) == (2, 2, 1.0)
    assert (out[2].n_grams, out[2].n_dup_grams) == (4, 2)
    assert out[2].dup_frac == 0.5
    assert (out[3].n_grams, out[3].n_dup_grams, out[3].dup_frac) == (2, 0, 0.0)
    assert (out[4].n_grams, out[4].n_dup_grams, out[4].dup_frac) == (0, 0, 0.0)


def test_duplicate_ngram_spans_within_doc_repeat_not_flagged(spark):
    """Document frequency counts DISTINCT docs: a gram repeated inside
    one document only is not cross-document duplication."""
    from fresco_hpc_spark.functions import duplicate_ngram_spans

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "z z z z")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in duplicate_ngram_spans(df, n=3).collect()}
    assert out[1].n_dup_grams == 0
    assert out[2].n_dup_grams == 0


def test_remove_duplicate_ngram_spans_hand_computed(spark):
    """3-gram surgery: doc 1 (earliest) keeps the shared passage; doc
    2's copy is excised (covered positions = union of its dup-gram
    ranges); unique text survives everywhere; a doc that is entirely a
    later copy comes back empty."""
    from fresco_hpc_spark.functions import remove_duplicate_ngram_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d unique tail here"),
            (2, "x y a b c d z"),      # 'a b c'/'b c d' dup -> cut a..d
            (3, "a b c d"),            # entirely a later copy -> ''
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_ngram_spans(df, n=3).collect()}
    assert out[1].clean_text == "a b c d unique tail here"
    assert out[1].n_removed == 0
    assert out[2].clean_text == "x y z"
    assert out[2].n_removed == 4
    assert out[3].clean_text == "" and out[3].n_removed == 4


def test_remove_duplicate_ngram_spans_overlap_merges(spark):
    """Overlapping duplicated grams merge into one excision; the
    within-doc second copy of a cross-doc gram is removed too (only the
    corpus-wide first occurrence survives)."""
    from fresco_hpc_spark.functions import remove_duplicate_ngram_spans

    df = spark.createDataFrame(
        [(1, "p q r p q r"), (2, "p q r s")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_ngram_spans(df, n=3).collect()}
    # doc 1 pos0 'p q r' is the winner; its pos3 copy is removed
    assert out[1].clean_text == "p q r"
    assert out[1].n_removed == 3
    # doc 2's 'p q r' removed; 'q r s' is unique so 's' survives
    assert out[2].clean_text == "s"


def test_oov_rate_hand_computed(spark):
    """vocab_size=2 over tf {the:4, cat:3, dog:1, owl:1}: vocab =
    {the, cat} (tf desc, token asc at ties); doc 2's 'dog owl' are both
    OOV."""
    from fresco_hpc_spark.functions import oov_rate

    df = spark.createDataFrame(
        [(1, "the cat the cat"), (2, "the dog owl cat"), (3, "the owl")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in oov_rate(df, vocab_size=2).collect()}
    assert (out[1].n_tokens, out[1].n_oov, out[1].oov_rate) == (4, 0, 0.0)
    assert (out[2].n_tokens, out[2].n_oov, out[2].oov_rate) == (4, 2, 0.5)
    assert (out[3].n_tokens, out[3].n_oov, out[3].oov_rate) == (2, 1, 0.5)


def test_length_percentile_filter_trims_tails(spark):
    """21 docs with 1..21 words, [p25, p75] keeps word counts 6..16
    (PERCENTILE_CONT on 1..21: p25=6, p75=16, inclusive)."""
    from fresco_hpc_spark.functions import length_percentile_filter

    rows = [(i, " ".join(["w"] * i), f"src{i % 3}") for i in range(1, 22)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = length_percentile_filter(df, p_low=0.25, p_high=0.75).collect()
    kept = sorted(r.n_words for r in out)
    assert kept == list(range(6, 17))
    # ADVICE r5: payload columns survive the filter (no re-join needed)
    assert set(out[0].asDict()) == {"doc_id", "text", "source", "n_words"}
    assert all(r.source == f"src{r.doc_id % 3}" for r in out)


def test_knn_graph_blocked_hand_computed(spark):
    """2-D vectors in two blocks: within block A, the unit-x and the
    (1,0.1) vectors are mutual rank-1 neighbors, unit-y ranks them by
    the 0.1 component; block B never mixes with A."""
    from fresco_hpc_spark.functions import knn_graph_blocked

    rows = [
        (1, "A", [1.0, 0.0]),
        (2, "A", [1.0, 0.1]),
        (3, "A", [0.0, 1.0]),
        (4, "B", [1.0, 0.0]),
        (5, "B", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, label string, embedding array<double>"
    )
    out = {
        (r.vec_id, r.rank): (r.neighbor_id, r.cosine_sim)
        for r in knn_graph_blocked(df, k=2, block_col="label").collect()
    }
    assert out[(1, 1)][0] == 2 and out[(1, 2)][0] == 3
    assert out[(2, 1)][0] == 1 and out[(2, 2)][0] == 3
    # unit-y is closer to (1, 0.1) than to (1, 0)
    assert out[(3, 1)][0] == 2 and out[(3, 2)][0] == 1
    # block B: only each other, k=2 truncates to the block size - 1
    assert out[(4, 1)][0] == 5 and (4, 2) not in out
    assert out[(5, 1)][0] == 4
    assert out[(1, 1)][1] > out[(1, 2)][1]


def test_cap_per_group_selects_n_smallest_coins(spark):
    """The cap keeps exactly the n smallest salted-hash coins per group
    — content-stable selection, not first-n-by-arrival — through BOTH
    routes: the small-group direct window and the big-group prefilter
    (group of 40 > prefilter_factor*n = 12)."""
    from fresco_hpc_spark.functions import cap_per_group
    from fresco_hpc_spark.functions.sampling import hash_fraction
    from pyspark.sql import functions as F

    rows = [("big", i) for i in range(40)] + [("small", 100 + i) for i in range(2)]
    df = spark.createDataFrame(rows, "source string, doc_id bigint")
    out = cap_per_group(df, n=3, group_col="source", key_col="doc_id").collect()
    # brute-force expectation from the same coin
    coins = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id",
            hash_fraction(
                F.concat(F.lit("cap|"), F.col("doc_id").cast("string"))
            ).alias("c"),
        ).collect()
    }
    want_big = sorted(range(40), key=lambda i: (coins[i], i))[:3]
    got = {}
    for r in out:
        got.setdefault(r.source, []).append((r.cap_rank, r.doc_id))
    assert [d for _, d in sorted(got["big"])] == want_big
    # the small group (2 < n) survives whole, ranked
    assert [d for _, d in sorted(got["small"])] == sorted(
        [100, 101], key=lambda i: (coins[i], i)
    )
    assert all(rk == i + 1 for g in got.values() for i, (rk, _) in enumerate(sorted(g)))


def test_cap_per_group_null_group_is_its_own_group(spark):
    """r6 review finding: rows with a NULL group key (missing domain
    metadata) must be capped as their own group — the window's
    PARTITION BY semantics — not silently dropped by a non-null-safe
    join."""
    from fresco_hpc_spark.functions import cap_per_group

    rows = [("a", i) for i in range(10)] + [(None, 100 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, doc_id bigint")
    out = cap_per_group(df, n=3, group_col="source", key_col="doc_id").collect()
    null_rows = [r for r in out if r.source is None]
    assert len(null_rows) == 3
    assert sorted(r.cap_rank for r in null_rows) == [1, 2, 3]
    assert len([r for r in out if r.source == "a"]) == 3


def test_cap_per_group_shortfall_fallback_stays_exact(spark):
    """prefilter_factor=1 with n=1 makes the threshold 1/count — small
    enough that groups routinely keep <n survivors and take the
    fallback path; output must STILL be the exact n smallest coins."""
    from fresco_hpc_spark.functions import cap_per_group
    from fresco_hpc_spark.functions.sampling import hash_fraction
    from pyspark.sql import functions as F

    rows = [(f"g{i % 5}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id bigint")
    out = cap_per_group(
        df, n=1, group_col="source", key_col="doc_id", prefilter_factor=1
    ).collect()
    coins = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id",
            hash_fraction(
                F.concat(F.lit("cap|"), F.col("doc_id").cast("string"))
            ).alias("c"),
        ).collect()
    }
    assert len(out) == 5
    for r in out:
        members = [i for i in range(100) if f"g{i % 5}" == r.source]
        assert r.doc_id == min(members, key=lambda i: (coins[i], i))


def test_cluster_aware_split_string_ids_keep_native_cluster_id(spark):
    """ADVICE r5: with string doc ids the cluster_id column must carry
    the representative in the key's NATIVE type, not a silently-NULL
    bigint cast."""
    from fresco_hpc_spark.functions import cluster_aware_split

    docs = spark.createDataFrame(
        [(f"doc-{i}", f"text {i}") for i in range(20)],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("doc-0", "doc-1"), ("doc-2", "doc-3")], ["doc_a", "doc_b"]
    )
    out = cluster_aware_split(docs, pairs, eval_frac=0.3).collect()
    assert all(r.cluster_id is not None for r in out)
    cluster_of = {r.doc_id: r.cluster_id for r in out}
    assert cluster_of["doc-0"] == cluster_of["doc-1"] == "doc-0"
    assert cluster_of["doc-19"] == "doc-19"  # singleton is its own rep


def test_containment_catches_subdocument_jaccard_misses(spark):
    """A short doc fully quoted inside a 10x larger one: containment_a
    = 1.0 while Jaccard is tiny — the asymmetric signal Jaccard-based
    dedup cannot see. Unrelated docs produce no pair."""
    from fresco_hpc_spark.functions import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"pad{i} fil{i} word{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler.replace("pad", "tail")),
            (3, "nothing shared here at all friends"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r
        for r in ngram_containment_pairs(df, n=3, threshold=0.9).collect()
    }
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r.containment_a == 1.0  # every 3-gram of the quote is in doc 2
    assert r.containment_b < 0.1 and r.jaccard < 0.1
    assert not any(3 in p for p in pairs)
    # the same corpus at Jaccard >= 0.5 finds NOTHING
    assert ngram_jaccard_pairs(df, n=3, threshold=0.5).collect() == []


def test_containment_prefix_matches_plain(spark):
    """VERDICT r5 item 2: the asymmetric-prefix variant must produce
    the IDENTICAL output relation to the plain Σdf² generator on the
    same corpus — same pairs, same n_common/containment/jaccard values
    — while joining only prefix tokens on the contained side."""
    from fresco_hpc_spark.functions import (
        ngram_containment_pairs,
        ngram_containment_pairs_prefix,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"pad{i} fil{i} word{i}" for i in range(20))
    mid = " ".join(f"mid{i} core{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler.replace("pad", "tail")),
            (3, "nothing shared here at all friends"),
            (4, mid),
            (5, mid + " extra tail words here"),  # high mutual containment
        ],
        "doc_id bigint, text string",
    )
    plain = [
        tuple(r)
        for r in ngram_containment_pairs(
            df, n=3, threshold=0.9, max_token_freq=10**9
        ).collect()
    ]
    prefix = [
        tuple(r)
        for r in ngram_containment_pairs_prefix(
            df, n=3, threshold=0.9
        ).collect()
    ]
    assert plain == prefix
    assert {(p[0], p[1]) for p in prefix} == {(1, 2), (4, 5)}


def test_containment_prefix_survives_stop_shingle(spark):
    """The property that makes the prefix variant the 100 TB route: a
    shingle present in EVERY document (df = corpus size) would cost the
    plain join df² candidates — or silent recall loss under its
    max_token_freq cap. Here the plain variant with a tiny cap LOSES
    the true pair; the prefix variant keeps it, exactly."""
    from fresco_hpc_spark.functions import (
        ngram_containment_pairs,
        ngram_containment_pairs_prefix,
    )

    stop = "the quick brown"  # one 3-gram shared by all docs
    rows = [(i, stop + " " + f"u{i} v{i} w{i} x{i}") for i in range(1, 9)]
    # doc 9 fully contains doc 1's shingle set
    rows.append((9, rows[0][1] + " long appended suffix of extra words"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # cap=0 drops every token in the plain variant -> no pairs at all
    capped = ngram_containment_pairs(
        df, n=3, threshold=0.9, max_token_freq=0
    ).collect()
    assert capped == []
    out = {
        (r.doc_a, r.doc_b): r
        for r in ngram_containment_pairs_prefix(df, n=3, threshold=0.9).collect()
    }
    assert (1, 9) in out and out[(1, 9)].containment_a == 1.0
    # and with the cap effectively disabled the two variants agree exactly
    plain = [
        tuple(r)
        for r in ngram_containment_pairs(
            df, n=3, threshold=0.9, max_token_freq=10**9
        ).collect()
    ]
    prefix = [
        tuple(r)
        for r in ngram_containment_pairs_prefix(df, n=3, threshold=0.9).collect()
    ]
    assert plain == prefix


def test_default_pair_generators_are_lossless(spark):
    """VERDICT r6 item 3: a NEW caller of ngram_jaccard_pairs /
    ngram_containment_pairs gets the exact prefix route — on the
    stop-shingle corpus (a shingle in every doc) the old capped default
    silently lost recall when df crossed the cap; the default must now
    keep the true pair with no cap argument at all."""
    from fresco_hpc_spark.functions import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    stop = "the quick brown"
    rows = [(i, stop + " " + f"u{i} v{i} w{i} x{i}") for i in range(1, 9)]
    rows.append((9, rows[0][1] + " long appended suffix of extra words"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # a cap below the stop-shingle's df loses the pair (opt-in trade)
    assert (
        ngram_containment_pairs(
            df, n=3, threshold=0.9, max_token_freq=0
        ).collect()
        == []
    )
    # the DEFAULT keeps it
    cont = {
        (r.doc_a, r.doc_b)
        for r in ngram_containment_pairs(df, n=3, threshold=0.9).collect()
    }
    assert (1, 9) in cont
    # jaccard default likewise routes through the exact prefix plan:
    # doc 1 vs doc 9 share doc 1's 5 shingles of doc 9's 11 → J = 5/11
    jac = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.4).collect()
    }
    assert (1, 9) in jac


def test_weighted_sample_k_matches_naive_ranking(spark):
    """A-Res two-phase (order-statistic prefilter + bounded rank
    window) must equal the naive full-window ranking exactly — per
    group, including a group SMALLER than k (all rows kept), a NULL
    group (own stratum, null-safe join), and exclusion of
    null/zero/negative weights. The global variant matches the same
    ranking without grouping."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import weighted_sample_k
    from fresco_hpc_spark.functions.sampling import hash_fraction

    rows = []
    for i in range(40):
        rows.append(("a", i, float(1 + i % 7)))
    for i in range(40, 46):
        rows.append(("b", i, 2.0))          # |b| = 6 > k
    rows.append(("tiny", 100, 5.0))          # |tiny| = 1 < k
    rows.append((None, 101, 3.0))            # NULL group
    rows.append((None, 102, 4.0))
    rows.append(("a", 200, None))            # excluded weights
    rows.append(("a", 201, 0.0))
    rows.append(("a", 202, -2.0))
    df = spark.createDataFrame(rows, "g string, id bigint, w double")

    k = 3
    got = {
        (r.g, r.id): (r.sample_key, r.sample_rank)
        for r in weighted_sample_k(
            df, k=k, weight_col="w", id_col="id", group_col="g"
        ).collect()
    }
    key = F.round(
        F.pow(
            hash_fraction(F.concat(F.lit("ares|"), F.col("id").cast("string"))),
            F.lit(1.0) / F.col("w"),
        ),
        9,
    )
    naive = (
        df.filter(F.col("w").isNotNull() & (F.col("w") > 0))
        .withColumn("sample_key", key)
        .withColumn(
            "sample_rank",
            F.row_number().over(
                Window.partitionBy("g").orderBy(F.desc("sample_key"), F.col("id"))
            ),
        )
        .filter(F.col("sample_rank") <= k)
    )
    want = {
        (r.g, r.id): (r.sample_key, r.sample_rank) for r in naive.collect()
    }
    assert got == want
    by_group = {}
    for (g, _), (_, rk) in got.items():
        by_group.setdefault(g, []).append(rk)
    assert sorted(by_group["a"]) == [1, 2, 3]
    assert sorted(by_group["b"]) == [1, 2, 3]
    assert by_group["tiny"] == [1]            # n < k keeps all
    assert sorted(by_group[None]) == [1, 2]   # NULL group sampled, not dropped
    assert not any(i in (200, 201, 202) for _, i in got)

    got_global = [
        (r.id, r.sample_rank)
        for r in weighted_sample_k(df, k=5, weight_col="w", id_col="id")
        .orderBy("sample_rank")
        .collect()
    ]
    naive_global = (
        df.filter(F.col("w").isNotNull() & (F.col("w") > 0))
        .withColumn("sample_key", key)
        .withColumn(
            "sample_rank",
            F.row_number().over(Window.orderBy(F.desc("sample_key"), F.col("id"))),
        )
        .filter(F.col("sample_rank") <= 5)
    )
    assert got_global == [
        (r.id, r.sample_rank)
        for r in naive_global.orderBy("sample_rank").collect()
    ]


def test_weighted_sample_k_weights_shift_inclusion(spark):
    """Statistical sanity on the fixed md5 coin: with weights 10 vs 1
    over 400 rows, the heavy half must dominate a k=40 sample (A-Res
    inclusion ∝ weight — expected ~36 heavy picks; require > 28)."""
    from fresco_hpc_spark.functions import weighted_sample_k

    rows = [(i, 10.0 if i < 200 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    picked = [
        r.id
        for r in weighted_sample_k(df, k=40, weight_col="w", id_col="id").collect()
    ]
    heavy = sum(1 for i in picked if i < 200)
    assert len(picked) == 40
    assert heavy > 28, f"heavy picks {heavy}/40 — weighting not applied?"


def test_cluster_aware_split_never_straddles(spark):
    """Anti-leakage: every near-dup cluster lands wholly in train or
    wholly in eval; singletons get exactly the corpus_split coin."""
    from fresco_hpc_spark.functions import cluster_aware_split, corpus_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(0, 50)]      # 50 two-doc clusters
        + [(0, 150), (150, 151)],                  # one 4-doc chain
        ["doc_a", "doc_b"],
    )
    out = cluster_aware_split(docs, pairs, eval_frac=0.3).collect()
    split_of = {r.doc_id: r.split for r in out}
    cluster_of = {r.doc_id: r.cluster_id for r in out}
    # members agree with their cluster-mates
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    # the 4-doc chain 0-100-150-151 shares one cluster and one side
    assert cluster_of[0] == cluster_of[100] == cluster_of[150] == cluster_of[151] == 0
    # singletons match plain corpus_split exactly
    singles = [i for i in range(200) if cluster_of[i] == i and i not in
               {d for p in [(i, i+100) for i in range(50)] + [(0,150),(150,151)] for d in p}]
    plain = {r.doc_id: r.split
             for r in corpus_split(docs, "doc_id", eval_frac=0.3).collect()}
    assert singles and all(split_of[i] == plain[i] for i in singles)
    # both sides non-empty at this fraction
    assert {"train", "eval"} == set(split_of.values())


def test_bigram_logprob_hand_computed(spark):
    """Self-scored model over {(a,b):2, (b,a):2, (a,c):1}, marginals
    {a:3, b:2}, V=3: P(b|a)=3/6, P(a|b)=3/5, P(c|a)=2/6. Micro-unit
    arithmetic replicated exactly."""
    import math

    from fresco_hpc_spark.functions import bigram_logprob_score

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "a c"), (4, "solo")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob_score(df).collect()}

    def mean_lp(ps):
        u = [round(math.log(p) * 1e6) for p in ps]
        return round(sum(u) / (1e6 * len(u)), 6)

    assert out[1].n_transitions == 3
    assert out[1].mean_logprob == mean_lp([0.5, 0.6, 0.5])
    assert out[2].mean_logprob == mean_lp([0.6])
    assert out[3].mean_logprob == mean_lp([2 / 6])
    assert 4 not in out  # single token: no transitions


def test_bigram_model_punishes_shuffled_text(spark):
    """The order signal: a scrambled copy of fluent text scores
    strictly below the fluent original under a reference bigram model —
    the case the unigram score cannot distinguish at all."""
    from fresco_hpc_spark.functions import (
        bigram_logprob_score,
        unigram_logprob_score,
    )

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran to the cat")
         for i in range(5)],
        "doc_id bigint, text string",
    )
    probe = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),
            (101, "mat the sat cat the on"),  # same bag of words
        ],
        "doc_id bigint, text string",
    )
    bi = {r.doc_id: r.mean_logprob
          for r in bigram_logprob_score(probe, reference=ref).collect()}
    assert bi[100] > bi[101]
    uni = {r.doc_id: r.mean_logprob
           for r in unigram_logprob_score(probe, reference=ref).collect()}
    assert uni[100] == uni[101]  # unigram is blind to order


def test_ivf_stored_index_matches_live_query(spark):
    """Index-at-rest: querying the bucketed IVF table returns exactly
    what ivf_ann_topk computes live on the same codebook — and without
    re-assigning the corpus."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import (
        ivf_ann_topk,
        ivf_build_index,
        ivf_query_index,
        ivf_train_centroids,
    )
    from fresco_hpc_spark.sources import table

    emb = table(spark, SF_SMALL, "embeddings")
    cents = ivf_train_centroids(
        emb, n_cells=8, iterations=2,
        seed_bucket_col=F.pmod(F.col("vec_id"), F.lit(8)),
    )
    q = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    spark.sql("DROP TABLE IF EXISTS test_ivf_idx")
    try:
        ivf_build_index(emb, cents, "test_ivf_idx")
        stored = [
            tuple(r)
            for r in ivf_query_index(
                spark.table("test_ivf_idx"), q, cents, k=10, nprobe=4
            ).collect()
        ]
        live = [
            tuple(r) for r in ivf_ann_topk(emb, q, cents, k=10, nprobe=4).collect()
        ]
        assert stored == live and len(stored) == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS test_ivf_idx")


def test_pack_sequences_hand_computed(spark):
    """Budget 100 within source 'a': docs of 60/60/90 tokens pack as
    prefix sums 0/60/120 -> bins 0/0/1; a 250-token doc overruns its
    own bin (the documented bound); source 'b' restarts at bin 0."""
    from fresco_hpc_spark.functions import pack_sequences

    def words(n):
        return " ".join(["w"] * n)

    df = spark.createDataFrame(
        [
            ("a", 1, words(60)), ("a", 2, words(60)), ("a", 3, words(90)),
            ("a", 4, words(250)), ("a", 5, words(10)),
            ("b", 10, words(40)),
        ],
        "source string, doc_id bigint, text string",
    )
    out = {r.doc_id: r.bin_id for r in pack_sequences(df, 100).collect()}
    # prefix sums (excl.): 0, 60, 120, 210, 460 -> bins 0, 0, 1, 2, 4
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 4, 10: 0}


def test_pack_texts_materializes_bins_with_offsets(spark):
    """VERDICT r5 item 4: the materialized packing emits one row per
    (stratum, bin) with concatenated text, member ids, and the token
    offset where each member starts — same binning as pack_sequences
    (docs 60/60 share bin 0; offsets 0,60)."""
    from fresco_hpc_spark.functions import pack_texts

    def words(tag, n):
        return " ".join([tag] * n)

    df = spark.createDataFrame(
        [
            ("a", 1, words("x", 60)),
            ("a", 2, words("y", 60)),
            ("a", 3, words("z", 90)),
            ("b", 10, words("q", 40)),
        ],
        "source string, doc_id bigint, text string",
    )
    out = {(r.source, r.bin_id): r for r in pack_texts(df, 100).collect()}
    assert set(out) == {("a", 0), ("a", 1), ("b", 0)}
    a0 = out[("a", 0)]
    assert (a0.n_docs, a0.n_tokens) == (2, 120)
    assert a0.doc_ids == "1,2" and a0.offsets == "0,60"
    assert a0.packed_text == words("x", 60) + "\n\n" + words("y", 60)
    a1 = out[("a", 1)]
    assert (a1.n_docs, a1.doc_ids, a1.offsets) == (1, "3", "0")
    assert out[("b", 0)].packed_text == words("q", 40)


def test_pack_texts_counts_token_bearing_separator(spark):
    """ADVICE r6: a separator that contributes whitespace-delimited
    tokens must count into the running offsets (offsets[i] is defined
    against the PACKED text), and a separator that would glue onto
    document tokens raises instead of silently shifting offsets."""
    import pytest as _pytest

    from fresco_hpc_spark.functions import pack_texts

    df = spark.createDataFrame(
        [("a", 1, "w1 w2 w3"), ("a", 2, "x1 x2"), ("a", 3, "y1")],
        "source string, doc_id bigint, text string",
    )
    out = {
        (r.source, r.bin_id): r
        for r in pack_texts(df, 100, sep=" <|doc|> ").collect()
    }
    r = out[("a", 0)]
    # packed = "w1 w2 w3 <|doc|> x1 x2 <|doc|> y1": doc 2 starts at
    # token 4 (3 doc tokens + 1 sep token), doc 3 at 4 + 2 + 1 = 7
    assert r.offsets == "0,4,7"
    assert r.packed_text.split()[4] == "x1" and r.packed_text.split()[7] == "y1"
    assert r.n_tokens == 6  # document tokens only
    with _pytest.raises(ValueError, match="sep"):
        pack_texts(df, 100, sep="<|doc|>")


def test_knn_graph_null_block_forms_own_block(spark):
    """ADVICE r6: a NULL block key must not silently drop vectors —
    null-safe join semantics put them in their own block, neighbors
    drawn only from other NULL-blocked vectors."""
    from fresco_hpc_spark.functions import knn_graph_blocked

    rows = [
        (1, "x", [1.0, 0.0]),
        (2, "x", [0.9, 0.1]),
        (3, None, [0.0, 1.0]),
        (4, None, [0.1, 0.9]),
        (5, None, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, label string, embedding array<double>")
    out = {}
    for r in knn_graph_blocked(df, k=1, block_col="label").collect():
        out[r.vec_id] = (r.neighbor_id, r.label)
    assert set(out) == {1, 2, 3, 4, 5}  # nobody vanished
    assert out[1] == (2, "x") and out[2] == (1, "x")
    # null-block vectors pick neighbors inside the null block only
    assert out[3][0] in (4, 5) and out[3][1] is None
    assert out[4][0] in (3, 5) and out[5][0] in (3, 4)


def test_dsir_prefers_target_like_documents(spark):
    """DSIR's core contract: documents sharing the target corpus's
    n-gram profile get higher log-weights than out-of-domain ones, and
    the deterministic (gumbel=False) top-k returns exactly the most
    target-like docs. The raw corpus is half medical-ish (the target
    domain), half legalese; weights must separate the halves
    completely."""
    from fresco_hpc_spark.functions import dsir_logweights, dsir_select

    med = "patient dose trial symptom clinical patient dose outcome"
    law = "plaintiff herein whereas statute covenant hereby liability"
    raw = spark.createDataFrame(
        [(i, (med if i % 2 == 0 else law) + f" filler{i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    target = spark.createDataFrame(
        [(100 + i, "patient trial dose clinical symptom outcome") for i in range(5)],
        "doc_id bigint, text string",
    )
    w = {r.doc_id: r.logw for r in dsir_logweights(raw, target, n_buckets=64).collect()}
    assert set(w) == set(range(40))
    assert min(w[i] for i in range(0, 40, 2)) > max(w[i] for i in range(1, 40, 2))
    top = dsir_select(raw, target, k=10, n_buckets=64, gumbel=False).collect()
    assert [r.sample_rank for r in top] == list(range(1, 11))
    assert all(r.doc_id % 2 == 0 for r in top)


def test_dsir_is_partition_invariant_and_validates(spark):
    """The md5 coin + micro-nat quantization make weights and the
    Gumbel selection identical under any partitioning (the property
    .sample() lacks); n_buckets < 2 raises."""
    import pytest as _pt

    from fresco_hpc_spark.functions import dsir_logweights, dsir_select

    raw = spark.createDataFrame(
        [(i, f"alpha beta gamma token{i} delta epsilon zeta") for i in range(30)],
        "doc_id bigint, text string",
    )
    target = raw.filter("doc_id < 5")
    a = dsir_logweights(raw, target, n_buckets=32).collect()
    b = dsir_logweights(
        raw.repartition(7), target.repartition(3), n_buckets=32
    ).collect()
    assert sorted((r.doc_id, r.logw_micro) for r in a) == sorted(
        (r.doc_id, r.logw_micro) for r in b
    )
    s1 = [(r.doc_id, r.select_key_micro) for r in dsir_select(
        raw, target, k=7, n_buckets=32).collect()]
    s2 = [(r.doc_id, r.select_key_micro) for r in dsir_select(
        raw.repartition(5), target, k=7, n_buckets=32).collect()]
    assert s1 == s2 and len(s1) == 7
    with _pt.raises(ValueError):
        dsir_logweights(raw, target, n_buckets=1)


def test_int8_quantization_roundtrip_and_recall(spark):
    """Int8 scalar quantization contract: codes stay in [-127, 127]
    and dequantize within half a quantization step; per-vector scales
    cancel in cosine, so top-10 over the codes recalls >= 8/10 of the
    exact scan on the real embeddings table; NULL vectors drop, the
    zero vector quantizes to zero codes and is excluded from search;
    a zero-norm probe raises."""
    import pytest as _pt

    from fresco_hpc_spark.functions import (
        ann_topk_int8,
        brute_force_knn,
        quantize_embeddings_int8,
    )
    from fresco_hpc_spark.sources import table
    from tests.conftest import SF_SMALL

    emb = table(spark, SF_SMALL, "embeddings")
    qz = quantize_embeddings_int8(emb)
    row = qz.join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).filter("vec_id = 3").head()
    assert all(-127 <= c <= 127 for c in row["codes"])
    for c, x in zip(row["codes"], row["embedding"]):
        assert abs(c * row["scale"] - float(x)) <= row["scale"] / 2 + 1e-9

    probe = [int(x) for x in qz.filter("vec_id = 0").head()["codes"]]
    exact = {r.vec_id for r in brute_force_knn(
        emb, [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]],
        k=10).collect()}
    quant = {r.vec_id for r in ann_topk_int8(qz, probe, k=10).collect()}
    assert len(exact & quant) >= 8, (exact, quant)

    mixed = spark.createDataFrame(
        [(1, [0.5, -1.0]), (2, [0.0, 0.0]), (3, None)],
        "vec_id bigint, embedding array<double>",
    )
    mq = quantize_embeddings_int8(mixed)
    got = {r.vec_id: (list(r.codes), r.scale) for r in mq.collect()}
    assert set(got) == {1, 2}
    assert got[1][0] == [64, -127] and got[2] == ([0, 0], 0.0)
    assert ann_topk_int8(mq, [127, 0], k=5).count() == 1  # zero vec excluded
    with _pt.raises(ValueError):
        ann_topk_int8(mq, [0, 0], k=5)


def test_pq_codes_compress_and_adc_recalls(spark):
    """PQ contract: every vector reduces to m=8 sub-codes in
    [0, n_codes); the ADC metric is squared L2 (what sums across
    subspaces — NOT cosine, so recall is measured against the exact
    L2 top-10); the production shortlist-then-rerank shape recovers
    the exact top-10 completely with a 100-candidate shortlist even on
    this worst-case near-uniform synthetic data, and a bare 50-ADC
    shortlist still holds a majority; codebooks and codes are identical
    under a different input partitioning (the determinism the oracle
    replay depends on)."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import (
        pq_adc_rerank_topk,
        pq_adc_topk,
        pq_encode,
        pq_train_codebooks,
    )
    from fresco_hpc_spark.sources import table
    from tests.conftest import SF_SMALL

    emb = table(spark, SF_SMALL, "embeddings")
    cbs = pq_train_codebooks(emb, m=8, n_codes=16, iterations=2)
    assert len(cbs) == 8 and all(len(cb) == 16 for cb in cbs)
    codes = pq_encode(emb, cbs)
    sample = codes.head(20)
    assert all(
        len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes)
        for r in sample
    )

    q = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    qlit = F.array(*[F.lit(v) for v in q])
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d2 = F.aggregate(
        F.zip_with(v, qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    exact = [
        r.vec_id
        for r in emb.select("vec_id", d2.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    short50 = {r.vec_id for r in pq_adc_topk(codes, q, cbs, k=50).collect()}
    assert len(set(exact) & short50) >= 6, (exact, short50)
    reranked = [
        r.vec_id
        for r in pq_adc_rerank_topk(
            codes, emb, q, cbs, k=10, shortlist=100
        ).collect()
    ]
    assert reranked == exact, (reranked, exact)

    cbs2 = pq_train_codebooks(emb.repartition(7), m=8, n_codes=16, iterations=2)
    assert cbs2 == cbs
    a = sorted((r.vec_id, list(r.codes)) for r in codes.collect())
    b = sorted(
        (r.vec_id, list(r.codes))
        for r in pq_encode(emb.repartition(5), cbs2).collect()
    )
    assert a == b

    import pytest as _pt

    with _pt.raises(ValueError, match="divisible"):
        pq_train_codebooks(emb, m=7)


def test_document_fingerprint_rejects_existing_fingerprint_col(spark):
    """ADVICE r10: keep_cols=True does select('*', fp); if the input
    already carries a 'fingerprint' column the result holds two
    identically-named columns and the downstream groupBy('fingerprint')
    (the exact corpus_curation_v5 pattern) dies on an ambiguous
    reference far from the cause — it must fail HERE, actionably."""
    import pytest as _pt

    from fresco_hpc_spark.functions import document_fingerprint

    docs = spark.createDataFrame(
        [(1, "some text", "deadbeef")], ["doc_id", "text", "fingerprint"]
    )
    with _pt.raises(ValueError, match="fingerprint"):
        document_fingerprint(docs, keep_cols=True)
    # the projecting form overwrites by construction and stays fine
    out = document_fingerprint(docs)
    assert out.columns == ["doc_id", "fingerprint"]
    assert out.count() == 1


def test_ivfpq_index_recall_and_probed_exactness(spark):
    """The composed IVF×PQ index (vectors.py ivfpq_build_index /
    ivfpq_query_index). Pins, in order of strength: (1) within the
    probed cells the ADC-shortlist + exact-rerank pipeline returns
    EXACTLY the L2 top-k of those cells (the 100-shortlist absorbs all
    quantization error, as with pq_adc_rerank_topk); (2) recall vs the
    GLOBAL exact top-10 is bounded only by the IVF probe choice (≥ 6/10
    on this worst-case near-uniform data at nprobe=4 of 8); (3) the
    result is invariant under input repartitioning (integer ADC keys +
    micro-quantized rerank leave nothing to merge order)."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import (
        ivf_assign,
        ivf_train_centroids,
        ivfpq_build_index,
        ivfpq_query_index,
        pq_train_codebooks,
    )
    from fresco_hpc_spark.sources import table
    from tests.conftest import SF_SMALL

    emb = table(spark, SF_SMALL, "embeddings")
    cents = ivf_train_centroids(
        emb, n_cells=8, iterations=2,
        seed_bucket_col=F.pmod(F.col("vec_id"), F.lit(8)),
    )
    cbs = pq_train_codebooks(emb, m=8, n_codes=16, iterations=2)
    q = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    spark.sql("DROP TABLE IF EXISTS t_ivfpq_idx")
    try:
        ivfpq_build_index(emb, cents, cbs, "t_ivfpq_idx")
        idx = spark.table("t_ivfpq_idx")
        # the store holds ONLY routing + codes — never the raw vectors
        assert sorted(idx.columns) == ["_cell", "codes", "vec_id"]
        res = ivfpq_query_index(
            idx, emb, q, cents, cbs, k=10, nprobe=4, shortlist=100
        ).collect()

        # (1) exact-within-probed-cells: replicate the probe ranking,
        # then the exact micro-quantized L2 top-10 of those cells
        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a) ** 0.5
            nb = sum(x * x for x in b) ** 0.5
            return dot / (na * nb) if na and nb else 0.0

        probes = [
            i for i, _ in sorted(
                enumerate(cents), key=lambda t: (-cos(t[1], q), t[0])
            )[:4]
        ]
        qlit = F.array(*[F.lit(x) for x in q])
        v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        vv = F.aggregate(F.transform(v, lambda p: p * p), F.lit(0.0), lambda a, t: a + t)
        vq = F.aggregate(F.zip_with(v, qlit, lambda p, r: p * r), F.lit(0.0), lambda a, t: a + t)
        qq = sum(x * x for x in q)
        d2 = (vv - F.lit(2.0) * vq) + F.lit(qq)
        exact_probed = (
            ivf_assign(emb, cents)
            .filter(F.col("_cell").isin(probes))
            .select(
                "vec_id",
                F.round(d2 * 1_000_000, 0).cast("bigint").alias("l2_sq_micro"),
            )
            .orderBy("l2_sq_micro", "vec_id")
            .limit(10)
            .collect()
        )
        assert [(r.vec_id, r.l2_sq_micro) for r in res] == [
            (r.vec_id, r.l2_sq_micro) for r in exact_probed
        ]

        # (2) global recall bounded only by the coarse probe
        exact_global = {
            r.vec_id
            for r in emb.select(
                "vec_id", F.round(d2 * 1_000_000, 0).cast("bigint").alias("d")
            ).orderBy("d", "vec_id").limit(10).collect()
        }
        got = {r.vec_id for r in res}
        assert len(got & exact_global) >= 6, (sorted(got), sorted(exact_global))

        # (3) partitioning invariance end to end
        ivfpq_build_index(emb.repartition(7), cents, cbs, "t_ivfpq_idx2")
        res2 = ivfpq_query_index(
            spark.table("t_ivfpq_idx2"), emb.repartition(5), q, cents, cbs,
            k=10, nprobe=4, shortlist=100,
        ).collect()
        assert [(r.vec_id, r.l2_sq_micro) for r in res] == [
            (r.vec_id, r.l2_sq_micro) for r in res2
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivfpq_idx")
        spark.sql("DROP TABLE IF EXISTS t_ivfpq_idx2")


def test_trigram_sees_what_bigram_cannot(spark):
    """The 2-word-context signal: reference = {"a b x", "y b c"}. The
    probe "a b c" stitches two reference fragments — every bigram in it
    is reference-seen with the same counts as the fluent "a b x"
    (P(x|b) = P(c|b) = 2/7), so the BIGRAM scores tie exactly; only the
    trigram model separates them ((a,b,x) seen: 2/6 vs (a,b,c) unseen:
    1/6). Plus the plain order signal: a shuffled copy scores strictly
    below the fluent original."""
    import math

    from fresco_hpc_spark.functions import (
        bigram_logprob_score,
        trigram_logprob_score,
    )

    ref = spark.createDataFrame(
        [(1, "a b x"), (2, "y b c")], "doc_id bigint, text string"
    )
    probe = spark.createDataFrame(
        [(100, "a b x"), (101, "a b c")], "doc_id bigint, text string"
    )
    bi = {r.doc_id: r.mean_logprob
          for r in bigram_logprob_score(probe, reference=ref).collect()}
    assert bi[100] == bi[101]  # bigram is blind to the stitch
    tri = {r.doc_id: r
           for r in trigram_logprob_score(probe, reference=ref).collect()}
    assert tri[100].mean_logprob > tri[101].mean_logprob
    assert tri[100].n_transitions == 1

    def mean_lp(ps):
        u = [round(math.log(p) * 1e6) for p in ps]
        return round(sum(u) / (1e6 * len(u)), 6)

    assert tri[100].mean_logprob == mean_lp([2 / 6])
    assert tri[101].mean_logprob == mean_lp([1 / 6])

    shuf = spark.createDataFrame(
        [(200, "the cat sat on the mat"), (201, "mat the sat cat the on")],
        "doc_id bigint, text string",
    )
    ref2 = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran to the cat")
         for i in range(5)],
        "doc_id bigint, text string",
    )
    t2 = {r.doc_id: r.mean_logprob
          for r in trigram_logprob_score(shuf, reference=ref2).collect()}
    assert t2[200] > t2[201]


def test_kn_logprob_hand_computed_and_normalized(spark):
    """Interpolated Kneser-Ney, D=3/4, over {(a,b):2, (b,a):2, (a,c):1}
    (ctx a: c=3, N1+=2; ctx b: c=2, N1+=1; every word has continuation
    fertility 1; N1+(··)=3): P(b|a)=21/36, P(a|b)=18/24, P(c|a)=9/36 —
    replicated through the exact integer form. The discount mass
    balances EXACTLY: Σ_w P_KN(w|u) == 1 for every context (Fraction
    arithmetic, no tolerance) — the property Laplace smoothing only
    approximates and the reason KN perplexity is calibrated."""
    import math
    from fractions import Fraction

    from fresco_hpc_spark.functions import kn_logprob_score

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "a c"), (4, "solo")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in kn_logprob_score(df).collect()}

    model = {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 1}
    ctx = {"a": (3, 2), "b": (2, 1)}
    cont = {"a": 1, "b": 1, "c": 1}
    nc = len(model)

    def p(u, w):
        c2 = model.get((u, w), 0)
        c1, n1p = ctx[u]
        num = max(4 * c2 - 3, 0) * nc + 3 * n1p * max(cont.get(w, 0), 1)
        return Fraction(num, 4 * c1 * nc)

    # exact normalization over the vocabulary, per context
    vocab = {"a", "b", "c"}
    for u in ctx:
        assert sum(p(u, w) for w in vocab) == Fraction(1), u

    def mean_lp(ps):
        u = [round(math.log(x) * 1e6) for x in ps]
        return round(sum(u) / (1e6 * len(u)), 6)

    assert out[1].n_transitions == 3
    assert out[1].mean_logprob == mean_lp(
        [float(p("a", "b")), float(p("b", "a")), float(p("a", "b"))]
    )
    assert out[2].mean_logprob == mean_lp([float(p("b", "a"))])
    assert out[3].mean_logprob == mean_lp([float(p("a", "c"))])
    assert 4 not in out

    # order signal survives KN smoothing (reference-scored)
    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran to the cat")
         for i in range(5)],
        "doc_id bigint, text string",
    )
    probe = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "mat the sat cat the on")],
        "doc_id bigint, text string",
    )
    kn = {r.doc_id: r.mean_logprob
          for r in kn_logprob_score(probe, reference=ref).collect()}
    assert kn[100] > kn[101]


def test_ensure_ivfpq_index_build_query_split(spark):
    """ensure_ivfpq_index: builds once, no-ops while the corpus
    fingerprint AND geometry parameters match (the registered query's
    repeated invocations measure query-only cost), rebuilds on a
    fingerprint change, a geometry change, or fingerprint=None — the
    ensure_text_index contract applied to the vector store. Stored
    params live with the index as TBLPROPERTIES."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import (
        ensure_ivfpq_index,
        ivf_train_centroids,
        ivfpq_query_index,
        pq_train_codebooks,
    )
    from fresco_hpc_spark.sources import table
    from tests.conftest import SF_SMALL

    emb = table(spark, SF_SMALL, "embeddings")
    cents = ivf_train_centroids(
        emb, n_cells=8, iterations=1,
        seed_bucket_col=F.pmod(F.col("vec_id"), F.lit(8)),
    )
    cbs = pq_train_codebooks(emb, m=8, n_codes=16, iterations=1)
    q = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    spark.sql("DROP TABLE IF EXISTS t_ens_ivfpq")
    try:
        assert ensure_ivfpq_index(emb, cents, cbs, "t_ens_ivfpq", fingerprint="v1")
        assert not ensure_ivfpq_index(
            emb, cents, cbs, "t_ens_ivfpq", fingerprint="v1"
        )
        res1 = ivfpq_query_index(
            spark.table("t_ens_ivfpq"), emb, q, cents, cbs, k=10, nprobe=4
        ).collect()
        # params live with the index
        props = {
            r["key"]: r["value"]
            for r in spark.sql("SHOW TBLPROPERTIES t_ens_ivfpq").collect()
        }
        assert props["fresco.n_cells"] == "8"
        assert props["fresco.m"] == "8"
        assert props["fresco.n_codes"] == "16"
        # corpus change rebuilds; geometry change rebuilds; None rebuilds
        assert ensure_ivfpq_index(emb, cents, cbs, "t_ens_ivfpq", fingerprint="v2")
        cbs4 = pq_train_codebooks(emb, m=4, n_codes=16, iterations=1)
        assert ensure_ivfpq_index(emb, cents, cbs4, "t_ens_ivfpq", fingerprint="v2")
        assert ensure_ivfpq_index(emb, cents, cbs4, "t_ens_ivfpq", fingerprint=None)
        # rebuild back to the original geometry: stored == fresh results
        assert ensure_ivfpq_index(emb, cents, cbs, "t_ens_ivfpq", fingerprint="v3")
        res2 = ivfpq_query_index(
            spark.table("t_ens_ivfpq"), emb, q, cents, cbs, k=10, nprobe=4
        ).collect()
        assert [(r.vec_id, r.l2_sq_micro) for r in res1] == [
            (r.vec_id, r.l2_sq_micro) for r in res2
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ens_ivfpq")


def test_quality_classifier_separates_and_is_deterministic(spark):
    """The learned quality gate (functions/classify.py): full-batch
    fixed-point logistic regression over hashed n-gram presence.
    Pins: (1) three rounds fully separate a lexically-separable corpus
    (every good doc's prob above every bad doc's); (2) training is
    partition-invariant to the INTEGER (BIGINT logits, micro-quantized
    residuals, HALF_UP updates leave no float merge-order anywhere);
    (3) featureless docs are omitted from training and scoring;
    (4) n_buckets < 2 and an all-empty corpus fail loudly."""
    import pytest as _pt

    from fresco_hpc_spark.functions import (
        quality_classifier_score,
        quality_classifier_train,
    )

    rows = [(i, "good clean prose with structure and meaning", 1)
            for i in range(20)]
    rows += [(100 + i, "zz qq xx spam spam keyword keyword stuffing junk", 0)
             for i in range(20)]
    rows += [(200, "   ", 0)]  # featureless: whitespace only
    df = spark.createDataFrame(rows, "doc_id bigint, text string, y int")

    w = quality_classifier_train(df, "y", n_buckets=64, iterations=3, lr=5.0)
    out = quality_classifier_score(df, w, n_buckets=64).collect()
    assert len(out) == 40  # featureless doc omitted
    good = [r for r in out if r.doc_id < 100]
    bad = [r for r in out if r.doc_id >= 100]
    assert min(r.prob for r in good) > max(r.prob for r in bad)
    assert min(r.logit_micro for r in good) > 0 > max(r.logit_micro for r in bad)
    # bias bucket is not counted as a feature hit
    assert all(r.n_buckets_hit >= 1 for r in out)

    w2 = quality_classifier_train(
        df.repartition(7), "y", n_buckets=64, iterations=3, lr=5.0
    )
    assert w == w2
    out2 = quality_classifier_score(
        df.repartition(5), w2, n_buckets=64
    ).collect()
    assert [(r.doc_id, r.logit_micro) for r in out] == [
        (r.doc_id, r.logit_micro) for r in out2
    ]

    with _pt.raises(ValueError, match="n_buckets"):
        quality_classifier_train(df, "y", n_buckets=1)
    empty = spark.createDataFrame([(1, " ", 0)], "doc_id bigint, text string, y int")
    with _pt.raises(ValueError, match="no documents"):
        quality_classifier_train(empty, "y", n_buckets=64)


def test_kmv_sketch_contract(spark):
    """KMV estimator contract (functions/sketch.py): (1) groups under k
    distinct values are EXACT; (2) a full sketch estimates within the
    ~1/sqrt(k-2) error band (asserted at 3 sigma); (3) the MERGE
    property — the union's sketch computed from the two per-side
    sketches equals the sketch built on the union directly (the 100 TB
    rollup guarantee); (4) NULL values don't count, a NULL group forms
    its own group; (5) union/intersection estimates from sketches alone
    track the true overlap; (6) k < 2 fails loudly."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import (
        kmv_distinct,
        kmv_sketch,
        kmv_union_intersect,
    )

    rows = [("small", i) for i in range(40)]            # < k: exact
    rows += [("big", i) for i in range(5000)]           # full sketch
    rows += [("dup", 7)] * 100                          # duplicates fold
    rows += [(None, i) for i in range(10)]              # NULL group
    rows += [("small", None)]                           # NULL value
    df = spark.createDataFrame(rows, "g string, v bigint")

    out = {r.g: r for r in kmv_distinct(df, "v", "g", k=64).collect()}
    assert out["small"].est_distinct == out["small"].exact_distinct == 40
    assert out["dup"].est_distinct == out["dup"].exact_distinct == 1
    assert out[None].est_distinct == out[None].exact_distinct == 10
    big = out["big"]
    assert big.exact_distinct == 5000 and big.n_seen == 64
    rel = abs(big.est_distinct - 5000) / 5000
    assert rel < 3 / (64 - 2) ** 0.5, (big.est_distinct, rel)

    # merge property: sketch(A ∪ B) == k-smallest of sketch(A)+sketch(B)
    a = df.filter("g = 'big' AND v < 3000").withColumn("g", F.lit("x"))
    b = df.filter("g = 'big' AND v >= 2000").withColumn("g", F.lit("y"))
    u = df.filter("g = 'big'").withColumn("g", F.lit("u"))
    sk = kmv_sketch(a.union(b), "v", "g", k=64)
    ha, hb = [
        [int(x) for x in r.hs]
        for r in sk.orderBy("g").collect()
    ]
    merged = sorted(set(ha) | set(hb))[:64]
    hu = [int(x) for x in kmv_sketch(u, "v", "g", k=64).first().hs]
    assert merged == hu

    # sketch-only set algebra vs truth: |x|=3000, |y|=3000, |x∩y|=1000
    est = kmv_union_intersect(sk, k=64, group_col="g").first()
    assert abs(est.union_est - 5000) / 5000 < 3 / (64 - 2) ** 0.5
    true_j = 1000 / 5000
    assert abs(est.jaccard_est - true_j) < 0.2, est
    assert 0 < est.inter_est < 3000

    with _pt.raises(ValueError, match="k must be"):
        kmv_sketch(df, "v", "g", k=1)


def test_hll_sketch_contract(spark):
    """HLL register contract (functions/sketch.py): (1) the estimate
    lands inside the ~1.04/sqrt(m) error band (asserted at 4 sigma) on
    a 5000-distinct group; (2) the MERGE property is EXACT — registers
    built per-shard and MAX-merged equal registers built directly, so
    the merged estimate is bit-identical, not merely close; (3)
    duplicates fold (a group of one repeated value estimates 1 through
    the linear-counting branch); (4) NULL values are skipped and a NULL
    group survives as its own group; (5) rho is integer-exact: every
    register value sits in [1, 61-b]; (6) b outside [4, 14] fails
    loudly."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    rows = [("big", i) for i in range(5000)]
    rows += [("dup", 7)] * 100
    rows += [(None, i) for i in range(10)]
    rows += [("big", None)]
    df = spark.createDataFrame(rows, "g string, v bigint")

    b = 9
    out = {r.g: r for r in hll_distinct(df, "v", "g", b=b).collect()}
    m = 1 << b
    assert out["dup"].est_distinct == out["dup"].exact_distinct == 1
    assert out[None].exact_distinct == 10
    assert abs(out[None].est_distinct - 10) <= 1
    big = out["big"]
    assert big.exact_distinct == 5000
    rel = abs(big.est_distinct - 5000) / 5000
    assert rel < 4 * 1.04 / m**0.5, (big.est_distinct, rel)

    # merge property: per-shard registers MAX-merge to the direct build
    shards = df.filter("g = 'big' AND v IS NOT NULL").withColumn(
        "shard", (F.col("v") % 7).cast("int")
    )
    per_shard = hll_sketch(shards, "v", ["g", "shard"], b=b)
    merged = hll_merge(per_shard.drop("shard"), group_col="g")
    direct = hll_sketch(df.filter("g = 'big'"), "v", "g", b=b)
    sym_diff = merged.exceptAll(direct).union(direct.exceptAll(merged))
    assert sym_diff.count() == 0  # registers identical, not just close
    est_m = hll_estimate(merged, b=b, group_col="g").first()
    assert est_m.est_distinct == big.est_distinct

    # rho bounds: integer-exact leading-zero count stays in range
    regs = direct.select(F.min("r"), F.max("r")).first()
    assert 1 <= regs[0] and regs[1] <= 61 - b

    with _pt.raises(ValueError, match="precision b"):
        hll_sketch(df, "v", "g", b=3)
    with _pt.raises(ValueError, match="precision b"):
        hll_sketch(df, "v", "g", b=15)


def test_char_entropy_signal(spark):
    """Char-entropy gibberish signal (functions/text.py char_entropy):
    a single-char flood has H = 0 exactly; a string of n distinct chars
    has H = ln(n) exactly; prose sits between a flood and a
    base64-looking blob; hand-check of a small mixed case through the
    same micro-unit arithmetic; empty/NULL omitted."""
    import math

    from fresco_hpc_spark.functions import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaaaaaaaa"),
            (2, "abcdefghij"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "QmFzZTY0IGJsb2JzIGxvb2sgbGlrZSB0aGlzIQ3x9Zk2"),
            (5, "aab"),
            (6, ""),
            (7, None),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].entropy_nats == 0.0 and out[1].distinct_chars == 1
    assert out[2].entropy_nats == round(math.log(10), 6)
    # hand-check "aab": H = ln(3) - (2·ln2 + 1·ln1)/3, micro-unit path
    u = round(2 * math.log(2.0) * 1e6) + round(1 * math.log(1.0) * 1e6)
    assert out[5].entropy_nats == round(math.log(3.0) - u / (1e6 * 3), 6)
    # flood < prose < base64-ish blob
    assert out[1].entropy_nats < out[3].entropy_nats < out[4].entropy_nats


def test_cms_sketch_contract(spark):
    """Count-Min contract (functions/sketch.py): (1) estimates NEVER
    underestimate — checked for EVERY distinct value, not just heavy
    hitters; (2) with w far above the distinct count, heavy hitters
    estimate exactly (collisions add only light-tail mass); (3) the
    MERGE property — summing two shards' counter matrices equals the
    sketch of the union (additivity); (4) the sketch never exceeds d·w
    rows; (5) bad params fail loudly."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import cms_estimate, cms_sketch

    rows = [("heavy",)] * 500 + [("mid",)] * 50
    rows += [(f"tail{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")

    sk = cms_sketch(df, "v", d=4, w=256)
    assert sk.count() <= 4 * 256
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    est = cms_estimate(sk, exact.select("v"), "v", d=4, w=256)
    joined = exact.join(est, "v").collect()
    assert len(joined) == 202
    for r in joined:
        assert r.cms_est >= r.c, (r.v, r.cms_est, r.c)
    by_v = {r.v: r for r in joined}
    assert by_v["heavy"].cms_est == 500  # w >> distinct: exact
    assert by_v["mid"].cms_est == 50

    # merge = counter sum: shard sketches fold into the union's sketch
    a = spark.createDataFrame(rows[:400], "v string")
    b = spark.createDataFrame(rows[400:], "v string")
    merged = (
        cms_sketch(a, "v", d=4, w=256)
        .unionByName(cms_sketch(b, "v", d=4, w=256))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r.row, r.col): r.cnt for r in sk.collect()}
    assert {(r.row, r.col): r.cnt for r in merged.collect()} == full

    with _pt.raises(ValueError, match="need d"):
        cms_sketch(df, "v", d=0)


def test_bloom_decontaminate_contract(spark):
    """Bloom prefilter contract (functions/bloom.py): (1) NO FALSE
    NEGATIVES — n_overlap/contaminated equal ngram_decontaminate's
    exactly, per doc; (2) candidates ⊇ exact hits always; (3) a
    deliberately tiny filter (m_words=1, 32 bits for everything) still
    returns EXACT n_overlap — false positives only cost candidate
    volume, never correctness; (4) the bitmap relation is mergeable
    (bit_or over the union == filter of the union set); (5) bad params
    fail loudly."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import (
        bloom_build,
        bloom_decontaminate,
        ngram_decontaminate,
    )

    docs = [(i, f"w{i} common words here and also unique{i} tail{i} x y z")
            for i in range(40)]
    # doc 100 shares a full 4-gram window with doc 0's text
    docs += [(100, "w0 common words here trailing stuff one two three")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    ev = df.filter("doc_id = 0")
    train = df.filter("doc_id <> 0")

    exact = {r.doc_id: r for r in ngram_decontaminate(train, ev, n=4).collect()}
    bl = {r.doc_id: r
          for r in bloom_decontaminate(train, ev, n=4, m_words=64, k=4).collect()}
    assert set(bl) == set(exact)
    for d in exact:
        assert bl[d].n_overlap == exact[d].n_overlap, d
        assert bl[d].contaminated == exact[d].contaminated, d
        assert bl[d].n_bloom_candidates >= bl[d].n_overlap, d
    assert bl[100].contaminated and bl[100].n_overlap >= 1

    # saturated 32-bit filter: every gram is a candidate, counts exact
    tiny = {r.doc_id: r
            for r in bloom_decontaminate(train, ev, n=4, m_words=1, k=2).collect()}
    for d in exact:
        assert tiny[d].n_overlap == exact[d].n_overlap, d

    # merge: bit_or over two sets' bitmaps == bitmap of the union
    t1 = spark.createDataFrame([("alpha",), ("beta",)], "token string")
    t2 = spark.createDataFrame([("beta",), ("gamma",)], "token string")
    merged = (
        bloom_build(t1, m_words=8).unionByName(bloom_build(t2, m_words=8))
        .groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    direct = bloom_build(t1.unionByName(t2), m_words=8)
    assert {(r.word, r.bits) for r in merged.collect()} == {
        (r.word, r.bits) for r in direct.collect()
    }

    with _pt.raises(ValueError, match="m_words"):
        bloom_build(t1, m_words=0)


def test_perplexity_buckets_semantics(spark):
    """The CCNet split: three buckets partition the scored corpus, tie
    values share a bucket (value-based labeling, not ntile), bucket
    means are ordered (1 = lowest logprob = tail), and counts sum to
    the scored-doc total."""
    import __spark_entry__ as entry
    from tests.conftest import SF_SMALL

    out = entry.q_perplexity_buckets(spark, SF_SMALL).collect()
    assert [r.bucket for r in out] == [1, 2, 3]
    assert all(r.n_docs > 0 for r in out)
    assert out[0].avg_logprob < out[1].avg_logprob < out[2].avg_logprob
    assert out[0].max_logprob <= out[1].min_logprob
    assert out[1].max_logprob <= out[2].min_logprob
    from fresco_hpc_spark.functions import kn_logprob_score
    from fresco_hpc_spark.sources import table

    n_scored = kn_logprob_score(table(spark, SF_SMALL, "documents")).count()
    assert sum(r.n_docs for r in out) == n_scored


def test_rp_ann_recall_and_determinism(spark):
    """JL sign-projection ANN (functions/vectors.py rp_project +
    ann_rp_rerank_topk): recall@10 >= 0.7 vs exact brute force on the
    sf0.1 embeddings through a 64→40 projection with shortlist 200 (the
    synthetic corpus is the JL worst case — near-orthogonal with ~0.03
    neighbor gaps — so the projection keeps 40 of 64 dims; real
    embedding corpora separate far more); the
    query's own row is the top hit; the sign matrix is frozen
    (regenerating it yields the identical literal matrix — the oracle
    inlines it); shortlist < k fails loudly."""
    import pytest as _pt

    from fresco_hpc_spark.functions import (
        ann_rp_rerank_topk,
        brute_force_knn,
        rp_sign_matrix,
    )
    from fresco_hpc_spark.sources import table

    emb = table(spark, SF_MED, "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    exact = [r.vec_id for r in brute_force_knn(emb, qv, k=10).collect()]
    approx = [
        r.vec_id
        for r in ann_rp_rerank_topk(
            emb, query_id=0, out_dim=40, shortlist=200, k=10
        ).collect()
    ]
    assert approx[0] == 0
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.7, f"RP-ANN recall {recall} too low"

    m1 = rp_sign_matrix(16, 64)
    m2 = rp_sign_matrix(16, 64)
    assert m1 == m2
    assert {v for row in m1 for v in row} == {1.0, -1.0}
    # rows differ from each other (the LCG is advancing, not stuck)
    assert len({tuple(r) for r in m1}) == 16

    with _pt.raises(ValueError, match="shortlist"):
        ann_rp_rerank_topk(emb, shortlist=5, k=10)
    with _pt.raises(ValueError, match="out_dim"):
        rp_sign_matrix(0, 64)


def test_cms_heavy_hitters_contract(spark):
    """Heavy-hitter contract (functions/sketch.py cms_heavy_hitters):
    output is EXACTLY the values with true count >= threshold (the CMS
    prefilter is a superset — zero false negatives — and the exact
    recount removes its false positives); cms_est >= cnt on every row
    (one-sided error); heaviest-first ordering; threshold < 1 fails
    loudly."""
    import pytest as _pt

    from fresco_hpc_spark.functions import cms_heavy_hitters

    rows = (
        [("heavy",)] * 120
        + [("warm",)] * 60
        + [("mid",)] * 50
        + [("light%d" % i,) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "v string")
    out = cms_heavy_hitters(df, "v", threshold=50, d=4, w=64).collect()
    assert [(r.v, r.cnt) for r in out] == [
        ("heavy", 120), ("warm", 60), ("mid", 50)
    ]
    assert all(r.cms_est >= r.cnt for r in out)
    # threshold above everything -> empty, not an error
    assert cms_heavy_hitters(df, "v", threshold=1000, d=4, w=64).count() == 0
    with _pt.raises(ValueError, match="threshold"):
        cms_heavy_hitters(df, "v", threshold=0)


def test_hard_negative_mining_contract(spark):
    """Hard-negative contract (functions/vectors.py
    hard_negative_mining): every mined pair crosses labels; the probe
    set is the n smallest ids; per probe the top-k other-label
    neighbors come back in exact-cosine order (checked against a
    driver-side recompute); NULL labels count as a distinct class
    (null-safe inequality); bad params fail loudly."""
    import math

    import pytest as _pt

    from fresco_hpc_spark.functions import hard_negative_mining

    rows = []
    for i in range(12):
        lab = None if i == 11 else i % 3
        vec = [math.cos(0.37 * i + 0.11 * j) for j in range(8)]
        rows.append((i, vec, lab))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")
    out = hard_negative_mining(df, n_probes=3, k=4).collect()
    assert sorted({r.query_id for r in out}) == [0, 1, 2]
    labels = {i: r[2] for i, r in zip(range(12), rows)}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        return round(num / den, 6)

    for q in (0, 1, 2):
        got = [(r.neighbor_id, r.cosine_sim) for r in out if r.query_id == q]
        cands = [
            (cos(rows[n][1], rows[q][1]), n)
            for n in range(12)
            if labels[n] != labels[q]
        ]
        want = [
            (n, c) for c, n in sorted(cands, key=lambda t: (-t[0], t[1]))[:4]
        ]
        assert got == want, (q, got, want)
        assert all(labels[n] != labels[q] for n, _ in got)

    with _pt.raises(ValueError, match="n_probes"):
        hard_negative_mining(df, n_probes=0)


def test_normalize_text_canonical_form(spark):
    """normalize_text contract: lowercase, fixed-table accent fold,
    control chars -> spaces, whitespace collapse, trim; blank text
    normalizes to the empty string with length 0."""
    from fresco_hpc_spark.functions import normalize_text

    rows = [
        (1, "  Héllo\tWÖRLD  "),   # uppercase Ö folds via lower() first
        (2, "café \x01du\x7f  monde"),
        (3, "   "),
        (4, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: (r.norm_text, r.n_norm_chars) for r in normalize_text(df).collect()}
    assert out[1] == ("hello world", 11)
    assert out[2] == ("cafe du monde", 13)
    assert out[3] == ("", 0)
    assert out[4] == ("plain", 5)


def test_tfidf_search_ranking(spark):
    """tfidf_search contract: a document that IS the query ranks first
    with the highest cosine; docs sharing rarer query terms outrank
    docs sharing only common ones; OOV-only queries return empty (the
    sklearn vocabulary convention); guards fail loudly."""
    import pytest as _pt

    from fresco_hpc_spark.functions import tfidf_search

    rows = [
        (1, "fast table scan"),            # the query itself
        (2, "fast fast fast everywhere"),  # common term, high tf
        (3, "table scan plan"),            # two query terms
        (4, "unrelated words entirely"),
        (5, "fast word"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = tfidf_search(df, "fast table scan", top_k=5).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1 and out[0].cosine_sim > 0.99
    assert 4 not in ids  # shares no query term
    sims = {r.doc_id: r.cosine_sim for r in out}
    assert sims[3] > sims[2] and sims[3] > sims[5]

    assert tfidf_search(df, "zzz qqq", top_k=5).count() == 0
    with _pt.raises(ValueError, match="query"):
        tfidf_search(df, "   ")
    with _pt.raises(ValueError, match="top_k"):
        tfidf_search(df, "fast", top_k=0)


def test_ann_recall_at_k_contract(spark):
    """Recall@k eval contract: identical rankings score 1.0 at every k;
    a half-overlapping top-10 scores the exact overlap fraction; ks
    must be positive."""
    import pytest as _pt

    from fresco_hpc_spark.functions import ann_recall_at_k

    truth = spark.createDataFrame(
        [(i, 1.0 - i / 100.0) for i in range(10)], "vec_id bigint, cosine_sim double"
    )
    same = ann_recall_at_k(truth, truth, ks=(1, 5, 10)).collect()
    assert [(r.k, r.hits, r.recall) for r in same] == [
        (1, 1, 1.0), (5, 5, 1.0), (10, 10, 1.0)
    ]
    # approx finds ids 0,1,2,3,4 then 100..104 (misses 5..9)
    approx = spark.createDataFrame(
        [(i, 1.0 - i / 100.0) for i in range(5)]
        + [(100 + i, 0.5 - i / 100.0) for i in range(5)],
        "vec_id bigint, cosine_sim double",
    )
    half = {r.k: r for r in ann_recall_at_k(truth, approx, ks=(1, 5, 10)).collect()}
    assert half[1].recall == 1.0 and half[5].recall == 1.0
    assert half[10].hits == 5 and half[10].recall == 0.5
    # ADVICE r11: the denominator caps at |truth| — a 3-row corpus can
    # still score a perfect recall@10 (3/3, not 3/10) ...
    tiny = spark.createDataFrame(
        [(i, 1.0 - i / 100.0) for i in range(3)],
        "vec_id bigint, cosine_sim double",
    )
    capped = {r.k: r for r in ann_recall_at_k(tiny, tiny, ks=(10,)).collect()}
    assert capped[10].hits == 3 and capped[10].recall == 1.0
    # ... and a fully-disjoint retrieval still emits one row per
    # requested k, with zero hits, instead of an empty relation
    disjoint = spark.createDataFrame(
        [(100 + i, 1.0 - i / 100.0) for i in range(3)],
        "vec_id bigint, cosine_sim double",
    )
    zero = ann_recall_at_k(tiny, disjoint, ks=(1, 5)).collect()
    assert [(r.k, r.hits, r.recall) for r in zero] == [
        (1, 0, 0.0), (5, 0, 0.0)
    ]
    with _pt.raises(ValueError, match="ks"):
        ann_recall_at_k(truth, approx, ks=(0,))


def test_mmr_diversify_contract(spark):
    """MMR contract: the first pick is the relevance argmax; a
    near-duplicate of the first pick is PASSED OVER in favor of a
    diverse lower-relevance candidate once the diversity term bites;
    λ=1 degenerates to pure relevance order; k < m yields min(m, k)
    rows; bad params fail loudly."""
    import pytest as _pt

    from fresco_hpc_spark.functions import mmr_diversify

    rows = [
        (1, 0.99, [1.0, 0.0, 0.0]),     # top relevance
        (2, 0.98, [0.999, 0.01, 0.0]),  # near-dup of 1
        (3, 0.50, [0.0, 1.0, 0.0]),     # diverse, lower relevance
        (4, 0.40, [0.0, 0.0, 1.0]),     # diverse
    ]
    cand = spark.createDataFrame(
        rows, "vec_id bigint, cosine_sim double, embedding array<double>"
    )
    out = [r.vec_id for r in mmr_diversify(cand, m=3, lam=0.5).collect()]
    assert out[0] == 1          # relevance argmax first
    assert out[1] in (3, 4)     # the near-dup 2 is passed over
    assert 2 not in out[:2]

    pure = [r.vec_id for r in mmr_diversify(cand, m=4, lam=1.0).collect()]
    assert pure == [1, 2, 3, 4]  # λ=1: relevance order exactly

    short = mmr_diversify(cand.limit(2), m=5, lam=0.7).collect()
    assert len(short) == 2 and [r.mmr_rank for r in short] == [1, 2]

    with _pt.raises(ValueError, match="m must"):
        mmr_diversify(cand, m=0)
    with _pt.raises(ValueError, match="lam"):
        mmr_diversify(cand, lam=1.5)


def test_mmr_diversify_degenerate_candidates(spark):
    """ADVICE r12 guards: a zero-norm embedding must not raise
    ZeroDivisionError (its pairwise similarity is 0 — SQL's x/0.0 →
    NULL semantics); a NULL relevance row drops from the pool like a
    NULL embedding; λ=0 still picks the relevance argmax first
    (standard MMR — step 1 has no diversity term by definition), then
    pure-diversity picks for the rest."""
    from fresco_hpc_spark.functions import mmr_diversify

    rows = [
        (1, 0.90, [1.0, 0.0]),
        (2, 0.80, [0.0, 0.0]),   # zero-norm: sim vs anything = 0
        (3, None, [0.0, 1.0]),   # NULL relevance: dropped from pool
        (4, 0.70, [0.9, 0.1]),
    ]
    cand = spark.createDataFrame(
        rows, "vec_id bigint, cosine_sim double, embedding array<double>"
    )
    out = mmr_diversify(cand, m=4, lam=0.5).collect()
    ids = [r.vec_id for r in out]
    assert 3 not in ids and len(ids) == 3
    assert ids[0] == 1           # relevance argmax
    assert ids[1] == 2           # zero-norm: sim 0 -> most diverse

    lam0 = mmr_diversify(cand, m=3, lam=0.0).collect()
    assert lam0[0].vec_id == 1   # NOT the lowest id — the rel argmax
    # λ=0 after step 1: pure diversity; 2 (sim 0 to everything) wins
    assert lam0[1].vec_id == 2


def test_reciprocal_rank_fusion_contract(spark):
    """RRF contract (Cormack et al. 2009): a document in BOTH lists
    outranks a single top-1 from either list alone once ranks are deep
    enough; a document missing from one list carries a NULL rank there
    and only one credit; exact micro credits replay; bad params fail
    loudly."""
    import pytest as _pt

    from fresco_hpc_spark.functions import reciprocal_rank_fusion

    lex = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id bigint, s double"
    )
    sem = spark.createDataFrame(
        [(9, 0.99), (2, 0.5), (3, 0.4)], "doc_id bigint, s double"
    )
    out = reciprocal_rank_fusion(
        [(lex, "s", "lex_rank"), (sem, "s", "sem_rank")],
        id_col="doc_id", k_const=60, top_k=10,
    ).collect()
    rows = {r.doc_id: r for r in out}
    # doc 2: lex rank 2 + sem rank 2 -> 2*round(1e6/62) = 32258
    assert rows[2].rrf_micro == 2 * round(1_000_000.0 / 62)
    # doc 1: only lex, rank 1 -> round(1e6/61); sem_rank NULL
    assert rows[1].rrf_micro == round(1_000_000.0 / 61)
    assert rows[1].sem_rank is None and rows[9].lex_rank is None
    # agreement beats a single top-1: doc 2 (both lists) outranks 1 & 9
    order = [r.doc_id for r in out]
    assert order.index(2) < order.index(1)
    assert order.index(2) < order.index(9)
    with _pt.raises(ValueError, match="ranked"):
        reciprocal_rank_fusion([(lex, "s", "r")])
    with _pt.raises(ValueError, match="k_const"):
        reciprocal_rank_fusion(
            [(lex, "s", "a"), (sem, "s", "b")], k_const=0
        )
    # ADVICE r12: repeated rank_name / shadowed id_col fail at the API
    # boundary, not as a late ambiguous-column join error
    with _pt.raises(ValueError, match="distinct"):
        reciprocal_rank_fusion([(lex, "s", "r"), (sem, "s", "r")])
    with _pt.raises(ValueError, match="shadow"):
        reciprocal_rank_fusion(
            [(lex, "s", "doc_id"), (sem, "s", "b")]
        )
    # a duplicated id inside one list keeps only its best rank — the
    # full-outer join must not fan out and double-count the credit
    dup = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (2, 0.7)], "doc_id bigint, s double"
    )
    fused = reciprocal_rank_fusion(
        [(dup, "s", "lex_rank"), (sem, "s", "sem_rank")],
        id_col="doc_id",
    ).collect()
    by_id = {r.doc_id: r for r in fused}
    assert by_id[1].lex_rank == 1
    assert by_id[1].rrf_micro == round(1_000_000.0 / 61)
    # ADVICE r13: the dedup happens BEFORE ranking, so the document
    # after the duplicate gets rank 2 (gap-free), not rank 3 — its
    # 1/(k+rank) credit matches a dedup-first ranking
    assert by_id[2].lex_rank == 2


def test_rr_rotation_contract(spark):
    """OPQ-lite rotation (rr_perm_signs / rotate_vectors): the
    transform is an exact isometry (per-vector norm preserved to
    summation-order noise), the permutation is a true permutation,
    the driver-side rotate_query twin matches the distributed
    rotation, and the certified recall of the rotated PQ chain stays
    within one top-10 hit of plain PQ on this ~iid corpus (the
    rotation's GAIN needs correlated dims; the pin is that it never
    meaningfully degrades)."""
    import __spark_entry__ as m
    from fresco_hpc_spark.functions import (
        rotate_query,
        rotate_vectors,
        rr_perm_signs,
    )
    from fresco_hpc_spark.sources.readers import table

    perm, signs = rr_perm_signs(64, 41)
    assert sorted(perm) == list(range(64))
    assert set(signs) <= {1.0, -1.0} and -1.0 in signs
    assert (perm, signs) == rr_perm_signs(64, 41)  # deterministic

    emb = table(spark, "/root/testdata/sf0.001", "embeddings").limit(20)
    orig = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.collect()}
    rot = {r.vec_id: [float(x) for x in r.embedding]
           for r in rotate_vectors(emb, perm, signs).collect()}
    for vid, v in orig.items():
        got = rot[vid]
        assert got == rotate_query(v, perm, signs)
        assert abs(sum(x * x for x in got) - sum(x * x for x in v)) < 1e-9

    pq = {r.k: r.hits for r in
          m.q_ann_recall_pq(spark, "/root/testdata/sf0.001").collect()}
    opq = {r.k: r.hits for r in
           m.q_ann_recall_opq(spark, "/root/testdata/sf0.001").collect()}
    assert pq[1] == 1 and opq[1] == 1  # the true NN survives ADC
    assert abs(pq[10] - opq[10]) <= 1


def test_token_id_fast_path_equals_string_path(spark, docs_with_dups):
    """The bigint token-id fast path (materialize=True; VERDICT r14
    item 1) must return byte-identical pair relations to the lazy
    string-keyed path for all four pair generators — the collision
    audit passed, so tid-equality IS token-equality."""
    from fresco_hpc_spark.functions import (
        ngram_containment_pairs,
        ngram_containment_pairs_prefix,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    cases = [
        lambda m: ngram_jaccard_pairs_prefix(
            docs_with_dups, n=3, threshold=0.5, materialize=m
        ),
        lambda m: ngram_containment_pairs_prefix(
            docs_with_dups, n=3, threshold=0.8, materialize=m
        ),
        lambda m: ngram_jaccard_pairs(
            docs_with_dups, n=1, threshold=0.5, max_token_freq=10**9,
            materialize=m,
        ),
        lambda m: ngram_containment_pairs(
            docs_with_dups, n=1, threshold=0.8, max_token_freq=10**9,
            materialize=m,
        ),
    ]
    for build in cases:
        fast = [tuple(r) for r in build(True).collect()]
        exact = [tuple(r) for r in build(False).collect()]
        assert fast == exact and len(exact) > 0


def test_token_id_collision_falls_back_to_exact(spark, docs_with_dups, monkeypatch):
    """A colliding token-id hash must trip the audit and fall back to
    the exact string path: identical output, and the collided hashed
    cache is released (no storage leak on the fallback route)."""
    from pyspark.sql import functions as F

    from fresco_hpc_spark.functions import dedup as d

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    expected = [
        tuple(r)
        for r in d.ngram_jaccard_pairs_prefix(
            docs_with_dups, n=3, threshold=0.5
        ).collect()
    ]
    assert expected
    docs_with_dups.count()
    base = n_persisted()
    # 8 buckets over a many-thousand-shingle vocabulary: guaranteed
    # collisions, so the audit MUST reject the fast path
    monkeypatch.setattr(
        d, "_TOKEN_ID_EXPR", lambda c: F.pmod(F.xxhash64(c), F.lit(8))
    )
    got = [
        tuple(r)
        for r in d.ngram_jaccard_pairs_prefix(
            docs_with_dups, n=3, threshold=0.5, materialize=True
        ).collect()
    ]
    assert got == expected
    # the fallback still checkpoints its result (<=1 live block) but the
    # rejected hashed cache must not linger; allow slack for the async
    # ContextCleaner racing this count
    assert n_persisted() - base <= 2
