"""Learned quality classification — the fastText/CCNet-style linear
classifier a pretraining pipeline trains on "good vs raw" labels and
sweeps over the corpus (the model-based sibling of the rule gates and
LM scores in functions/text.py).

Architecture (Spark-first, oracle rules 8/10 compliant end to end):
logistic regression over HASHED N-GRAM PRESENCE features (the DSIR
feature space of functions/sampling.py, binarized — presence bounds
every per-feature magnitude at 1), trained by full-batch gradient
ascent in INTEGER MICRO-UNIT fixed point:

- weights live in micro-units as BIGINTs; the bias is bucket ``-1``, a
  feature present in every document, so one uniform (doc, bucket)
  relation carries logits, gradients, and updates;
- per-document logits are exact BIGINT sums (order-free);
- the sigmoid is the only float op: both engines evaluate
  ``1/(1+exp(-(z/1e6)))`` on the identical double, and the residual is
  micro-quantized HALF_UP per (doc, bucket) BEFORE the gradient sum —
  the same partial-agg-noise kill as every other micro-unit operator;
- the weight update ``round(lr·g/n)`` divides exact BIGINTs in double
  with one literal, identical on the driver (Decimal HALF_UP — Python's
  round() is banker's) and in the oracle's replayed SQL.

Training is full-batch and unrolled: ``iterations`` rounds, each ONE
Spark job over the persisted presence relation (bounded 1 + n_buckets
row collect per round — the driver-held-codebook pattern of
ivf_train_centroids / pq_train_codebooks). The DuckDB oracle replays
every round as CTEs, so the trained weights — not just the scores —
are certified.

Scale shape (100 TB): feature extraction is map-only; the presence
relation is one distinct per (doc, bucket); each round is one equi-join
against a broadcast-sized literal weight array plus one
``n_buckets``-group aggregate with map-side partials. Nothing is
corpus² and no window spans the corpus. Gradient magnitudes stay exact:
``|g| ≤ n_docs·1e6`` micro-units, inside double's 2^53 integer range up
to ~9×10⁹ documents (shard-and-merge past that).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fresco_hpc_spark.functions.dedup import _h60
from fresco_hpc_spark.functions.sampling import _dsir_features

_MICRO = 1_000_000


def _presence(
    df: DataFrame,
    label_col: str,
    text_col: str,
    id_col: str,
    n_buckets: int,
    salt: str,
) -> DataFrame:
    """(doc, y, bucket) PRESENCE relation over hashed unigram+bigram
    features, plus the always-present bias bucket ``-1`` for every doc
    that has at least one feature. Distinct per (doc, bucket): the
    classifier is over presence, not counts."""
    feats = _dsir_features(df, text_col, id_col)
    labels = df.select(
        F.col(id_col).alias("doc"), F.col(label_col).cast("int").alias("y")
    )
    pres = (
        feats.select(
            "doc",
            F.pmod(
                _h60(F.concat(F.lit(salt + "|"), F.col("feat"))),
                F.lit(int(n_buckets)),
            ).alias("bucket"),
        )
        .distinct()
        .join(labels, "doc")
    )
    bias = pres.select("doc", "y").distinct().select(
        "doc", F.lit(-1).cast("bigint").alias("bucket"), "y"
    )
    return pres.select("doc", "bucket", "y").unionByName(bias)


def quality_classifier_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    iterations: int = 3,
    lr: float = 5.0,
    salt: str = "qcls",
) -> dict[int, int]:
    """Train the hashed-ngram logistic classifier; returns the weight
    map ``{bucket: micro_weight}`` including the bias at bucket ``-1``
    — driver-held like every codebook here (1 + n_buckets BIGINTs).
    ``label_col`` must be 0/1. Documents with no features (empty text)
    carry no gradient and are omitted, like every tokenize-family
    operator omits them. Deterministic: integer logits, micro-quantized
    residuals, HALF_UP updates — retraining under any partitioning
    returns the identical map (pinned in tests), and the DuckDB oracle
    replays the full schedule."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from pyspark.storagelevel import StorageLevel

    # repartition by doc BEFORE the persist: every round's per-doc logit
    # aggregate AND its gradient join key on doc, so the persisted
    # distribution satisfies both — without it each round re-shuffles
    # the corpus-sized presence relation (measured 16.7 -> 624 MB at a
    # ×20 corpus = 1.87× superlinear; with it the per-round exchange is
    # the n_docs-row residual relation only)
    pres = (
        _presence(df, label_col, text_col, id_col, n_buckets, salt)
        .repartition("doc")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        n = pres.filter(F.col("bucket") == -1).count()
        if n == 0:
            raise ValueError("no documents with features to train on")
        w: dict[int, int] = {b: 0 for b in range(-1, n_buckets)}
        for _ in range(int(iterations)):
            warr = F.array(
                *[F.lit(int(w[b])).cast("bigint") for b in range(-1, n_buckets)]
            )
            z = (
                pres.groupBy("doc", "y")
                .agg(
                    F.sum(
                        F.element_at(warr, (F.col("bucket") + 2).cast("int"))
                    ).alias("z")
                )
            )
            p = F.lit(1.0) / (
                F.lit(1.0) + F.exp(-(F.col("z") / F.lit(float(_MICRO))))
            )
            r = z.select(
                "doc",
                F.round((F.col("y") - p) * _MICRO, 0)
                .cast("bigint")
                .alias("r"),
            )
            grads = (
                pres.join(r, "doc")
                .groupBy("bucket")
                .agg(F.sum("r").alias("g"))
                .collect()
            )
            for row in grads:
                g = int(row["g"])
                upd = int(
                    Decimal(repr(float(lr) * g / n)).quantize(
                        Decimal("1"), ROUND_HALF_UP
                    )
                )
                w[int(row["bucket"])] += upd
    finally:
        pres.unpersist()
    return w


def quality_classifier_score(
    df: DataFrame,
    weights: dict[int, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    salt: str = "qcls",
) -> DataFrame:
    """Score every document under trained weights: exact BIGINT logit
    (micro-units, the bias included via the always-present ``-1``
    bucket) and the 6-dp sigmoid probability. Map-only feature pass +
    one per-doc aggregate; thresholding ``prob`` is the standard
    learned quality gate. Documents with no features are omitted
    (no logit is defined for them)."""
    warr = F.array(
        *[F.lit(int(weights.get(b, 0))).cast("bigint") for b in range(-1, n_buckets)]
    )
    pres = _presence(
        df.withColumn("_y0", F.lit(0)), "_y0", text_col, id_col, n_buckets, salt
    )
    z = pres.groupBy("doc").agg(
        F.sum(F.element_at(warr, (F.col("bucket") + 2).cast("int"))).alias(
            "logit_micro"
        ),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_buckets_hit"),
    )
    prob = F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(F.col("logit_micro") / F.lit(float(_MICRO))))),
        6,
    )
    return z.select(
        F.col("doc").alias(id_col),
        "n_buckets_hit",
        "logit_micro",
        prob.alias("prob"),
    ).orderBy(id_col)
