"""Column statistics / availability probes (SURVEY.md §2.4 A1, A11, A12;
§2.2 P4).

These are the per-chart preflight queries the reference issues before
rendering (DatabaseQueries.ts:68-114, vgplot.tsx:184-219). Each is a single
hash-aggregate with map-side partial aggregation; at scale they read only
the probed column (parquet column pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, col: str) -> DataFrame:
    """A1: ``MIN, MAX, COUNT(*), null-count`` of one column
    (DatabaseQueries.ts:68-88)."""
    return df.agg(
        F.min(col).alias("min_value"),
        F.max(col).alias("max_value"),
        F.count(F.lit(1)).alias("total_count"),
        F.count(F.when(F.col(col).isNull(), 1)).alias("null_count"),
    )


def availability(df: DataFrame, col: str, time_col: str = "time") -> DataFrame:
    """P4: count of usable rows — non-null, non-zero metric with a non-null
    time (DatabaseQueries.ts:93-114, vgplot.tsx:202-219)."""
    usable = (
        F.col(col).isNotNull() & (F.col(col) != 0) & F.col(time_col).isNotNull()
    )
    return df.filter(usable).agg(F.count(F.lit(1)).alias("available_count"))


def time_extent(df: DataFrame, time_col: str = "time", with_count: bool = False) -> DataFrame:
    """A11: min/max of the time column for plot domains
    (histogram.tsx:65-72, query_builder.tsx:333-337)."""
    aggs = [
        F.min(time_col).alias("min_time"),
        F.max(time_col).alias("max_time"),
    ]
    if with_count:
        aggs.append(F.count(F.lit(1)).alias("row_count"))
    return df.agg(*aggs)


def not_null(df: DataFrame, *cols: str) -> DataFrame:
    """P3: the null-guard predicate prefixed to nearly every reference view
    (DatabaseQueries.ts:81 etc.)."""
    pred: Column = F.lit(True)
    for c in cols:
        pred = pred & F.col(c).isNotNull()
    return df.filter(pred)


def linear_trend(
    df: DataFrame,
    key_col: str,
    x: Column,
    y_col: str,
) -> DataFrame:
    """Per-key least-squares trend line — slope/intercept/r² via the
    built-in regression aggregates (``regr_slope`` etc., map-side
    combinable sufficient statistics: one groupBy, no second pass).
    The chart layer's trend overlay; ``x`` is any numeric expression
    (e.g. hours since a fixed origin keeps slopes in a readable range).
    """
    return (
        df.filter(F.col(y_col).isNotNull())
        .select(F.col(key_col), x.alias("_x"), F.col(y_col).alias("_y"))
        .groupBy(key_col)
        .agg(
            F.round(F.regr_slope("_y", "_x"), 6).alias("slope"),
            F.round(F.regr_intercept("_y", "_x"), 6).alias("intercept"),
            F.round(F.regr_r2("_y", "_x"), 6).alias("r2"),
            F.regr_count("_y", "_x").alias("n_points"),
        )
        .orderBy(key_col)
    )


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Whole-table data-quality profile (the Deequ/TFDV-style preflight a
    training-data pipeline runs before ingesting a table): one output row
    per column with row count, null count/fraction, exact distinct count,
    and min/max for orderable columns.

    ONE aggregation pass: every column's metrics are expressions in a
    single ``agg`` (Catalyst expands multi-distinct into one Expand +
    aggregate — still a single scan), then the 1-row result is unpivoted
    driver-free via ``explode`` of a metadata array. Swap
    ``countDistinct`` for ``approx_count_distinct`` at true 100 TB scale
    where a 2% HLL error is acceptable (same plan minus the Expand).

    min/max are presented as DOUBLE (numerics as-is, timestamps as epoch
    seconds, strings/binary as NULL) so the long format has one type and
    cross-engine value parity avoids string-formatting differences.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)

    # exact token match, not prefix (ADVICE r4: startswith('int') also
    # matched 'interval ...' dtypes, whose cast-to-double raises an
    # AnalysisException instead of taking the NULL min/max branch)
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}

    def _minmax(c: str):
        t = dtypes[c]
        if t in numeric or t.startswith("decimal("):
            return F.col(c).cast("double")
        if t in ("timestamp", "timestamp_ntz"):
            return F.col(c).cast("double")  # epoch seconds
        # strings, binary, date, interval, arrays, structs: no min/max
        return F.lit(None).cast("double")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(_minmax(c)).alias(f"_mn_{c}"),
            F.max(_minmax(c)).alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.round(
                    (F.col("_n") - F.col(f"_nn_{c}"))
                    / F.greatest(F.col("_n"), F.lit(1)),
                    6,
                ).alias("null_frac"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_value"),
                F.col(f"_mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(entries).alias("p"))
        .select(
            "p.column",
            F.col("p.n_rows").cast("bigint").alias("n_rows"),
            F.col("p.n_nulls").cast("bigint").alias("n_nulls"),
            F.col("p.null_frac").cast("double").alias("null_frac"),
            F.col("p.n_distinct").cast("bigint").alias("n_distinct"),
            "p.min_value",
            "p.max_value",
        )
        .orderBy("column")
    )


def standardize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    decimals: int = 2,
    out_col: str | None = None,
) -> DataFrame:
    """Feature standardization: ``z = (x − mean) / stddev`` per group
    (or globally) — the classic scaling pass before regression /
    clustering / embedding-adjacent features. Unlike
    ``rolling_zscore`` (trailing per-key window for anomaly flags),
    this is the whole-population transform.

    Engine-exact means: the value is assumed to carry ≤ ``decimals``
    decimal places (telemetry with fixed precision); sums run over the
    EXACT integer fixed-point representation (value·10^d and its
    square, both bigint — no float summation-order drift), so mean and
    variance are identical in any engine, and only the final
    sqrt/divide touch floats (rounded to 6 dp like every aggregate).
    Sample variance (n−1); groups with n < 2 or zero variance emit
    NULL z.

    Scale shape: ONE partial-aggregated groupBy over the group keys
    builds the (n, Σx, Σx²) relation, broadcast back onto the rows for
    a map-side transform (group cardinality ≪ rows; for a global
    standardize it is a 1-row broadcast cross join).
    """
    out_col = out_col or f"{value_col}_z"
    scale = 10 ** decimals
    v = F.col(value_col)
    fx = F.round(v * scale, 0).cast("bigint")
    keys = [F.col(c) for c in (group_cols or [])]
    stats = (
        df.filter(v.isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(fx).alias("_s1"),
            F.sum(fx * fx).alias("_s2"),
        )
    )
    mean = F.col("_s1") / (F.lit(float(scale)) * F.col("_n"))
    # sample variance from exact integer sums:
    # var = (Σx² − (Σx)²/n) / (scale²·(n−1)).
    # (Σx)² is computed in DOUBLE — squaring the bigint would overflow
    # for Σx beyond ~3e9; Σx itself stays ≤ 2^53 (exact as double) for
    # any realistic fixed-point telemetry volume per group, which is
    # the documented bound of this exactness scheme.
    s1d = F.col("_s1").cast("double")
    var = (
        (F.col("_s2") - (s1d * s1d) / F.col("_n"))
        / (F.lit(float(scale * scale)) * (F.col("_n") - 1))
    )
    sd = F.sqrt(var)
    joined = (
        df.join(F.broadcast(stats), group_cols, "left")
        if group_cols
        else df.crossJoin(F.broadcast(stats))
    )
    z = F.when(
        (F.col("_n") >= 2) & (sd > 0) & v.isNotNull(),
        F.round((v - mean) / sd, 6),
    )
    return joined.withColumn(out_col, z).drop("_n", "_s1", "_s2")


def fk_audit(
    pairs: list[tuple[str, "DataFrame", str, "DataFrame", str]],
) -> "DataFrame":
    """Referential-integrity audit across table relationships: for each
    ``(name, child, fk_col, parent, pk_col)`` one summary row —
    child-row count, NULL foreign keys, ORPHAN rows (non-null FK with
    no parent), and distinct missing key values. The pre-join data-
    quality gate a pipeline runs before trusting a star schema: a
    non-zero orphan rate silently becomes dropped rows at the first
    inner join.

    Scale shape: per relationship, one anti equi-join of the child's
    DISTINCT non-null FK values against the parent keys (distinct
    first, so the join is key-domain-sized, and the full child table
    contributes only a partial-agg count + a semi-join-shaped count
    through the same key relation). Catalyst broadcasts the missing-key
    side when small; relationships concatenate by unionByName — the
    audit over K relationships is K independent subplans, no
    cross-relationship shuffle.
    """
    if not pairs:
        raise ValueError("fk_audit needs at least one relationship")
    outs = []
    for name, child, fk, parent, pk in pairs:
        fk_vals = child.select(F.col(fk).alias("_k"))
        nn = fk_vals.filter(F.col("_k").isNotNull())
        keys = nn.distinct()
        parents = parent.select(F.col(pk).alias("_k")).distinct()
        missing = keys.join(parents, "_k", "left_anti")
        orphan_rows = nn.join(missing, "_k", "left_semi")
        totals = child.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(fk).isNull(), 1)).alias("n_null_fk"),
        )
        stats = (
            totals.crossJoin(
                F.broadcast(
                    missing.agg(F.count(F.lit(1)).alias("n_missing_keys"))
                )
            )
            .crossJoin(
                F.broadcast(
                    orphan_rows.agg(F.count(F.lit(1)).alias("n_orphans"))
                )
            )
            .select(
                F.lit(name).alias("relationship"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_null_fk").cast("bigint").alias("n_null_fk"),
                F.col("n_orphans").cast("bigint").alias("n_orphans"),
                F.col("n_missing_keys").cast("bigint").alias("n_missing_keys"),
                F.round(
                    F.col("n_orphans")
                    / F.greatest(F.col("n_rows"), F.lit(1)),
                    6,
                ).alias("orphan_rate"),
            )
        )
        outs.append(stats)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("relationship")


def check_constraints(
    df: "DataFrame",
    checks: list[tuple],
) -> "DataFrame":
    """Declarative data-quality gate — the Deequ-style expectation
    runner that turns "we assume the data is fine" into a metric (the
    companion of :func:`profile_columns`' discovery view and
    :func:`fk_audit`'s referential slice). Each check yields one row:
    ``check, target, n_violations, n_rows, passed``.

    Supported checks (tuples, first element the kind):

    - ``("not_null", col)`` — NULL values are violations.
    - ``("unique", [cols...])`` — rows whose key tuple occurs more than
      once all count as violations (both copies — the number of rows
      you'd have to quarantine).
    - ``("accepted_values", col, [v...])`` — non-null values outside
      the list (NULL is not a violation here; combine with not_null).
    - ``("between", col, lo, hi)`` — non-null values outside [lo, hi].
    - ``("foreign_key", col, parent_df, parent_col)`` — non-null values
      with no parent (fk_audit's orphan count as a pass/fail row).

    Scale shape: every ROW-LOCAL check (not_null / accepted_values /
    between) folds into ONE shared aggregation pass — conditional sums,
    map-side partial agg, zero extra scans however many such checks are
    declared. ``unique`` adds one groupBy on its key (the violation
    count is Σ over keys with c > 1 of c — a partial-aggregatable sum);
    ``foreign_key`` adds the fk_audit anti-join over DISTINCT keys.
    Results concatenate via unionByName and order by (check, target) —
    a bounded relation of one row per declared check.
    """
    if not checks:
        raise ValueError("check_constraints needs at least one check")
    aggs = [F.count(F.lit(1)).alias("_n")]
    labels: list[tuple[str, str]] = []
    others = []
    for idx, chk in enumerate(checks):
        kind = chk[0]
        if kind == "not_null":
            col = chk[1]
            aggs.append(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"_v{idx}")
            )
            labels.append((kind, col, f"_v{idx}"))
        elif kind == "accepted_values":
            col, vals = chk[1], chk[2]
            bad = F.col(col).isNotNull() & ~F.col(col).isin(list(vals))
            aggs.append(
                F.sum(F.when(bad, 1).otherwise(0)).cast("bigint").alias(f"_v{idx}")
            )
            labels.append((kind, col, f"_v{idx}"))
        elif kind == "between":
            col, lo, hi = chk[1], chk[2], chk[3]
            bad = F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi))
            aggs.append(
                F.sum(F.when(bad, 1).otherwise(0)).cast("bigint").alias(f"_v{idx}")
            )
            labels.append((kind, col, f"_v{idx}"))
        elif kind == "unique":
            cols = list(chk[1]) if isinstance(chk[1], (list, tuple)) else [chk[1]]
            dup = (
                df.groupBy(*[F.col(c) for c in cols])
                .agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > 1)
                .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("_v"))
            )
            others.append((kind, ",".join(cols), dup))
        elif kind == "foreign_key":
            col, parent, pcol = chk[1], chk[2], chk[3]
            keys = (
                df.select(F.col(col).alias("_k"))
                .filter(F.col("_k").isNotNull())
            )
            parents = parent.select(F.col(pcol).alias("_k")).distinct()
            orphan = keys.join(
                keys.distinct().join(parents, "_k", "left_anti"),
                "_k",
                "left_semi",
            ).agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
            others.append((kind, col, orphan))
        else:
            raise ValueError(f"unknown check kind: {kind!r}")
    n_rows_df = df.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    outs = []
    if labels:
        one = df.agg(*aggs)
        for kind, target, vcol in labels:
            outs.append(
                one.select(
                    F.lit(kind).alias("check"),
                    F.lit(target).alias("target"),
                    F.col(vcol).alias("n_violations"),
                    F.col("_n").cast("bigint").alias("n_rows"),
                    (F.col(vcol) == 0).alias("passed"),
                )
            )
    for kind, target, vdf in others:
        outs.append(
            vdf.crossJoin(F.broadcast(n_rows_df)).select(
                F.lit(kind).alias("check"),
                F.lit(target).alias("target"),
                F.col("_v").alias("n_violations"),
                F.col("_n").alias("n_rows"),
                (F.col("_v") == 0).alias("passed"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("check", "target")
