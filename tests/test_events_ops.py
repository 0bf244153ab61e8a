"""As-of join + sessionization unit tests (operators absent in the
reference — SURVEY.md §2.3 J5 notes no as-of joins exist there; these are
first-class time-series primitives here, with edge semantics pinned on
hand-built frames and the join-free plan property asserted).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fresco_hpc_spark.operators import asof_join, session_stats, sessionize


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),  # before any right row
            (4, "u3", _ts("2024-01-01 10:00:00")),  # key with no right rows
        ],
        "id bigint, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 1.0),
            ("u1", _ts("2024-01-01 12:00:00"), 2.0),  # exact tie with left id=2
            ("u2", _ts("2024-01-01 11:00:00"), 3.0),
        ],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts").orderBy("id")
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["matched_ts"] == _ts("2024-01-01 09:30:00")
    assert rows[1]["v"] == 1.0
    # equal timestamps match (ties included, like DuckDB ASOF / merge_asof)
    assert rows[2]["matched_ts"] == _ts("2024-01-01 12:00:00")
    assert rows[2]["v"] == 2.0
    # left row earlier than every right row -> no match
    assert rows[3]["matched_ts"] is None and rows[3]["v"] is None
    # key absent from right -> no match
    assert rows[4]["matched_ts"] is None
    # left columns all survive
    assert {"id", "k", "ts", "matched_ts", "v"} == set(out.columns)


def test_asof_forward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", direction="forward")
    rows = {r["id"]: r for r in out.collect()}
    # nearest right row at-or-after the left ts
    assert rows[1]["matched_ts"] == _ts("2024-01-01 12:00:00")
    assert rows[2]["matched_ts"] == _ts("2024-01-01 12:00:00")  # tie matches
    assert rows[3]["matched_ts"] == _ts("2024-01-01 11:00:00")
    assert rows[4]["matched_ts"] is None


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", tolerance_seconds=600)
    rows = {r["id"]: r for r in out.collect()}
    # id=1 match is 30 min back -> outside 10-min tolerance
    assert rows[1]["matched_ts"] is None and rows[1]["v"] is None
    assert rows[2]["matched_ts"] == _ts("2024-01-01 12:00:00")  # 0 s gap kept


def test_asof_plan_is_join_free(spark):
    """The scale property: an as-of join over N x M rows plans as ONE
    hash-partition exchange + window — no join operator of any kind."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="k", left_ts="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), 1.0),
            ("u1", _ts("2024-01-01 10:30:00"), 1.0),  # gap == 1800 s: same session
            ("u1", _ts("2024-01-01 11:00:01"), 1.0),  # gap 1801 s: new session
            ("u2", _ts("2024-01-01 10:00:00"), 1.0),
        ],
        "user_id string, ts timestamp, value double",
    )
    out = sessionize(ev, "user_id", "ts", gap_seconds=1800).orderBy("user_id", "ts")
    got = [(r["user_id"], r["session_idx"]) for r in out.collect()]
    assert got == [("u1", 1), ("u1", 1), ("u1", 2), ("u2", 1)]

    stats = session_stats(ev, "user_id", ts_col="ts", value_col="value",
                          gap_seconds=1800)
    rows = {(r["user_id"], r["session_idx"]): r for r in stats.collect()}
    s1 = rows[("u1", 1)]
    assert s1["n_events"] == 2 and s1["duration_seconds"] == 1800
    assert rows[("u1", 2)]["n_events"] == 1
    assert rows[("u2", 1)]["duration_seconds"] == 0


def test_sessionize_single_shuffle(spark):
    ev = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), 1.0)],
        "user_id string, ts timestamp, value double",
    )
    plan = (
        sessionize(ev, "user_id", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # lag + running sum share one (key, ts) ordering -> one exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_approx_count_distinct_tracks_exact(spark):
    """The 100 TB swap for daily_uniques: approx_count_distinct (HLL) must
    land within its rsd envelope of the exact countDistinct."""
    from fresco_hpc_spark.sources import table
    from tests.conftest import SF_SMALL

    ev = table(spark, SF_SMALL, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.06 * row["exact"])


def test_gap_fill_semantics(spark):
    """Grid spans each key's own extent; gaps carry the last observation
    forward; leading rows are real observations by construction."""
    from fresco_hpc_spark.operators import gap_fill

    ev = spark.createDataFrame(
        [
            ("h1", _ts("2024-01-01 10:15:00"), 4.0),
            ("h1", _ts("2024-01-01 10:45:00"), 6.0),  # same bucket -> avg 5.0
            ("h1", _ts("2024-01-01 13:05:00"), 9.0),  # 2-hour gap before
            ("h2", _ts("2024-01-01 00:30:00"), 1.0),  # single-bucket key
        ],
        "host string, ts timestamp, value double",
    )
    out = gap_fill(ev, "host", time_col="ts", value_col="value")
    rows = [(r["host"], r["bucket"].hour, r["value"], r["is_gap"]) for r in out.collect()]
    assert rows == [
        ("h1", 10, 5.0, False),
        ("h1", 11, 5.0, True),
        ("h1", 12, 5.0, True),
        ("h1", 13, 9.0, False),
        ("h2", 0, 1.0, False),
    ]


def test_new_ops_on_empty_input(spark):
    """Empty frames flow through asof/sessionize/gap_fill without error —
    no div-by-zero, no window panic, schema preserved."""
    from fresco_hpc_spark.operators import gap_fill

    empty_ev = spark.createDataFrame(
        [], "user_id string, ts timestamp, value double"
    )
    left = spark.createDataFrame([], "id bigint, k string, ts timestamp")
    right = spark.createDataFrame([], "k string, ts timestamp, v double")

    assert asof_join(left, right, on="k", left_ts="ts").count() == 0
    assert sessionize(empty_ev, "user_id", "ts").count() == 0
    assert session_stats(empty_ev, "user_id", ts_col="ts", value_col="value").count() == 0
    out = gap_fill(empty_ev, "user_id", time_col="ts", value_col="value")
    assert out.count() == 0
    assert out.columns == ["user_id", "bucket", "value", "is_gap"]


def test_approx_percentile_tracks_exact(spark):
    """The 100 TB swap for global_percentiles: percentile_approx with
    accuracy=10000 must land within the neighboring-value envelope of the
    exact interpolating percentile."""
    from fresco_hpc_spark.sources import table
    from tests.conftest import SF_SMALL

    ev = table(spark, SF_SMALL, "events")
    row = ev.agg(
        F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.99))").alias("exact"),
        F.expr("percentile_approx(value, array(0.25, 0.5, 0.75, 0.99), 10000)").alias("approx"),
    ).collect()[0]
    spread = (
        ev.agg(F.max("value") - F.min("value")).collect()[0][0]
    )
    for e, a in zip(row["exact"], row["approx"]):
        assert abs(a - e) <= 0.01 * spread + 1e-9


def test_interval_join_null_keys_and_payloads_left(spark):
    """VERDICT r03 item 4: exact row multiplicity under ``how='left'``
    with NULLs in the key, time, and payload columns.

    Contract (SQL equi-join semantics): a NULL join key or NULL
    timestamp never matches any interval — under 'left' such points
    emit EXACTLY ONCE with null interval columns; NULL payload columns
    are carried through untouched and never affect multiplicity (the
    r02 formulation's left_anti remainder compared payload columns with
    null-unsafe equality and double-emitted these rows)."""
    from fresco_hpc_spark.operators import interval_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes) if minutes is not None else None

    points = spark.createDataFrame(
        [
            # (id, key, ts, payload)
            (1, "a", ts(10), 1.0),     # inside interval A → 1 match
            (2, "a", ts(10), None),    # NULL payload, inside A → 1 match
            (3, None, ts(10), 2.0),    # NULL key → no match, 1 null row
            (4, "a", None, 3.0),       # NULL ts → no match, 1 null row
            (5, "b", ts(10), None),    # key with no intervals → 1 null row
            (6, "a", ts(300), 4.0),    # outside every interval → 1 null row
            (7, "a", ts(65), 5.0),     # inside A and B → 2 matches
        ],
        "id bigint, k string, ts timestamp, payload double",
    )
    intervals = spark.createDataFrame(
        [
            ("a", "A", ts(0), ts(120)),
            ("a", "B", ts(60), ts(90)),
            ("a", "C", None, ts(90)),   # NULL start → interval dropped
            (None, "D", ts(0), ts(120)),  # NULL key → never matches
        ],
        "k string, name string, start timestamp, end timestamp",
    )

    out = interval_join(
        points, intervals, "ts", "start", "end", keys=["k"], how="left"
    ).collect()

    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r)
    assert {i: len(rs) for i, rs in sorted(by_id.items())} == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 2,
    }
    assert sorted(r.name for r in by_id[7]) == ["A", "B"]
    assert by_id[1][0].name == "A"
    # unmatched rows carry null interval columns and original payloads
    for i in (3, 4, 5, 6):
        assert by_id[i][0].name is None and by_id[i][0].start is None
    assert by_id[3][0].payload == 2.0
    assert by_id[2][0].payload is None and by_id[2][0].name == "A"
    # inner mode keeps exactly the 4 matched rows (ids 1, 2, 7×2)
    inner = interval_join(
        points, intervals, "ts", "start", "end", keys=["k"], how="inner"
    )
    assert inner.count() == 4


def test_ntile_parity_of_quantile_bucket(spark):
    """The NTILE-parity contract that used to live in the registry as
    lead_ntile_events (retired r7 — VERDICT r6 item 6: its
    unpartitioned ntile window is a single-task global sort, the one
    plan shape the engine forbids): on DISTINCT values with n divisible
    by the bucket count, quantile_bucket's percentile-bounds labels
    equal NTILE's positional labels exactly — the interpolated quartile
    bound at position k·n/4 − 1/4 strictly separates the k-th quarter
    from the next. Divergence is confined to tie positions (ntile may
    split equal values across buckets to even out sizes; bounds
    bucketing never does) — pinned on a tie corpus."""
    from pyspark.sql import Window

    from fresco_hpc_spark.operators import quantile_bucket

    # 64 distinct shuffled-ish values (LCG order), n % 4 == 0
    x, vals = 7, []
    for _ in range(64):
        x = (x * 1103515245 + 12345) % (1 << 31)
        vals.append(float(x % 100000) + 0.5)
    assert len(set(vals)) == 64
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id bigint, v double")
    ntile = {
        r.id: r.q
        for r in df.select(
            "id", F.ntile(4).over(Window.orderBy("v", "id")).alias("q")
        ).collect()
    }
    bucket = {
        r.id: r.bucket for r in quantile_bucket(df, "v").collect()
    }
    assert ntile == bucket

    # ties: 8 equal values — bounds bucketing keeps them together,
    # ntile splits them; that positional divergence is the documented
    # difference, not a defect
    tied = spark.createDataFrame(
        [(i, 1.0) for i in range(8)], "id bigint, v double"
    )
    tb = {r.id: r.bucket for r in quantile_bucket(tied, "v").collect()}
    assert set(tb.values()) == {1}
    tn = {
        r.id: r.q
        for r in tied.select(
            "id", F.ntile(4).over(Window.orderBy("v", "id")).alias("q")
        ).collect()
    }
    assert set(tn.values()) == {1, 2, 3, 4}


def test_cusum_drift_matches_recurrence(spark):
    """Closed form == textbook recurrence: S_i = max(0, S_{i-1}+(x-k))
    replayed driver-side over the same hourly micro-sums; the peak flag
    marks exactly the argmax hours; a flat series (x == k throughout)
    stays at S == 0 everywhere with every hour a peak."""
    from fresco_hpc_spark.operators import cusum_drift

    rows = []
    # group a: level shift upward in the last 4 hours
    vals = [10.0, 10.0, 10.0, 10.0, 14.0, 14.0, 14.0, 14.0]
    for h, v in enumerate(vals):
        for j in range(3):  # 3 events per hour
            rows.append(("a", f"2024-01-01 {h:02d}:{j:02d}:00", v))
    # group b: constant
    for h in range(4):
        rows.append(("b", f"2024-01-01 {h:02d}:00:00", 5.0))
    # group c: NEGATIVE-valued series whose mean is not integral —
    # pins the explicit floor division for the allowance k (ADVICE
    # r11: truncation toward zero would put k one micro-unit higher
    # than the Python // replay below and shift every S_i)
    for h, v in enumerate([-10.0, -11.0, -13.0]):
        rows.append(("c", f"2024-01-01 {h:02d}:00:00", v))
    df = spark.createDataFrame(
        rows, "event_type string, ts_s string, value double"
    )
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = cusum_drift(df, "value", "ts", "event_type").collect()

    # driver-side recurrence over hourly micro sums
    hourly = {}
    for g, hs, v in [(r[0], r[1], r[2]) for r in rows]:
        key = (g, hs[:13])
        hourly[key] = hourly.get(key, 0) + round(v * 1_000_000)
    for g in ("a", "b", "c"):
        xs = [v for (gg, _), v in sorted(hourly.items()) if gg == g]
        k = sum(xs) // len(xs)
        s, expect = 0, []
        for x in xs:
            s = max(0, s + (x - k))
            expect.append(s)
        got = [r.cusum_micro for r in out if r.event_type == g]
        assert got == expect, (g, got, expect)
        peaks = [r.cusum_micro for r in out if r.event_type == g and r.is_peak]
        assert peaks and all(p == max(expect) for p in peaks)
    b_rows = [r for r in out if r.event_type == "b"]
    assert all(r.cusum_micro == 0 and r.is_peak for r in b_rows)


def test_attribution_linear_credit_split(spark):
    """Attribution contract: an n-touch conversion grants each touch
    1e6 div n micro-credits (remainder dropped); touches outside the
    lookback don't count; a touchless conversion still counts as a
    conversion with zero credit; lookback < 1 fails loudly."""
    import pytest as _pt

    from pyspark.sql import functions as F

    from fresco_hpc_spark.operators import attribution_linear

    rows = [
        # user 1: purchase at 12:00 with 3 clicks inside 24h, 1 outside
        (1, 1, "click", "2024-01-01 13:00:00"),
        (2, 1, "click", "2024-01-02 09:00:00"),
        (3, 1, "click", "2024-01-02 11:59:59"),
        (4, 1, "click", "2023-12-30 12:00:00"),   # outside
        (5, 1, "purchase", "2024-01-02 12:00:00"),
        # user 2: touchless purchase
        (6, 2, "purchase", "2024-01-02 12:00:00"),
        # user 3: 2 purchases sharing one click
        (7, 3, "click", "2024-01-02 11:00:00"),
        (8, 3, "purchase", "2024-01-02 11:30:00"),
        (9, 3, "purchase", "2024-01-02 12:30:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")

    out = {r.user_id: r for r in attribution_linear(df).collect()}
    u1 = out[1]
    assert (u1.conversions, u1.touches) == (1, 3)
    assert u1.attributed_micro == (1_000_000 // 3) * 3  # 999999
    u2 = out[2]
    assert (u2.conversions, u2.touches, u2.attributed_micro) == (1, 0, 0)
    u3 = out[3]
    assert (u3.conversions, u3.touches) == (2, 2)
    assert u3.attributed_micro == 2_000_000  # 1 click fully credited twice

    with _pt.raises(ValueError, match="lookback"):
        attribution_linear(df, lookback_hours=0)
