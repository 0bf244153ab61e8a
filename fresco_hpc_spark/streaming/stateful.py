"""Custom stateful streaming operator: cross-batch counter→rate.

The batch ETL computes rates from consecutive-sample deltas with a lag
window (SURVEY.md §2.5 W2/W3). In the reference's watch mode each file is
transformed independently, so the first sample of every file loses its
delta (state resets at file boundaries). This operator is the *streaming-
native* upgrade: ``applyInPandasWithState`` keeps the last (timestamp,
counter) per group in Spark's state store, so deltas are computed across
micro-batch boundaries exactly once — the semantics a continuous 100 TB
telemetry feed actually wants.

State size is O(groups) (one row each), checkpointed with the query.
For UNBOUNDED group spaces (ephemeral devices, job ids) pass
``ttl_seconds``: groups idle longer than the TTL are evicted via
``GroupStateTimeout.ProcessingTimeTimeout`` — without eviction the state
store grows forever and a year of churned keys eventually dominates
checkpoint size and recovery time at 100 TB. An evicted group that
reappears starts fresh (its first new sample emits no rate — the same
semantics as a first-ever sample).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType(), False),
        T.StructField("ts_seconds", T.LongType(), False),
        T.StructField("rate", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType(), True),
        T.StructField("last_value", T.DoubleType(), True),
    ]
)

MIN_TIME_DELTA = 0.1  # reference: rates need >=0.1 s between samples


def _make_rate_fn(ttl_seconds: int | None):
    def _rate_fn(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-group kernel: sort this batch's samples, prepend the carried
        (ts, value) from state, emit a rate per adjacent pair, store the last
        sample back. Negative deltas (counter reset) → rate 0.0, matching the
        block/nfs transformers (SURVEY.md §7.4 trap 6). With a TTL, a group
        that received nothing for ttl_seconds is dropped from the store."""
        if ttl_seconds is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"group_key": [], "ts_seconds": [], "rate": []}
            ).astype({"group_key": str, "ts_seconds": "int64", "rate": "float64"})
            return
        rows = pd.concat(list(batches), ignore_index=True).sort_values("ts_seconds")
        if state.exists:
            last_ts, last_value = state.get
        else:
            last_ts, last_value = None, None

        out_ts: list[int] = []
        out_rate: list[float] = []
        for ts, value in zip(rows["ts_seconds"], rows["value"]):
            if last_ts is not None:
                dt = float(ts - last_ts)
                dv = float(value - last_value)
                if dt >= MIN_TIME_DELTA:
                    out_ts.append(int(ts))
                    out_rate.append(dv / dt if dv >= 0 else 0.0)
            last_ts, last_value = int(ts), float(value)
        state.update((last_ts, last_value))
        if ttl_seconds is not None:
            state.setTimeoutDuration(ttl_seconds * 1000)
        yield pd.DataFrame(
            {"group_key": key[0], "ts_seconds": out_ts, "rate": out_rate}
        )

    return _rate_fn


_rate_fn = _make_rate_fn(None)  # batch-parity kernel, importable for tests


def streaming_counter_rates(
    stream_df: DataFrame,
    key_col: str = "group_key",
    ts_col: str = "ts_seconds",
    value_col: str = "value",
    ttl_seconds: int | None = None,
) -> DataFrame:
    """counter stream → per-group rates with state carried ACROSS
    micro-batches. Input needs (key_col: string, ts_col: long epoch
    seconds, value_col: double monotonic-ish counter). ``ttl_seconds``
    evicts groups idle that long (processing time) — REQUIRED for
    unbounded key spaces; None keeps state forever (bounded fleets).

    Backfill caveat: with ``ttl_seconds`` set, a ``trigger(availableNow)``
    drain does NOT terminate when the backlog is consumed — pending
    ProcessingTimeTimeout registrations make Spark keep scheduling
    "no new data but cleaning up state" micro-batches until every idle
    group's TTL actually expires (hours, for production TTLs). For pure
    backfills use ``ttl_seconds=None``, or ``stop()`` the query once
    ``lastProgress`` shows the sources exhausted."""
    renamed = stream_df.selectExpr(
        f"CAST(`{key_col}` AS STRING) AS group_key",
        f"CAST(`{ts_col}` AS LONG) AS ts_seconds",
        f"CAST(`{value_col}` AS DOUBLE) AS value",
    )
    return renamed.groupBy("group_key").applyInPandasWithState(
        _make_rate_fn(ttl_seconds),
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_seconds is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def expected_rates(samples: list[tuple[str, int, float]]) -> list[tuple[str, int, float]]:
    """Reference kernel (pure Python) for tests: rates over the full,
    boundary-free sample sequence per key."""
    by_key: dict[str, list[tuple[int, float]]] = {}
    for k, ts, v in samples:
        by_key.setdefault(k, []).append((ts, v))
    out: list[tuple[str, int, float]] = []
    for k, rows in by_key.items():
        rows.sort()
        for (t0, v0), (t1, v1) in zip(rows, rows[1:]):
            dt = float(t1 - t0)
            if dt >= MIN_TIME_DELTA:
                dv = v1 - v0
                out.append((k, t1, dv / dt if dv >= 0 else 0.0))
    return out


EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType(), False),
        T.StructField("ts_seconds", T.LongType(), False),
        # nullable: a NULL input poisons the rest of the key's series
        # with SQL NULL, matching the batch ewma_scan (r7 / ADVICE r6)
        T.StructField("ewma", T.DoubleType(), True),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType([T.StructField("s", T.DoubleType(), True)])


def _make_ewma_fn(alpha: float, ttl_seconds: int | None):
    a = float(alpha)

    def _ewma_fn(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-group kernel: sort this batch's samples, seed the
        recurrence from the carried state (or the first sample), emit
        one smoothed value per sample, store the running state back —
        the EXACT IEEE op sequence of the batch scan
        (operators/timeseries.py ewma_scan), so a drained stream equals
        the batch operator bit-for-bit (test_streaming pins it)."""
        if ttl_seconds is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"group_key": [], "ts_seconds": [], "ewma": []}
            ).astype({"group_key": str, "ts_seconds": "int64", "ewma": "float64"})
            return
        # na_position='first' matches the batch scan's Spark sort (NULL
        # first ascending); pandas would otherwise sort NaN last and the
        # bit-for-bit batch-parity contract would break on null input
        rows = pd.concat(list(batches), ignore_index=True).sort_values(
            ["ts_seconds", "value"], na_position="first"
        )
        # state.exists distinguishes "unseeded" from "poisoned": a NULL
        # value poisons the rest of the key with SQL NULL exactly like
        # the batch ewma_scan (α·v + (1−α)·NULL = NULL), and the stored
        # None state keeps the poison across micro-batches (ADVICE r6:
        # float(v) silently propagated NaN instead)
        seeded = state.exists
        s = state.get[0] if seeded else None
        out_ts: list[int] = []
        out_s: list[float | None] = []
        for ts, v in zip(rows["ts_seconds"], rows["value"]):
            v = None if pd.isna(v) else float(v)
            if not seeded:
                s, seeded = v, True
            elif v is None or s is None:
                s = None
            else:
                s = a * v + (1.0 - a) * s
            out_ts.append(int(ts))
            out_s.append(s)
        state.update((s,))
        if ttl_seconds is not None:
            state.setTimeoutDuration(ttl_seconds * 1000)
        yield pd.DataFrame(
            {"group_key": key[0], "ts_seconds": out_ts, "ewma": out_s}
        )

    return _ewma_fn


HOLT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType(), False),
        T.StructField("ts_seconds", T.LongType(), False),
        # nullable: NULL input poisons (level, trend, forecast) with SQL
        # NULL, matching the batch holt_scan (r7 / ADVICE r6)
        T.StructField("level", T.DoubleType(), True),
        T.StructField("trend", T.DoubleType(), True),
        T.StructField("forecast", T.DoubleType(), True),
    ]
)

_HOLT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("l", T.DoubleType(), True),
        T.StructField("b", T.DoubleType(), True),
    ]
)


def _make_holt_fn(alpha: float, beta: float, ttl_seconds: int | None):
    a, bt = float(alpha), float(beta)

    def _holt_fn(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-group Holt kernel: (level, trend) carried across
        micro-batches in the EXACT IEEE op order of the batch
        holt_scan, so a drained stream equals the batch operator
        bit-for-bit (test_streaming pins it)."""
        if ttl_seconds is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {
                    "group_key": [],
                    "ts_seconds": [],
                    "level": [],
                    "trend": [],
                    "forecast": [],
                }
            ).astype(
                {
                    "group_key": str,
                    "ts_seconds": "int64",
                    "level": "float64",
                    "trend": "float64",
                    "forecast": "float64",
                }
            )
            return
        # na_position='first' matches the batch scan's Spark sort (NULL
        # first ascending) so batch parity holds on null input too
        rows = pd.concat(list(batches), ignore_index=True).sort_values(
            ["ts_seconds", "value"], na_position="first"
        )
        # state.exists distinguishes "unseeded" from "poisoned", exactly
        # as in the EWMA kernel (ADVICE r6): a NULL value nulls the rest
        # of the key's (level, trend, forecast) like the batch holt_scan
        seeded = state.exists
        lv, tr = (state.get[0], state.get[1]) if seeded else (None, None)
        out_ts: list[int] = []
        out_l: list[float | None] = []
        out_b: list[float | None] = []
        for ts, v in zip(rows["ts_seconds"], rows["value"]):
            v = None if pd.isna(v) else float(v)
            if not seeded:
                lv, tr = v, (0.0 if v is not None else None)
                seeded = True
            elif v is None or lv is None or tr is None:
                lv, tr = None, None
            else:
                new_l = a * v + (1.0 - a) * (lv + tr)
                tr = bt * (new_l - lv) + (1.0 - bt) * tr
                lv = new_l
            out_ts.append(int(ts))
            out_l.append(lv)
            out_b.append(tr)
        state.update((lv, tr))
        if ttl_seconds is not None:
            state.setTimeoutDuration(ttl_seconds * 1000)
        yield pd.DataFrame(
            {
                "group_key": key[0],
                "ts_seconds": out_ts,
                "level": out_l,
                "trend": out_b,
                "forecast": [
                    None if x is None or y is None else x + y
                    for x, y in zip(out_l, out_b)
                ],
            }
        )

    return _holt_fn


def streaming_holt(
    stream_df: DataFrame,
    key_col: str = "group_key",
    ts_col: str = "ts_seconds",
    value_col: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
    ttl_seconds: int | None = None,
) -> DataFrame:
    """Streaming per-key Holt double-exponential smoothing — the
    streaming twin of the batch ``holt_scan`` (operators/timeseries.py):
    state = ONE (level, trend) pair per key, the same O(keys) state
    store and TTL contract as the rate/EWMA operators, and the same
    processing-order caveat (ordering only within a micro-batch). Emits
    raw doubles — round at presentation when comparing to the batch
    operator's rounded columns."""
    renamed = stream_df.selectExpr(
        f"CAST(`{key_col}` AS STRING) AS group_key",
        f"CAST(`{ts_col}` AS LONG) AS ts_seconds",
        f"CAST(`{value_col}` AS DOUBLE) AS value",
    )
    return renamed.groupBy("group_key").applyInPandasWithState(
        _make_holt_fn(alpha, beta, ttl_seconds),
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=_HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_seconds is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_ewma(
    stream_df: DataFrame,
    key_col: str = "group_key",
    ts_col: str = "ts_seconds",
    value_col: str = "value",
    alpha: float = 0.3,
    ttl_seconds: int | None = None,
) -> DataFrame:
    """Streaming per-key EWMA with the recurrence state carried ACROSS
    micro-batches — the streaming-native twin of the batch
    ``ewma_scan`` (state = one double per key, so the state store is
    O(keys) like the rate operator; the same TTL/backfill caveats
    apply). Out-of-order arrivals are ordered only WITHIN a micro-batch
    (the state cannot rewind); feed event-time-ordered sources or
    accept processing-order smoothing, the standard streaming-EWMA
    contract. Raw smoothed doubles are emitted; round at presentation
    if comparing against the batch operator's rounded column.
    """
    renamed = stream_df.selectExpr(
        f"CAST(`{key_col}` AS STRING) AS group_key",
        f"CAST(`{ts_col}` AS LONG) AS ts_seconds",
        f"CAST(`{value_col}` AS DOUBLE) AS value",
    )
    return renamed.groupBy("group_key").applyInPandasWithState(
        _make_ewma_fn(alpha, ttl_seconds),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_seconds is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


RESERVOIR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("sample_key", T.DoubleType(), False),
        T.StructField("sample_rank", T.LongType(), False),
        T.StructField("batch_seq", T.LongType(), False),
    ]
)

_RESERVOIR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType()), True),
        T.StructField("ws", T.ArrayType(T.DoubleType()), True),
        T.StructField("keys", T.ArrayType(T.DoubleType()), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _make_reservoir_fn(k: int, ttl_seconds: int | None):
    kk = int(k)

    def _reservoir_fn(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-group A-Res reservoir kernel: state = the current top-k
        (id, weight, sample_key) triples; each micro-batch's rows merge
        in and the k largest keys survive. The key arrives ALREADY
        COMPUTED by the same JVM expression the batch operator uses
        (r7 review: a Python-recomputed pow could land one libm-ulp
        across a 9-dp rounding boundary and flip a rank near the
        k-edge), so the kernel only merges and never does float math —
        the reservoir after ANY prefix of the stream equals the batch
        ``weighted_sample_k`` over the rows seen so far bit-for-bit
        (test_streaming pins it). Rows whose key is NULL (null id or
        excluded weight) are skipped, matching the batch filter —
        and never crash the query (int(NaN) raised before)."""
        if ttl_seconds is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {c.name: [] for c in RESERVOIR_OUTPUT_SCHEMA}
            ).astype(
                {
                    "group_key": str,
                    "id": "int64",
                    "weight": "float64",
                    "sample_key": "float64",
                    "sample_rank": "int64",
                    "batch_seq": "int64",
                }
            )
            return
        if state.exists:
            ids, ws, keys, seq = state.get
            pool = list(zip(ids, ws, keys))
        else:
            pool, seq = [], 0
        rows = pd.concat(list(batches), ignore_index=True)
        for i, w, ky in zip(rows["id"], rows["weight"], rows["sample_key"]):
            if pd.isna(i) or pd.isna(w) or pd.isna(ky) or w <= 0:
                continue  # same exclusion as the batch operator
            pool.append((int(i), float(w), float(ky)))
        # top-k by (key desc, id asc) — ties identical to the batch rank
        pool.sort(key=lambda t: (-t[2], t[0]))
        pool = pool[:kk]
        seq = int(seq) + 1
        state.update(
            (
                [p[0] for p in pool],
                [p[1] for p in pool],
                [p[2] for p in pool],
                seq,
            )
        )
        if ttl_seconds is not None:
            state.setTimeoutDuration(ttl_seconds * 1000)
        yield pd.DataFrame(
            {
                "group_key": key[0],
                "id": [p[0] for p in pool],
                "weight": [p[1] for p in pool],
                "sample_key": [p[2] for p in pool],
                "sample_rank": list(range(1, len(pool) + 1)),
                "batch_seq": seq,
            }
        )

    return _reservoir_fn


def streaming_weighted_sample(
    stream_df: DataFrame,
    k: int,
    key_col: str = "group_key",
    id_col: str = "id",
    weight_col: str = "weight",
    salt: str = "ares",
    ttl_seconds: int | None = None,
) -> DataFrame:
    """Streaming A-Res weighted reservoir — the streaming twin of the
    batch :func:`~fresco_hpc_spark.functions.sampling.weighted_sample_k`:
    a fixed-size weighted-without-replacement sample per group,
    maintained incrementally over an unbounded stream with **O(k)
    state per group** (the whole point of A-Res: the sample after any
    stream prefix is just the top-k content-derived keys, so the
    reservoir IS the state — no row history).

    Each micro-batch emits the group's CURRENT reservoir tagged with a
    monotonically increasing ``batch_seq``; downstream consumers read
    the max-seq emission per group as "the sample so far" (append mode
    cannot retract rows, so supersession is by sequence, the standard
    accumulating-snapshot pattern). The sample key is computed BY THE
    SAME JVM EXPRESSION the batch operator uses — md5-derived
    ``u^(1/w)``, HALF_UP 9-dp, evaluated in the streaming plan before
    the stateful kernel (r7 review: a Python-side pow recomputation
    could land one libm-ulp across a rounding boundary and flip a
    rank) — so a drained stream's final reservoir equals the batch
    operator over all rows seen bit-for-bit (test_streaming pins it).
    Null ids and null/non-positive weights are excluded, like the
    batch operator. Same TTL/backfill contract as the other stateful
    kernels.
    """
    from fresco_hpc_spark.functions.sampling import hash_fraction

    renamed = stream_df.selectExpr(
        f"CAST(`{key_col}` AS STRING) AS group_key",
        f"CAST(`{id_col}` AS LONG) AS id",
        f"CAST(`{weight_col}` AS DOUBLE) AS weight",
    )
    u = hash_fraction(
        F.concat(F.lit(salt + "|"), F.col("id").cast("string"))
    )
    keyed = renamed.withColumn(
        "sample_key",
        F.round(F.pow(u, F.lit(1.0) / F.col("weight")), 9),
    )
    return keyed.groupBy("group_key").applyInPandasWithState(
        _make_reservoir_fn(k, ttl_seconds),
        outputStructType=RESERVOIR_OUTPUT_SCHEMA,
        stateStructType=_RESERVOIR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_seconds is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


SCD2_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType(), False),
        T.StructField("state", T.StringType(), True),
        T.StructField("valid_from_us", T.LongType(), False),
        T.StructField("valid_to_us", T.LongType(), True),
        T.StructField("version", T.LongType(), False),
        T.StructField("is_current", T.BooleanType(), False),
        T.StructField("batch_seq", T.LongType(), False),
    ]
)

_SCD2_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur", T.StringType(), True),
        T.StructField("cur_is_null", T.BooleanType(), True),
        T.StructField("from_us", T.LongType(), True),
        T.StructField("version", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _make_scd2_fn(ttl_seconds: int | None):
    def _scd2_fn(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-key SCD2 kernel: state = the OPEN episode (current
        attribute value with an explicit null flag — pandas can't
        distinguish SQL NULL from NaN on its own — plus valid_from,
        version, batch sequence). Each micro-batch's rows apply in
        (ts, tie) order; a null-safe change CLOSES the open episode
        (emitted immediately with its valid_to) and opens the next.
        After the batch, the open episode is emitted tagged
        ``batch_seq`` — append-mode supersession, exactly like the
        streaming reservoir: the row with the highest batch_seq per
        key IS the current state."""
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            cur, cur_null, from_us, version, seq = state.get
        else:
            cur, cur_null, from_us, version, seq = None, True, None, 0, 0
        out_rows = []
        opened = version > 0
        for pdf in batches:
            pdf = pdf.sort_values(["ts_us", "tie"])
            for ts_us, v in zip(pdf["ts_us"], pdf["state_val"]):
                v_null = pd.isna(v)
                v = None if v_null else str(v)
                if not opened:
                    cur, cur_null, from_us, version = v, v_null, int(ts_us), 1
                    opened = True
                elif (v_null != cur_null) or (not v_null and v != cur):
                    out_rows.append(
                        (key[0], cur, int(from_us), int(ts_us),
                         int(version), False, int(seq + 1))
                    )
                    cur, cur_null, from_us, version = (
                        v, v_null, int(ts_us), version + 1
                    )
        seq += 1
        if opened:
            out_rows.append(
                (key[0], cur, int(from_us), None, int(version), True,
                 int(seq))
            )
            state.update((cur, bool(cur_null), int(from_us),
                          int(version), int(seq)))
            if ttl_seconds is not None:
                state.setTimeoutDuration(ttl_seconds * 1000)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[f.name for f in SCD2_OUTPUT_SCHEMA.fields],
            )

    return _scd2_fn


def streaming_scd2_state(
    stream_df: DataFrame,
    key_col: str = "group_key",
    ts_col: str = "ts_us",
    state_col: str = "state_val",
    tie_col: str | None = None,
    ttl_seconds: int | None = None,
) -> DataFrame:
    """Streaming SCD type-2 maintenance — the streaming-native twin of
    the batch ``operators/cdc.py scd2_history``: per key, the OPEN
    episode rides the state store (O(keys), one small tuple each) and
    every null-safe attribute change immediately emits the CLOSED
    episode with its valid_to; each batch also emits the open episode
    tagged ``batch_seq`` (append-mode supersession — max batch_seq per
    key is the current dimension row). A drained stream's closed
    episodes plus its latest open episodes equal the batch operator's
    history EXACTLY (same change semantics, timestamps as epoch
    microseconds; pinned in test_streaming).

    Ordering contract: rows are ordered by (ts, tie) WITHIN a
    micro-batch; the state cannot rewind across batches — feed
    event-time-ordered sources (a file-per-day change log) or accept
    processing-order history, the same contract as streaming_ewma.
    """
    tie = (
        f"CAST(`{tie_col}` AS LONG) AS tie"
        if tie_col is not None
        else "CAST(0 AS LONG) AS tie"
    )
    renamed = stream_df.selectExpr(
        f"CAST(`{key_col}` AS STRING) AS group_key",
        f"CAST(`{ts_col}` AS LONG) AS ts_us",
        f"CAST(`{state_col}` AS STRING) AS state_val",
        tie,
    )
    return renamed.groupBy("group_key").applyInPandasWithState(
        _make_scd2_fn(ttl_seconds),
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=_SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_seconds is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


KS_REF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType(), True),
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("ks_d", T.DoubleType(), False),
        T.StructField("ks_at", T.DoubleType(), False),
    ]
)

_KS_REF_STATE_SCHEMA = T.StructType(
    [T.StructField("bin_counts", T.ArrayType(T.LongType()), False)]
)


def _make_ks_ref_fn(edges: list[float], ttl_seconds: int | None):
    from decimal import ROUND_HALF_UP, Decimal

    b = len(edges)

    def _round6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def _ks_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return iter([])
        counts = list(state.get[0]) if state.exists else [0] * (b + 1)
        for pdf in pdfs:
            # bins come pre-computed JVM-side; count them vectorized
            # (values above the last edge share the overflow bin b)
            binned = pdf["_bin"].clip(upper=b).value_counts()
            for _bin, cnt in binned.items():
                counts[int(_bin)] += int(cnt)
        state.update((counts,))
        if ttl_seconds is not None:
            state.setTimeoutDuration(ttl_seconds * 1000)
        n = sum(counts)
        if n == 0:
            return iter([])
        # same IEEE op order as the batch ks_vs_reference: cume/n vs
        # j/b per edge, abs, max with FIRST-j tie-break (== min edge)
        best, jat, acc = -1.0, 1, 0
        for j in range(1, b + 1):
            acc += counts[j - 1]
            d = abs(acc / n - float(j) / float(b))
            if d > best:
                best, jat = d, j
        yield pd.DataFrame(
            [
                {
                    "group_key": key[0],
                    "n_seen": n,
                    "ks_d": _round6(best),
                    "ks_at": _round6(edges[jat - 1]),
                }
            ]
        )

    return _ks_fn


def streaming_ks_reference(
    stream_df: DataFrame,
    ref_edges: list[float],
    key_col: str = "group_key",
    value_col: str = "value",
    ttl_seconds: int | None = None,
) -> DataFrame:
    """Streaming one-sample KS drift monitor — the streaming twin of
    ``operators.percentiles.ks_vs_reference``: each micro-batch's
    values are binned against the reference's equi-depth edges
    JVM-SIDE with the SAME shared expression as the batch operator
    (``reference_bin_expr`` — the house rule for exact batch/stream
    equivalence), then merged into a per-group cumulative bin-count
    vector in the state store (a pre-aggregation would be a second
    stateful operator, which structured streaming forbids before
    ``applyInPandasWithState`` — the pandas fn bincounts the batch's
    binned rows vectorized instead).
    Every batch emits the group's CURRENT drift against the reference:
    ``group_key, n_seen, ks_d, ks_at`` (rounded half-up like the batch
    operator, first-max edge tie-break == its min-edge rule).

    This is the ingest-time "did today's feed depart from the training
    corpus?" alarm: state is O(groups · bins) longs — independent of
    volume — and the pandas crossing never parses raw values (bins are
    JVM-computed; python only bincounts ints). The drained stream over
    a file backlog equals the batch operator on the union exactly
    (pinned in test_streaming). ``ttl_seconds`` evicts idle groups
    (same contract as the rate/EWMA/SCD2 operators); an evicted group
    restarts its distribution from zero.
    """
    if not ref_edges:
        raise ValueError("ref_edges must be non-empty")
    from fresco_hpc_spark.operators.percentiles import reference_bin_expr

    edges = sorted(float(e) for e in ref_edges)
    renamed = stream_df.selectExpr(
        f"CAST(`{key_col}` AS STRING) AS group_key",
        f"CAST(`{value_col}` AS DOUBLE) AS _v",
    ).filter(F.col("_v").isNotNull())
    binned = renamed.select(
        "group_key", reference_bin_expr(edges, "_v").alias("_bin")
    )
    return binned.groupBy("group_key").applyInPandasWithState(
        _make_ks_ref_fn(edges, ttl_seconds),
        outputStructType=KS_REF_OUTPUT_SCHEMA,
        stateStructType=_KS_REF_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_seconds is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
