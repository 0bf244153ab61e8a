"""Catalog probes (SURVEY.md §2.8) and session timezone semantics
(SURVEY.md §7.4 trap 2 — the DST bucketing trap)."""

from __future__ import annotations

import duckdb

from fresco_hpc_spark.session import list_tables, table_exists, table_info
from fresco_hpc_spark.sources import table
from tests.conftest import SF_SMALL


def test_catalog_probes(spark):
    df = table(spark, SF_SMALL, "events")
    df.createOrReplaceTempView("probe_events")
    assert table_exists(spark, "probe_events")
    assert not table_exists(spark, "no_such_table")
    assert "probe_events" in list_tables(spark)
    info = table_info(spark, "probe_events")
    assert ("event_id", "bigint") in info and ("value", "double") in info
    spark.catalog.dropTempView("probe_events")
    assert not table_exists(spark, "probe_events")


def test_day_trunc_dst_parity_new_york(spark):
    """date_trunc('day') across the 2024-03-10 US DST transition with the
    session TZ set to America/New_York (the reference's `SET TimeZone`,
    client.ts:46) must bucket identically to DuckDB converting UTC wall
    time to New York local time. Day boundaries shift by 5h (EST) before
    and 4h (EDT) after the change — UTC bucketing gets both wrong."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # hourly instants spanning the DST weekend, pinned by epoch second
        # (a timestamp LITERAL would parse in the session TZ and shift 5h)
        epoch_2024_03_09 = 1709942400  # 2024-03-09T00:00:00Z
        df = spark.range(0, 96).selectExpr(
            f"timestamp_seconds({epoch_2024_03_09} + id*3600) AS ts"
        )
        # date_format renders in the session TZ → NY wall-time day labels
        # (collect() would yield the underlying UTC instants instead)
        got = {
            (r.day, r.n)
            for r in df.selectExpr(
                "date_format(date_trunc('day', ts), 'yyyy-MM-dd HH:mm:ss') AS day"
            )
            .groupBy("day").count().withColumnRenamed("count", "n").collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)

    con = duckdb.connect()
    want = {
        (str(r[0]), r[1])
        for r in con.execute(
            """
            WITH t AS (
              SELECT TIMESTAMP '2024-03-09 00:00:00' + to_seconds(i*3600) AS ts
              FROM generate_series(0, 95) AS g(i)
            )
            SELECT strftime(date_trunc('day',
                       timezone('America/New_York', timezone('UTC', ts))),
                       '%Y-%m-%d %H:%M:%S') AS day,
                   COUNT(*) AS n
            FROM t GROUP BY 1
            """
        ).fetchall()
    }
    con.close()
    assert got == want
    # sanity: the DST day (Mar 10) has 23 local hours in this window
    days = dict(got)
    assert days.get("2024-03-10 00:00:00") == 23


def test_tune_shuffle_partitions_scales_with_bytes(spark, tmp_path):
    """VERDICT r6 item 5: shuffle partitions sized from estimated
    shuffle volume — floor of min_per_core*cores on small inputs,
    bytes/target when the volume dominates, hard cap on absurd
    estimates. The conf is actually set on the session, and
    input_bytes_of sums nested dirs."""
    from fresco_hpc_spark.session import input_bytes_of, tune_shuffle_partitions

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    cores = spark.sparkContext.defaultParallelism
    try:
        # tiny input: the per-core floor wins
        n = tune_shuffle_partitions(spark, 1 << 20)
        assert n == 2 * cores
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(n)
        # volume-dominated: ceil(bytes*ratio / target)
        n = tune_shuffle_partitions(
            spark, 100 << 30, shuffle_ratio=2.0, target_partition_bytes=128 << 20
        )
        assert n == (200 << 30) // (128 << 20)  # 1600
        # capped
        n = tune_shuffle_partitions(spark, 1 << 50, max_partitions=5000)
        assert n == 5000
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    d = tmp_path / "ib"
    (d / "sub").mkdir(parents=True)
    (d / "a.bin").write_bytes(b"x" * 1000)
    (d / "sub" / "b.bin").write_bytes(b"y" * 500)
    assert input_bytes_of(str(d)) == 1500
    assert input_bytes_of(str(d / "a.bin")) == 1000
    assert input_bytes_of([str(d), str(d / "a.bin")]) == 2500
