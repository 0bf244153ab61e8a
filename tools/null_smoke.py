"""Null-injection smoke gate: drive EVERY registered query against a
copy of the testdata with ~5% NULLs deterministically injected into the
key columns (event/user/type/value/ts, doc text/lang/source, embedding
label, part name, order custkey/date), under a vanilla ANSI-ON session.

This is the breakage class a driver-side testdata regeneration causes:
a query that silently assumes a non-null column either crashes under
ANSI (caught here) or mis-routes a null group (caught by the null-group
unit tests per operator). Execution-only — oracles are NOT compared
(many data-contract oracles legitimately assume today's null-free
columns); the gate is "no query crashes and every plan completes".

Usage: python tools/null_smoke.py [src_sf_dir]     (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SPECS = {
    "events": (
        "SELECT CASE WHEN event_id % 19 = 0 THEN NULL ELSE event_id END AS event_id, "
        "CASE WHEN event_id % 23 = 0 THEN NULL ELSE ts END AS ts, "
        "CASE WHEN event_id % 17 = 0 THEN NULL ELSE user_id END AS user_id, "
        "CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_type END AS event_type, "
        "CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value, props"
    ),
    "documents": (
        "SELECT doc_id, CASE WHEN doc_id % 31 = 0 THEN NULL ELSE text END AS text, "
        "CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang, "
        "CASE WHEN doc_id % 17 = 0 THEN NULL ELSE source END AS source, n_chars"
    ),
    "embeddings": (
        "SELECT vec_id, embedding, "
        "CASE WHEN vec_id % 13 = 0 THEN NULL ELSE label END AS label"
    ),
    "part": (
        "SELECT p_partkey, CASE WHEN p_partkey % 29 = 0 THEN NULL ELSE p_name "
        "END AS p_name, p_brand, p_type, p_size, p_retailprice"
    ),
    "orders": (
        "SELECT o_orderkey, CASE WHEN o_orderkey % 37 = 0 THEN NULL ELSE "
        "o_custkey END AS o_custkey, o_orderstatus, o_totalprice, "
        "CASE WHEN o_orderkey % 41 = 0 THEN NULL ELSE o_orderdate END AS "
        "o_orderdate, o_orderpriority"
    ),
}

_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def write_null_injected(src: str, out: str) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in _TABLES:
        sel = _SPECS.get(t, "SELECT *")
        con.execute(
            f"COPY ({sel} FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = os.path.join(tempfile.gettempdir(), "fresco_null_smoke")
    write_null_injected(src, out)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    import __spark_entry__ as entrymod

    bad = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, out).count()
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0][:160]))
            print(f"CRASH {name}: {bad[-1][1]}")
    print(f"{len(entrymod.queries())} queries, {len(bad)} crashes")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
