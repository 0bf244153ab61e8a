"""Local oracle-parity checker — mimics the driver's t2 gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet, then compares row count, column names (sorted), and
values (rows sorted by all columns; floats both exactly and with tolerance).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    s, o = _normalize(spark_df), _normalize(oracle_df)
    mismatches = 0
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if pd.isna(a) and pd.isna(b):
                continue
            if not _values_equal(a, b):
                if mismatches < 5:
                    problems.append(f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}")
                mismatches += 1
    if mismatches:
        problems.append(f"total {mismatches} value mismatches")
    # strict-hash proxy: exact string equality after the engine-side rounding
    strict = (s.astype(str).values == o.astype(str).values).all()
    if not strict and not mismatches:
        problems.append("NOTE: tolerant-equal but not bit-identical (driver hash may differ)")
    return problems


def main(argv: list[str] | None = None) -> int:
    # argv defaults to the CLI args; pass [] (tests/test_full_parity.py)
    # to run the full sweep regardless of the host process's sys.argv
    argv = sys.argv[1:] if argv is None else argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from fresco_hpc_spark.session import get_spark

    spark = get_spark("parity-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check: {len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        real = [p for p in problems if not p.startswith("NOTE")]
        status = "FAIL" if real else ("WARN" if problems else "OK  ")
        if real:
            failures += 1
        print(f"{status} {name} ({len(sdf)} rows)")
        for p in problems:
            print(f"      {p}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
