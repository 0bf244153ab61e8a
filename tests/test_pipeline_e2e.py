"""End-to-end batch pipeline (SURVEY.md §3.3): raw CSVs → transformer →
generic chain → chunked parquet → validation, as one Spark job.
"""

from __future__ import annotations

import pytest

from fresco_hpc_spark.etl.pipeline import run_batch_pipeline
from fresco_hpc_spark.etl.synthetic_raw import raw_block_from_events
from fresco_hpc_spark.etl.transformers import block_io_rates
from fresco_hpc_spark.schema import RAW_BLOCK_SCHEMA
from fresco_hpc_spark.sources import read_csv_tolerant, table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def raw_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("pipe_raw")
    raw = raw_block_from_events(table(spark, SF_SMALL, "events")).toPandas()
    raw.iloc[:500].to_csv(base / "2024-01" / "block.csv", index=False) if (
        (base / "2024-01").mkdir() or True
    ) else None
    (base / "2024-02").mkdir()
    raw.iloc[500:].to_csv(base / "2024-02" / "block.csv", index=False)
    return str(base)


def test_pipeline_end_to_end(spark, raw_dir, tmp_path):
    out_dir = str(tmp_path / "out")
    cfg = {
        "transformations": [
            {"type": "suffix_transform", "suffix": "_C", "columns": ["Job Id", "Host"]},
            {"type": "add_unit_column"},
            {
                "type": "standardize_columns",
                "output_schema": ["Job Id", "Host", "Event", "Value", "Units", "Timestamp"],
            },
        ]
    }
    result = run_batch_pipeline(
        spark, raw_dir + "/*/block.csv", "block", out_dir, generic_config=cfg
    )
    assert result.columns == ["Job Id", "Host", "Event", "Value", "Units", "Timestamp"]

    back = spark.read.parquet(out_dir)
    assert back.count() == result.count() > 0
    # suffix applied
    sample = back.select("Job Id").first()[0]
    assert sample.endswith("_C")
    # equivalent to composing the pieces by hand on one distributed read
    direct = block_io_rates(
        read_csv_tolerant(spark, raw_dir + "/*/block.csv", schema=RAW_BLOCK_SCHEMA)
    )
    assert back.count() == direct.count()


def test_pipeline_rejects_unknown_kind(spark, tmp_path):
    with pytest.raises(KeyError, match="unknown pipeline kind"):
        run_batch_pipeline(spark, "/nope/*.csv", "wat", str(tmp_path / "o"))
