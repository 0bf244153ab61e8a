"""Config-driven generic transformer chain (SURVEY.md §2.8 string/scalar
rows; reference: data-pipeline/.../transformers/generic_transformers.py).

The reference's CompositeTransformer applies suffix → string-normalize →
schema-standardize → unit-column → timestamp-normalize → column-reorder as
configured in YAML (config/datasets/conte_hpc.yaml). All of it maps to
native column expressions — including the suffix append, which the
reference implements as a per-row ``map_elements`` lambda
(generic_transformers.py:43-47) and which here is a plain ``concat`` (no
UDF, stays in whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# multi-format permissive timestamp parse (generic_transformers.py:142-185):
# Polars format=None infers; we coalesce the formats seen in the datasets.
_TS_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "MM/dd/yyyy HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
]


def suffix_transform(df: DataFrame, columns: list[str], suffix: str) -> DataFrame:
    """Append a per-cluster suffix to key columns (conte_hpc.yaml
    suffix_transform; generic_transformers.py:13-56). Nulls stay null —
    ``concat`` propagates null like the reference's ``if x is not None``."""
    if not suffix:
        return df
    for c in columns:
        if c in df.columns:
            df = df.withColumn(c, F.concat(F.col(c).cast("string"), F.lit(suffix)))
    return df


def string_normalize(df: DataFrame, patterns: list[dict[str, str]]) -> DataFrame:
    """Regex find/replace applied to every string column
    (generic_transformers.py:87-139; e.g. jobID→JOB)."""
    string_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    for c in string_cols:
        expr = F.col(c)
        for p in patterns:
            if p.get("find"):
                expr = F.regexp_replace(expr, p["find"], p.get("replace", ""))
        df = df.withColumn(c, expr)
    return df


def schema_standardize(df: DataFrame, expected_columns: list[str]) -> DataFrame:
    """Select in schema order; missing columns become typed-null
    placeholders (generic_transformers.py:209-243)."""
    exprs = [
        F.col(c) if c in df.columns else F.lit(None).cast("string").alias(c)
        for c in expected_columns
    ]
    return df.select(*exprs)


def add_unit_column(df: DataFrame, default: str = "") -> DataFrame:
    """Add ``unit`` = '' when missing (generic_transformers.py:188-206)."""
    if "unit" not in df.columns:
        df = df.withColumn("unit", F.lit(default))
    return df


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Parse string columns whose name contains time/timestamp with a
    permissive multi-format coalesce (generic_transformers.py:142-185)."""
    for f in df.schema.fields:
        if ("time" in f.name.lower()) and isinstance(f.dataType, T.StringType):
            parsed = F.coalesce(
                *[F.try_to_timestamp(F.col(f.name), F.lit(fmt)) for fmt in _TS_FORMATS]
            )
            df = df.withColumn(f.name, parsed)
    return df


def column_reorder(df: DataFrame, expected_columns: list[str]) -> DataFrame:
    """Select the expected columns that exist, in order
    (generic_transformers.py:59-84)."""
    available = [c for c in expected_columns if c in df.columns]
    return df.select(*available) if available else df


class CompositeTransformer:
    """Apply the configured transformation sequence
    (generic_transformers.py:246-293). ``config`` mirrors the YAML shape:

        {"transformations": [
            {"type": "suffix_transform", "suffix": "_C", "columns": [...]},
            {"type": "job_id_normalization", "patterns": [{"find": ..., "replace": ...}]},
            {"type": "standardize_columns", "output_schema": [...]},
            {"type": "add_unit_column"},
            {"type": "normalize_timestamps"},
        ]}
    """

    def __init__(self, config: dict):
        self.config = config or {}
        self.steps: list = self.config.get("transformations", [])

    def transform(self, df: DataFrame) -> DataFrame:
        expected: list[str] | None = None
        for step in self.steps:
            kind = step.get("type")
            if kind == "suffix_transform":
                df = suffix_transform(df, step.get("columns", []), step.get("suffix", ""))
            elif kind == "job_id_normalization":
                df = string_normalize(df, step.get("patterns", []))
            elif kind == "standardize_columns":
                expected = step.get("output_schema", [])
                df = schema_standardize(df, expected)
            elif kind == "add_unit_column":
                df = add_unit_column(df)
            elif kind == "normalize_timestamps":
                df = normalize_timestamps(df)
        if expected:  # reference always reorders last
            df = column_reorder(df, expected)
        return df
