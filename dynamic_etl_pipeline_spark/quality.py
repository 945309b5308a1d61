"""Data-quality validation + lineage tagging (SURVEY §2.10).

The reference validates each record against the inferred schema in a
Python loop (validate_record, app.py:267-276, applied at app.py:355-360)
and tags `_schema_version` / `_ingested_at` / `_quality_issues` before
storing (app.py:361-363). Here the same checks are planned statically:

- *extra / missing columns* are a property of the batch, not the row —
  known at plan time, so they cost a constant expression, not a scan;
- *per-row missing values* (the dict-key-absent case maps to NULL in a
  DataFrame) become a vectorized when/array_compact expression;
- lineage columns are plain withColumn.

Everything stays in codegen: validating 100 TB costs one pass with no
Python and no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISSUES_COL = "_quality_issues"
VERSION_COL = "_schema_version"
INGESTED_COL = "_ingested_at"
LINEAGE_COLS = (ISSUES_COL, VERSION_COL, INGESTED_COL)


def validation_issues(df: DataFrame, expected: T.StructType) -> Column:
    """Array-of-issue-strings column, reference message format exactly
    (app.py:271-275): "Field 'f' not in schema" for unexpected columns,
    "Missing field: 'f'" for schema fields absent (batch-level) or NULL
    (row-level) in the batch."""
    expected_fields = set(expected.fieldNames())
    actual_fields = [c for c in df.columns if c not in LINEAGE_COLS]

    static_issues: list[Column] = []
    for field in actual_fields:
        if field not in expected_fields:
            static_issues.append(F.lit(f"Field '{field}' not in schema"))
    per_row: list[Column] = []
    for field in sorted(expected_fields):
        if field not in df.columns:
            static_issues.append(F.lit(f"Missing field: '{field}'"))
        else:
            per_row.append(
                F.when(F.col(field).isNull(), F.lit(f"Missing field: '{field}'"))
            )
    parts = static_issues + per_row
    if not parts:
        return F.array().cast(T.ArrayType(T.StringType()))
    return F.array_compact(F.array(*parts))


def validate(df: DataFrame, expected: T.StructType) -> DataFrame:
    return df.withColumn(ISSUES_COL, validation_issues(df, expected))


def with_lineage(df: DataFrame, schema_version: int) -> DataFrame:
    """Reference app.py:361-363: tag version + ingest timestamp."""
    return df.withColumn(VERSION_COL, F.lit(schema_version)).withColumn(
        INGESTED_COL, F.current_timestamp()
    )


def quality_summary(df: DataFrame) -> DataFrame:
    """Good/bad record counts (reference count_good/count_issues loop,
    app.py:353-366) as a single aggregate."""
    has_issues = F.size(F.col(ISSUES_COL)) > 0
    return df.groupBy(has_issues.alias("has_issues")).agg(
        F.count("*").alias("n_records")
    )


def coerce_strings(df: DataFrame) -> DataFrame:
    """Reference-compat all-string mode (app.py:255-261: every value is
    str(value), None -> "" before schema inference). Scalar columns
    cast to string with NULL -> ''; nested columns (the
    _extracted_patterns struct) keep their shape — matching the
    reference's observed schemas, where genson still types the nested
    object (SURVEY §1.2). Lineage columns pass through untouched.

    This is a COMPAT mode, not the default: the engine keeps real
    types (SURVEY §1.4 calls the string-only model an artifact).
    """
    nested = (T.StructType, T.ArrayType, T.MapType)
    cols = []
    for f in df.schema.fields:
        if f.name in LINEAGE_COLS or isinstance(f.dataType, nested):
            cols.append(F.col(f.name))
        else:
            cols.append(
                F.coalesce(F.col(f.name).cast("string"), F.lit(""))
                .alias(f.name)
            )
    return df.select(cols)
