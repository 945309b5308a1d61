"""Dynamic schema inference, versioning, and evolution tracking —
the reference's one genuinely interesting idea (SURVEY §1.3), rebuilt
as catalog operations over small parquet tables.

Reference semantics preserved exactly:
- schemas are versioned monotonically (app.py:76-81, insert 119-122);
- a new batch bumps the version only when the *top-level field set*
  changes (app.py:339-350) — type changes don't (in the reference
  everything is a string so types can't change; here we keep real types
  but retain the key-set rule as the evolution trigger);
- every bump logs added/removed fields to a change log (app.py:83-91,
  124-128).

Differences by design: the schema document is Spark's ``StructType``
JSON (real types) instead of a genson all-string JSON Schema
(app.py:255-261 coerces every value to str — an artifact, not a
semantic); storage is parquet append, not SQLite row-at-a-time.

Scale note: these catalog tables are metadata (rows = number of schema
versions ever seen). All data-plane work (inference) is delegated to
Spark's own readers; ``register`` touches only a StructType.
"""

from __future__ import annotations

import datetime as _dt
import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HISTORY_SCHEMA = T.StructType([
    T.StructField("version", T.IntegerType(), False),
    T.StructField("schema_json", T.StringType(), False),
    T.StructField("created_at", T.TimestampType(), False),
])

_CHANGES_SCHEMA = T.StructType([
    T.StructField("old_version", T.IntegerType(), False),
    T.StructField("new_version", T.IntegerType(), False),
    T.StructField("added_fields", T.ArrayType(T.StringType()), False),
    T.StructField("removed_fields", T.ArrayType(T.StringType()), False),
    T.StructField("created_at", T.TimestampType(), False),
])


def _now() -> _dt.datetime:
    return _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)


class SchemaRegistry:
    """Versioned schema store over two parquet catalog tables
    (``schema_history``, ``schema_changes``)."""

    def __init__(self, spark: SparkSession, store_dir: str):
        self.spark = spark
        self.store = Path(store_dir)
        self.history_path = str(self.store / "schema_history")
        self.changes_path = str(self.store / "schema_changes")
        # single-writer cache of (version, schema): every mutation goes
        # through register(), so re-reading the catalog per batch would
        # only repay a Spark job to learn what this instance just wrote
        self._latest: tuple[int, T.StructType] | None = None

    # -- reads ------------------------------------------------------------

    def _read(self, path: str, schema: T.StructType) -> DataFrame:
        if not Path(path).exists():
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(path)

    def history(self) -> DataFrame:
        """All schema versions, ascending (reference get_schemas,
        app.py:155-159)."""
        return self._read(self.history_path, _HISTORY_SCHEMA).orderBy("version")

    def changes(self) -> DataFrame:
        """Change log, newest first (reference get_schema_changes,
        app.py:162-166)."""
        return self._read(self.changes_path, _CHANGES_SCHEMA).orderBy(
            F.desc("created_at"), F.desc("new_version")
        )

    def latest(self) -> tuple[int, T.StructType] | None:
        """Latest version + schema (reference get_latest_schema_version,
        app.py:144-152: ORDER BY version DESC LIMIT 1)."""
        if self._latest is not None:
            return self._latest
        if not Path(self.history_path).exists():
            return None  # no catalog yet: skip the empty-scan Spark job
        row = (
            self._read(self.history_path, _HISTORY_SCHEMA)
            .orderBy(F.desc("version")).limit(1).collect()
        )
        if not row:
            return None
        self._latest = (
            row[0]["version"],
            T.StructType.fromJson(json.loads(row[0]["schema_json"])),
        )
        return self._latest

    # -- writes -----------------------------------------------------------

    def _append(self, path: str, rows: list, schema: T.StructType) -> None:
        # one explicit slice: the default createDataFrame splits even a
        # single row across default-parallelism Python partitions, and a
        # later coalesce(1) drains all of them through sequential Python
        # worker round-trips (~5s for a 1-row catalog append)
        rdd = self.spark.sparkContext.parallelize(rows, 1)
        self.spark.createDataFrame(rdd, schema).write.mode("append").parquet(path)

    def register(self, schema: T.StructType) -> tuple[int, bool]:
        """Register a batch schema; returns (version, changed).

        Key-set comparison per the reference (app.py:112-116, 339-350):
        same top-level field set -> reuse the latest version; otherwise
        bump, store the new schema, and log added/removed fields.
        """
        latest = self.latest()
        new_fields = set(schema.fieldNames())
        if latest is not None:
            version, old_schema = latest
            old_fields = set(old_schema.fieldNames())
            if old_fields == new_fields:
                return version, False
            new_version = version + 1
            self._append(self.changes_path, [(
                version, new_version,
                sorted(new_fields - old_fields),
                sorted(old_fields - new_fields),
                _now(),
            )], _CHANGES_SCHEMA)
        else:
            new_version = 1
        self._append(
            self.history_path,
            [(new_version, json.dumps(schema.jsonValue()), _now())],
            _HISTORY_SCHEMA,
        )
        self._latest = (new_version, schema)
        return new_version, True

    def register_df(self, df: DataFrame) -> tuple[int, bool]:
        return self.register(df.schema)

    # -- export -----------------------------------------------------------

    def schema_for(self, version: int) -> T.StructType:
        """The stored StructType for a version (ValueError if absent)."""
        if self._latest is not None and self._latest[0] == version:
            return self._latest[1]
        rows = (
            self._read(self.history_path, _HISTORY_SCHEMA)
            .filter(F.col("version") == version).limit(1).collect()
        )
        if not rows:
            raise ValueError(f"no schema version {version} in registry")
        return T.StructType.fromJson(json.loads(rows[0]["schema_json"]))

    def to_json_schema(self, version: int) -> dict:
        """Export a stored version as a genson-style JSON Schema
        document — byte-parity with the reference's ``schema_history``
        rows (app.py:250-263: ``SchemaBuilder().add_object(...)
        .to_schema()``), so downstream consumers of the reference's
        SQLite catalog can read this registry's export unchanged.

        genson output shape (verified against the reference's actual
        etl_data.db v1/v2 rows in tests/test_schema_registry.py):
        ``$schema`` header ``http://json-schema.org/schema#``; every
        object level carries type/properties/required; ``required`` is
        SORTED (genson sorts key sets); properties keep field order.
        Spark types map onto JSON Schema primitive names; the nested
        ``_extracted_patterns`` struct round-trips as the object-of-
        string-arrays document the reference stores for text ingests.
        """
        return _struct_to_json_schema(self.schema_for(version), top=True)


def _spark_type_to_json_schema(dt: T.DataType) -> dict:
    if isinstance(dt, T.StructType):
        return _struct_to_json_schema(dt)
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _spark_type_to_json_schema(dt.elementType)}
    if isinstance(dt, T.MapType):
        # JSON objects with arbitrary keys: genson would emit
        # per-observed-key properties; a schema-level map is the honest
        # closed form
        return {
            "type": "object",
            "additionalProperties": _spark_type_to_json_schema(dt.valueType),
        }
    if isinstance(dt, T.StringType):
        return {"type": "string"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return {"type": "integer"}
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"type": "number"}
    if isinstance(dt, T.NullType):
        return {"type": "null"}
    # timestamps/dates/binary: genson sees the str()-coerced value
    # (app.py:255-261), so they surface as strings
    return {"type": "string"}


def _struct_to_json_schema(st: T.StructType, top: bool = False) -> dict:
    doc: dict = {}
    if top:
        doc["$schema"] = "http://json-schema.org/schema#"
    doc["type"] = "object"
    doc["properties"] = {
        f.name: _spark_type_to_json_schema(f.dataType) for f in st.fields
    }
    doc["required"] = sorted(f.name for f in st.fields)
    return doc
