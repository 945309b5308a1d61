"""Interchange writers: the record store back OUT through the
reference's wire formats.

The reference's only export is its SQLite artifact (covered by
EtlPipeline.export_sqlite); real pipelines hand records to downstream
consumers as CSV or JSONL. These writers close the round-trip with the
readers in ``readers.py`` — a store written by ``write_jsonl`` reads
back through ``read_json`` with the same rows — and both are plain
distributed ``df.write`` jobs (one file per partition, no driver
funnel). Nested/array columns (``_extracted_patterns``, quality
issues) don't fit CSV's flat model, so ``write_csv`` serializes them
to JSON strings explicitly rather than failing mid-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = None) -> None:
    """One JSON object per line, schema preserved including nesting."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True, **options) -> None:
    """CSV with complex columns (struct/array/map) serialized as JSON
    text — the same blob convention the reference stores (app.py:364),
    applied per column instead of per row."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    (
        df.select(cols)
        .write.mode(mode)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )
