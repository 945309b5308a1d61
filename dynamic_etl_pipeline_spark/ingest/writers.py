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


def write_training_shards(df: DataFrame, path: str, shard_col: str,
                          sort_cols: list[str], mode: str = "overwrite",
                          fmt: str = "parquet") -> None:
    """Write deterministic training shards: one directory per shard
    (``partitionBy``), rows INSIDE each shard file in ``sort_cols``
    order — the layout a dataloader consumes sequentially
    (corpus_shuffle_shards computes the shard/position assignment;
    this materializes it).

    Plan shape: ``repartition(shard_col)`` routes each shard to one
    task, ``sortWithinPartitions`` orders rows before the writer sees
    them (Spark's writer preserves incoming row order per file), and
    ``partitionBy`` splits directories WITHOUT a second shuffle since
    rows already arrive shard-clustered. No global sort anywhere: this
    is the repartition+secondary-sort idiom, shard-parallel at any
    corpus size. (At extreme shard sizes, add more distribution keys
    to ``repartition`` and accept multiple files per shard — each
    still internally ordered.)"""
    (
        df.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, *sort_cols)
        .write.mode(mode)
        .partitionBy(shard_col)
        .format(fmt)
        .save(path)
    )
