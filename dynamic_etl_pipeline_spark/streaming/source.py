"""Streaming sources.

The events fixture doubles as a replayable stream: the parquet file(s)
under a path are treated as arriving micro-batches by Spark's file
source. A real deployment swaps this for Kafka/Kinesis by changing only
this module — everything downstream is plain (un)bounded DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import normalize_event_ts, table_path
from ..session import tune


def stream_events(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """Unbounded events DataFrame from the fixture parquet.

    The file source needs an explicit schema (no streaming inference);
    a footer-only batch read supplies it. ts is normalized exactly like
    catalog.load_table so batch and stream plans stay twins.
    """
    tune(spark)
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    # The streaming file source only accepts directories: stream the
    # fixture dir with a glob pinned to the events file.
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    return normalize_event_ts(df, ntz=False)


def stream_events_dir(spark: SparkSession, directory: str,
                      schema, max_files_per_trigger: int = 1) -> DataFrame:
    """Stream a directory of event parquet files (tests use this to
    replay the fixture as N distinct micro-batches)."""
    tune(spark)
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )
    return normalize_event_ts(df, ntz=False)


def stream_parquet_dir(spark: SparkSession, directory: str,
                       schema, max_files_per_trigger: int = 1) -> DataFrame:
    """Stream any directory of parquet files as micro-batches (generic
    variant of stream_events_dir without the events ts conversion —
    e.g. a CDC change feed for sinks.maintain_keyed_store)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )
