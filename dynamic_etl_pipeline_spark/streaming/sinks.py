"""Streaming sinks.

``run_available_now_to_memory`` is the verification harness: drain the
whole (bounded) replay in one availableNow run and hand back the result
as a DataFrame. The memory sink collects to the driver, so it is for
tests/oracles only.

``foreach_batch_parquet`` is the deployment-shaped sink: per-batch
parquet append keyed by batch_id, idempotent on retry (overwrite of the
same batch directory), arbitrarily parallel.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def run_available_now_to_memory(stream_df: DataFrame,
                                output_mode: str = "complete",
                                timeout_s: int = 300,
                                state_partitions: int | None = 8) -> DataFrame:
    """Process everything currently available, stop, return results.

    complete mode re-emits the full aggregate result on the final
    trigger, which is what makes streaming output comparable 1:1 with
    the batch twin (append would hold back windows newer than the
    watermark at end-of-stream).

    ``state_partitions`` temporarily lowers shuffle partitions for the
    run: every stateful operator opens one state store per shuffle
    partition, and at verification scale 32 stores are pure overhead
    (a real deployment sizes this to key cardinality and keeps it fixed
    for the checkpoint's lifetime).
    """
    spark = stream_df.sparkSession
    name = f"vr_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def foreach_batch_parquet(stream_df: DataFrame, path: str,
                          checkpoint: str,
                          output_mode: str = "update"):
    """Start a foreachBatch sink appending each micro-batch to
    ``path/batch_id=N`` (idempotent per-batch overwrite + checkpoint
    tracking = effectively-once on retries)."""
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{path.rstrip('/')}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def maintain_incremental_rollup(stream_df: DataFrame, store_dir: str,
                                checkpoint: str, width: str = "1 hour",
                                timeout_s: int = 300) -> DataFrame:
    """Streaming materialized view: maintain an at-rest hourly rollup
    table under foreachBatch, merging each micro-batch's PARTIAL
    aggregates into the store instead of re-aggregating history.

    The merge exploits associativity: the store keeps (bucket, type) ->
    (n_events, total_value DECIMAL) partials; each batch computes its
    own partials and the merge is `union -> groupBy -> sum` over
    |store| + |batch-keys| rows — cost is proportional to the ROLLUP
    size, never to accumulated raw history (the property that makes a
    materialized view viable when the raw stream is 100 TB). DECIMAL
    totals at rest make merge order irrelevant, so the maintained view
    is bit-identical to the batch twin.

    Exactly-once across retries: commits use the atomic-pointer idiom
    (Delta/Hive-style). Each merged batch is written to its own
    versioned directory ``v-<batch_id>``; the single commit point is an
    ``os.replace`` of the ``CURRENT`` pointer file, which is atomic on
    POSIX. The pointer doubles as the replay marker, so data and marker
    can never disagree, and readers always see a complete version —
    there is no window where the store is absent or half-swapped. A
    crash after the data write but before the pointer swap leaves an
    orphan ``v-`` directory that the replayed batch simply overwrites.

    Returns the final rollup as a DataFrame (bucket, event_type,
    n_events, total_value DOUBLE) after an availableNow drain.
    """
    import os
    import shutil
    from pathlib import Path

    from pyspark.sql import functions as F

    spark = stream_df.sparkSession
    store = Path(store_dir)

    unit = width.split()[-1]  # "1 hour" -> date_trunc('hour', ...)

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc(unit, F.col("ts")).alias("bucket"),
            "event_type",
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,4)")).alias("total_value"),
        )

    pointer = store / "CURRENT"

    def current_version() -> int | None:
        return int(pointer.read_text()) if pointer.exists() else None

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        last = current_version()
        if last is not None and last >= batch_id:
            return  # replayed batch: already committed
        new = partials(batch_df)
        if last is not None:
            new = (
                spark.read.parquet(str(store / f"v-{last}"))
                .unionByName(new)
                .groupBy("bucket", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value")
                    .cast("decimal(27,4)")
                    .alias("total_value"),
                )
            )
        vdir = store / f"v-{batch_id}"
        new.write.mode("overwrite").parquet(str(vdir))
        tmp = store / f"_CURRENT.tmp-{batch_id}"
        tmp.write_text(str(batch_id))
        os.replace(tmp, pointer)  # atomic commit: pointer IS the marker
        if last is not None:  # post-commit GC; orphans on crash are harmless
            shutil.rmtree(store / f"v-{last}", ignore_errors=True)

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        q.stop()
    return spark.read.parquet(str(store / f"v-{current_version()}")).select(
        "bucket", "event_type", "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )
