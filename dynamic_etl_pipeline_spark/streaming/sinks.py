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
