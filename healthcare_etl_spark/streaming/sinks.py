"""Streaming sinks: exactly-once parquet via ``foreachBatch``.

The built-in file sink is append-only; ``foreachBatch`` is the standard
escape hatch for transactional/idempotent sinks: each micro-batch
arrives as a regular DataFrame with an epoch id, and the writer makes
(epoch, write) idempotent — re-delivered epochs overwrite their own
partition directory instead of duplicating rows. Combined with
checkpointed offsets this yields effective exactly-once into parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.streaming.windows import streaming_events


def run_stream_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Stream events into an epoch-partitioned parquet table, exactly-once.

    Each epoch's rows land under ``epoch=<id>/``; rewriting an epoch
    replaces exactly that directory (dynamic partition overwrite), so
    replays are idempotent. Returns the materialized table.
    """
    ev = streaming_events(spark, sf_dir).select("event_id", "ts", "event_type", "value")

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_dir)
        )

    q = (
        ev.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out_dir)
