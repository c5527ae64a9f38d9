"""Exactly-once streaming sinks via foreachBatch (SCALE.md §streaming).

The memory/console sinks are test rigs; production delivery is
``foreachBatch`` writing each micro-batch idempotently: partition the
output by ``batch_id`` and overwrite that partition, so a replayed
batch (checkpoint recovery re-delivers the last uncommitted batch)
rewrites the same files instead of duplicating them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def idempotent_parquet_sink(out_path: str):
    """foreachBatch function: exactly-once parquet delivery keyed by
    batch_id (dynamic partition overwrite makes replays no-ops)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return write_batch


def start_file_pipeline(
    spark: SparkSession,
    source_df: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Streaming load: file source → idempotent parquet sink with a
    checkpoint — the streaming twin of the batch dirlist ledger (the
    checkpoint's seen-files log plays the ledger role)."""
    return (
        source_df.writeStream.foreachBatch(idempotent_parquet_sink(out_path))
        .option("checkpointLocation", checkpoint)
        .start()
    )
