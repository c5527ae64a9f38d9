"""Checkpoint recovery: stop a streaming pipeline, add new input,
restart from the same checkpoint — the seen-files log must skip
everything already delivered (exactly-once across restarts, the
streaming twin of the dirlist ledger)."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from thrive_spark.streaming.sinks import start_file_pipeline
from thrive_spark.tables import Tables


def test_restart_from_checkpoint_no_duplicates(spark, sf_dir, stream_dir, tmp_path):
    src_all, schema = stream_dir
    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(src)
    chunks = sorted(
        f for f in os.listdir(src_all) if f.startswith("chunk_")
    )
    half = len(chunks) // 2

    def reader():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # phase 1: first half of the input
    for i, f in enumerate(chunks[:half]):
        shutil.copy(f"{src_all}/{f}", f"{src}/{f}")
        os.utime(f"{src}/{f}", (time.time() + i, time.time() + i))
    q = start_file_pipeline(spark, reader(), out, ckpt)
    q.processAllAvailable()
    q.stop()
    n_phase1 = spark.read.parquet(out).count()
    assert n_phase1 > 0

    # phase 2: rest of the input lands; RESTART from the checkpoint
    for i, f in enumerate(chunks[half:]):
        shutil.copy(f"{src_all}/{f}", f"{src}/{f}")
        os.utime(
            f"{src}/{f}", (time.time() + half + i, time.time() + half + i)
        )
    q = start_file_pipeline(spark, reader(), out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    want = Tables(spark, sf_dir).events
    assert got.count() == want.count()  # nothing duplicated, nothing lost
    assert got.select("event_id").distinct().count() == want.count()
    # and the second run really did append beyond phase 1
    assert got.count() > n_phase1
    assert got.select(F.max("batch_id")).collect()[0][0] >= half


def test_available_now_incremental_batches(spark, sf_dir, tmp_path):
    """Trigger.AvailableNow: the batch-like incremental run — each
    invocation drains exactly the files the checkpoint hasn't seen,
    then stops. This is Structured Streaming's native counterpart of
    the dirlist ledger (sources/incremental.py): same exactly-once
    contract, state in the checkpoint instead of a parquet ledger."""
    from pyspark.sql import functions as F

    from thrive_spark.tables import Tables

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = "t_avnow"
    ev = Tables(spark, sf_dir).events.select("event_id", "user_id", "value")
    ev.filter(F.col("event_id") % 3 == 0).write.parquet(f"{src}/f1")

    def drain():
        q = (
            spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
            .groupBy()
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.table(out).collect()[0][0]

    n1_expected = ev.filter(F.col("event_id") % 3 == 0).count()
    assert drain() == n1_expected
    # new file lands; the next AvailableNow run picks up ONLY the delta
    ev.filter(F.col("event_id") % 3 == 1).write.parquet(f"{src}/f2")
    total = drain()
    assert total == ev.filter(F.col("event_id") % 3 != 2).count()
