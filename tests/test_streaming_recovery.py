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
