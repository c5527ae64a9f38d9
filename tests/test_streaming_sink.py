"""foreachBatch idempotent sink: end-to-end file pipeline with
checkpoint recovery semantics (replaying a batch must not duplicate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thrive_spark.streaming.sinks import idempotent_parquet_sink, start_file_pipeline
from thrive_spark.tables import Tables
from tests.test_streaming import read_stream  # reuse the chunked source


def test_idempotent_sink_exactly_once(spark, sf_dir, stream_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = start_file_pipeline(
        spark, read_stream(spark, stream_dir), out, ckpt
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    want = Tables(spark, sf_dir).events
    assert got.count() == want.count()
    # every source event delivered exactly once
    assert got.select("event_id").distinct().count() == want.count()

    # replay a batch (checkpoint recovery re-delivers): rewriting the
    # same batch partition must be a no-op, not a duplication
    batch0 = got.filter(F.col("batch_id") == 0).drop("batch_id")
    idempotent_parquet_sink(out)(batch0, 0)
    assert spark.read.parquet(out).count() == want.count()
