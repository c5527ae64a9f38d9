"""Streaming oracle (SURVEY §5.2.4): drive the true Structured
Streaming ops with a chunked file source + memory sink and assert the
results equal the oracle-checked batch twins."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from thrive_spark.operators import streaming_twins
from thrive_spark.streaming import ops
from thrive_spark.tables import Tables

N_CHUNKS = 6


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """Split events chronologically into N parquet files (mtime
    ascending = arrival order for the file source)."""
    root = tmp_path_factory.mktemp("events_stream")
    ev = Tables(spark, sf_dir).events
    n = ev.count()
    # monotonically_increasing_id over a sorted single partition is rank
    ranked = ev.orderBy("ts", "event_id").coalesce(1).withColumn(
        "rn", F.monotonically_increasing_id()
    )
    for i in range(N_CHUNKS):
        lo, hi = i * n // N_CHUNKS, (i + 1) * n // N_CHUNKS
        chunk = ranked.filter((F.col("rn") >= lo) & (F.col("rn") < hi)).drop("rn")
        cdir = str(root / f"c{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(cdir)
        part = next(
            p for p in os.listdir(cdir) if p.endswith(".parquet")
        )
        dst = str(root / f"chunk_{i}.parquet")
        os.rename(f"{cdir}/{part}", dst)
        ts = time.time() + i  # strictly increasing mtimes
        os.utime(dst, (ts, ts))
    schema = ev.schema
    return str(root), schema


def run_stream(spark, stream_df, mode, name):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    out = spark.table(name).toPandas()
    q.stop()
    return out


def read_stream(spark, stream_dir):
    path, schema = stream_dir
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .filter(F.col("event_id").isNotNull())
    )


def canon(pdf, cols):
    return sorted(
        tuple(str(v) for v in row)
        for row in pdf[sorted(cols)].itertuples(index=False, name=None)
    )


def test_tumbling_equals_twin(spark, sf_dir, stream_dir):
    got = run_stream(
        spark, ops.tumbling_counts(read_stream(spark, stream_dir)), "complete", "t_tum"
    )
    want = streaming_twins.stream_tumbling_count(spark, sf_dir).toPandas()
    assert canon(got, got.columns) == canon(want, want.columns)


def test_sliding_equals_twin(spark, sf_dir, stream_dir):
    got = run_stream(
        spark, ops.sliding_avg(read_stream(spark, stream_dir)), "complete", "t_slide"
    )
    want = streaming_twins.stream_sliding_avg(spark, sf_dir).toPandas()
    assert canon(got, got.columns) == canon(want, want.columns)


def test_session_equals_twin(spark, sf_dir, stream_dir):
    got = run_stream(
        spark,
        ops.session_windows(read_stream(spark, stream_dir)),
        "complete",
        "t_sess",
    )
    want = streaming_twins.stream_session_window(spark, sf_dir).toPandas()
    assert canon(got, got.columns) == canon(want, want.columns)


def test_dedup_matches_twin_counts(spark, sf_dir, stream_dir):
    got = run_stream(
        spark,
        ops.dedup_within_watermark(read_stream(spark, stream_dir)),
        "append",
        "t_dedup",
    )
    want = streaming_twins.stream_dedup_watermark(spark, sf_dir).toPandas()
    # same distinct-key count; kept row identity is arrival-dependent
    assert len(got) == len(want)


def test_watermark_drop_bounded(spark, sf_dir, stream_dir):
    got = run_stream(
        spark,
        ops.windowed_counts_with_watermark(read_stream(spark, stream_dir)),
        "append",
        "t_wm",
    )
    total = Tables(spark, sf_dir).events.count()
    # append mode emits only watermark-closed windows; engine-defined
    # drop semantics → bound checks, not equality (SURVEY §2.9)
    assert 0 < got["n"].sum() <= total


def test_stateful_counter_equals_twin_finals(spark, sf_dir, stream_dir):
    got = run_stream(
        spark,
        ops.stateful_cum_purchase(read_stream(spark, stream_dir)),
        "append",
        "t_state",
    )
    want = streaming_twins.stream_stateful_counter(spark, sf_dir).toPandas()
    g = got.groupby("user_id")["cum_purchase"].max().sort_index()
    w = want.groupby("user_id")["cum_purchase"].max().sort_index()
    assert g.round(4).equals(w.round(4)), (g, w)
