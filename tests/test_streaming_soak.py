"""Rate-source soak: run a watermarked windowed aggregation over the
built-in ``rate-micro-batch`` source for a dozen micro-batches and
assert the two properties that matter for an always-on pipeline —
state stays BOUNDED (closed windows are evicted once the watermark
passes them) and emitted results are exact (every closed window holds
exactly one batch's rows). A stateful op whose state grows with input
would pass a correctness test and OOM in production; this is the test
that catches it."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

ROWS_PER_BATCH = 1000
N_BATCHES = 12
#: event time advances one full window per micro-batch
WINDOW = "1 minute"
WATERMARK = "2 minutes"


def _rate_stream(spark):
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", ROWS_PER_BATCH)
        .option("numPartitions", 4)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 60_000)
        .load()
    )


def test_rate_soak_bounded_state_exact_windows(spark):
    agg = (
        _rate_stream(spark)
        .withWatermark("timestamp", WATERMARK)
        .groupBy(F.window("timestamp", WINDOW).alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "n", "value_sum")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_soak")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= N_BATCHES:
                break
            time.sleep(0.2)
        else:
            raise AssertionError(f"soak never reached batch {N_BATCHES}")

        # state boundedness: open windows are only those inside the
        # watermark horizon (watermark/window + the in-flight one, plus
        # slack for progress-report timing) — NOT one per batch seen
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p["stateOperators"] and p["batchId"] >= 6
        ]
        assert state_rows, "no state metrics reported"
        assert max(state_rows) <= 6, (
            f"state grew with input: {state_rows} (eviction not happening)"
        )
        # watermark advanced with event time
        wm = q.lastProgress["eventTime"].get("watermark", "")
        assert wm >= "1970-01-01T00:08", f"watermark stuck at {wm!r}"
    finally:
        q.stop()

    out = spark.table("t_soak").toPandas()
    # exactness: every closed 1-minute window saw exactly one batch
    assert len(out) >= N_BATCHES - 4  # all but the watermark tail closed
    assert (out["n"] == ROWS_PER_BATCH).all(), out
    # rate source value is a global row counter: the window starting
    # at minute k holds exactly values [k*B, (k+1)*B), so its sum is
    # k*B^2 + B*(B-1)/2 — an exact per-window fingerprint
    b = ROWS_PER_BATCH
    got = {
        int(row["window_start"].timestamp()) // 60: int(row["value_sum"])
        for _, row in out.iterrows()
    }
    for k, s in got.items():
        assert s == k * b * b + b * (b - 1) // 2, (k, s)
    assert len(got) == len(out), "duplicate window emitted"
