"""True Structured Streaming forms of the §2.9 operators.

Each function takes a *streaming* events DataFrame (schema:
event_id long, ts timestamp, user_id long, event_type string,
value double, props string) and returns the streaming result.
tests/test_streaming.py drives them with a chunked file source and a
memory sink and asserts equality with the batch twins in
operators/streaming_twins.py — that equality IS the streaming oracle.

At scale these run unchanged against kafka/file sources: the
aggregations are keyed (user_id / window), so state is partitioned;
watermarks bound state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators._util import fixed


def tumbling_counts(events: DataFrame) -> DataFrame:
    """events per 1-hour tumbling window × event_type."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def sliding_avg(events: DataFrame) -> DataFrame:
    """1-hour window sliding 15 min; integer-exact rounded average
    (same fixed-point formula as the batch twin)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum(fixed("value", 1000000)).alias("s6"))
        .select(
            F.col("w.start").alias("window_start"),
            "n",
            (F.expr("(2 * s6 + 100 * n) div (200 * n)") / 10000.0).alias(
                "avg_value"
            ),
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows with an inactivity gap."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
        )
        .select("user_id", "session_start", "n_events", "duration_us")
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Dedup on (user, type, minute) with a 30-minute watermark: state
    for a key is dropped once the watermark passes it, so state stays
    bounded — the streaming form of the batch min-keeper twin."""
    keyed = events.withColumn("minute_ts", F.date_trunc("minute", "ts"))
    return keyed.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "minute_ts"]
    )


def windowed_counts_with_watermark(events: DataFrame) -> DataFrame:
    """Tumbling counts with a 10-minute watermark: late events (by the
    engine's per-batch watermark) are dropped from their window. The
    batch twin models a per-ROW watermark, so the counts here are an
    upper bound of the twin's kept counts — asserted as such in tests
    (drop semantics are engine-defined; SURVEY §2.9 rows-only)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def stateful_cum_purchase(events: DataFrame) -> DataFrame:
    """Arbitrary stateful op: running per-user purchase total via
    applyInPandasWithState. Emits one row per input event with the
    cumulative value (micro-batch arrival order = event-time order in
    the test harness, matching the batch twin's window order).

    Spark 4's ``transformWithStateInPandas`` successor API was
    prototyped but is unusable in this container: its streaming Python
    runner needs a working ``google.protobuf`` install
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, verified) and the
    environment is pip-frozen. The APIs are semantically equivalent
    for this operator (per-key value state + per-row emission)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "event_id long, user_id long, cum_purchase double"
    state_schema = "total long"

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        total = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                if r["event_type"] == "purchase":
                    # same fixed-point units as the batch twin
                    total += int(r["value"] * 10000 + 0.5)
                rows.append((int(r["event_id"]), int(user_id), total / 10000.0))
        state.update((total,))
        yield pd.DataFrame(rows, columns=["event_id", "user_id", "cum_purchase"])

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stateful_cum_purchase_tws(events: DataFrame) -> DataFrame:
    """``stateful_cum_purchase`` on Spark 4's successor API,
    ``transformWithStateInPandas`` (StatefulProcessor + typed value
    state). Semantically identical to the applyInPandasWithState
    twin for this op: per-key value state, per-row emission.

    BOUNDARY (r11 verdict item 8): this container's pip-frozen env
    lacks ``google.protobuf``, which the transformWithState Python
    runner requires (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
    at query start, verified). The prototype is kept runnable and
    tests/test_streaming.py::test_stateful_tws_equals_twin_finals is
    importorskip-gated on google.protobuf — the moment the env gains
    it, the gate opens and the API parity is asserted automatically."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CumPurchase(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.total = handle.getValueState("total", "total long")

        def handleInputRows(self, key, rows, timerValues):
            total = (self.total.get() or (0,))[0] if self.total.exists() else 0
            out = []
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                for _, r in pdf.iterrows():
                    if r["event_type"] == "purchase":
                        # same fixed-point units as the batch twin
                        total += int(r["value"] * 10000 + 0.5)
                    out.append(
                        (int(r["event_id"]), int(key[0]), total / 10000.0)
                    )
            self.total.update((total,))
            yield pd.DataFrame(
                out, columns=["event_id", "user_id", "cum_purchase"]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CumPurchase(),
        outputStructType="event_id long, user_id long, cum_purchase double",
        outputMode="Append",
        timeMode="None",
    )


def gapfill_15min(events: DataFrame) -> DataFrame:
    """Streaming form of ``resample_gapfill``: dense 15-minute buckets
    per event_type with n=0 empty buckets and a forward-filled last
    observed bucket sum. Keyed state = the OPEN bucket (id, count,
    fixed-point sum) + the last finalized sum; when an event for a
    later bucket arrives, the open bucket is finalized and every gap
    bucket between them is emitted with n=0 and the carried sum. The
    currently-open bucket is never emitted (its terminator hasn't
    arrived) — the batch-twin test compares up to the last closed
    bucket. Assumes per-key bucket-monotonic arrival (the chunked test
    source is chronological); a stray late event folds into the open
    bucket rather than crashing, mirroring the cum_purchase twin's
    arrival-order contract. State is one tuple per event_type —
    bounded by key cardinality, not stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    bucket_s = 900
    scale = 10000
    out_schema = (
        "event_type string, bucket long, n long, "
        "bucket_sum double, ffill_sum double"
    )
    state_schema = "cur long, n long, s4 long, last_s4 long, started int"

    def update(key, pdfs, state: GroupState):
        (event_type,) = key
        cur, n, s4, last_s4, started = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                b = int(r["ts"].value // 1_000_000_000) // bucket_s
                v4 = int(r["value"] * scale + 0.5)
                if not started:
                    cur, n, s4, started = b, 0, 0, 1
                elif b > cur:
                    rows.append(
                        (event_type, cur, n, s4 / scale, s4 / scale)
                    )
                    last_s4 = s4
                    for gap in range(cur + 1, b):
                        rows.append(
                            (event_type, gap, 0, 0.0, last_s4 / scale)
                        )
                    cur, n, s4 = b, 0, 0
                n += 1
                s4 += v4
        state.update((cur, n, s4, last_s4, started))
        yield pd.DataFrame(
            rows,
            columns=["event_type", "bucket", "n", "bucket_sum", "ffill_sum"],
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def tumbling_topk_counts(events: DataFrame) -> DataFrame:
    """Streaming side of ``stream_tumbling_topk``: the tumbling
    count aggregate. Rank-over-aggregate is not streamable in one
    query (a non-time window function over a streaming agg is
    unsupported by design — it needs the finalized window), so the
    top-k rank runs as a trivial batch post-pass over emitted
    windows; state here is bounded by (windows in watermark ×
    event types)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def enrich_with_static_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream–static join: enrich the event stream with a broadcast
    dimension (user_id → nation). The static side is re-resolved per
    micro-batch, so a slowly-changing dim picks up updates without
    restarting the query; no state store is involved (static side is
    a broadcast, not a stream), so this composes freely with
    downstream windowed aggregation.
    """
    keyed = events.withColumn("nk", (F.col("user_id") % 25).cast("int"))
    joined = keyed.join(
        F.broadcast(dim.select("n_nationkey", "n_name")),
        keyed.nk == F.col("n_nationkey"),
    )
    return (
        joined.groupBy(F.window("ts", "1 hour").alias("w"), "n_name")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(fixed("value")).alias("vf"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_name",
            "n_events",
            (F.col("vf") / 10000.0).alias("sum_value"),
        )
    )


def interval_join_view_purchase(events: DataFrame) -> DataFrame:
    """Stream–stream interval join: each 'view' joins the same user's
    'purchase' events landing within the following hour.

    Both sides carry a 2-hour watermark; with the join bound
    p_ts ∈ [v_ts, v_ts + 1 h] Spark derives the state-retention
    horizon — view-side state can be dropped once the watermark
    passes v_ts + 1 h, purchase-side once it passes p_ts — so state
    is bounded by stream rate × (watermark + bound), never unbounded.
    Output mode is append (inner interval joins emit exactly-once
    per matched pair once both watermarks clear the bound).
    """
    v = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = v.join(
        p,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + INTERVAL 1 HOUR"
        ),
    )
    return joined.select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag_us"),
    )


def interval_join_view_purchase_outer(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream–stream interval join: like
    interval_join_view_purchase, but views with NO purchase inside
    their hour emit once the watermark proves no match can arrive
    (null purchase columns). Outer emission is watermark-driven: a
    view's state is released when watermark > v_ts + 1 h, which with
    the 2-hour delay means max-seen-ts − 2 h must pass v_ts + 1 h —
    the exact cutoff the batch twin encodes. (Engine note: unmatched
    rows surface one micro-batch AFTER the watermark move — the test
    asserts subset/exact accordingly.)"""
    v = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = v.join(
        p,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + INTERVAL 1 HOUR"
        ),
        "left_outer",
    )
    return joined.select(
        "view_id",
        F.col("v_user").alias("user_id"),
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag_us"),
    )


def probe_dedup_minhash(
    new_docs: DataFrame, corpus_sh: DataFrame, corpus_bands: DataFrame
) -> DataFrame:
    """Streaming incremental near-dup dedup — the true ingest form of
    operators/dedup_extra.dedup_incremental_minhash: ``new_docs`` is a
    STREAMING DataFrame of (doc_id, text); ``corpus_sh`` /
    ``corpus_bands`` are the STATIC persistent LSH index over the
    already-ingested corpus (built once by ``_mhp_sig_bands``; at
    scale an append-only parquet table bucketed by (band, key)).
    Emits (new_id, dup_of, jaccard) for every arriving doc that is a
    verified near-duplicate of a corpus doc, in append mode.

    Plan shape: signature computation is per-row expressions on the
    stream (stateless), the probe is a stream-static equi-join on
    (band, key), and the verify joins the static shingle-set table.
    The arriving doc's own shingle set rides along on its band rows
    (carry_sets=True) because a rejoin against the stream would be a
    stream-stream self-join Spark rejects; the only stateful step is
    the candidate-pair dropDuplicates, whose state is bounded by the
    stream's TRUE duplicate pairs (not the corpus)."""
    from ..operators.dedup_extra import (
        NGRAM_JACCARD_THRESHOLD,
        _mhp_sig_bands,
    )
    from ..operators._util import r4

    _, nb = _mhp_sig_bands(new_docs, checkpoint=False, carry_sets=True)
    cand = (
        nb.select(
            F.col("doc_id").alias("new_id"),
            F.col("s").alias("sa"),
            "band",
            "key",
        )
        .join(
            corpus_bands.select(
                F.col("doc_id").alias("dup_of"), "band", "key"
            ),
            ["band", "key"],
        )
        .dropDuplicates(["new_id", "dup_of"])
    )
    inter = F.size(F.array_intersect("sa", "sb.s"))
    j = inter.cast("double") / (F.size("sa") + F.size("sb.s") - inter)
    return (
        cand.join(
            corpus_sh.alias("sb"), F.col("dup_of") == F.col("sb.doc_id")
        )
        .withColumn("j", j)
        .filter(F.col("j") >= NGRAM_JACCARD_THRESHOLD)
        .select("new_id", "dup_of", r4(F.col("j")).alias("jaccard"))
    )
