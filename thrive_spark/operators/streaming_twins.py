"""§2.9 Streaming operators — batch twins.

Each operator here is the deterministic batch formulation the driver
can oracle-check; ``thrive_spark.streaming`` holds the true Structured
Streaming forms (same logic over readStream, asserted equal to these
twins in tests/test_streaming.py — the streaming oracle).

Watermark/arrival semantics: "arrival order" is event_id (the
generation order), so late-data behavior is reproducible in SQL.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import dsum_over


@query(
    "stream_tumbling_count",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type, count(*) AS n
    FROM events GROUP BY window_start, event_type
    """,
)
def stream_tumbling_count(spark, sf_dir):
    """1-hour tumbling window counts per event type (batch twin of the streaming op)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@query(
    "stream_sliding_avg",
    oracle="""
    WITH e AS (
        SELECT CAST(floor(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
                          / 900000000) AS BIGINT) * 900000000 AS b,
               value
        FROM events
    ),
    w AS (
        SELECT make_timestamp(b - CAST(k AS BIGINT) * 900000000) AS window_start,
               value
        FROM e, (SELECT unnest([0, 1, 2, 3]) AS k)
    )
    SELECT window_start, count(*) AS n,
           ((2 * sum(CAST(round(value * 1000000, 0) AS BIGINT)) + 100 * count(*))
            // (200 * count(*))) / 10000.0 AS avg_value
    FROM w GROUP BY window_start
    """,
)
def stream_sliding_avg(spark, sf_dir):
    """1-hour window sliding every 15 min: each event lands in 4
    windows. The oracle expands the 4 offsets explicitly.

    The rounded average is computed in exact integer arithmetic
    (micro-unit fixed point, integer half-up division): sums divided
    by small power-of-two counts land *exactly* on round-half
    boundaries often enough that double rounding splits the engines
    (observed twice at sf0.01). Values are non-negative, so the
    (2a + b) div 2b half-up formula applies directly."""
    t = Tables(spark, sf_dir)
    v6 = F.round(F.col("value") * 1000000, 0).cast("long")
    return (
        t.events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum(v6).alias("s6"))
        .select(
            F.col("w.start").alias("window_start"),
            "n",
            (F.expr("(2 * s6 + 100 * n) div (200 * n)") / 10000.0).alias(
                "avg_value"
            ),
        )
    )


@query(
    "stream_session_window",
    oracle="""
    WITH o AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP))
                            - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                            >= 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_window(spark, sf_dir):
    """Per-user sessions with a 30-minute inactivity gap, via the
    native session_window (works in batch too; the streaming form is
    identical). Oracle is the classic lag/gap-flag/cumsum rewrite."""
    t = Tables(spark, sf_dir)
    g = t.events.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )
    return g.select("user_id", "session_start", "n_events", "duration_us")


@query(
    "stream_watermark_late",
    oracle="""
    WITH m AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
               max(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS wm
        FROM events
    )
    SELECT event_type,
           count(*) FILTER (WHERE tus >= wm - 600000000) AS n_kept,
           count(*) FILTER (WHERE tus <  wm - 600000000) AS n_dropped
    FROM m GROUP BY event_type
    """,
)
def stream_watermark_late(spark, sf_dir):
    """10-minute watermark: an event is late if its time is >10 min
    behind the max event time seen so far in arrival order (event_id).
    Batch twin of withWatermark drop semantics. The global
    arrival-order window is twin-only — the streaming form keeps the
    watermark in engine state, no global window."""
    t = Tables(spark, sf_dir)
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    tus = F.unix_micros("ts")
    d = t.events.select(
        "event_type", tus.alias("tus"), F.max(tus).over(w).alias("wm")
    )
    late = F.col("tus") < F.col("wm") - 600000000
    return d.groupBy("event_type").agg(
        F.count(F.when(~late, 1)).alias("n_kept"),
        F.count(F.when(late, 1)).alias("n_dropped"),
    )


@query(
    "stream_dedup_watermark",
    oracle="""
    SELECT user_id, event_type,
           date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_ts,
           min(event_id) AS keep_event_id, count(*) AS n_dups
    FROM events GROUP BY user_id, event_type, minute_ts
    """,
)
def stream_dedup_watermark(spark, sf_dir):
    """Dedup on (user, type, minute) keeping the first arrival —
    the deterministic batch twin of dropDuplicatesWithinWatermark
    (which keeps an arbitrary first-seen row; min(event_id) pins it).
    """
    t = Tables(spark, sf_dir)
    return t.events.groupBy(
        "user_id",
        "event_type",
        F.date_trunc("minute", "ts").alias("minute_ts"),
    ).agg(
        F.min("event_id").alias("keep_event_id"), F.count("*").alias("n_dups")
    )


@query(
    "stream_stateful_counter",
    oracle="""
    SELECT event_id, user_id,
           sum(CAST(floor((CASE WHEN event_type = 'purchase' THEN value
                                ELSE 0.0 END) * 10000 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) / 10000.0
               AS cum_purchase
    FROM events
    """,
)
def stream_stateful_counter(spark, sf_dir):
    """Running per-user purchase total — the batch twin of the
    transformWithStateInPandas stateful operator (streaming/stateful.py).
    """
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    purchase = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
        0.0
    )
    return t.events.select(
        "event_id",
        "user_id",
        dsum_over(purchase, w).alias("cum_purchase"),
    )


@query(
    "stream_tumbling_topk",
    oracle="""
    WITH c AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type, count(*) AS n
        FROM events GROUP BY window_start, event_type
    )
    SELECT window_start, event_type, n, rk FROM (
        SELECT window_start, event_type, n,
               CAST(row_number() OVER (PARTITION BY window_start
                    ORDER BY n DESC, event_type) AS BIGINT) AS rk
        FROM c
    ) WHERE rk <= 3
    """,
)
def stream_tumbling_topk(spark, sf_dir):
    """Top-3 event types per tumbling hour — the 'trending now' query.
    Batch twin is a windowed count + per-window rank; the streaming
    form keeps the same tumbling aggregate under a watermark and ranks
    per finalized window downstream (rank-over-aggregate is an
    output-mode-complete op, so it runs on the closed windows only).
    One shuffle for the count (map-side partial), one window over
    tiny (window × 5 types) rows; unique (n desc, event_type)
    tiebreak keeps both engines' top-3 identical."""
    t = Tables(spark, sf_dir)
    c = (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    wspec = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        c.withColumn("rk", F.row_number().over(wspec).cast("bigint"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "stream_join_static",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           n_name, count(*) AS n_events,
           sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) / 10000.0
             AS sum_value
    FROM events JOIN nation ON CAST(user_id % 25 AS INT) = n_nationkey
    GROUP BY window_start, n_name
    """,
)
def stream_join_static(spark, sf_dir):
    """Batch twin of the stream–static enrichment join
    (streaming/ops.py::enrich_with_static_dim): events keyed to a
    broadcast nation dim, then hourly windowed count + fixed-point
    sum per nation. The true-streaming form is asserted equal in
    tests/test_streaming.py::test_static_join_equals_twin."""
    t = Tables(spark, sf_dir)
    from ..streaming.ops import enrich_with_static_dim

    return enrich_with_static_dim(t.events, t.nation)


@query(
    "stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
           epoch_us(CAST(p.ts AS TIMESTAMP))
               - epoch_us(CAST(v.ts AS TIMESTAMP)) AS lag_us
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts
     AND epoch_us(CAST(p.ts AS TIMESTAMP))
         <= epoch_us(CAST(v.ts AS TIMESTAMP)) + 3600000000
    """,
)
def stream_stream_join(spark, sf_dir):
    """Batch twin of the stream–stream interval join
    (streaming/ops.py::interval_join_view_purchase): view × purchase
    pairs per user with the purchase inside the view's following
    hour. The time bound is compared in integer microseconds, so both
    engines (and the streaming form) cut identical pair sets; the
    true-streaming form — watermarks bounding join state — is
    asserted equal in tests/test_streaming.py.

    Scale shape: equi key (user_id) + range bound compiles to one
    user_id shuffle with the range as a post-join filter; per-user
    fan-out is |views|·|purchases| within the hour, the same bound
    the streaming state store carries."""
    t = Tables(spark, sf_dir)
    from ..streaming.ops import interval_join_view_purchase

    return interval_join_view_purchase(t.events)


@query(
    "stream_stream_join_outer",
    oracle="""
    WITH v AS (
        SELECT event_id AS view_id, user_id, epoch_us(CAST(ts AS TIMESTAMP))
                   AS v_us
        FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
        FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
        SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) - 7200000000 AS w
        FROM events
    )
    SELECT v.view_id, v.user_id, p.purchase_id,
           p.p_us - v.v_us AS lag_us
    FROM v LEFT JOIN p
      ON v.user_id = p.user_id
     AND p.p_us >= v.v_us AND p.p_us <= v.v_us + 3600000000
    , wm
    WHERE p.purchase_id IS NOT NULL
       OR v.v_us + 3600000000 < wm.w
    """,
)
def stream_stream_join_outer(spark, sf_dir):
    """Batch twin of the LEFT OUTER stream–stream interval join:
    matched view→purchase pairs PLUS null-extended rows for views
    whose match window closed under the final watermark (max event
    time − 2 h). The watermark cutoff is part of the SEMANTICS, not an
    artifact: a view near the stream tail is still 'pending' — the
    engine cannot yet prove no purchase will arrive — so neither the
    stream nor this twin emits it unmatched. Both sides of that rule
    are integer-microsecond arithmetic, so the emitted set is
    engine-exact; state-size reasoning is identical to the inner
    variant (streaming/ops.py)."""
    t = Tables(spark, sf_dir)
    from ..streaming.ops import interval_join_view_purchase_outer

    joined = interval_join_view_purchase_outer(t.events)
    wm = t.events.agg(
        (F.max(F.unix_micros("ts")) - 7200 * 1_000_000).alias("w")
    )
    # re-derive each view's timestamp to apply the watermark cutoff on
    # the unmatched branch (the joined output carries only lag_us)
    views = t.events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("v_us"),
    )
    out = (
        joined.join(views, "view_id")
        .crossJoin(F.broadcast(wm))
        .filter(
            F.col("purchase_id").isNotNull()
            | (F.col("v_us") + 3600 * 1_000_000 < F.col("w"))
        )
        .select("view_id", "user_id", "purchase_id", "lag_us")
    )
    return out
