"""Time-series resampling: bucket → gap-fill → forward-fill — the
"hypertable rollup" surface of the reference re-expressed relationally:
the dense grid is generated with `sequence`/`explode` per series (no
driver loop, no Python), gaps appear as left-join nulls, and the fill
is a running `last(ignorenulls)` window.

Scale shape: grid size = series × buckets regardless of event volume;
the heavy input collapses to per-bucket partials in one map-side
aggregation before anything joins. The only shuffles are on the
(tiny-cardinality) series key: the rollup groupBy, the grid join, and
the forward-fill window all share it.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import dsum, ffix, fixed, ofix, osum

#: bucket width in seconds (15 min — fine enough that real gaps exist
#: in the test corpus, so the fill paths are non-vacuous)
BUCKET_S = 900


@query(
    "resample_gapfill",
    oracle=f"""
    WITH b AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // {BUCKET_S} AS bucket,
               value
        FROM events
    ),
    rolled AS (
        SELECT event_type, bucket, count(*) AS n_raw,
               {osum('value')} AS sum_raw
        FROM b GROUP BY event_type, bucket
    ),
    spans AS (
        SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
        FROM rolled GROUP BY event_type
    ),
    grid AS (
        SELECT s.event_type, g.g AS bucket
        FROM spans s, LATERAL (SELECT unnest(generate_series(s.b0, s.b1))
                               AS g) g
    )
    SELECT grid.event_type, grid.bucket,
           CAST(coalesce(r.n_raw, 0) AS BIGINT) AS n,
           coalesce(r.sum_raw, 0.0) AS bucket_sum,
           last_value(r.sum_raw IGNORE NULLS) OVER (
               PARTITION BY grid.event_type ORDER BY grid.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ffill_sum
    FROM grid LEFT JOIN rolled r
      ON grid.event_type = r.event_type AND grid.bucket = r.bucket
    """,
)
def resample_gapfill(spark, sf_dir):
    """15-minute resample of event value per event_type with a dense
    bucket grid: empty buckets appear with n=0/sum=0 and a
    forward-filled last observed sum — the shape dashboards and
    downsampling jobs need (a naive groupBy silently drops empty
    buckets). Bucket ids are integer epoch-seconds // 900, immune to
    engine timestamp-truncation differences."""
    t = Tables(spark, sf_dir)
    b = t.events.select(
        "event_type",
        F.expr(f"(unix_micros(ts) div 1000000) div {BUCKET_S}").alias(
            "bucket"
        ),
        "value",
    )
    rolled = b.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n_raw"), dsum("value").alias("sum_raw")
    )
    spans = rolled.groupBy("event_type").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("b0", "b1")).alias("bucket"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(rolled, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n_raw", F.lit(0)).cast("bigint").alias("n"),
            F.coalesce("sum_raw", F.lit(0.0)).alias("bucket_sum"),
            F.last("sum_raw", ignorenulls=True).over(w).alias("ffill_sum"),
        )
    )


@query(
    "timeseries_downsample_m4",
    oracle=f"""
    WITH b AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // {BUCKET_S} AS bucket,
               value, ts, event_id,
               row_number() OVER (
                   PARTITION BY event_type,
                                CAST(floor(epoch(ts)) AS BIGINT) // {BUCKET_S}
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY event_type,
                                CAST(floor(epoch(ts)) AS BIGINT) // {BUCKET_S}
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, bucket,
           count(*) AS n,
           CAST(floor(min(value) * 10000 + 0.5) AS BIGINT)
               / 10000.0 AS v_min,
           CAST(floor(max(value) * 10000 + 0.5) AS BIGINT)
               / 10000.0 AS v_max,
           CAST(floor(max(CASE WHEN rn_a = 1 THEN value END) * 10000
                      + 0.5) AS BIGINT) / 10000.0 AS v_first,
           CAST(floor(max(CASE WHEN rn_d = 1 THEN value END) * 10000
                      + 0.5) AS BIGINT) / 10000.0 AS v_last
    FROM b GROUP BY event_type, bucket
    """,
)
def timeseries_downsample_m4(spark, sf_dir):
    """M4 downsampling (Jugel et al., VLDB 2014): per (series, time
    bucket) keep min/max/first/last — the error-free reduction for
    rendering a 100 TB series at pixel resolution (each bucket's four
    extremes are exactly what a line plot can show).

    One shuffle on (event_type, bucket) serves both window passes and
    the final aggregate (same partitioning key, Catalyst reuses the
    exchange); first/last resolve by (ts, event_id) — a total order,
    so the result is engine-exact."""
    t = Tables(spark, sf_dir)
    bucket = F.expr(f"(unix_micros(ts) div 1000000) div {BUCKET_S}")
    base = t.events.select(
        "event_type", bucket.alias("bucket"), "value", "ts", "event_id"
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    marked = base.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return marked.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        (fixed(F.min("value")) / 10000.0).alias("v_min"),
        (fixed(F.max("value")) / 10000.0).alias("v_max"),
        (
            fixed(F.max(F.when(F.col("rn_a") == 1, F.col("value")))) / 10000.0
        ).alias("v_first"),
        (
            fixed(F.max(F.when(F.col("rn_d") == 1, F.col("value")))) / 10000.0
        ).alias("v_last"),
    )


@query(
    "rollup_time_hierarchy",
    oracle=f"""
    SELECT event_type,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           count(*) AS n, {osum('value')} AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, d, h)
    """,
)
def rollup_time_hierarchy(spark, sf_dir):
    """Hypertable-style continuous-aggregate hierarchy: one pass
    produces the (type, day, hour) leaf rollup AND its (type, day),
    (type), and grand-total ancestors — the multi-granularity
    materialization a time-series store keeps per hypertable.

    Catalyst compiles ROLLUP to a single Expand + hash aggregate
    (rows × 4 grouping sets, map-side combined): one shuffle total,
    no per-granularity re-scan. At 100 TB prefer this over N separate
    GROUP BYs whenever all granularities are needed — the input is
    read once, and partial aggregation shrinks each grouping set
    before the exchange."""
    t = Tables(spark, sf_dir)
    e = t.events.select(
        "event_type",
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
        "value",
    )
    return e.rollup("event_type", "d", "h").agg(
        F.count("*").alias("n"), dsum("value").alias("sum_value")
    )


#: truncated-EWMA tap count and the dyadic decay (α = 1/2): every
#: weight 0.5^k is a power of two, so weight·value is EXACT in IEEE
#: doubles (exponent shift only) — the whole filter is engine-exact
#: without fixed-point intermediates.
_EWMA_TAPS = 8


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce({'value' if k == 0 else f'lag(value, {k}) OVER w'}"
        f" * {0.5 ** k!r}, 0.0)"
        for k in range(_EWMA_TAPS)
    )
    den = " + ".join(
        "(CASE WHEN "
        + ("value" if k == 0 else f"lag(value, {k}) OVER w")
        + f" IS NOT NULL THEN {0.5 ** k!r} ELSE 0.0 END)"
        for k in range(_EWMA_TAPS)
    )
    return f"""
    SELECT event_id, user_id, value,
           {ofix(f'({num}) / ({den})')} AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@query("ts_ewma_halflife", oracle=_ewma_oracle())
def ts_ewma_halflife(spark, sf_dir):
    """Exponentially-weighted moving average per user (half-life = 1
    step, 8-tap truncation): y_t = Σ_k 0.5^k·x_{t-k} / Σ_k 0.5^k over
    the taps present at the partition head.

    Engine-exactness: α=1/2 makes every weight a power of two, so each
    product is an exact float op; numerator and denominator are short
    fixed-order chains of exact terms, and IEEE +,/ are deterministic —
    both engines produce bit-identical doubles, floored to 4 dp for
    output. The truncation (weights beyond 8 taps < 0.8 %) is what
    makes EWMA window-expressible at all: the untruncated recurrence is
    a sequential scan per key, unparallelizable; 8 lags over one
    (user_id) sort is a single window pass, linear and shuffle-free
    beyond the one partition-by exchange.
    """
    from functools import reduce
    from operator import add

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    taps = [
        F.col("value") if k == 0 else F.lag("value", k).over(w)
        for k in range(_EWMA_TAPS)
    ]
    num = reduce(
        add,
        [
            F.coalesce(t_ * F.lit(0.5**k), F.lit(0.0))
            for k, t_ in enumerate(taps)
        ],
    )
    den = reduce(
        add,
        [
            F.when(t_.isNotNull(), F.lit(0.5**k)).otherwise(F.lit(0.0))
            for k, t_ in enumerate(taps)
        ],
    )
    # try_divide: a frame of ALL-NULL taps has den 0 — EWMA undefined,
    # NULL on both engines (DuckDB x/0 is NULL; r10 stress corpus)
    return t.events.select(
        "event_id", "user_id", "value", ffix(F.try_divide(num, den)).alias("ewma")
    )


_FIX = "CAST(floor(value * 10000 + 0.5) AS BIGINT)"


@query(
    "ts_rolling_corr",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, ts,
               {_FIX} AS x,
               lag({_FIX}) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS y
        FROM events
    ),
    q AS (
        SELECT event_id, user_id,
               count(*) OVER w AS n,
               sum(x) OVER w AS sx, sum(y) OVER w AS sy,
               sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
               sum(x * y) OVER w AS sxy
        FROM p WHERE y IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, n AS n_pairs,
           CASE WHEN n >= 5 AND (n * sxx - sx * sx) > 0
                         AND (n * syy - sy * sy) > 0
                THEN {ofix('CAST(n * sxy - sx * sy AS DOUBLE)'
                           ' / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))'
                           ' * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))')}
           END AS roll_corr
    FROM q
    """,
)
def ts_rolling_corr(spark, sf_dir):
    """Rolling lag-1 autocorrelation (20-pair trailing frame) per user:
    Pearson r of (value, previous value) — the mean-reversion /
    momentum signal of a metrics store, windowed.

    All five sufficient statistics (Σx Σy Σx² Σy² Σxy) are fixed-point
    BIGINT window sums — exact at any merge order — and the covariance
    numerator n·Σxy − Σx·Σy and variance terms stay in integer
    arithmetic until one final double divide/sqrt (IEEE-exact, same op
    sequence both engines). Headroom: |x_fp| ≤ 5·10⁶ (value ≤ 490·10⁴)
    → n·Σx² ≤ 20²·2.5e13 ≈ 1e16 « 2^63. Scale shape: one window sort
    on user_id; frames never materialize — constant state per row.
    """
    t = Tables(spark, sf_dir)
    w0 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = t.events.select(
        "event_id",
        "user_id",
        "ts",
        fixed("value").alias("x"),
        F.lag(fixed("value")).over(w0).alias("y"),
    ).filter(F.col("y").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    x, y = F.col("x"), F.col("y")
    q = p.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n"),
        F.sum(x).over(w).alias("sx"),
        F.sum(y).over(w).alias("sy"),
        F.sum(x * x).over(w).alias("sxx"),
        F.sum(y * y).over(w).alias("syy"),
        F.sum(x * y).over(w).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    dx = n * F.col("sxx") - sx * sx
    dy = n * F.col("syy") - sy * sy
    num = (n * F.col("sxy") - sx * sy).cast("double")
    r = num / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double")))
    return q.select(
        "event_id",
        "user_id",
        n.alias("n_pairs"),
        F.when((n >= 5) & (dx > 0) & (dy > 0), ffix(r)).alias("roll_corr"),
    )


@query(
    "ts_anomaly_zscore",
    oracle=f"""
    WITH q AS (
        SELECT event_id, user_id, value,
               {_FIX} AS x,
               count({_FIX}) OVER w AS n,
               sum({_FIX}) OVER w AS s,
               sum({_FIX} * {_FIX}) OVER w AS ss
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value, n AS n_hist,
           {ofix('CAST(n * x - s AS DOUBLE)'
                 ' / sqrt(CAST(n * ss - s * s AS DOUBLE) * n / (n - 1))')}
               AS zscore
    FROM q
    WHERE n >= 12 AND (n * ss - s * s) > 0
      AND abs(CAST(n * x - s AS DOUBLE)
              / sqrt(CAST(n * ss - s * s AS DOUBLE) * n / (n - 1))) > 2.5
    """,
)
def ts_anomaly_zscore(spark, sf_dir):
    """Trailing-window anomaly detection: flag events whose value sits
    > 2.5 sample standard deviations from the mean of the user's
    previous ≤20 events (current row EXCLUDED from its own baseline —
    the leave-one-out shape real monitors need, ≥12 history rows).

    z reduces to integer arithmetic: with fixed-point X, Σx, Σx² the
    scale cancels — z = (n·X − Σx) / √((n·Σx² − (Σx)²)·n/(n−1)) — so
    both engines divide the SAME integers and apply the same IEEE
    sqrt/divide. Scale: one window pass over the user_id sort, O(1)
    state per row; the filter is post-window, so no second scan.
    """
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    xf = fixed("value")
    q = t.events.select(
        "event_id",
        "user_id",
        "value",
        xf.alias("x"),
        F.count(xf).over(w).alias("n"),
        F.sum(xf).over(w).alias("s"),
        F.sum(xf * xf).over(w).alias("ss"),
    )
    n, s, ss, x = F.col("n"), F.col("s"), F.col("ss"), F.col("x")
    p = n * x - s
    qv = n * ss - s * s
    z = p.cast("double") / F.sqrt(qv.cast("double") * n / (n - 1))
    return (
        q.filter((n >= 12) & (qv > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "user_id",
            "value",
            n.alias("n_hist"),
            ffix(z).alias("zscore"),
        )
    )


@query(
    "win_max_drawdown",
    oracle=f"""
    WITH r AS (
        SELECT user_id, ts, event_id,
               sum({_FIX}) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS equity_fp
        FROM events
    ),
    d AS (
        SELECT user_id, equity_fp,
               max(equity_fp) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS peak_fp
        FROM r
    )
    SELECT user_id,
           CAST(max(peak_fp - equity_fp) AS BIGINT) AS max_drawdown_fp,
           CAST(max(peak_fp) AS BIGINT) AS peak_fp
    FROM d GROUP BY user_id
    """,
)
def win_max_drawdown(spark, sf_dir):
    """Maximum drawdown per user: treating the running fixed-point sum
    of event values as an equity curve, the largest peak-to-trough
    drop (max over time of running-max − current) — the risk metric
    every portfolio/telemetry dashboard computes, and the canonical
    composition of two prefix scans.

    Both the running sum and the running max are single-pass window
    folds over one (user_id) sort; the final aggregate reuses the
    same partitioning, so the whole metric costs one shuffle. All
    arithmetic is BIGINT on fixed-point values — no float provenance
    at all."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = t.events.select(
        "user_id",
        F.sum(fixed("value")).over(w).alias("equity_fp"),
        F.col("ts"),
        F.col("event_id"),
    )
    d = r.select(
        "user_id",
        "equity_fp",
        F.max("equity_fp").over(w).alias("peak_fp"),
    )
    return d.groupBy("user_id").agg(
        F.max(F.col("peak_fp") - F.col("equity_fp"))
        .cast("bigint")
        .alias("max_drawdown_fp"),
        F.max("peak_fp").cast("bigint").alias("peak_fp"),
    )


@query(
    "ts_seasonal_baseline",
    oracle=f"""
    WITH h AS (
        SELECT event_type, CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
               {_FIX} AS v_fp
        FROM events
    ),
    base AS (
        SELECT event_type, hr, count(*) AS n,
               CAST(sum(v_fp) AS BIGINT) AS s_fp
        FROM h GROUP BY event_type, hr
    ),
    dev AS (
        SELECT h.event_type, h.hr,
               CAST(h.v_fp * base.n - base.s_fp AS BIGINT) AS dev_n_fp,
               base.n
        FROM h JOIN base ON h.event_type = base.event_type
                        AND h.hr = base.hr
    )
    SELECT event_type, hr, n,
           {ofix('CAST(max(abs(dev_n_fp)) AS DOUBLE) / (n * 10000)')}
               AS max_abs_dev,
           {ofix('CAST(sum(abs(dev_n_fp)) AS DOUBLE) / (CAST(n AS DOUBLE)'
                 ' * n * 10000)')} AS mean_abs_dev
    FROM dev GROUP BY event_type, hr, n
    """,
)
def ts_seasonal_baseline(spark, sf_dir):
    """Hour-of-day seasonal baseline removal: each event's deviation
    from its (event_type, hour) mean, rolled up to per-cell max and
    mean absolute deviation — the de-seasonalization step before
    thresholding time-series alerts (a 9 a.m. spike is only a spike
    relative to 9 a.m. behavior).

    Integer trick: deviation·n = v_fp·n − Σv_fp avoids dividing by n
    per row — all deviations stay exact BIGINT until the final two
    divisions per (type, hour) cell. The baseline is a 24×|types|
    aggregate that BROADCASTS back onto the stream; both aggregates
    map-side combine, so the event volume crosses the wire once."""
    t = Tables(spark, sf_dir)
    h = t.events.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hr"),
        fixed("value").alias("v_fp"),
    )
    base = h.groupBy("event_type", "hr").agg(
        F.count("*").alias("n"),
        F.sum("v_fp").cast("bigint").alias("s_fp"),
    )
    dev = h.join(F.broadcast(base), ["event_type", "hr"]).select(
        "event_type",
        "hr",
        "n",
        (F.col("v_fp") * F.col("n") - F.col("s_fp"))
        .cast("bigint")
        .alias("dev_n_fp"),
    )
    return dev.groupBy("event_type", "hr", "n").agg(
        ffix(
            F.max(F.abs("dev_n_fp")).cast("double") / (F.col("n") * 10000)
        ).alias("max_abs_dev"),
        ffix(
            F.sum(F.abs("dev_n_fp")).cast("double")
            / (F.col("n").cast("double") * F.col("n") * 10000)
        ).alias("mean_abs_dev"),
    )


@query(
    "ts_ohlc_bars",
    oracle=f"""
    WITH k AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               value,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 16, '0')
                 || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
        FROM events
        WHERE value IS NOT NULL
    )
    SELECT event_type, day,
           {ofix('arg_min(value, ord_key)')} AS open,
           {ofix('max(value)')} AS high,
           {ofix('min(value)')} AS low,
           {ofix('arg_max(value, ord_key)')} AS close,
           count(*) AS n_ticks,
           {osum('value')} AS volume
    FROM k GROUP BY event_type, day
    """,
)
def ts_ohlc_bars(spark, sf_dir):
    """OHLC candlestick rollup: per (series, day) the first / highest /
    lowest / last observed value plus tick count and summed volume —
    the canonical downsample every market-data or metrics store ships.

    Open/close are arg_min/arg_max over a composite string key
    (zero-padded epoch-micros ++ event_id) because neither engine's
    arg_min takes a tuple key and ties on raw timestamps would make
    the answer nondeterministic (same discipline as agg_argminmax).
    One partial+final aggregate — no window: at 100 TB each map task
    pre-folds its slice to one candle per (series, day) before the
    shuffle, so reducers see |series|·|days| rows. (Physically a
    SortAggregate: min_by/max_by declare order-sensitive buffers, so
    Spark sorts each partition by the grouping key rather than
    hashing — still map-side combined, single Exchange; asserted in
    tests/test_plans.py.)"""
    t = Tables(spark, sf_dir)
    ord_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 16, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    # a tick without a value is not a tick: NULL values would make
    # min_by/arg_min pick different rows per engine (Spark's min_by
    # returns the NULL, DuckDB's arg_min skips it — r10 stress corpus)
    return (
        t.events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("ts").cast("date").cast("string").alias("day"),
            "value",
            ord_key.alias("ord_key"),
        )
        .groupBy("event_type", "day")
        .agg(
            ffix(F.min_by("value", F.col("ord_key"))).alias("open"),
            ffix(F.max("value")).alias("high"),
            ffix(F.min("value")).alias("low"),
            ffix(F.max_by("value", F.col("ord_key"))).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            dsum("value").alias("volume"),
        )
    )


@query(
    "ts_vwap_daily",
    oracle=f"""
    SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS day,
           CAST({osum('l_quantity')} AS BIGINT) AS total_qty,
           {osum('l_extendedprice * l_quantity')} AS notional,
           {ofix(f"({osum('l_extendedprice * l_quantity')}) / ({osum('l_quantity')})")}
               AS vwap
    FROM lineitem GROUP BY day
    """,
)
def ts_vwap_daily(spark, sf_dir):
    """Volume-weighted average price per ship day:
    VWAP = Σ(price·qty) / Σ(qty) — the denominator-weighted mean that
    a plain avg() gets wrong, and the standard execution-quality
    benchmark for any trade/sales tape.

    Both sums are fixed-point longs (order-insensitive, engine-exact);
    the per-row price·qty product is one IEEE multiply, identical in
    both engines, BEFORE fixing — so the quotient divides two exact
    doubles and ffix presents it. Single map-side-combined aggregate
    keyed by day; no shuffle carries raw line items, only per-day
    partials."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select(
            F.col("l_shipdate").cast("date").cast("string").alias("day"),
            "l_quantity",
            "l_extendedprice",
        )
        .groupBy("day")
        .agg(
            dsum("l_quantity").cast("bigint").alias("total_qty"),
            dsum(F.col("l_extendedprice") * F.col("l_quantity")).alias(
                "notional"
            ),
            ffix(
                dsum(F.col("l_extendedprice") * F.col("l_quantity"))
                / dsum("l_quantity")
            ).alias("vwap"),
        )
    )


@query(
    "ts_dow_hour_profile",
    oracle=f"""
    SELECT dayofweek(ts) AS dow, hour(ts) AS hr,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           {ofix(f"({osum('value')}) / count(*)")} AS avg_value
    FROM events GROUP BY dow, hr
    """,
)
def ts_dow_hour_profile(spark, sf_dir):
    """Seasonality fingerprint: event volume, distinct users, and mean
    value in every (day-of-week × hour-of-day) cell — the 7×24 heatmap
    behind staffing/capacity dashboards and the seasonal-naive
    forecaster's lookup table.

    Day-of-week convention bridged explicitly: Spark's dayofweek() is
    1–7 Sunday=1, DuckDB's is 0–6 Sunday=0, so Spark emits
    dayofweek−1. The mean divides a fixed-point exact sum by an exact
    count (one IEEE divide, identical both engines). Fixed 168-cell
    output regardless of input scale; count(DISTINCT) partial-
    aggregates per cell."""
    t = Tables(spark, sf_dir)
    return (
        t.events.select(
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hr"),
            "user_id",
            "value",
        )
        .groupBy("dow", "hr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            ffix(dsum("value") / F.count(F.lit(1))).alias("avg_value"),
        )
    )


@query(
    "ts_interarrival_stats",
    oracle="""
    WITH s AS (
        SELECT event_type,
               (epoch_us(CAST(ts AS TIMESTAMP))
                - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                    (PARTITION BY event_type
                     ORDER BY ts, event_id)) // 1000000 AS gap_s
        FROM events
    )
    SELECT event_type, count(*) AS n_gaps,
           min(gap_s) AS min_gap_s,
           round(quantile_cont(gap_s, 0.5), 4) AS median_gap_s,
           round(quantile_cont(gap_s, 0.9), 4) AS p90_gap_s,
           max(gap_s) AS max_gap_s
    FROM s WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
)
def ts_interarrival_stats(spark, sf_dir):
    """Inter-arrival time distribution per stream: the gap between
    consecutive events in integer seconds, summarized as exact
    min/median/p90/max — the arrival-process fingerprint capacity
    planning and anomaly thresholds (and the resample bucket width)
    are derived from.

    Gaps are integer epoch-micro differences floor-divided BEFORE the
    percentile (the agg_percentile_exact-proven cross-engine
    interpolation pattern on integer inputs). One window pass
    partitioned by the low-cardinality stream key, then a per-stream
    fold; at 100 TB the window partitions by (stream, coarse time
    bucket) instead — noted, since a single celebrity stream must not
    serialize through one task."""
    t = Tables(spark, sf_dir)
    s = t.events.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) OVER "
            "(PARTITION BY event_type ORDER BY ts, event_id)) div 1000000"
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    from ._util import r4 as _r4

    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        _r4(F.percentile("gap_s", 0.5)).alias("median_gap_s"),
        _r4(F.percentile("gap_s", 0.9)).alias("p90_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


CUSUM_TOPK = 5


@query(
    "ts_cusum_changepoints",
    oracle=f"""
    WITH b AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // {BUCKET_S} AS bucket,
               count(*) AS x
        FROM events GROUP BY 1, 2
    ),
    st AS (
        SELECT event_type, count(*) AS nb, sum(x) AS tot
        FROM b GROUP BY 1
    ),
    r AS (
        SELECT b.event_type, bucket, x,
               sum(nb * x - tot) OVER (
                   PARTITION BY b.event_type ORDER BY bucket
               ) AS run
        FROM b JOIN st ON b.event_type = st.event_type
    ),
    s AS (
        SELECT event_type, bucket, x,
               run - least(0, min(run) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )) AS cusum
        FROM r
    ),
    k AS (
        SELECT event_type, bucket, x, cusum,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY cusum DESC, bucket
               ) AS rn
        FROM s
    )
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(x AS BIGINT) AS n_events, CAST(cusum AS BIGINT) AS cusum
    FROM k WHERE rn <= {CUSUM_TOPK}
    """,
)
def ts_cusum_changepoints(spark, sf_dir):
    """CUSUM change-point detection per event_type: the top-{{K}}
    upward excursions of the one-sided CUSUM statistic over 15-minute
    event-count buckets — the classic sequential detector for "did
    the event rate shift upward, and when did the burst start
    accumulating" (Page 1954's recursion).

    The recursion S_t = max(0, S_(t-1) + d_t) is NOT a window sum,
    but its closed form IS: S_t = run_t − min(0, min_(j≤t) run_j)
    over the deviation prefix sums — so the whole detector is two
    stacked window passes, no UDF, no iteration. Deviations stay in
    EXACT integers (d_t = nb·x_t − tot avoids the rational mean:
    both engines fold identical BIGINTs), so the statistic
    hash-checks. Emitting top-K by the statistic (unique buckets as
    the tiebreak) instead of a tuned threshold keeps the exhibit
    non-vacuous on any corpus.

    Scale shape: one groupBy to buckets, a broadcast-size per-type
    stats join, two windows over the bucket sort — O(1) state per
    row, the same single-sort cost class as the running-sum ops."""
    t = Tables(spark, sf_dir)
    b = (
        t.events.select(
            "event_type",
            F.expr(f"(unix_micros(ts) div 1000000) div {BUCKET_S}").alias(
                "bucket"
            ),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    st = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("x").alias("tot")
    )
    wrun = Window.partitionBy("event_type").orderBy("bucket")
    r = b.join(F.broadcast(st), "event_type").withColumn(
        "run",
        F.sum(F.col("nb") * F.col("x") - F.col("tot")).over(wrun),
    )
    wmin = wrun.rowsBetween(Window.unboundedPreceding, 0)
    s = r.withColumn(
        "cusum",
        F.col("run") - F.least(F.lit(0), F.min("run").over(wmin)),
    )
    k = s.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("cusum").desc(), F.col("bucket")
            )
        ),
    )
    return k.filter(F.col("rn") <= CUSUM_TOPK).select(
        "event_type",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("x").cast("bigint").alias("n_events"),
        F.col("cusum").cast("bigint").alias("cusum"),
    )
