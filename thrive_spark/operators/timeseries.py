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
from ._util import dsum, fixed, osum

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
