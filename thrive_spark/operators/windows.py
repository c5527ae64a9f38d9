"""§2.5 Window function operators.

Scale notes: every window here partitions by a real key (customer,
user, status) — one shuffle, then sorted evaluation within partitions;
no global single-partition windows except `win_ntile_percentile`,
which is documented as driver-bounded (global quantile assignment at
100 TB should use approx quantiles / range partitioning instead — see
SCALE.md). Money-scale windowed sums use fixed-point long summation
(_util.dsum_over): DuckDB evaluates sliding frames with segment trees
(different association order than Spark's running evaluation), so
float sums would drift.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import dsum_over, fixed, osum_over, r4

_WSUM = osum_over("o_totalprice", "{w}")


@query(
    "win_row_number_topn",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def win_row_number_topn(spark, sf_dir):
    """row_number top-3 orders per customer (WindowGroupLimit exhibit)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t.orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice, -4) AS price_bucket,
           rank() OVER (PARTITION BY o_orderstatus ORDER BY round(o_totalprice, -4) DESC) AS rnk,
           dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY round(o_totalprice, -4) DESC) AS drnk
    FROM orders
    """,
)
def win_rank_dense_rank(spark, sf_dir):
    """rank vs dense_rank over deliberately-coarsened prices (ties)."""
    t = Tables(spark, sf_dir)
    bucket = F.round(F.col("o_totalprice"), -4)
    w = Window.partitionBy("o_orderstatus").orderBy(bucket.desc())
    return t.orders.select(
        "o_orderkey",
        "o_orderstatus",
        bucket.alias("price_bucket"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "win_ntile_percentile",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cum_dist
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice NULLS FIRST, o_orderkey)
    """,
)
def win_ntile_percentile(spark, sf_dir):
    """Global ntile/percent_rank/cume_dist WITHOUT a single-partition
    window: range-partition on the (unique) total order, rank locally
    per range, then add broadcast per-range offsets — the classic
    distributed two-pass global sort-rank. From the global rank r and
    total n, all three functions are closed-form (the order is unique,
    so cume_dist = r/n and SQL's ntile bucketing is
    rem buckets of size q+1 then k-rem of size q, q = n div k).
    Every exchange is linear (range or pid-hash); the only
    SinglePartition exchange touches the P-row offset table."""
    t = Tables(spark, sf_dir)
    k = 4
    parts = (
        t.orders.select("o_orderkey", "o_totalprice")
        .repartitionByRange("o_totalprice", "o_orderkey")
        .withColumn("pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    local = parts.withColumn("lr", F.row_number().over(w_local))
    # P rows: cumulative counts of the ranges below each pid + total n
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("pid").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        parts.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "pid",
            F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
            F.sum("cnt").over(w_tot).alias("n"),
        )
    )
    r = F.col("off") + F.col("lr")
    n = F.col("n")

    def idiv(a, b):  # exact bigint floor-div (a,b >= 0): no FP rounding
        return ((a - a % b) / b).cast("bigint")

    q, rem = idiv(n, F.lit(k)), n % k
    cut = rem * (q + 1)  # rows covered by the size-(q+1) buckets
    tile = (
        F.when(n < k, r)  # degenerate: fewer rows than tiles
        .when(r <= cut, idiv(r - 1, q + 1) + 1)
        .otherwise(rem + idiv(r - 1 - cut, q) + 1)
    )
    return local.join(F.broadcast(offsets), "pid").select(
        "o_orderkey",
        tile.cast("bigint").alias("quartile"),
        r4(F.when(n > 1, (r - 1) / (n - 1)).otherwise(0.0)).alias("pct_rank"),
        r4(r / n).alias("cum_dist"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark, sf_dir):
    """lag/lead over per-user event-time ordering: gap micros + next event type."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return t.events.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "win_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {_WSUM.format(w='w')} AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_running_sum(spark, sf_dir):
    """Running fixed-point cumulative sum of order totals per customer."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.orders.select(
        "o_custkey", "o_orderkey", dsum_over("o_totalprice", w).alias("running_total")
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
               AS mov_avg_7
    FROM events
    """,
)
def win_moving_avg(spark, sf_dir):
    """7-row trailing moving average of event values per user."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return t.events.select(
        "event_id", "user_id", r4(F.avg("value").over(w)).alias("mov_avg_7")
    )


@query(
    "win_range_frame",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           {_WSUM.format(w='w')} AS near_price_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)
    """,
)
def win_range_frame(spark, sf_dir):
    """Value-range frame (±5000 around each row's o_totalprice) WITHOUT
    the naive window formulation: ``PARTITION BY o_orderstatus`` has 3
    distinct values, so a window plan sorts each third of the table on
    a single task — a scale-killer at 100 TB (flagged r4).

    Scale rewrite — band-bucketed cogroup, same family as
    ``join_theta_band`` (joins.py): bucket prices by the frame width W;
    a row's [x−W, x+W] frame only ever touches buckets b−1, b, b+1.
    Contributors replicate into the 3 query buckets they can serve
    (one explode, 3× row count), both sides shuffle once on
    (status, bucket) — hundreds of independent groups instead of 3 —
    and each group computes exact per-row frame sums in one Arrow
    batch via sorted prefix-sums + binary search (O(n log n) local,
    no pairwise blow-up). Fixed-point int64 prefix sums reproduce the
    oracle's ``sum(floor(x*1e4+0.5))/1e4`` exactly in any order;
    searchsorted left/right gives the frame's inclusive bounds, and
    bound arithmetic (x±5000) is the same IEEE double op in numpy,
    Spark, and DuckDB. Plan-asserted in tests/test_plans.py: cogrouped
    Arrow exchange on the composite key, no Window/Sort over a
    3-value partition."""
    import numpy as np
    import pandas as pd

    W = 5000.0
    t = Tables(spark, sf_dir)
    all_orders = t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    # SQL RANGE-frame NULL/NaN discipline (r11: the bypass now really
    # covers NaN, not just NULL — r10 advice): NULL-ordered rows are
    # peers of each other only → frame sum NULL; NaN rows sort as one
    # peer group above everything in DuckDB → their frame sum is a sum
    # over NaN prices = NaN. Both verdicts are computed directly here
    # and the rows never enter the cogroup, where floor(NaN) →
    # INT64_MIN would poison the int64 prefix sums.
    is_bad = F.col("o_totalprice").isNull() | F.isnan("o_totalprice")
    nulls = all_orders.filter(is_bad).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.when(F.isnan("o_totalprice"), F.lit(float("nan")))
        .otherwise(F.lit(None))
        .cast("double")
        .alias("near_price_sum"),
    )
    orders = all_orders.filter(~is_bad)
    bkt = F.floor(F.col("o_totalprice") / W).cast("long")
    queries_df = orders.withColumn("bkt", bkt)
    # Fresh aliases on the contributor side: both branches derive from
    # the same scan, and Spark's binary-node attribute dedup can prune
    # a right-side value column that shares its exprId with the left
    # (observed: right pdf arrived with only its grouping columns).
    # Cogroup matches keys positionally, so names may differ.
    contrib = orders.select(
        F.col("o_orderstatus").alias("c_status"),
        F.col("o_totalprice").alias("c_price"),
        F.explode(F.array(bkt - 1, bkt, bkt + 1)).alias("c_bkt"),
    )

    def frame_sums(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:  # bucket has contributors but no query rows
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype="int64"),
                    "o_orderstatus": pd.Series(dtype="object"),
                    "o_totalprice": pd.Series(dtype="float64"),
                    "near_price_sum": pd.Series(dtype="float64"),
                }
            )
        prices = np.sort(right["c_price"].to_numpy())
        fp = np.floor(prices * 10000.0 + 0.5).astype(np.int64)
        pref = np.concatenate(([0], np.cumsum(fp)))
        x = left["o_totalprice"].to_numpy()
        lo = np.searchsorted(prices, x - W, side="left")
        hi = np.searchsorted(prices, x + W, side="right")
        return pd.DataFrame(
            {
                "o_orderkey": left["o_orderkey"].to_numpy(),
                "o_orderstatus": left["o_orderstatus"].to_numpy(),
                "o_totalprice": x,
                "near_price_sum": (pref[hi] - pref[lo]) / 10000.0,
            }
        )

    return (
        queries_df.groupBy("o_orderstatus", "bkt")
        .cogroup(contrib.groupBy("c_status", "c_bkt"))
        .applyInPandas(
            frame_sums,
            "o_orderkey long, o_orderstatus string, o_totalprice double, "
            "near_price_sum double",
        )
        .unionByName(nulls)
    )


@query(
    "win_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               / 10000.0 AS hour_sum
    FROM events
    """,
)
def win_time_range_frame(spark, sf_dir):
    """Event-time range frame: per-user rolling 1-hour sum — the
    time-window analytics shape (sliding by event, not by bucket).
    Spark expresses interval range frames over a numeric order key:
    seconds-since-epoch with a ±3600 range is the documented
    equivalent of RANGE INTERVAL '1' HOUR. Ties in the order key are
    frame-PEERS in both engines, so results agree even on duplicate
    timestamps."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        "user_id",
        dsum_over("value", w).alias("hour_sum"),
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT o_orderkey, metric, round(val, 4) AS val
    FROM (
        SELECT o_orderkey,
               round(o_totalprice, 4) AS total_price,
               round(o_totalprice * 0.07, 4) AS est_tax,
               CAST(year(o_orderdate) AS DOUBLE) AS order_year
        FROM orders
    )
    UNPIVOT (val FOR metric IN (total_price, est_tax, order_year))
    """,
)
def unpivot_stack(spark, sf_dir):
    """Unpivot / melt: wide metric columns → (metric, value) rows via
    the native DataFrame unpivot (compiles to Expand — one pass, no
    join, row count × n_metrics)."""
    t = Tables(spark, sf_dir)
    wide = t.orders.select(
        "o_orderkey",
        F.round("o_totalprice", 4).alias("total_price"),
        F.round(F.col("o_totalprice") * 0.07, 4).alias("est_tax"),
        F.year("o_orderdate").cast("double").alias("order_year"),
    )
    # standard-SQL UNPIVOT (and DuckDB's) EXCLUDES NULL cells; Spark's
    # unpivot keeps them — align on the standard (r10 stress corpus
    # plants NULL o_totalprice)
    return (
        wide.unpivot(
            "o_orderkey",
            ["total_price", "est_tax", "order_year"],
            "metric",
            "val",
        )
        .filter(F.col("val").isNotNull())
        .select("o_orderkey", "metric", F.round("val", 4).alias("val"))
    )


@query(
    "win_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderpriority) OVER w AS first_prio,
           last_value(o_orderpriority) OVER w AS last_prio
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_value(spark, sf_dir):
    """first/last value over an unbounded frame per customer."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t.orders.select(
        "o_custkey",
        F.first("o_orderpriority").over(w).alias("first_prio"),
        F.last("o_orderpriority").over(w).alias("last_prio"),
    ).dropDuplicates()


@query(
    "win_distinct_count",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(DISTINCT event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS et_variety
    FROM events
    """,
)
def win_distinct_count(spark, sf_dir):
    """Rolling DISTINCT count: how many distinct event types appear in
    the user's trailing 50 events — a behavioural-diversity feature.
    Spark has no COUNT(DISTINCT) OVER; the idiomatic rewrite is
    size(collect_set() OVER), which keeps the frame's distinct set in
    bounded per-row state (|frame| = 50). The ROWS frame is made
    deterministic by the (ts, event_id) tiebreak, so both engines see
    identical frames.

    Scale shape: partitioned by user_id (high cardinality — millions
    of partitions spread evenly), one shuffle, per-row state bounded
    by the frame length. The low-cardinality variant (partition by
    event_type) would funnel each type through one task — that shape
    needs the range-partitioned two-pass template instead (see
    win_ntile_percentile)."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(-49, 0)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias(
            "et_variety"
        ),
    )


@query(
    "win_running_sum_reset",
    oracle="""
    WITH marked AS (
      SELECT event_id, user_id, ts, value,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS epoch
      FROM events
    )
    SELECT event_id, user_id, epoch,
           sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
             OVER (PARTITION BY user_id, epoch ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) / 10000.0
             AS running_since_signup
    FROM marked
    """,
)
def win_running_sum_reset(spark, sf_dir):
    """Running sum that RESETS at each marker event ('signup') — the
    accumulator-with-reset pattern (meter readings, session spend,
    counters after deploys). Rewrite: a running count of markers
    defines an epoch; the running sum re-partitions on (user, epoch).
    Both windows order the same way, so Catalyst evaluates them over
    ONE user_id shuffle (the second window's partition key refines the
    first's — no extra exchange). Fixed-point sum, engine-exact."""
    t = Tables(spark, sf_dir)
    w_epoch = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = t.events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .over(w_epoch)
        .cast("bigint")
        .alias("epoch"),
    )
    w_run = (
        Window.partitionBy("user_id", "epoch")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return marked.select(
        "event_id",
        "user_id",
        "epoch",
        (F.sum(fixed("value")).over(w_run) / 10000.0).alias(
            "running_since_signup"
        ),
    )


@query(
    "win_pct_of_total",
    oracle="""
    WITH b AS (
      SELECT o_orderstatus, o_orderkey,
             CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT) AS pf,
             sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
               OVER (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS cum,
             sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
               OVER (PARTITION BY o_orderstatus) AS tot
      FROM orders
    )
    SELECT o_orderstatus, o_orderkey,
           floor(CAST(pf AS DOUBLE) / tot * 1000000 + 0.5)
               / 1000000.0 AS share,
           floor(CAST(cum AS DOUBLE) / tot * 1000000 + 0.5)
               / 1000000.0 AS cum_share,
           CASE WHEN CAST(cum AS DOUBLE) / tot <= 0.8 THEN 'A'
                WHEN CAST(cum AS DOUBLE) / tot <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM b
    """,
)
def win_pct_of_total(spark, sf_dir):
    """Percent-of-total + cumulative share + ABC (Pareto) class per
    status — the revenue-concentration analysis every warehouse runs.
    Both windows and the final projection ride ONE status-keyed
    shuffle; shares divide two fixed-point longs (one double division
    each, mirrored), so the 80/95 class boundaries are engine-exact.
    Skew note: a dominant status key serializes its sort — at 100 TB
    pre-aggregate per (status, price-bucket) first when row-level
    order isn't required."""
    t = Tables(spark, sf_dir)
    pf = fixed("o_totalprice")
    w_run = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("o_orderstatus")
    b = t.orders.select(
        "o_orderstatus",
        "o_orderkey",
        pf.alias("pf"),
        F.sum(pf).over(w_run).alias("cum"),
        F.sum(pf).over(w_all).alias("tot"),
    )
    cum_share = F.col("cum").cast("double") / F.col("tot")
    share = F.col("pf").cast("double") / F.col("tot")
    return b.select(
        "o_orderstatus",
        "o_orderkey",
        (F.floor(share * 1000000 + 0.5) / 1000000.0).alias("share"),
        (F.floor(cum_share * 1000000 + 0.5) / 1000000.0).alias("cum_share"),
        F.when(cum_share <= 0.8, "A")
        .when(cum_share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           nth_value(o_orderkey, 2) OVER w AS second_order_key,
           nth_value(o_orderkey, 3) OVER w AS third_order_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_nth_value(spark, sf_dir):
    """nth_value over the full partition frame: each customer's 2nd
    and 3rd order key in date order (NULL when fewer exist) — rounds
    out the positional window bank (first/last/lag/lead/nth). The
    dropDuplicates collapses the per-row window output to one row per
    customer on the same partitioning the window already shuffled."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t.orders.select(
        "o_custkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order_key"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_order_key"),
    ).dropDuplicates()


@query(
    "win_sliding_median",
    oracle=f"""
    WITH x AS (
        SELECT event_id, user_id,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v, ts
        FROM events
        WHERE value IS NOT NULL
    ),
    f AS (
        SELECT event_id, user_id,
               list_sort(list(v) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN 14 PRECEDING
                                       AND CURRENT ROW)) AS fr
        FROM x
    )
    SELECT event_id, user_id,
           CASE WHEN len(fr) % 2 = 1
                THEN CAST(fr[(len(fr) + 1) // 2] AS DOUBLE) / 10000.0
                ELSE (fr[len(fr) // 2] + fr[len(fr) // 2 + 1]) / 2.0
                     / 10000.0
           END AS med15
    FROM f
    """,
)
def win_sliding_median(spark, sf_dir):
    """EXACT rolling median over a 15-row trailing frame per user —
    the robust-statistics window the built-in aggregates don't offer
    (percentile_approx is estimate-grade; this is exact).

    The frame's fixed-point values collect into an in-row array,
    sort JVM-side, and the middle element (or the half-up mean of the
    two middles — integer + one dyadic division, engine-exact) is
    selected positionally. Cost: O(k log k) per row for frame size k —
    fine for dashboard-scale frames; for k in the thousands switch to
    the two-heap streaming median inside applyInPandasWithState.
    Collect-over-frame is bounded by the frame, so memory is O(k)
    regardless of partition size."""
    t = Tables(spark, sf_dir)
    # NULL observations leave the stream on BOTH sides up front:
    # Spark's collect_list silently skips NULLs while DuckDB's list()
    # keeps them, so a null-valued tick would shift the two engines'
    # frames differently (r10 stress corpus)
    t_events = t.events.filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, 0)
    )
    fr = F.sort_array(F.collect_list(fixed("value")).over(w))
    n = F.size(fr)
    odd = F.element_at(fr, ((n + 1) / 2).cast("int")).cast("double") / 10000.0
    even = (
        (
            F.element_at(fr, (n / 2).cast("int"))
            + F.element_at(fr, (n / 2).cast("int") + 1)
        )
        / 2.0
        / 10000.0
    )
    return t_events.select(
        "event_id",
        "user_id",
        F.when(n % 2 == 1, odd).otherwise(even).alias("med15"),
    )


@query(
    "win_frame_matrix",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS run_sum_fp,
           CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS trail4_fp,
           CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
               AS center5_fp,
           CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS future_fp
    FROM events
    """,
)
def win_frame_matrix(spark, sf_dir):
    """The ROWS-frame matrix in one pass: expanding (running),
    trailing, centered, and strictly-future frames over the SAME
    window sort — four frame families, one exchange, one sort
    (Catalyst evaluates same-spec frames in a single Window node;
    only the frame cursors differ). All sums are fixed-point BIGINT,
    so every cell is exact at any merge order. The strictly-future
    frame is the one naive implementations get wrong (it excludes
    the current row); its presence pins the off-by-one."""
    t = Tables(spark, sf_dir)
    base = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    v = fixed("value")
    return t.events.select(
        "event_id",
        "user_id",
        F.sum(v)
        .over(base.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_sum_fp"),
        F.sum(v).over(base.rowsBetween(-3, 0)).alias("trail4_fp"),
        F.sum(v).over(base.rowsBetween(-2, 2)).alias("center5_fp"),
        F.sum(v)
        .over(base.rowsBetween(1, Window.unboundedFollowing))
        .alias("future_fp"),
    )


@query(
    "win_rolling_extrema",
    oracle=f"""
    WITH d AS (
        SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS v_fp
        FROM events GROUP BY event_type, day
    )
    SELECT event_type, day,
           v_fp / 10000.0 AS day_value,
           min(v_fp) OVER w / 10000.0 AS roll_min,
           max(v_fp) OVER w / 10000.0 AS roll_max,
           (max(v_fp) OVER w - min(v_fp) OVER w) / 10000.0 AS roll_range
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_rolling_extrema(spark, sf_dir):
    """Rolling 7-bucket min/max envelope over per-day series totals —
    the support/resistance band (and the denominator of channel
    indicators like the stochastic oscillator) that complements the
    moving-average family with order statistics.

    The heavy input collapses to |series|·|days| fixed-point partials
    in one map-side-combined aggregate BEFORE any window; the extrema
    window then runs over the tiny rollup, partitioned by the series
    key. Min/max over fixed-point longs need no float discipline at
    all — the frame result is exact in any engine."""
    t = Tables(spark, sf_dir)
    d = (
        t.events.select(
            "event_type",
            F.col("ts").cast("date").cast("string").alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(F.sum(fixed("value")).alias("v_fp"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return d.select(
        "event_type",
        "day",
        (F.col("v_fp") / 10000.0).alias("day_value"),
        (F.min("v_fp").over(w) / 10000.0).alias("roll_min"),
        (F.max("v_fp").over(w) / 10000.0).alias("roll_max"),
        ((F.max("v_fp").over(w) - F.min("v_fp").over(w)) / 10000.0).alias(
            "roll_range"
        ),
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH pres AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d
        FROM events
    ),
    firsts AS (
        SELECT user_id, d,
               CASE WHEN row_number() OVER (
                   PARTITION BY user_id ORDER BY d) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM pres
    ),
    daily AS (
        SELECT d, CAST(count(*) AS BIGINT) AS active_users,
               CAST(sum(is_first) AS BIGINT) AS new_users
        FROM firsts GROUP BY d
    )
    SELECT d AS day_num, active_users, new_users,
           CAST(sum(new_users) OVER (ORDER BY d) AS BIGINT)
               AS cum_distinct_users
    FROM daily
    """,
)
def win_running_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) — cumulative unique users by day — via
    the first-occurrence rewrite: neither engine supports a DISTINCT
    window aggregate, so each user's first active day gets a flag
    (row_number()==1 over the per-user day order) and the cumulative
    distinct count becomes a plain running SUM of daily new-user
    counts. Also emits per-day actives and new users (the growth
    accounting identity: cum[d] = cum[d-1] + new[d]).

    Scale shape: the event stream collapses to distinct (user, day)
    presence first; the row_number window partitions BY USER (shuffle
    keyed on user_id, |users| partitions of |active days| rows each —
    never a global sort); the final running sum orders a |days|-row
    aggregate, the only single-partition window in the plan and
    bounded by the calendar, not the data."""
    t = Tables(spark, sf_dir)
    pres = t.events.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("d"),
    ).distinct()
    w_user = Window.partitionBy("user_id").orderBy("d")
    firsts = pres.withColumn(
        "is_first",
        F.when(F.row_number().over(w_user) == 1, 1).otherwise(0),
    )
    daily = firsts.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_users"),
        F.sum("is_first").cast("bigint").alias("new_users"),
    )
    w_cum = Window.orderBy("d")
    return daily.select(
        F.col("d").alias("day_num"),
        "active_users",
        "new_users",
        F.sum("new_users").over(w_cum).cast("bigint")
        .alias("cum_distinct_users"),
    )
