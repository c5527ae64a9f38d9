"""Behavioral analytics operators: funnel conversion and cohort
retention — the event-sequence queries the reference's analytics
surface serves (sessionization's batch siblings; the streaming twins
live in operators/streaming_twins.py).

Scale shapes: both operators reduce events to per-user scalars with
conditional min-aggregations keyed on user_id, then join those tiny
per-user tables back — every join and aggregate shares the ONE
user_id shuffle key, so AQE plans them as a single exchange reused
across stages; nothing materializes per-event state. Date arithmetic
stays in integer day/week space (floor(datediff / 7) on BOTH
engines — DuckDB's `//` truncates toward zero, r10), not engine-specific
week truncation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import dsum, ffix, fixed, ofix, osum, r4

#: Monday anchor for week bucketing (1970-01-05 was a Monday)
_WEEK0 = "1970-01-05"


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts >= v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase,
           round(CAST((SELECT count(*) FROM c) AS DOUBLE)
                 / (SELECT count(*) FROM v), 4) AS view_to_click,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                 / (SELECT count(*) FROM c), 4) AS click_to_purchase
    """,
)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel view → click → purchase: a user converts a stage
    only with an event AT OR AFTER their entry into the previous stage
    (min-timestamp chaining, so 'purchase before ever viewing' does
    not count). Emits the stage populations and step conversion
    rates.

    Single-lineage plan (r16): the old v/c/p CTE chain re-used each
    stage DataFrame in two branches, and DataFrame reuse is NOT plan
    reuse — events was scanned 6× (ReuseExchange never fired across
    the differing aggregate branches). One groupBy(user_id) now
    collects min(view ts) plus the click/purchase ts lists, and the
    stage chaining (t_click = min click ≥ t_view, t_purchase = min
    purchase ≥ t_click) runs as array ops on the grouped row — one
    events scan, one user_id exchange, one global-agg exchange
    (measured 1.83× at sf0.1; guide §2.4). A window formulation was
    measured SLOWER (0.77×): sorting all events by (user_id, ts)
    costs more than the hash aggregate that min-reduces views
    map-side. Per-user state is bounded by that user's click/purchase
    counts — same bound the old per-stage joins carried."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    g = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv"),
        # group-exists semantics: the old v CTE kept a user whose only
        # view has a NULL ts (count(*) counts the group), so n_view
        # counts view EVENTS present, not non-null min timestamps
        F.count(
            F.when(F.col("event_type") == "view", F.lit(1))
        ).alias("nv"),
        F.collect_list(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("cls"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("prs"),
    )
    # JOIN USING (user_id) in the old chain silently dropped the NULL
    # user_id group from the click/purchase stages (NULL never joins);
    # replicate by gating the chain on a non-NULL key
    g2 = g.withColumn(
        "tc",
        F.when(
            F.col("user_id").isNotNull(),
            F.array_min(F.filter("cls", lambda x: x >= F.col("tv"))),
        ),
    )
    g3 = g2.withColumn(
        "tp", F.array_min(F.filter("prs", lambda x: x >= F.col("tc")))
    )
    counts = g3.agg(
        F.sum((F.col("nv") > 0).cast("long")).alias("n_view"),
        F.sum(F.col("tc").isNotNull().cast("long")).alias("n_click"),
        F.sum(F.col("tp").isNotNull().cast("long")).alias("n_purchase"),
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        r4(F.col("n_click").cast("double") / F.col("n_view")).alias(
            "view_to_click"
        ),
        r4(F.col("n_purchase").cast("double") / F.col("n_click")).alias(
            "click_to_purchase"
        ),
    )


@query(
    "cohort_retention",
    oracle=f"""
    WITH f AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS d0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT e.user_id,
               CAST(floor(CAST(date_diff('day', DATE '{_WEEK0}', f.d0)
                               AS DOUBLE) / 7) AS BIGINT) AS cohort_week,
               CAST(floor(CAST(date_diff('day', f.d0, CAST(e.ts AS DATE))
                               AS DOUBLE) / 7) AS BIGINT) AS week_offset
        FROM events e JOIN f USING (user_id)
        WHERE CAST(e.ts AS DATE) >= f.d0
    )
    SELECT cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM act GROUP BY cohort_week, week_offset
    """,
)
def cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by signup week (weeks
    since the 1970-01-05 Monday anchor — integer arithmetic, immune to
    engine week-truncation differences), counted once per (cohort,
    weeks-since-signup) cell they were active in."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts")
    f = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").cast("date").alias("d0"))
    )
    act = (
        ev.join(f, "user_id")
        .filter(F.col("ts").cast("date") >= F.col("d0"))
        .select(
            "user_id",
            F.floor(F.datediff("d0", F.lit(_WEEK0).cast("date")) / 7)
            .cast("bigint")
            .alias("cohort_week"),
            F.floor(F.datediff(F.col("ts").cast("date"), "d0") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("bigint").alias("n_active")
    )


@query(
    "sessionize_ids",
    oracle="""
    WITH o AS (
        SELECT event_id, user_id, ts,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT event_id, user_id,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_new,
               ts
        FROM o
    )
    SELECT event_id, user_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS session_idx
    FROM marked
    """,
)
def sessionize_ids(spark, sf_dir):
    """Gaps-and-islands sessionization: assign each EVENT its per-user
    session ordinal (new session after a 30-minute silence) — the
    event-level complement of stream_session_window's per-session
    aggregate, and the standard lag → flag → running-sum rewrite that
    keeps it one window pass over one user_id shuffle."""
    t = Tables(spark, sf_dir)
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    marked = t.events.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w_ord).isNull()
            | (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w_ord))
                > 1800 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return marked.select(
        "event_id",
        "user_id",
        F.sum("is_new").over(w_run).cast("bigint").alias("session_idx"),
    )


@query(
    "dq_outlier_iqr",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CAST(floor(quantile_cont(value, 0.25) * 10000 + 0.5)
                    AS BIGINT) AS q1_fp,
               CAST(floor(quantile_cont(value, 0.75) * 10000 + 0.5)
                    AS BIGINT) AS q3_fp
        FROM events GROUP BY event_type
    ),
    b AS (
        SELECT event_type,
               q1_fp - (3 * (q3_fp - q1_fp)) // 2 AS lo_fp,
               q3_fp + (3 * (q3_fp - q1_fp)) // 2 AS hi_fp
        FROM q
    )
    SELECT e.event_type, count(*) AS n,
           CAST(count(CASE WHEN
                    CAST(floor(e.value * 10000 + 0.5) AS BIGINT) < b.lo_fp
                 OR CAST(floor(e.value * 10000 + 0.5) AS BIGINT) > b.hi_fp
                THEN 1 END) AS BIGINT) AS n_outliers,
           b.lo_fp, b.hi_fp
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type, b.lo_fp, b.hi_fp
    """,
)
def dq_outlier_iqr(spark, sf_dir):
    """Tukey-fence outlier rate per event_type: IQR bounds from exact
    quantiles, then a broadcast join back to count fence violations.
    All comparisons happen on 1e-4 fixed-point longs — the quantile
    interpolation is quantized once per group (agg_percentile_exact
    established the engines agree at 4dp) so the per-row fence test is
    exact integer arithmetic, immune to float associativity. Two
    passes by design: quantiles need the full distribution before any
    row can be classified; the bounds table is group-cardinality-sized
    → broadcast, so the second pass adds no shuffle."""
    t = Tables(spark, sf_dir)
    q = t.events.groupBy("event_type").agg(
        fixed(F.percentile("value", 0.25)).alias("q1_fp"),
        fixed(F.percentile("value", 0.75)).alias("q3_fp"),
    )
    iqr3h = (3 * (F.col("q3_fp") - F.col("q1_fp"))).cast("bigint")
    b = q.select(
        "event_type",
        (F.col("q1_fp") - F.floor(iqr3h / 2)).cast("bigint").alias("lo_fp"),
        (F.col("q3_fp") + F.floor(iqr3h / 2)).cast("bigint").alias("hi_fp"),
    )
    v_fp = fixed("value")
    return (
        t.events.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "lo_fp", "hi_fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when((v_fp < F.col("lo_fp")) | (v_fp > F.col("hi_fp")), 1)
            ).cast("bigint").alias("n_outliers"),
        )
        .select("event_type", "n", "n_outliers", "lo_fp", "hi_fp")
    )


@query(
    "agg_histogram_bucketed",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           count(*) AS n,
           sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) / 10000.0
             AS total
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def agg_histogram_bucketed(spark, sf_dir):
    """Equi-width histogram as plain bucketed aggregation — the exact,
    engine-checkable counterpart of histogram_numeric (whose bin
    placement is implementation-defined). Bucket arithmetic is one
    double division + floor, identical in both engines; the heavy
    lifting is an ordinary partial+final hash aggregate, so the
    histogram of a 100 TB column costs one scan and a
    buckets×partitions shuffle."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("total"),
        )
        .orderBy("bucket")
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    o AS (
        SELECT user_id, day,
               datediff('day', DATE '1970-01-01', day)
                 - row_number() OVER (PARTITION BY user_id ORDER BY day)
                 AS grp
        FROM days
    )
    SELECT user_id,
           strftime(min(day), '%Y-%m-%d') AS island_start,
           strftime(max(day), '%Y-%m-%d') AS island_end,
           count(*) AS n_days
    FROM o GROUP BY user_id, grp
    """,
)
def win_gaps_islands(spark, sf_dir):
    """Gaps-and-islands, island-aggregate form: maximal runs of
    CONSECUTIVE active days per user (start, end, length) — streak
    analytics, the day-granular complement of ``sessionize_ids``'s
    event-level session ordinals.

    Classic rewrite: day_number − row_number is constant within a
    consecutive run, so islands fall out of one group-by on that
    difference. Cost shape: the distinct collapses events to at most
    users × days rows first, then one user-keyed window and a reuse of
    the same partitioning for the final aggregate — a single shuffle
    chain, no self-join. Dates ride as integer day numbers (exact both
    engines); output dates are strings (driver output rule: no DATE
    columns)."""
    t = Tables(spark, sf_dir)
    days = t.events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    o = days.select(
        "user_id",
        "day",
        (
            F.datediff("day", F.lit("1970-01-01")) - F.row_number().over(w)
        ).alias("grp"),
    )
    return o.groupBy("user_id", "grp").agg(
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("island_start"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("island_end"),
        F.count("*").alias("n_days"),
    ).drop("grp")


def _basket_arrays(ob):
    """One row per order with its sorted distinct brand set.
    collect_set dedups within the group, so the input needs NO prior
    distinct — this is the ONLY shuffle of the basket pipeline."""
    return ob.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("p_brand")).alias("bs")
    )


def _basket_pairs(ob):
    """(src < dst) brand pairs per order, generated in-row: collect
    each order's sorted brand set, then an array-comprehension lambda
    expands the i<j combinations — no self-join, no second shuffle of
    the basket table. Shared by basket_brand_affinity and
    graph_copurchase_stats."""
    return _pairs_from_arrays(_basket_arrays(ob))


def _pairs_from_arrays(arr):
    return arr.select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> "
                "transform(slice(bs, i + 2, size(bs)), "
                "y -> struct(x AS src, y AS dst))))"
            )
        ).alias("p")
    ).select("p.src", "p.dst")


@query(
    "basket_brand_affinity",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    bc AS (SELECT p_brand, count(*) AS c FROM ob GROUP BY p_brand),
    tot AS (SELECT count(DISTINCT l_orderkey) AS t FROM ob),
    pc AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               count(*) AS pair_cnt
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, pair_cnt,
           {ofix('CAST(pair_cnt AS DOUBLE) / t', 6)} AS support,
           {ofix('CAST(pair_cnt * t AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE)')}
               AS lift
    FROM pc
    JOIN bc ca ON ca.p_brand = brand_a
    JOIN bc cb ON cb.p_brand = brand_b, tot
    WHERE pair_cnt >= 3
    """,
)
def basket_brand_affinity(spark, sf_dir):
    """Market-basket affinity at brand grain: for every brand pair
    co-occurring in ≥3 orders, support = P(a,b) and lift =
    P(a,b)/(P(a)·P(b)) — the association-rule mining primitive.

    Scale shape: the basket explosion happens AFTER projecting items
    to their (order, brand) distinct, and the pair space is generated
    IN-ROW — one groupBy(l_orderkey) collects each basket's sorted
    brand array, and an array-comprehension lambda emits the i<j
    combinations without a self-join (measured 1.5× over the
    equi-self-join at sf0.1, one less shuffle of the basket table;
    Σ|basket|² stays bounded by basket width either way). Brand
    marginals (25 rows) and the order-count scalar broadcast back
    onto the pair table. Lift's numerator/denominator stay in exact
    BIGINT (pair_cnt·total ≤ |orders|² « 2^63) until ONE double
    division, so both engines divide identical integers.
    """
    t = Tables(spark, sf_dir)
    ob = (
        t.lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(t.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
    )
    # r16: the old three-consumer diamond (bc / tot / pc each built on
    # `arr`) relied on ReuseExchange, which never fired — the plan
    # scanned lineitem and ran the collect_set aggregate FOUR times
    # (plans/r16/basket_brand_affinity_before.txt: 8 scans, 15
    # exchanges). One explode now emits each basket's i<j brand pairs,
    # one single per member brand (dst NULL, the brand marginal), and
    # one (NULL, NULL) order marker (the order total), so a single
    # (src, dst) groupBy yields all three tables from ONE basket
    # aggregate — 1 lineitem scan, 2 data-sized exchanges (guide §2.4;
    # the pair shuffle partial-aggregates to ≤|brands|² rows per task).
    # r17 (VERDICT r16 item 3): r16 lazily localCheckpoint'ed the tiny
    # counts table for its four filtered consumers; the RDD barrier +
    # three broadcast-build jobs cost more at sf0.1 than the recompute
    # they saved (driver bench 1.457 → 1.889 s). The marginals and the
    # order total are now WINDOW sums over the single counts lineage
    # instead of self-joins: partitionBy(src) sees brand a's marginal
    # row from every (a, b) pair row, partitionBy(coalesce(dst, src))
    # sees brand b's, and an unpartitioned window carries the order
    # total — no checkpoint, no broadcasts, ONE job (guide §2.4 "window
    # functions ... do not need a second shuffle"). The whole-frame
    # window is scale-safe: counts is bounded by |brands|²+|brands|+1
    # rows (p_brand has 25 values at every TPC-H SF), not by data size.
    arr = _basket_arrays(ob)
    ex = arr.select(
        F.explode(
            F.concat(
                F.expr(
                    "flatten(transform(bs, (x, i) -> "
                    "transform(slice(bs, i + 2, size(bs)), "
                    "y -> struct(x AS src, y AS dst))))"
                ),
                F.expr(
                    "transform(bs, x -> "
                    "struct(x AS src, CAST(NULL AS STRING) AS dst))"
                ),
                F.array(
                    F.struct(
                        F.lit(None).cast("string").alias("src"),
                        F.lit(None).cast("string").alias("dst"),
                    )
                ),
            )
        ).alias("p")
    ).select("p.src", "p.dst")
    counts = ex.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
    marg = F.when(
        F.col("dst").isNull() & F.col("src").isNotNull(), F.col("cnt")
    )
    enriched = (
        counts.withColumn(
            "ca", F.sum(marg).over(Window.partitionBy("src"))
        )
        .withColumn(
            "cb",
            F.sum(marg).over(
                Window.partitionBy(F.coalesce("dst", "src"))
            ),
        )
        .withColumn(
            "t",
            F.sum(
                F.when(F.col("src").isNull(), F.col("cnt"))
            ).over(Window.partitionBy()),
        )
    )
    return (
        enriched.filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("cnt") >= 3)
        )
        .select(
            F.col("src").alias("brand_a"),
            F.col("dst").alias("brand_b"),
            F.col("cnt").alias("pair_cnt"),
            ffix(F.col("cnt").cast("double") / F.col("t"), 6).alias(
                "support"
            ),
            ffix(
                (F.col("cnt") * F.col("t")).cast("double")
                / (F.col("ca") * F.col("cb")).cast("double")
            ).alias("lift"),
        )
    )


@query(
    "events_pattern_triple",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_type,
               lead(event_type, 1) OVER w AS nxt1,
               lead(event_type, 2) OVER w AS nxt2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, count(*) AS n_triples,
           min(epoch_us(ts)) AS first_hit_us
    FROM o
    WHERE event_type = 'view' AND nxt1 = 'click' AND nxt2 = 'purchase'
    GROUP BY user_id
    """,
)
def events_pattern_triple(spark, sf_dir):
    """MATCH_RECOGNIZE-style sequence detection: occurrences of the
    CONSECUTIVE event pattern view→click→purchase inside each user's
    stream (no intervening events allowed — stricter than funnel
    chaining), with per-user match count and first-match timestamp.

    A fixed-length pattern compiles to lead() probes on one (user_id)
    window sort — single shuffle, O(1) state per row, no self-joins;
    the pattern filter and aggregate ride the same partitioning. This
    is the scalable plan for any bounded-window regex over 100 TB of
    events; only unbounded patterns (Kleene star) need the stateful
    applyInPandasWithState path (see streaming twins).
    """
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = t.events.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    return (
        o.filter(
            (F.col("event_type") == "view")
            & (F.col("nxt1") == "click")
            & (F.col("nxt2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_triples"),
            F.min(F.unix_micros("ts")).alias("first_hit_us"),
        )
    )


@query(
    "attribution_first_touch",
    oracle=f"""
    WITH f AS (
        SELECT user_id, campaign FROM (
            SELECT user_id,
                   CASE WHEN json_valid(props)
                        THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                   END AS campaign,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    )
    SELECT f.campaign, count(*) AS n_purchases,
           {osum('e.value')} AS revenue
    FROM events e JOIN f USING (user_id)
    WHERE e.event_type = 'purchase'
    GROUP BY f.campaign
    """,
)
def attribution_first_touch(spark, sf_dir):
    """First-touch revenue attribution: every purchase credits the
    campaign (``props.k``) of its user's FIRST-ever event; output is
    revenue and purchase count per campaign.

    The first-touch table is one row_number over the user_id sort
    (deterministic (ts, event_id) tie-break), at most |users| rows —
    it re-joins the purchase stream on the same user_id key, so AQE
    reuses one exchange for window + join; the campaign rollup is a
    map-side-combined aggregate on a tiny key space. Revenue is the
    fixed-point exact sum."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    f = (
        t.events.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("campaign"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "campaign")
    )
    return (
        t.events.filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
        .join(f, "user_id")
        .groupBy("campaign")
        .agg(
            F.count("*").alias("n_purchases"),
            dsum("value").alias("revenue"),
        )
    )


@query(
    "agg_entropy_gini",
    oracle=f"""
    WITH c AS (
        SELECT lang, source, count(*) AS c
        FROM documents GROUP BY lang, source
    ),
    g AS (
        SELECT lang,
               CAST(sum(c) AS BIGINT) AS n,
               count(*) AS k,
               CAST(sum(c * c) AS BIGINT) AS ss,
               CAST(sum(CAST(floor(c * log2(c) * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS s_fp
        FROM c GROUP BY lang
    )
    SELECT lang, n, k,
           {ofix('CAST(CAST(floor(log2(n) * 10000 + 0.5) AS BIGINT) * n'
                 ' - s_fp AS DOUBLE) / CAST(n * 10000 AS DOUBLE)')}
               AS entropy_bits,
           {ofix('CAST(n * n - ss AS DOUBLE) / CAST(n * n AS DOUBLE)', 6)}
               AS gini
    FROM g
    """,
)
def agg_entropy_gini(spark, sf_dir):
    """Distribution-shape metrics per language: Shannon entropy (bits)
    and Gini impurity of the source mix — the diversity signals a
    corpus-balance dashboard tracks per slice.

    Both reduce to integer sufficient statistics over the per-(lang,
    source) count table: H = (n·⌊log₂n·10⁴⌋ − Σ⌊c·log₂c·10⁴⌋)/(n·10⁴)
    with every log term floored to BIGINT before summing (order-proof;
    log2 floor-parity across engines is property-tested to 2e5), and
    Gini = (n² − Σc²)/n² exactly in BIGINT until one double division.
    Scale: two chained hash aggregates, the second over ≤ langs×sources
    rows — nothing beyond the first shuffle touches data volume."""
    t = Tables(spark, sf_dir)
    c = t.documents.groupBy("lang", "source").agg(F.count("*").alias("c"))
    cc = F.col("c")
    g = c.groupBy("lang").agg(
        F.sum(cc).cast("bigint").alias("n"),
        F.count("*").alias("k"),
        F.sum(cc * cc).cast("bigint").alias("ss"),
        F.sum(
            F.floor(cc * F.log2(cc) * 10000 + 0.5).cast("bigint")
        ).cast("bigint").alias("s_fp"),
    )
    n, ss, s_fp = F.col("n"), F.col("ss"), F.col("s_fp")
    l2n = F.floor(F.log2(n) * 10000 + 0.5).cast("bigint")
    entropy = (l2n * n - s_fp).cast("double") / (n * 10000).cast("double")
    gini = (n * n - ss).cast("double") / (n * n).cast("double")
    return g.select(
        "lang",
        "n",
        "k",
        ffix(entropy).alias("entropy_bits"),
        ffix(gini, 6).alias("gini"),
    )


@query(
    "win_period_over_period",
    oracle=f"""
    WITH m AS (
        SELECT CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1)
                    AS BIGINT) AS month_id,
               count(*) AS n_orders,
               {osum('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month_id, n_orders, revenue,
           {ofix('(revenue - lag(revenue) OVER (ORDER BY month_id))'
                 ' / lag(revenue) OVER (ORDER BY month_id)', 6)} AS mom_pct,
           {ofix('(revenue - lag(revenue, 12) OVER (ORDER BY month_id))'
                 ' / lag(revenue, 12) OVER (ORDER BY month_id)', 6)}
               AS yoy_pct
    FROM m
    """,
)
def win_period_over_period(spark, sf_dir):
    """Month-over-month and year-over-year revenue deltas — the
    period-comparison query every BI layer generates. Months ride as
    integer month ids (year·12 + month−1: lag(12) is exactly one year,
    no date-truncation semantics in play).

    The global un-partitioned window is applied AFTER aggregation, on
    ~|months| rows — windows over aggregates of 100 TB are fine; it's
    un-partitioned windows over the raw fact that single-thread (see
    win_ntile_percentile's range-partition rewrite for that case).
    Revenue is the fixed-point exact sum, so lag ratios divide
    identical doubles in both engines."""
    t = Tables(spark, sf_dir)
    m = t.orders.groupBy(
        (F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1))
        .cast("bigint")
        .alias("month_id")
    ).agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    w = Window.orderBy("month_id")
    rev, prev, prev12 = (
        F.col("revenue"),
        F.lag("revenue").over(w),
        F.lag("revenue", 12).over(w),
    )
    return m.select(
        "month_id",
        "n_orders",
        "revenue",
        ffix((rev - prev) / prev, 6).alias("mom_pct"),
        ffix((rev - prev12) / prev12, 6).alias("yoy_pct"),
    )


#: Benford expected share of leading digit d: log10(1 + 1/d), in 1e-6
#: fixed-point (precomputed literals — no transcendental parity risk)
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _benford_case_sql() -> str:
    arms = " ".join(
        f"WHEN {d} THEN {ppm / 1e6!r}" for d, ppm in _BENFORD_PPM.items()
    )
    return f"CASE lead_digit {arms} END"


@query(
    "dq_benford_leading_digit",
    oracle=f"""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS lead_digit
        FROM orders WHERE o_totalprice > 0
    ),
    g AS (SELECT lead_digit, count(*) AS n FROM d GROUP BY lead_digit),
    t AS (SELECT sum(n) AS tot FROM g)
    SELECT lead_digit, n,
           {ofix('CAST(n AS DOUBLE) / tot', 6)} AS obs_share,
           {_benford_case_sql()} AS benford_share,
           {ofix(f'CAST(n AS DOUBLE) / tot - ({_benford_case_sql()})', 6)}
               AS excess
    FROM g, t
    """,
)
def dq_benford_leading_digit(spark, sf_dir):
    """Benford's-law audit of the money column: observed leading-digit
    shares vs the log10(1+1/d) expectation — the classic
    fabricated-data / unit-mixup detector for a DQ suite.

    The leading digit is extracted in exact integer space (fixed-point
    cents → decimal string → first char): no log10 at query time — the
    Benford expectations are precomputed rational literals, so nothing
    transcendental has to agree across engines. One hash aggregate on
    a 9-value key plus a broadcast scalar total; scales with a scan."""
    t = Tables(spark, sf_dir)
    d = t.orders.filter(F.col("o_totalprice") > 0).select(
        F.substring(fixed("o_totalprice", 100).cast("string"), 1, 1)
        .cast("bigint")
        .alias("lead_digit")
    )
    g = d.groupBy("lead_digit").agg(F.count("*").alias("n"))
    tot = g.agg(F.sum("n").alias("tot"))
    bshare = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
        ),
        F.col("lead_digit").cast("int"),
    ) / 1e6
    obs = F.col("n").cast("double") / F.col("tot")
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "lead_digit",
            "n",
            ffix(obs, 6).alias("obs_share"),
            bshare.alias("benford_share"),
            ffix(obs - bshare, 6).alias("excess"),
        )
    )


@query(
    "events_markov_transition",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    c AS (
        SELECT cur, nxt, count(*) AS n FROM p
        WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    t AS (SELECT cur, sum(n) AS row_total FROM c GROUP BY cur)
    SELECT c.cur, c.nxt, c.n,
           {ofix('CAST(c.n AS DOUBLE) / row_total', 6)} AS p_transition
    FROM c JOIN t ON c.cur = t.cur
    """,
)
def events_markov_transition(spark, sf_dir):
    """First-order Markov transition matrix over event types: for
    every (current → next) pair within a user's stream, the count and
    the row-normalized transition probability — the model behind
    next-action prediction and behavioral anomaly scoring.

    One user_id window sort produces the successor pairs; the pair
    and row-marginal aggregates both collapse onto the tiny
    |types|² key space, and the probability divides two exact
    integers. The |types|-row marginal broadcasts back — nothing
    after the window touches event volume."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = t.events.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = p.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    tot = c.groupBy("cur").agg(F.sum("n").alias("row_total"))
    return c.join(F.broadcast(tot), "cur").select(
        "cur",
        "nxt",
        "n",
        ffix(F.col("n").cast("double") / F.col("row_total"), 6).alias(
            "p_transition"
        ),
    )


@query(
    "analytics_rfm_segments",
    oracle="""
    WITH m AS (
        SELECT user_id,
               max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
               count(*) AS freq,
               CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS monetary_fp
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    s AS (
        SELECT user_id, freq, monetary_fp,
               CAST(ntile(5) OVER (ORDER BY last_us, user_id) AS BIGINT)
                   AS r_score,
               CAST(ntile(5) OVER (ORDER BY freq, user_id) AS BIGINT)
                   AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary_fp, user_id) AS BIGINT)
                   AS m_score
        FROM m
    )
    SELECT user_id, r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                    THEN 'champion'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'new_promising'
                WHEN r_score <= 2 AND f_score <= 2 AND m_score <= 2
                    THEN 'hibernating'
                ELSE 'core' END AS segment
    FROM s
    """,
)
def analytics_rfm_segments(spark, sf_dir):
    """RFM segmentation: per-user Recency / Frequency / Monetary
    quintile scores over purchase events, folded into the marketing
    segments (champion / at-risk-loyal / new-promising / hibernating /
    core) a CRM export carries.

    All three metrics come from ONE purchase aggregate (max ts in
    integer micros, count, fixed-point spend); the three ntile(5)
    windows run over the |users|-row aggregate — post-aggregation
    global windows, not raw-fact ones (for quantiles over raw 100 TB
    facts, use win_ntile_percentile's range-partition rewrite). Every
    ntile orders with a user_id tiebreak, so quintile boundaries are
    engine-deterministic."""
    t = Tables(spark, sf_dir)
    m = (
        t.events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count("*").alias("freq"),
            F.sum(fixed("value")).cast("bigint").alias("monetary_fp"),
        )
    )
    s = m.select(
        "user_id",
        F.ntile(5).over(Window.orderBy("last_us", "user_id"))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(5).over(Window.orderBy("freq", "user_id"))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(5).over(Window.orderBy("monetary_fp", "user_id"))
        .cast("bigint")
        .alias("m_score"),
    )
    r, f_, mm = F.col("r_score"), F.col("f_score"), F.col("m_score")
    seg = (
        F.when((r >= 4) & (f_ >= 4) & (mm >= 4), "champion")
        .when((r <= 2) & (f_ >= 4), "at_risk_loyal")
        .when((r >= 4) & (f_ <= 2), "new_promising")
        .when((r <= 2) & (f_ <= 2) & (mm <= 2), "hibernating")
        .otherwise("core")
    )
    return s.select(
        "user_id", "r_score", "f_score", "m_score", seg.alias("segment")
    )


@query(
    "analytics_audience_overlap",
    oracle=f"""
    WITH u AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    c AS (SELECT event_type, count(*) AS n_users FROM u GROUP BY event_type),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_both
        FROM u a JOIN u b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both, ca.n_users AS n_a, cb.n_users AS n_b,
           {ofix('CAST(n_both AS DOUBLE)'
                 ' / (ca.n_users + cb.n_users - n_both)', 6)} AS jaccard
    FROM pairs
    JOIN c ca ON ca.event_type = type_a
    JOIN c cb ON cb.event_type = type_b
    """,
)
def analytics_audience_overlap(spark, sf_dir):
    """Audience overlap matrix: for every pair of event types, the
    user-set intersection size and Jaccard similarity — the audience-
    planning query behind retargeting and cannibalization analysis.

    The |users|×|types| distinct projection collapses event volume
    first; the pair intersection is a self-join on user_id (the same
    single-key shuffle every operator in this module uses), and the
    per-type marginals broadcast back. Jaccard divides exact integers
    via inclusion-exclusion — no float provenance. At sketch scale the
    same output shape comes from per-type HLL unions
    (agg_hll_sketch_union): exact here because the oracle demands it."""
    t = Tables(spark, sf_dir)
    u = t.events.select("event_type", "user_id").distinct()
    c = u.groupBy("event_type").agg(F.count("*").alias("n_users"))
    a, b = u.alias("a"), u.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    ca = F.broadcast(
        c.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    )
    cb = F.broadcast(
        c.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    )
    return (
        pairs.join(ca, "type_a")
        .join(cb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            ffix(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "events_common_paths",
    oracle="""
    WITH p AS (
        SELECT event_type || '>' || lead(event_type, 1) OVER w
                   || '>' || lead(event_type, 2) OVER w AS path
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT path, count(*) AS n
    FROM p WHERE path IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 20
    """,
)
def events_common_paths(spark, sf_dir):
    """Top 3-step behavior paths: the most frequent consecutive
    event-type trigrams across all user streams — the "common paths"
    view of product analytics (the aggregate complement of
    events_pattern_triple's fixed-pattern match).

    lead()-probes on one user_id window sort build the trigram label
    in-row (string concat null-propagates at stream tails, filtered);
    the count collapses onto ≤|types|³ keys and the top-k is a
    TakeOrdered — after the one window shuffle nothing scales with
    event volume."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    path = F.concat_ws(
        ">",
        F.col("event_type"),
        F.lead("event_type", 1).over(w),
        F.lead("event_type", 2).over(w),
    )
    # concat_ws skips nulls (unlike ||): require all three legs
    full = F.when(
        F.lead("event_type", 2).over(w).isNotNull()
        & F.lead("event_type", 1).over(w).isNotNull(),
        path,
    )
    p = t.events.select(full.alias("path")).filter(F.col("path").isNotNull())
    return (
        p.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@query(
    "events_session_metrics",
    oracle="""
    WITH o AS (
        SELECT event_id, user_id, ts, event_type, value,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                            OR epoch_us(ts) - epoch_us(prev_ts)
                               > 1800000000
                       THEN 1 ELSE 0 END AS is_new
        FROM o
    ),
    sess AS (
        SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS session_idx
        FROM marked
    )
    SELECT user_id, session_idx,
           count(*) AS n_events,
           max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           sum(CAST(floor((CASE WHEN event_type = 'purchase' THEN value
                                ELSE 0.0 END) * 10000 + 0.5) AS BIGINT))
               / 10000.0 AS session_revenue
    FROM sess GROUP BY user_id, session_idx
    """,
)
def events_session_metrics(spark, sf_dir):
    """The session mart: one row per (user, session) with event count,
    duration, purchase count and fixed-point session revenue — the
    table product analytics actually joins against, built on the same
    lag → flag → running-sum sessionization as sessionize_ids but
    aggregated to session grain.

    The window chain and the final aggregate all key on user_id — one
    exchange end to end; duration is integer microseconds. This is
    the batch mirror of stream_session_window's session_window()
    aggregate (30-minute gap, same fixed-point revenue units)."""
    t = Tables(spark, sf_dir)
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w_ord)
    )
    marked = t.events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.lag("ts").over(w_ord).isNull() | (gap_us > 1800 * 1_000_000), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = marked.withColumn(
        "session_idx", F.sum("is_new").over(w_run).cast("bigint")
    )
    purchase_val = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(0.0)
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "duration_us"
        ),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        dsum(purchase_val).alias("session_revenue"),
    )


@query(
    "analytics_ab_test",
    oracle=f"""
    WITH assign AS (
        SELECT user_id, user_id % 2 AS arm FROM (
            SELECT DISTINCT user_id FROM events
        )
    ),
    conv AS (
        SELECT a.arm,
               count(*) AS n_users,
               count(*) FILTER (WHERE p.user_id IS NOT NULL) AS n_converted,
               CAST(coalesce(sum(p.rev_fp), 0) AS BIGINT) AS rev_fp
        FROM assign a LEFT JOIN (
            SELECT user_id,
                   sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS rev_fp
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ) p ON a.user_id = p.user_id
        GROUP BY a.arm
    )
    SELECT CAST(arm AS BIGINT) AS arm, n_users, n_converted,
           rev_fp / 10000.0 AS revenue,
           {ofix('CAST(n_converted AS DOUBLE) / n_users', 6)} AS conv_rate
    FROM conv
    """,
)
def analytics_ab_test(spark, sf_dir):
    """A/B experiment readout: users deterministically assigned to
    arms by id parity (the hash-mod assignment real experiment
    platforms use — stable under reprocessing, no rand()), with
    per-arm population, converter count, exact revenue and conversion
    rate. The z-statistic is left to the consumer: the sufficient
    statistics here are exact integers, which is the part an engine
    must get right.

    One distinct + one pre-aggregated left join on user_id (the
    per-user revenue rollup collapses events BEFORE the join), then a
    2-row aggregate — nothing after the first exchange scales with
    event volume."""
    t = Tables(spark, sf_dir)
    assign = t.events.select("user_id").distinct().select(
        "user_id", (F.col("user_id") % 2).alias("arm")
    )
    p = (
        t.events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(fixed("value")).alias("rev_fp"))
    )
    conv = (
        assign.join(p, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.count_if(F.col("rev_fp").isNotNull()).alias("n_converted"),
            F.coalesce(F.sum("rev_fp"), F.lit(0)).cast("bigint").alias(
                "rev_fp"
            ),
        )
    )
    return conv.select(
        F.col("arm").cast("bigint").alias("arm"),
        "n_users",
        "n_converted",
        (F.col("rev_fp") / 10000.0).alias("revenue"),
        ffix(F.col("n_converted").cast("double") / F.col("n_users"), 6).alias(
            "conv_rate"
        ),
    )


@query(
    "attribution_linear_window",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS p_us,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS rev_fp
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT event_id AS touch_id, user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
        FROM events WHERE event_type IN ('view', 'click')
    ),
    pairs AS (
        SELECT p.purchase_id, p.rev_fp, t.event_type,
               count(*) OVER (PARTITION BY p.purchase_id) AS n_touches
        FROM p JOIN touch t
          ON p.user_id = t.user_id
         AND t.t_us >= p.p_us - 3600000000 AND t.t_us < p.p_us
    )
    SELECT event_type AS channel,
           count(*) AS n_credits,
           CAST(sum((rev_fp * 1000) // n_touches) AS BIGINT) / 10000000.0
               AS credited_revenue
    FROM pairs GROUP BY event_type
    """,
)
def attribution_linear_window(spark, sf_dir):
    """Linear multi-touch attribution: each purchase's revenue splits
    EQUALLY across the user's view/click touches in the preceding
    hour; credited revenue rolls up per channel — the multi-touch
    complement of attribution_first_touch.

    The purchase↔touch pairing is a user-keyed interval join (equi key
    + integer-microsecond band, same plan family as
    stream_stream_join); the per-purchase touch count is a window on
    the pair set partitioned by purchase — so splitting is exact:
    rev_fp/n_touches divides an integer by an integer, summed after
    flooring only at the final projection. Caveat stated in the
    contract: Σ of per-touch double shares is order-sensitive in the
    16th digit, so the oracle and Spark both sum the SAME
    fixed-point-seeded doubles would still be order-sensitive in the
    last bits, so each credit is floored to an exact integer at 1e-7
    resolution FIRST ((rev_fp·1000) div n_touches) and the rollup is a
    pure BIGINT sum — merge-order-proof like every money sum here.
    """
    t = Tables(spark, sf_dir)
    p = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
        fixed("value").alias("rev_fp"),
    )
    touch = t.events.filter(
        F.col("event_type").isin("view", "click")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type"),
        F.unix_micros("ts").alias("t_us"),
    )
    pairs = p.join(
        touch,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_us") >= F.col("p_us") - 3600 * 1_000_000)
        & (F.col("t_us") < F.col("p_us")),
    ).select(
        "purchase_id",
        "rev_fp",
        "event_type",
    )
    w = Window.partitionBy("purchase_id")
    shared = pairs.withColumn("n_touches", F.count("*").over(w))
    credit_fp = F.expr("(rev_fp * 1000) div n_touches")
    return shared.groupBy(F.col("event_type").alias("channel")).agg(
        F.count("*").alias("n_credits"),
        (F.sum(credit_fp).cast("bigint") / 10000000.0).alias(
            "credited_revenue"
        ),
    )


@query(
    "analytics_peak_concurrency",
    oracle="""
    WITH pts AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS t, 1 AS d,
               event_id AS tb
        FROM events
        UNION ALL
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) + 300000000, -1,
               event_id + 1000000000
        FROM events
    ),
    sweep AS (
        SELECT t, sum(d) OVER (ORDER BY t, d, tb
                               ROWS UNBOUNDED PRECEDING) AS live
        FROM pts
    )
    SELECT CAST(max(live) AS BIGINT) AS peak_concurrent,
           CAST(min(live) AS BIGINT) AS min_live
    FROM sweep
    """,
)
def analytics_peak_concurrency(spark, sf_dir):
    """Peak concurrency via the sweep line: every event opens a
    5-minute activity interval; +1/−1 endpoint markers sorted by time
    give a running 'live interval' count whose max is the peak — the
    capacity-planning number (max concurrent sessions/connections)
    that a naive self-join computes in O(n²) and this plan in one
    sort. Endpoint ties order ends (−1) BEFORE starts at the same
    microsecond via the d sort key, the half-open [t, t+5 min)
    convention, mirrored exactly in both engines.

    The global running sum uses one un-partitioned window over 2n
    marker rows — for 100 TB, pre-aggregate markers per (time-bucket)
    first (Σd per bucket), sweep buckets, then rescan only the peak
    bucket: the two-level sweep keeps the global sort at bucket
    granularity."""
    t = Tables(spark, sf_dir)
    us = F.unix_micros("ts")
    starts = t.events.select(
        us.alias("t"), F.lit(1).alias("d"), F.col("event_id").alias("tb")
    )
    ends = t.events.select(
        (us + 300 * 1_000_000).alias("t"),
        F.lit(-1).alias("d"),
        (F.col("event_id") + 1_000_000_000).alias("tb"),
    )
    pts = starts.unionAll(ends)
    w = Window.orderBy("t", "d", "tb").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = pts.select(F.sum("d").over(w).alias("live"))
    return sweep.agg(
        F.max("live").cast("bigint").alias("peak_concurrent"),
        F.min("live").cast("bigint").alias("min_live"),
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH pres AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d
        FROM events
    ),
    span AS (SELECT min(d) AS d0, max(d) AS d1 FROM pres),
    served AS (
        SELECT p.user_id, p.d + k.k AS target_d
        FROM pres p, (SELECT unnest(generate_series(0, 6)) AS k) k
    ),
    wau AS (
        SELECT target_d AS d, count(DISTINCT user_id) AS wau
        FROM served GROUP BY target_d
    ),
    dau AS (SELECT d, count(*) AS dau FROM pres GROUP BY d)
    SELECT dau.d AS day_num, dau.dau, wau.wau
    FROM dau JOIN wau ON dau.d = wau.d, span
    WHERE dau.d BETWEEN span.d0 + 6 AND span.d1
    """,
)
def events_dau_wau(spark, sf_dir):
    """DAU and trailing-7-day WAU per day — THE engagement series, via
    the presence-expansion rewrite: windowed COUNT(DISTINCT) doesn't
    exist as a window aggregate in either engine, so each (user, day)
    presence row is exploded to the 7 target days it can serve and
    WAU becomes a plain distinct-count per target day. Output starts
    at the first day with a full trailing week (partial-week rows
    would understate WAU).

    Cost: presence collapses events to |users|×|active days| first
    (the big win), the explosion is ×7 of THAT, and both aggregates
    shuffle on the day key. The same rewrite gives MAU with k=0..29 —
    ×30 of the presence table, still far below event volume."""
    t = Tables(spark, sf_dir)
    pres = t.events.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
    ).distinct()
    span = pres.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    served = pres.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "d"
    ).select("user_id", (F.col("d") + F.col("k")).alias("target_d"))
    wau = served.groupBy(F.col("target_d").alias("d")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = pres.groupBy("d").agg(F.count("*").alias("dau"))
    return (
        dau.join(wau, "d")
        .crossJoin(F.broadcast(span))
        .filter(F.col("d").between(F.col("d0") + 6, F.col("d1")))
        .select(F.col("d").alias("day_num"), "dau", "wau")
    )


@query(
    "analytics_survival_table",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT s.user_id,
               min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS p_us
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s.t0
        GROUP BY s.user_id
    ),
    horizon AS (
        SELECT s.user_id,
               CASE WHEN p.p_us IS NOT NULL THEN
                    (p.p_us - epoch_us(CAST(s.t0 AS TIMESTAMP)))
                        // 86400000000
               END AS t_event,
               ((SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) FROM events)
                   - epoch_us(CAST(s.t0 AS TIMESTAMP))) // 86400000000
                   AS t_censor
        FROM s LEFT JOIN p ON s.user_id = p.user_id
    ),
    expanded AS (
        SELECT h.user_id, h.t_event, g.d
        FROM horizon h,
             LATERAL (SELECT unnest(generate_series(0,
                 coalesce(h.t_event, h.t_censor))) AS d) g
    )
    SELECT CAST(d AS BIGINT) AS day_t,
           count(*) AS n_at_risk,
           count(*) FILTER (WHERE t_event = d) AS n_converted
    FROM expanded GROUP BY d
    """,
)
def analytics_survival_table(spark, sf_dir):
    """Survival / time-to-event table for signup → first purchase:
    for every day t since signup, how many users were still at risk
    (not yet converted, observation window not yet exhausted) and how
    many converted exactly at t — with RIGHT-CENSORING handled the
    Kaplan-Meier way (users who never purchase contribute risk only
    up to the end of their observed window). The downstream S(t)
    product is one consumer-side fold over these EXACT integers —
    emitting the at-risk table instead of S(t) keeps the operator
    float-free.

    Shape: two user-keyed min-aggregates on one exchange, a scalar
    horizon broadcast, then each user expands to its ≤|days| at-risk
    rows — |users|×|days| « events, and the day rollup is the only
    further shuffle."""
    t = Tables(spark, sf_dir)
    ev = t.events
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    maxus = ev.agg(F.max(F.unix_micros("ts")).alias("mx"))
    day = 86400 * 1_000_000
    h = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(maxus))
        .select(
            "user_id",
            F.when(
                F.col("p_us").isNotNull(),
                (F.col("p_us") - F.unix_micros("t0"))
                .cast("bigint")
                / F.lit(day),
            )
            .cast("bigint")
            .alias("t_event_raw"),
            ((F.col("mx") - F.unix_micros("t0")) / F.lit(day))
            .cast("bigint")
            .alias("t_censor"),
        )
        .select(
            "user_id",
            F.expr(
                "CASE WHEN t_event_raw IS NOT NULL THEN t_event_raw END"
            ).alias("t_event"),
            "t_censor",
        )
    )
    expanded = h.select(
        "t_event",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.coalesce("t_event", "t_censor"),
            )
        ).alias("d"),
    )
    return expanded.groupBy(F.col("d").cast("bigint").alias("day_t")).agg(
        F.count("*").alias("n_at_risk"),
        F.count_if(F.col("t_event") == F.col("d")).alias("n_converted"),
    )


@query(
    "analytics_user_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d
        FROM events
    ),
    o AS (
        SELECT user_id, d,
               d - row_number() OVER (PARTITION BY user_id ORDER BY d)
                   AS grp
        FROM days
    ),
    islands AS (
        SELECT user_id, count(*) AS len, max(d) AS d_end
        FROM o GROUP BY user_id, grp
    ),
    lastday AS (SELECT user_id, max(d) AS last_d FROM days GROUP BY user_id)
    SELECT i.user_id,
           count(*) AS n_streaks,
           CAST(max(i.len) AS BIGINT) AS longest_streak,
           CAST(max(CASE WHEN i.d_end = l.last_d THEN i.len END) AS BIGINT)
               AS current_streak
    FROM islands i JOIN lastday l ON i.user_id = l.user_id
    GROUP BY i.user_id
    """,
)
def analytics_user_streaks(spark, sf_dir):
    """Per-user activity streaks: number of maximal consecutive-day
    runs, the longest, and the CURRENT streak (the run ending on the
    user's last active day) — the gamification/engagement rollup built
    on the same day-number − row_number islands as win_gaps_islands,
    collapsed to one row per user.

    Every step (distinct days, island window, both rollups, the
    last-day join) rides the single user_id partitioning; day numbers
    are exact integers so streak arithmetic is engine-free."""
    t = Tables(spark, sf_dir)
    days = t.events.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    o = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    islands = o.groupBy("user_id", "grp").agg(
        F.count("*").alias("len"), F.max("d").alias("d_end")
    )
    lastday = days.groupBy("user_id").agg(F.max("d").alias("last_d"))
    return (
        islands.join(lastday, "user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_streaks"),
            F.max("len").cast("bigint").alias("longest_streak"),
            F.max(
                F.when(F.col("d_end") == F.col("last_d"), F.col("len"))
            )
            .cast("bigint")
            .alias("current_streak"),
        )
    )


@query(
    "analytics_repurchase_intervals",
    oracle="""
    WITH p AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
        SELECT user_id,
               (us - lag(us) OVER (PARTITION BY user_id ORDER BY us))
                   // 3600000000 AS gap_h
        FROM p
    ),
    g AS (SELECT user_id, gap_h FROM gaps WHERE gap_h IS NOT NULL)
    SELECT count(DISTINCT user_id) AS n_repeat_users,
           count(*) AS n_intervals,
           CAST(floor(quantile_cont(gap_h, 0.25) * 10000 + 0.5) AS BIGINT)
               AS p25_h_fp,
           CAST(floor(quantile_cont(gap_h, 0.50) * 10000 + 0.5) AS BIGINT)
               AS p50_h_fp,
           CAST(floor(quantile_cont(gap_h, 0.75) * 10000 + 0.5) AS BIGINT)
               AS p75_h_fp,
           CAST(max(gap_h) AS BIGINT) AS max_h
    FROM g
    """,
)
def analytics_repurchase_intervals(spark, sf_dir):
    """Inter-purchase interval distribution: hours between a user's
    consecutive purchases, summarized as exact quartiles — the
    replenishment-cycle metric behind send-time optimization and
    churn-risk windows (a user past their p75 gap is overdue).

    Gaps are INTEGER hours (micros floor-div), so the quantile
    interpolation runs on exact integers and is quantized at 4 dp —
    the cross-engine agreement class agg_percentile_exact pinned. One
    user_id window for the lag, then a single global aggregate; the
    quantile needs the full gap distribution, which is
    |purchases|-sized, not event-sized."""
    t = Tables(spark, sf_dir)
    p = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    gaps = p.select(
        "user_id",
        F.expr(
            "(us - lag(us) OVER (PARTITION BY user_id ORDER BY us))"
            " div 3600000000"
        ).alias("gap_h"),
    ).filter(F.col("gap_h").isNotNull())
    return gaps.agg(
        F.countDistinct("user_id").alias("n_repeat_users"),
        F.count("*").alias("n_intervals"),
        fixed(F.percentile("gap_h", 0.25)).alias("p25_h_fp"),
        fixed(F.percentile("gap_h", 0.50)).alias("p50_h_fp"),
        fixed(F.percentile("gap_h", 0.75)).alias("p75_h_fp"),
        F.max("gap_h").cast("bigint").alias("max_h"),
    )


@query(
    "analytics_churn_rate",
    oracle=f"""
    WITH pres AS (
        SELECT DISTINCT user_id,
               CAST(floor(CAST(date_diff('day', DATE '1970-01-05',
                                         CAST(ts AS DATE)) AS DOUBLE) / 7)
                    AS BIGINT) AS m
        FROM events
    ),
    span AS (SELECT min(m) AS m0, max(m) AS m1 FROM pres),
    pairs AS (
        SELECT a.m, count(*) AS n_active,
               count(*) FILTER (WHERE b.user_id IS NULL) AS n_churned
        FROM pres a
        LEFT JOIN pres b
          ON a.user_id = b.user_id AND b.m = a.m + 1
        GROUP BY a.m
    )
    SELECT m AS week_id, n_active, n_churned,
           {ofix('CAST(n_churned AS DOUBLE) / n_active', 6)} AS churn_rate
    FROM pairs, span WHERE m < span.m1
    """,
)
def analytics_churn_rate(spark, sf_dir):
    """Week-over-week churn: of the users active in week w, the
    share with NO activity in w+1 — the retention complement of
    cohort_retention, on the same Monday-anchored integer week ids
    (week granularity because the test corpus spans ~2 weeks; the
    operator is granularity-generic). The final week is excluded
    (its churn is right-censored — see analytics_survival_table).

    Presence collapses events to |users|×|months| first; the churn
    test is a self left-join on (user, m+1) — one user_id-keyed
    shuffle — and rates divide exact counts."""
    t = Tables(spark, sf_dir)
    pres = t.events.select(
        "user_id",
        F.floor(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-05").cast("date")
            )
            / 7
        )
        .cast("bigint")
        .alias("m"),
    ).distinct()
    span = pres.agg(F.max("m").alias("m1"))
    a, b = pres.alias("a"), pres.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.m") == F.col("a.m") + 1),
            "left",
        )
        .groupBy(F.col("a.m").alias("m"))
        .agg(
            F.count("*").alias("n_active"),
            F.count_if(F.col("b.user_id").isNull()).alias("n_churned"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(span))
        .filter(F.col("m") < F.col("m1"))
        .select(
            F.col("m").alias("week_id"),
            "n_active",
            "n_churned",
            ffix(
                F.col("n_churned").cast("double") / F.col("n_active"), 6
            ).alias("churn_rate"),
        )
    )


@query(
    "analytics_pareto_share",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                   AS rev_fp
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT rev_fp,
               ntile(10) OVER (ORDER BY rev_fp DESC, o_custkey) AS decile
        FROM cust
    ),
    agg AS (
        SELECT decile, count(*) AS n_customers,
               sum(rev_fp) AS dec_fp
        FROM ranked GROUP BY decile
    ),
    tot AS (SELECT sum(dec_fp) AS t FROM agg)
    SELECT decile, n_customers, dec_fp / 10000.0 AS decile_revenue,
           floor(CAST(sum(dec_fp) OVER (ORDER BY decile) AS DOUBLE)
                 / t * 10000 + 0.5) / 10000.0 AS cum_share
    FROM agg, tot
    """,
)
def analytics_pareto_share(spark, sf_dir):
    """Pareto / 80-20 concentration curve: customers bucketed into
    revenue deciles (best spenders first), each decile's revenue and
    the cumulative share of total — the one-glance answer to "do 20 %
    of customers drive 80 % of revenue?".

    The ntile window runs over the |customers|-row aggregate, not the
    fact table (post-aggregation bounded, same discipline as RFM);
    ordering is unique (fixed-point revenue desc, custkey) so tile
    assignment is deterministic in both engines. Revenue stays in
    exact fixed-point longs through the cumulative sum — the only
    float op is the final share division of two exact values."""
    t = Tables(spark, sf_dir)
    cust = t.orders.groupBy("o_custkey").agg(
        F.sum(fixed("o_totalprice")).alias("rev_fp")
    )
    ranked = cust.withColumn(
        "decile",
        F.ntile(10).over(
            Window.orderBy(F.col("rev_fp").desc(), F.col("o_custkey"))
        ),
    )
    agg = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_fp").alias("dec_fp"),
    )
    w_cum = Window.orderBy("decile")
    w_tot = Window.orderBy("decile").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return agg.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_customers",
        (F.col("dec_fp") / 10000.0).alias("decile_revenue"),
        (
            F.floor(
                F.sum("dec_fp").over(w_cum).cast("double")
                / F.sum("dec_fp").over(w_tot)
                * 10000
                + 0.5
            )
            / 10000.0
        ).alias("cum_share"),
    )


@query(
    "analytics_new_vs_returning",
    oracle="""
    WITH f AS (
        SELECT o_custkey, min(strftime(o_orderdate, '%Y-%m')) AS m0
        FROM orders GROUP BY o_custkey
    ),
    o AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month, o_custkey,
               o_totalprice
        FROM orders
    )
    SELECT o.month, count(*) AS n_orders,
           count(DISTINCT o.o_custkey) AS n_customers,
           count(DISTINCT CASE WHEN f.m0 = o.month THEN o.o_custkey END)
               AS n_new,
           count(DISTINCT o.o_custkey)
             - count(DISTINCT CASE WHEN f.m0 = o.month THEN o.o_custkey END)
               AS n_returning,
           sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) / 10000.0
               AS revenue
    FROM o JOIN f ON o.o_custkey = f.o_custkey
    GROUP BY o.month
    """,
)
def analytics_new_vs_returning(spark, sf_dir):
    """Monthly new-vs-returning customer split: per calendar month the
    order count, distinct actives, how many were placing their FIRST
    ever order that month, the returning remainder, and revenue — the
    top strip of every growth dashboard.

    First-month assignment is min() over the customer's month strings
    (lexicographic == chronological for yyyy-MM, engine-neutral — no
    date_trunc divergence). The |customers|-row first-order table
    joins back by customer key; at 100 TB both sides shuffle once on
    o_custkey and the month rollup partial-aggregates map-side. The
    conditional count(DISTINCT CASE...) counts each new customer once
    regardless of their order count that month."""
    t = Tables(spark, sf_dir)
    o = t.orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_custkey",
        "o_totalprice",
    )
    f = o.groupBy("o_custkey").agg(F.min("month").alias("m0"))
    new_cust = F.when(F.col("m0") == F.col("month"), F.col("o_custkey"))
    return (
        o.join(f, "o_custkey")
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct(new_cust).alias("n_new"),
            (
                F.countDistinct("o_custkey") - F.countDistinct(new_cust)
            ).alias("n_returning"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "analytics_cohort_ltv",
    oracle="""
    WITH f AS (
        SELECT o_custkey,
               min(year(o_orderdate) * 12 + month(o_orderdate)) AS m0
        FROM orders GROUP BY o_custkey
    ),
    sizes AS (SELECT m0, count(*) AS cohort_users FROM f GROUP BY m0),
    rev AS (
        SELECT f.m0,
               year(o.o_orderdate) * 12 + month(o.o_orderdate) - f.m0
                   AS age_months,
               sum(CAST(floor(o.o_totalprice * 10000 + 0.5) AS BIGINT))
                   AS rev_fp
        FROM orders o JOIN f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT CAST(m0 // 12 AS VARCHAR) || '-' ||
               lpad(CAST(m0 % 12 + 1 AS VARCHAR), 2, '0') AS cohort,
           age_months, cohort_users,
           rev_fp / 10000.0 AS period_revenue,
           sum(rev_fp) OVER (PARTITION BY m0 ORDER BY age_months)
               / 10000.0 AS cum_revenue,
           floor(CAST(sum(rev_fp) OVER (PARTITION BY m0
                                        ORDER BY age_months) AS DOUBLE)
                 / cohort_users / 10000.0 * 10000 + 0.5) / 10000.0
               AS ltv_per_user
    FROM rev JOIN sizes USING (m0)
    """,
)
def analytics_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves: customers grouped by first-order
    month, revenue accumulated by months-since-first-order, normalized
    per cohort user — the LTV table that payback-period and CAC
    decisions read off.

    Months are linearized as year·12+month (pure integer arithmetic —
    no months_between float, no engine date_trunc quirks; the label is
    rebuilt from the integer). Revenue is fixed-point through the
    cumulative window (exact at any merge order); the per-user
    division happens once per output cell on exact operands. The
    cumulative window partitions by cohort — |months| rows per
    partition after the (m0, age) pre-aggregate, never raw orders."""
    t = Tables(spark, sf_dir)
    mcol = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    o = t.orders.select(
        "o_custkey", mcol.alias("m"), "o_totalprice"
    )
    f = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sizes = f.groupBy("m0").agg(F.count(F.lit(1)).alias("cohort_users"))
    rev = (
        o.join(f, "o_custkey")
        .groupBy("m0", (F.col("m") - F.col("m0")).alias("age_months"))
        .agg(F.sum(fixed("o_totalprice")).alias("rev_fp"))
    )
    w = Window.partitionBy("m0").orderBy("age_months")
    cohort = F.concat(
        F.floor(F.col("m0") / 12).cast("bigint").cast("string"),
        F.lit("-"),
        F.lpad((F.col("m0") % 12 + 1).cast("string"), 2, "0"),
    )
    return (
        rev.join(sizes, "m0")
        .select(
            cohort.alias("cohort"),
            F.col("age_months").cast("bigint").alias("age_months"),
            "cohort_users",
            (F.col("rev_fp") / 10000.0).alias("period_revenue"),
            (F.sum("rev_fp").over(w) / 10000.0).alias("cum_revenue"),
            (
                F.floor(
                    F.sum("rev_fp").over(w).cast("double")
                    / F.col("cohort_users")
                    / 10000.0
                    * 10000
                    + 0.5
                )
                / 10000.0
            ).alias("ltv_per_user"),
        )
    )


@query(
    "events_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS t0
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id,
               min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t1
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'purchase'
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= v.t0
        GROUP BY e.user_id
    ),
    lag AS (
        SELECT (t1 - t0) // 60000000 AS mins FROM p JOIN v USING (user_id)
    )
    SELECT count(*) AS n_converted,
           min(mins) AS min_minutes,
           round(quantile_cont(mins, 0.5), 4) AS median_minutes,
           round(quantile_cont(mins, 0.9), 4) AS p90_minutes,
           max(mins) AS max_minutes
    FROM lag
    """,
)
def events_time_to_convert(spark, sf_dir):
    """Conversion-latency distribution: per user, minutes between
    first view and first subsequent purchase, summarized as exact
    min/median/p90/max — the "how long does the funnel take" companion
    to funnel_conversion's "how many make it".

    Latencies are integer epoch-micro differences floor-divided to
    minutes BEFORE the percentile (integer inputs, so the interpolated
    quantile arithmetic is the agg_percentile_exact-proven
    cross-engine pattern). Two per-user min() aggregates shuffle on
    user_id once each; the final summary is a single-row fold of the
    |converted-users| lag table."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("us") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    lag = p.join(v, "user_id").select(
        F.expr("(t1 - t0) div 60000000").alias("mins")
    )
    return lag.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("mins").alias("min_minutes"),
        r4(F.percentile("mins", 0.5)).alias("median_minutes"),
        r4(F.percentile("mins", 0.9)).alias("p90_minutes"),
        F.max("mins").alias("max_minutes"),
    )


@query(
    "agg_order_width_histogram",
    oracle="""
    WITH w AS (
        SELECT l_orderkey, count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_lines, count(*) AS n_orders,
           floor(count(*) * 10000.0
                 / (SELECT count(*) FROM w) + 0.5) / 10000.0 AS share
    FROM w GROUP BY n_lines
    """,
)
def agg_order_width_histogram(spark, sf_dir):
    """Aggregate-of-aggregate histogram: the distribution of order
    WIDTH (line items per order) — the basket-depth profile that sizes
    the pair-explosion cost of every within-order operator
    (basket affinity, co-purchase graph: both are Σ width², read
    directly off this table).

    Two chained hash aggregates, both map-side combined (orderkey
    rollup → width rollup); the denominator is a 1-row scalar
    broadcast. The shuffle after pass one carries |orders| narrow
    rows, pass two |distinct widths|."""
    t = Tables(spark, sf_dir)
    w = t.lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    tot = w.agg(F.count(F.lit(1)).alias("t"))
    return (
        w.groupBy("n_lines")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_lines",
            "n_orders",
            (
                F.floor(F.col("n_orders") * 10000.0 / F.col("t") + 0.5)
                / 10000.0
            ).alias("share"),
        )
    )


@query(
    "events_retention_triangle",
    oracle="""
    WITH pres AS (
        SELECT DISTINCT user_id,
               CAST(floor(CAST(date_diff('day', DATE '1970-01-05',
                                         CAST(ts AS DATE)) AS DOUBLE) / 7)
                    AS BIGINT) AS w
        FROM events
    ),
    cohort AS (SELECT user_id, min(w) AS w0 FROM pres GROUP BY user_id),
    sizes AS (
        SELECT w0, count(*) AS cohort_users FROM cohort GROUP BY w0
    ),
    ret AS (
        SELECT c.w0, p.w - c.w0 AS week_offset,
               count(*) AS retained
        FROM pres p JOIN cohort c ON p.user_id = c.user_id
        GROUP BY c.w0, p.w - c.w0
    )
    SELECT r.w0 AS cohort_week, r.week_offset, s.cohort_users,
           r.retained,
           (20000 * r.retained + s.cohort_users)
               // (2 * s.cohort_users) AS retention_bp
    FROM ret r JOIN sizes s ON r.w0 = s.w0
    """,
)
def events_retention_triangle(spark, sf_dir):
    """Weekly cohort retention triangle: users grouped by first-active
    week, and for each later week the count (and basis-point share) of
    the cohort still active — the retention matrix every growth team
    reads column-by-column.

    Weeks are Monday-anchored integer ids (``floor(datediff / 7)`` from the
    1970-01-05 Monday anchor — pure integer arithmetic, no engine
    weekofyear()/ISO-week divergence; the corpus spans ~4 weeks so
    month granularity would be vacuous). The event stream collapses to
    distinct (user, week) presence FIRST — the row count every later
    stage touches is |users|·|active weeks|, never event volume. The
    cohort table is one more aggregate over presence; the triangle is
    presence ⋈ cohort shuffled on user_id, then a (cohort, offset)
    rollup whose key space is |weeks|² — tiny at any corpus size.
    Retention is exact integer half-up basis points (cohort sizes and
    retained counts are longs; no float division crosses the hash)."""
    t = Tables(spark, sf_dir)
    pres = t.events.select(
        "user_id",
        # floor(), not `div`: Spark `div` truncates toward zero while
        # DuckDB `//` floors — they diverge exactly on pre-1970-01-05
        # dates (negative datediff). floor-division on both sides keeps
        # week ids consistent for any epoch (ADVICE r8 item c).
        F.expr(
            "cast(floor(datediff(cast(ts as date), date'1970-01-05') / 7)"
            " as bigint)"
        ).alias("w"),
    ).distinct()
    cohort = pres.groupBy("user_id").agg(F.min("w").alias("w0"))
    sizes = cohort.groupBy("w0").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    ret = (
        pres.join(cohort, "user_id")
        .groupBy("w0", (F.col("w") - F.col("w0")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    return ret.join(sizes, "w0").select(
        F.col("w0").alias("cohort_week"),
        "week_offset",
        "cohort_users",
        "retained",
        F.expr("(20000 * retained + cohort_users) div (2 * cohort_users)")
        .cast("bigint")
        .alias("retention_bp"),
    )
