"""§2.3 Join operators.

Strategy notes (enforced/verified in tests/test_plans.py):

- Dimension joins use explicit ``F.broadcast`` → BroadcastHashJoin: no
  shuffle of the fact side, the single biggest win at 100 TB.
- Fact-fact joins (lineitem × orders) rely on SortMergeJoin over
  hash-partitioned keys; AQE handles skew splitting at runtime.
- The band (theta) join uses the bucketing rewrite from
  ``plans.band_join`` — naive theta joins plan as nested-loop /
  cartesian, which is O(n²) shuffle at scale; bucketing turns it into
  an equi join on ``floor(price/width)`` with ±1-bucket expansion.
- The as-of join is the window formulation (no native Spark as-of):
  one shuffle on the partition key, then a running max — linear, and
  it reuses the same partitioning a downstream per-user op would need.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.band_join import band_self_join
from ..registry import query
from ..tables import Tables
from ._util import dsum, fixed, osum


@query(
    "join_inner_broadcast",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n_orders,
           {osum('o_totalprice')} AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_broadcast(spark, sf_dir):
    """Orders ⋈ broadcast(customer) inner join rolled up by segment."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
    )


@query(
    "join_inner_shuffle",
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n_lines,
           {osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_inner_shuffle(spark, sf_dir):
    """Fact-fact lineitem ⋈ orders shuffle join with revenue rollup."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_lines"), dsum(rev).alias("revenue"))
    )


@query(
    "join_left_outer",
    oracle="""
    WITH per_order AS (
        SELECT o_orderkey, count(l_orderkey) AS n_lines
        FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey
    )
    SELECT n_lines, count(*) AS n_orders FROM per_order GROUP BY n_lines
    """,
)
def join_left_outer(spark, sf_dir):
    """Left outer orders→lineitem preserving empty orders; distribution of lines/order."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_lines"))
        .groupBy("n_lines")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    WITH per_order AS (
        SELECT o_orderkey, count(l_orderkey) AS n_lines
        FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderkey
    )
    SELECT n_lines, count(*) AS n_orders FROM per_order GROUP BY n_lines
    """,
)
def join_right_outer(spark, sf_dir):
    """Right outer lineitem→orders (mirror of the left-outer exhibit)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"), "right")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_lines"))
        .groupBy("n_lines")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH lo AS (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0),
         hi AS (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey % 3 = 0)
    SELECT count(*) FILTER (WHERE c_custkey IS NOT NULL AND o_custkey IS NOT NULL) AS n_both,
           count(*) FILTER (WHERE o_custkey IS NULL) AS n_left_only,
           count(*) FILTER (WHERE c_custkey IS NULL) AS n_right_only
    FROM lo FULL OUTER JOIN hi ON c_custkey = o_custkey
    """,
)
def join_full_outer(spark, sf_dir):
    """Full outer join with both-sides/left-only/right-only match counts."""
    t = Tables(spark, sf_dir)
    lo = t.customer.filter(F.col("c_custkey") % 2 == 0).select("c_custkey")
    hi = (
        t.orders.filter(F.col("o_custkey") % 3 == 0)
        .select("o_custkey")
        .dropDuplicates()
    )
    j = lo.join(hi, F.col("c_custkey") == F.col("o_custkey"), "full")
    return j.agg(
        F.count(
            F.when(F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(), 1)
        ).alias("n_both"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_left_only"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_right_only"),
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_left_semi(spark, sf_dir):
    """LEFT SEMI: customers having at least one urgent order."""
    t = Tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return t.customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_left_anti(spark, sf_dir):
    """Customers with no urgent order (every customer has *some* order
    in this corpus, so anti-joining on all orders would be vacuous)."""
    t = Tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return t.customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark, sf_dir):
    """Cross join of two tiny dimensions (region × nation)."""
    t = Tables(spark, sf_dir)
    return t.region.select("r_name").crossJoin(t.nation.select("n_name"))


@query(
    "join_theta_band",
    oracle="""
    SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
           round(abs(a.p_retailprice - b.p_retailprice), 4) AS price_gap
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND abs(a.p_retailprice - b.p_retailprice) < 1.0
    """,
)
def join_theta_band(spark, sf_dir):
    """Band join via the bucketing rewrite (plans/band_join.py) — an
    equi join on floor(price/width) with ±1 expansion instead of a
    nested-loop theta join. Same result set, shuffle-joinable at scale.
    """
    t = Tables(spark, sf_dir)
    pairs = band_self_join(
        t.part, key="p_partkey", value="p_retailprice", width=1.0
    )
    return pairs.select(
        F.col("a_key"),
        F.col("b_key"),
        F.round(F.abs(F.col("a_val") - F.col("b_val")), 4).alias("price_gap"),
    )


@query(
    "join_asof_backward",
    oracle="""
    SELECT event_id, user_id, ts,
           max(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_signup_ts
    FROM events
    """,
)
def join_asof_backward(spark, sf_dir):
    """As-of (backward) join: each event matched to the user's most
    recent strictly-prior 'signup' event. Window formulation — one
    shuffle on user_id, running max; no native as-of join needed.
    """
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        F.max(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w).alias(
            "prev_signup_ts"
        ),
    )


@query(
    "join_asof_cogroup",
    oracle="""
    WITH s AS (
        SELECT user_id, ts AS signup_ts FROM events
        WHERE event_type = 'signup'
    )
    SELECT e.event_id, e.user_id, e.ts, s.signup_ts AS prev_signup_ts
    FROM events e
    ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts > s.signup_ts
    """,
)
def join_asof_cogroup(spark, sf_dir):
    """As-of join, scale form: cogrouped ``pd.merge_asof`` per KEY
    BUCKET — both sides shuffle once on ``pmod(user_id, nbkt)``, then
    one vectorized ``merge_asof(by="user_id")`` serves every user in
    the bucket. Cogrouping on the raw user_id paid one Python
    function call PER USER (~10^4 Arrow round-trips at sf0.1 —
    measured 2.9x the wall of the bucketed form, guide §4); ``by=``
    inside the bucket has identical per-user asof semantics, and the
    bucket count scales with input partitions so a bucket stays
    task-memory-bounded at any scale instead of being a constant
    tuned to one box. This is the recipe when the window
    formulation's running max can't express the payload (as-of joins
    pulling many columns from the right side). Checked against
    DuckDB's native ASOF LEFT JOIN with a STRICT inequality, which is
    exactly merge_asof(allow_exact_matches=False): a signup at the
    same microsecond does NOT match (the window-frame formulation in
    join_asof_backward deliberately keeps same-ts earlier-event rows
    instead — the two exhibits pin the two tie disciplines)."""
    import pandas as pd

    t = Tables(spark, sf_dir)
    events = t.events.select("event_id", "user_id", "ts")
    # NULL user_id never matches (SQL equality): cogroup would pair
    # the NULL-key groups like groupBy does, but the ASOF JOIN oracle
    # (and any join semantics) must not (r10 stress corpus). NULL
    # user_id events land in the NULL bucket, whose right side is
    # empty after this filter — the empty-right branch below NaT-fills
    # them, exactly the unmatched-left ASOF outcome.
    signups = t.events.filter(
        (F.col("event_type") == "signup") & F.col("user_id").isNotNull()
    ).select("user_id", F.col("ts").alias("signup_ts"))
    nbkt = max(64, 4 * events.rdd.getNumPartitions())
    bkt = F.pmod(F.col("user_id"), F.lit(nbkt))

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values("ts", kind="mergesort")
        if not len(right):
            out = left.copy()
            out["prev_signup_ts"] = pd.NaT
            return out[["event_id", "user_id", "ts", "prev_signup_ts"]]
        right = right.sort_values("signup_ts", kind="mergesort")
        merged = pd.merge_asof(
            left,
            right[["user_id", "signup_ts"]],
            left_on="ts",
            right_on="signup_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        return merged.rename(columns={"signup_ts": "prev_signup_ts"})[
            ["event_id", "user_id", "ts", "prev_signup_ts"]
        ]

    return (
        events.groupBy(bkt.alias("_b"))
        .cogroup(signups.groupBy(bkt.alias("_b")))
        .applyInPandas(
            asof,
            "event_id long, user_id long, ts timestamp, prev_signup_ts timestamp",
        )
    )


@query(
    "join_interval_point",
    oracle="""
    SELECT s.event_id AS signup_id,
           count(e.event_id) AS n_events_within_hour
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN events e
      ON e.user_id = s.user_id
     AND e.ts >= s.ts
     AND e.ts < s.ts + INTERVAL 1 HOUR
     AND e.event_id <> s.event_id
    GROUP BY s.event_id
    """,
)
def join_interval_point(spark, sf_dir):
    """Point-in-interval join: events falling in [signup_ts, +1h) per
    user. The user_id equi-key keeps this a hash join with a residual
    range predicate — no nested loop at scale.
    """
    t = Tables(spark, sf_dir)
    e = t.events
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    j = s.join(
        e,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("ts") >= F.col("s_ts"))
        & (F.col("ts") < F.col("s_ts") + F.expr("INTERVAL 1 HOUR"))
        & (F.col("event_id") != F.col("signup_id")),
        "left",
    )
    return j.groupBy("signup_id").agg(
        F.count("event_id").alias("n_events_within_hour")
    )


@query(
    "join_star_multiway",
    oracle=f"""
    SELECT n_name, {osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def join_star_multiway(spark, sf_dir):
    """5-way star join (TPC-H Q5 shape, public spec): dims broadcast,
    facts joined largest-last so the fact table is only touched once.
    """
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = (
        t.region.filter(F.col("r_name") == "ASIA")
        .join(t.nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t.customer, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        t.lineitem.join(
            orders.join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
    )


#: fixed interval length for the overlap join exhibit (10 min, µs)
_IVL_US = 600_000_000


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
        SELECT event_id AS view_id, epoch_us(ts) AS sa,
               epoch_us(ts) + {_IVL_US} AS ea
        FROM events WHERE event_type = 'view'
    ),
    b AS (
        SELECT event_id AS purchase_id, epoch_us(ts) AS sb,
               epoch_us(ts) + {_IVL_US} AS eb
        FROM events WHERE event_type = 'purchase'
    )
    SELECT view_id, purchase_id,
           CAST(least(ea, eb) - greatest(sa, sb) AS BIGINT) AS overlap_us
    FROM a JOIN b ON sa <= eb AND sb <= ea
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval-overlap join with NO equi key: every (view, purchase)
    pair whose 10-minute activity windows intersect, plus the overlap
    duration. A naive theta join is a cartesian product; the rewrite
    buckets time into interval-length-sized cells and explodes each
    interval to the cells its span covers (≤ 2 here), so overlap
    candidates MUST share a cell — an equi join on the cell id with a
    residual overlap predicate, linear shuffle volume (the
    generalization of plans/band_join.py from points to intervals).
    Pairs spanning two shared cells match twice → dropDuplicates on
    the pair key. The DuckDB oracle states the same join as raw
    inequalities (its IEJoin handles that shape natively)."""
    t = Tables(spark, sf_dir)

    def intervals(etype, key, s, e):
        return (
            t.events.filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(key),
                F.expr("unix_micros(ts)").alias(s),
                (F.expr("unix_micros(ts)") + _IVL_US).alias(e),
            )
            .withColumn(
                "cell",
                F.explode(
                    F.sequence(
                        F.expr(f"{s} div {_IVL_US}"),
                        F.expr(f"{e} div {_IVL_US}"),
                    )
                ),
            )
        )

    a = intervals("view", "view_id", "sa", "ea")
    b = intervals("purchase", "purchase_id", "sb", "eb")
    return (
        a.join(b, "cell")
        .filter((F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")))
        .dropDuplicates(["view_id", "purchase_id"])
        .select(
            "view_id",
            "purchase_id",
            (
                F.least("ea", "eb") - F.greatest("sa", "sb")
            ).cast("bigint").alias("overlap_us"),
        )
    )


@query(
    "join_salted_skew",
    oracle="""
    WITH dim AS (
        SELECT event_type, count(*) AS type_n,
               CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS type_sum_fp
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(floor(e.value * 10000 + 0.5) AS BIGINT) AS value_fp,
           d.type_n, d.type_sum_fp
    FROM events e JOIN dim d USING (event_type)
    """,
)
def join_salted_skew(spark, sf_dir):
    """Skew-safe shuffled join on a hot key (5 event_types share the
    whole table): the fact side salts its join key by hashing a unique
    column, the dim side replicates once per salt, and the join runs
    on (key, salt) — the hot key's rows spread over N_SALTS reducers
    instead of funneling through one. Identical result to the plain
    join (the oracle). At this dim size a broadcast join would win
    (join_inner_broadcast covers that); this is the pattern for when
    the dim outgrows broadcast and one key dominates the fact — the
    shuffle-hash hint keeps the demo on the salted shuffle path."""
    n_salts = 8
    t = Tables(spark, sf_dir)
    dim = t.events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_n"),
        F.sum(fixed("value")).alias("type_sum_fp"),
    )
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    fact = t.events.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts)).cast("int")
    )
    return (
        fact.hint("SHUFFLE_HASH")
        .join(dim_rep, ["event_type", "_salt"])
        .select(
            "event_id",
            "event_type",
            fixed("value").alias("value_fp"),
            "type_n",
            "type_sum_fp",
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id, ts,
             max(CASE WHEN event_type = 'signup' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_ts,
             min(CASE WHEN event_type = 'signup' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_ts
      FROM events
    )
    SELECT event_id, user_id, ts,
           CASE
             WHEN prev_ts IS NULL THEN next_ts
             WHEN next_ts IS NULL THEN prev_ts
             WHEN epoch_us(CAST(ts AS TIMESTAMP))
                    - epoch_us(CAST(prev_ts AS TIMESTAMP))
                  <= epoch_us(CAST(next_ts AS TIMESTAMP))
                    - epoch_us(CAST(ts AS TIMESTAMP))
               THEN prev_ts ELSE next_ts
           END AS nearest_signup_ts
    FROM base
    """,
)
def join_asof_nearest(spark, sf_dir):
    """As-of join, *nearest* direction: each event matched to the
    temporally closest 'signup' of the same user, in either direction
    (backward wins ties — merge_asof convention). Two frame-bounded
    window passes over ONE shuffle on user_id: a running max of prior
    signup times and a running min of following ones, then a pure
    projection picks the closer side. Same scale shape as the
    backward form — no join node at all, state is one timestamp per
    direction per row."""
    t = Tables(spark, sf_dir)
    sig = F.when(F.col("event_type") == "signup", F.col("ts"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev_ts = F.max(sig).over(wb)
    next_ts = F.min(sig).over(wf)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    nearest = (
        F.when(prev_ts.isNull(), next_ts)
        .when(next_ts.isNull(), prev_ts)
        .when(us(F.col("ts")) - us(prev_ts) <= us(next_ts) - us(F.col("ts")), prev_ts)
        .otherwise(next_ts)
    )
    return t.events.select(
        "event_id", "user_id", "ts", nearest.alias("nearest_signup_ts")
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
               FROM orders WHERE o_orderkey % 5 = 0),
         b AS (SELECT nullif(o_orderstatus, 'P') AS st,
                      count(*) AS n_status
               FROM orders GROUP BY 1)
    SELECT a.o_orderkey, COALESCE(a.st, 'NULL') AS st_s, b.n_status
    FROM a JOIN b ON a.st IS NOT DISTINCT FROM b.st
    """,
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match NULL keys instead of dropping — the semantics CDC and
    sentinel-coded dimensions need. Spark plans eqNullSafe as an
    ordinary hash join (null-safe comparison is still an equi
    condition), so there is no scale penalty over `=`; the NULL key
    group concentrates in one partition, which is exactly the skew
    AQE's skew-join split handles."""
    t = Tables(spark, sf_dir)
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    a = t.orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", st.alias("st")
    )
    b = t.orders.groupBy(st.alias("st2")).agg(
        F.count(F.lit(1)).alias("n_status")
    )
    return (
        a.join(b, a.st.eqNullSafe(F.col("st2")))
        .select(
            "o_orderkey",
            F.coalesce(F.col("st"), F.lit("NULL")).alias("st_s"),
            "n_status",
        )
    )


@query(
    "join_hint_shuffle_hash",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n_orders,
           {osum('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_hint_shuffle_hash(spark, sf_dir):
    """The join-strategy hint surface: the same orders⋈customer run
    with an explicit SHUFFLE_HASH hint instead of the planner's
    default (broadcast here, sort-merge above the threshold).

    Hints are the escape hatch when the optimizer's stats are wrong at
    scale: SHUFFLE_HASH beats sort-merge when one side fits a
    per-partition hash table but exceeds the broadcast threshold (it
    skips both sorts); MERGE is the safe default for two huge sorted
    sides; BROADCAST forces replication of a side the stats
    overestimate. The hint changes the physical strategy ONLY — same
    rows, same oracle; tests/test_plans.py asserts the hinted plan
    actually contains ShuffledHashJoin while the unhinted one
    broadcasts."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.hint("shuffle_hash")
        .join(
            t.customer.select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT event_id, user_id, ts,
           min(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_ts
    FROM events
    """,
)
def join_asof_forward(spark, sf_dir):
    """As-of FORWARD join: each event matched to the user's next
    strictly-later 'purchase' — the time-to-conversion lookup, and the
    mirror of join_asof_backward (same one-shuffle window plan with
    the frame flipped to FOLLOWING; Spark evaluates forward frames in
    the same single pass by scanning the partition from the end)."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .over(w)
        .alias("next_purchase_ts"),
    )


@query(
    "join_multi_semi_flags",
    oracle="""
    WITH f AS (
        SELECT o_custkey,
               count(*) AS n_orders,
               count(*) FILTER (WHERE o_totalprice > 300000)
                   AS n_high_value,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                   AS n_urgent
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_mktsegment,
           f.o_custkey IS NOT NULL AS has_orders,
           coalesce(f.n_high_value, 0) > 0 AS has_high_value,
           coalesce(f.n_urgent, 0) > 0 AS has_urgent,
           CAST(coalesce(f.n_orders, 0) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN f ON c.c_custkey = f.o_custkey
    """,
)
def join_multi_semi_flags(spark, sf_dir):
    """Multi-existence enrichment: customers flagged with THREE
    different EXISTS conditions against orders (any order / any
    high-value order / any urgent order) in ONE pass — the idiomatic
    rewrite of three correlated EXISTS subqueries (three semi joins =
    three shuffles of the fact) into one conditional aggregation +
    one left join.

    The fact table is read and shuffled ONCE; each extra flag is one
    more FILTERed aggregate on the same exchange — the marginal cost
    of an additional EXISTS drops from a full semi join to one
    aggregate column. This is the enrichment-flags pattern every
    audience-builder UI compiles to."""
    t = Tables(spark, sf_dir)
    f = t.orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 300000).alias("n_high_value"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )
    return (
        t.customer.select("c_custkey", "c_mktsegment")
        .join(f, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("o_custkey").isNotNull().alias("has_orders"),
            (F.coalesce("n_high_value", F.lit(0)) > 0).alias(
                "has_high_value"
            ),
            (F.coalesce("n_urgent", F.lit(0)) > 0).alias("has_urgent"),
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias(
                "n_orders"
            ),
        )
    )


ASOF_TOLERANCE_S = 3600  # max lookback: 1 hour


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH m AS (
        SELECT event_id, user_id, ts,
               max(CASE WHEN event_type = 'signup'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_us
        FROM events
    )
    SELECT event_id, user_id, ts,
           CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) - prev_us
                     <= CAST({ASOF_TOLERANCE_S} AS BIGINT) * 1000000
                THEN prev_us END AS signup_us,
           coalesce(epoch_us(CAST(ts AS TIMESTAMP)) - prev_us
                        <= CAST({ASOF_TOLERANCE_S} AS BIGINT) * 1000000,
                    FALSE) AS matched
    FROM m
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of backward join WITH a tolerance bound (pandas
    merge_asof(tolerance=...) semantics): each event matches the
    user's most recent prior signup ONLY if it happened within the
    last hour — stale state must not silently attach, the difference
    between "last known price" and "price from last Tuesday".

    Same single-shuffle running-max window as join_asof_backward; the
    tolerance is a post-window null-out on integer epoch-micros (no
    interval arithmetic, no second pass). A match expires per-event,
    not per-partition, so correctness doesn't depend on session
    windows or state TTL."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_us = F.max(
        F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
    ).over(w)
    in_tol = (F.unix_micros("ts") - F.col("prev_us")) <= (
        ASOF_TOLERANCE_S * 1_000_000
    )
    return (
        t.events.select("event_id", "user_id", "ts", "event_type")
        .withColumn("prev_us", prev_us)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(in_tol, F.col("prev_us")).alias("signup_us"),
            F.coalesce(in_tol, F.lit(False)).alias("matched"),
        )
    )
