"""CDC / incremental-merge operator: apply a changelog of upserts and
deletes to a base snapshot — the reference's incremental-maintenance
surface, re-expressed as the standard Spark merge idiom (union →
latest-version-per-key window → delete filter) that Delta/Iceberg
MERGE compiles to underneath.

Scale shape: one shuffle on the merge key for the ranking window; the
changelog is typically ≪ the snapshot, and AQE's skew handling covers
hot keys. No per-row driver logic, no Python.

The changelog here is DERIVED deterministically from the orders table
(update every 7th key, delete every 11th) so the whole merge is
oracle-checkable; a real deployment feeds the same plan from a Kafka
/ Debezium source with (key, ver, op) columns.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import dsum


@query(
    "merge_upsert_cdc",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS order_key, o_totalprice AS price,
               o_orderstatus AS status, 0 AS ver, 'I' AS op
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, floor(o_totalprice * 1.1 * 100 + 0.5) / 100,
               o_orderstatus, 1, 'U'
        FROM orders WHERE o_orderkey % 7 = 0
    ),
    del AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus, 2, 'D'
        FROM orders WHERE o_orderkey % 11 = 0
    ),
    log_all AS (
        SELECT * FROM base UNION ALL SELECT * FROM upd
        UNION ALL SELECT * FROM del
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY order_key
                                     ORDER BY ver DESC) AS rn
        FROM log_all
    )
    SELECT order_key, price, status, op AS last_op
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def merge_upsert_cdc(spark, sf_dir):
    """Snapshot ⊕ changelog merge: latest version per key wins, 'D'
    tombstones drop the key. Updated prices use the engine-exact
    floor(x*1.1*100+0.5)/100 fixed-point bump (round() half-mode
    differs across engines)."""
    t = Tables(spark, sf_dir)
    o = t.orders
    base = o.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.lit(0).alias("ver"),
        F.lit("I").alias("op"),
    )
    upd = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("order_key"),
        (F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100).alias(
            "price"
        ),
        F.col("o_orderstatus").alias("status"),
        F.lit(1).alias("ver"),
        F.lit("U").alias("op"),
    )
    dele = o.filter(F.col("o_orderkey") % 11 == 0).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.lit(2).alias("ver"),
        F.lit("D").alias("op"),
    )
    w = Window.partitionBy("order_key").orderBy(F.col("ver").desc())
    return (
        base.unionAll(upd)
        .unionAll(dele)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("order_key", "price", "status", F.col("op").alias("last_op"))
    )


@query(
    "mv_incremental_refresh",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders,
           sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) / 10000.0
             AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def mv_incremental_refresh(spark, sf_dir):
    """Incremental materialized-view maintenance: an aggregate
    snapshot (count + fixed-point sum per status) built from the
    historical base is REFRESHED by merging a partial aggregate of
    the delta — never rescanning the base.

    The algebra that makes this work is the same partial/final split
    Catalyst uses inside a single query: counts add, fixed-point long
    sums add (a double sum would NOT merge exactly — accumulation
    order differs between the original build and the refresh; the
    fixed-point representation is what makes snapshot + delta
    bit-equal to a full recompute, which is exactly what the oracle
    asserts). Refresh cost: O(delta) scan + O(groups) merge; the
    snapshot round-trips through parquet, so state survives across
    jobs. avg/min/max merge the same way (sum,count)/(min,min); for
    non-decomposable aggregates (exact median) keep a t-digest-style
    sketch or fall back to recompute.
    """
    import shutil
    import tempfile

    t = Tables(spark, sf_dir)
    cutoff = F.lit("1999-01-01").cast("timestamp")

    def partial(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 10000 + 0.5).cast("long")
            ).alias("pf"),
        )

    snap_dir = tempfile.mkdtemp(prefix="thrive_mv_")
    try:
        # nightly build: aggregate the base once, persist the snapshot
        partial(t.orders.filter(F.col("o_orderdate") < cutoff)).write.mode(
            "overwrite"
        ).parquet(snap_dir + "/snap")
        # incremental refresh: snapshot ∪ delta-partial → re-merge
        snap = spark.read.parquet(snap_dir + "/snap")
        delta = partial(t.orders.filter(F.col("o_orderdate") >= cutoff))
        refreshed = (
            snap.unionByName(delta)
            .groupBy("o_orderstatus")
            .agg(
                F.sum("n_orders").alias("n_orders"),
                F.sum("pf").alias("pf"),
            )
            .select(
                "o_orderstatus",
                "n_orders",
                (F.col("pf") / 10000.0).alias("total_price"),
            )
        )
        return refreshed.localCheckpoint()
    finally:
        shutil.rmtree(snap_dir, ignore_errors=True)


@query(
    "merge_scd2_dimension",
    oracle="""
    WITH tiers AS (
        SELECT user_id, ts, event_id,
               CASE WHEN value < 50 THEN 'bronze'
                    WHEN value < 200 THEN 'silver'
                    ELSE 'gold' END AS tier
        FROM events
    ),
    runs AS (
        SELECT user_id, ts, event_id, tier,
               CASE WHEN lag(tier) OVER w IS DISTINCT FROM tier
                    THEN 1 ELSE 0 END AS is_change
        FROM tiers
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, tier,
               sum(is_change) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS run_id
        FROM runs
    ),
    versions AS (
        SELECT user_id, tier, CAST(run_id AS BIGINT) AS version,
               min(epoch_us(CAST(ts AS TIMESTAMP))) AS eff_from_us
        FROM numbered GROUP BY user_id, tier, run_id
    )
    SELECT user_id, version, tier, eff_from_us,
           lead(eff_from_us) OVER (PARTITION BY user_id
                                   ORDER BY version) AS eff_to_us,
           lead(eff_from_us) OVER (PARTITION BY user_id
                                   ORDER BY version) IS NULL AS is_current
    FROM versions
    """,
)
def merge_scd2_dimension(spark, sf_dir):
    """Slowly-changing-dimension type 2 build: each user's event
    stream is classified into a value tier (bronze/silver/gold), and
    CONSECUTIVE same-tier runs collapse into one dimension version
    with [eff_from, eff_to) validity — the history table a warehouse
    keeps for point-in-time joins (the complement of
    merge_upsert_cdc's latest-wins type-1 merge, and the consumer of
    join_interval_point's as-of lookup).

    Classic run-length rewrite: change flag (lag ≠, null-safe for the
    first row) → running-sum version number → one aggregate → lead()
    for the closing bound; all four steps share the single user_id
    exchange, so the 100 TB cost is one shuffle plus a rows-per-key
    sort. Validity bounds are emitted as epoch microseconds (integer,
    engine-exact; open end = NULL ∧ is_current)."""
    t = Tables(spark, sf_dir)
    tier = (
        F.when(F.col("value") < 50, "bronze")
        .when(F.col("value") < 200, "silver")
        .otherwise("gold")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = t.events.select(
        "user_id",
        "ts",
        "event_id",
        tier.alias("tier"),
        F.when(
            ~F.lag(tier).over(w).eqNullSafe(tier), 1
        )
        .otherwise(0)
        .alias("is_change"),
    )
    numbered = runs.select(
        "user_id",
        "ts",
        "tier",
        F.sum("is_change")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    versions = numbered.groupBy(
        "user_id", "tier", F.col("run_id").cast("bigint").alias("version")
    ).agg(F.min(F.unix_micros("ts")).alias("eff_from_us"))
    w2 = Window.partitionBy("user_id").orderBy("version")
    eff_to = F.lead("eff_from_us").over(w2)
    return versions.select(
        "user_id",
        "version",
        "tier",
        "eff_from_us",
        eff_to.alias("eff_to_us"),
        eff_to.isNull().alias("is_current"),
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS price FROM orders
        WHERE o_orderkey % 11 <> 0
    ),
    curr AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 50
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 13 <> 0
    )
    SELECT CASE WHEN b.k IS NULL THEN 'added'
                WHEN c.k IS NULL THEN 'removed'
                WHEN b.price <> c.price THEN 'changed'
                ELSE 'unchanged' END AS change,
           count(*) AS n,
           CAST(min(coalesce(b.k, c.k)) AS BIGINT) AS sample_key
    FROM base b FULL JOIN curr c ON b.k = c.k
    GROUP BY 1
    """,
)
def cdc_snapshot_diff(spark, sf_dir):
    """Snapshot reconciliation: FULL OUTER join of yesterday's and
    today's snapshot on the business key, classifying every row as
    added / removed / changed / unchanged with counts and a sample
    key — the diff report run before trusting a CDC feed (and the
    inverse operation of merge_upsert_cdc: diff recovers the
    changelog a merge consumed). Snapshots are modulo-derived from
    orders so the oracle states the expected report exactly.

    One key-equi full join = one shuffle both sides; the change
    classification is a projection and the report collapses to 4
    rows. Price comparison is on the raw stored doubles — equality of
    UNCHANGED values is exact (same parquet bits), which is precisely
    what makes full-join diffing sound."""
    t = Tables(spark, sf_dir)
    base = t.orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("bk"), F.col("o_totalprice").alias("bprice")
    )
    curr = t.orders.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("ck"),
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 50
        )
        .otherwise(F.col("o_totalprice"))
        .alias("cprice"),
    )
    j = base.join(curr, base.bk == curr.ck, "full_outer")
    change = (
        F.when(F.col("bk").isNull(), "added")
        .when(F.col("ck").isNull(), "removed")
        .when(F.col("bprice") != F.col("cprice"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(change.alias("change")).agg(
        F.count("*").alias("n"),
        F.min(F.coalesce("bk", "ck")).cast("bigint").alias("sample_key"),
    )


@query(
    "join_point_in_time_scd2",
    oracle="""
    WITH tiers AS (
        SELECT user_id, ts, event_id,
               CASE WHEN value < 50 THEN 'bronze'
                    WHEN value < 200 THEN 'silver'
                    ELSE 'gold' END AS tier
        FROM events
    ),
    runs AS (
        SELECT user_id, ts, event_id, tier,
               CASE WHEN lag(tier) OVER w IS DISTINCT FROM tier
                    THEN 1 ELSE 0 END AS is_change
        FROM tiers
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, tier,
               sum(is_change) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS run_id
        FROM runs
    ),
    dim AS (
        SELECT user_id, tier,
               min(epoch_us(CAST(ts AS TIMESTAMP))) AS eff_from_us,
               lead(min(epoch_us(CAST(ts AS TIMESTAMP)))) OVER (
                   PARTITION BY user_id ORDER BY CAST(run_id AS BIGINT))
                   AS eff_to_us
        FROM numbered GROUP BY user_id, tier, run_id
    )
    SELECT d.tier AS tier_at_purchase,
           count(*) AS n_purchases,
           sum(CAST(floor(e.value * 10000 + 0.5) AS BIGINT)) / 10000.0
               AS revenue
    FROM events e JOIN dim d
      ON e.user_id = d.user_id
     AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= d.eff_from_us
     AND (d.eff_to_us IS NULL
          OR epoch_us(CAST(e.ts AS TIMESTAMP)) < d.eff_to_us)
    WHERE e.event_type = 'purchase'
    GROUP BY d.tier
    """,
)
def join_point_in_time_scd2(spark, sf_dir):
    """Point-in-time join against the SCD2 dimension — the CONSUMER of
    merge_scd2_dimension, and the query every history table exists
    for: each purchase credits the tier that was valid AT ITS
    TIMESTAMP ([eff_from, eff_to) with an open current interval), so
    revenue attributes to the tier the user held then, not the tier
    they hold now (the correctness difference between type-1 and
    type-2 dimensions, made visible).

    Plan: the dimension build and the fact join share the user_id
    key; the validity predicate is a residual range filter on an
    equi join — the standard PIT shape (and why SCD2 tables cluster
    by key, not time). Interval bounds stay integer microseconds."""
    t = Tables(spark, sf_dir)
    dim = merge_scd2_dimension(spark, sf_dir).select(
        F.col("user_id").alias("d_user"),
        "tier",
        "eff_from_us",
        "eff_to_us",
    )
    p = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("e_us"), "value"
    )
    j = p.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("e_us") >= F.col("eff_from_us"))
        & (
            F.col("eff_to_us").isNull()
            | (F.col("e_us") < F.col("eff_to_us"))
        ),
    )
    return j.groupBy(F.col("tier").alias("tier_at_purchase")).agg(
        F.count("*").alias("n_purchases"),
        dsum("value").alias("revenue"),
    )
