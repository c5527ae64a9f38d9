"""§2.4 Aggregation operators.

Scale notes: every groupBy here compiles to HashAggregate with
map-side partial aggregation (verified in tests/test_plans.py), so the
shuffle carries only per-group partials — at 100 TB the shuffle volume
is O(groups × partitions), not O(rows). Money-scale double sums go
through DECIMAL(38,10) for engine-exact results (see _util.dsum).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import dsum, fixed, osum, r4


@query(
    "agg_global",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {osum('l_quantity')} AS sum_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           {osum('l_extendedprice')} AS sum_price,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    """Ungrouped table-wide aggregate: count, fixed-point sums, min/max over lineitem."""
    t = Tables(spark, sf_dir)
    return t.lineitem.agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "agg_hash_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity')} AS sum_qty,
           {osum('l_extendedprice')} AS sum_base_price,
           {osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash_groupby(spark, sf_dir):
    """TPC-H Q1 pricing summary (public TPC-H spec shape)."""
    t = Tables(spark, sf_dir)
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum(price).alias("sum_base_price"),
            dsum(price * (1 - disc)).alias("sum_disc_price"),
            dsum(price * (1 - disc) * (1 + tax)).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark, sf_dir):
    """count(DISTINCT customers / priorities) per order status."""
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query("agg_approx_count_distinct")  # rows-only: HLL sketches are engine-specific
def agg_approx_count_distinct(spark, sf_dir):
    """HLL approx_count_distinct users per event type (engine-specific sketch: rows-only)."""
    t = Tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_extendedprice * (1 - l_discount)')} AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS ((flag,status),(flag),()) revenue rollup in one pass."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return t.lineitem.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(dsum(rev).alias("revenue"), F.count("*").alias("n"))


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity')} AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP (returnflag, linestatus) quantity totals with subtotal rows."""
    t = Tables(spark, sf_dir)
    return t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT event_type, user_id % 5 AS user_bucket,
           count(*) AS n, {osum('value')} AS sum_value
    FROM events GROUP BY CUBE (event_type, user_bucket)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE (event_type, user bucket) counts + fixed-point value sums."""
    t = Tables(spark, sf_dir)
    e = t.events.withColumn("user_bucket", F.col("user_id") % 5)
    return e.cube("event_type", "user_bucket").agg(
        F.count("*").alias("n"), dsum("value").alias("sum_value")
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(CAST(year(o_orderdate) AS BIGINT))), ',')
             AS order_years
    FROM orders GROUP BY o_custkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """collect_list + sort, serialized to CSV text.

    The array is joined to a scalar string because the driver's pandas
    canonicalizer cannot hash list-typed cells (round-1 red row).
    """
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_custkey").agg(
        F.array_join(
            F.sort_array(F.collect_list(F.year("o_orderdate").cast("bigint"))), ","
        ).alias("order_years")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """Per-flag stddev/variance/corr/covar — the statistical aggregate bank."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        r4(F.stddev_samp("l_quantity")).alias("sd_qty"),
        r4(F.var_samp("l_quantity")).alias("var_qty"),
        r4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        r4(F.covar_samp("l_quantity", "l_discount")).alias("cov_qty_disc"),
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentile_exact(spark, sf_dir):
    """Exact percentile (median, p90) of order totals per status."""
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderstatus").agg(
        r4(F.percentile("o_totalprice", 0.5)).alias("median_price"),
        r4(F.percentile("o_totalprice", 0.9)).alias("p90_price"),
    )


@query("agg_percentile_approx")  # rows-only: sketch-based, engine-specific
def agg_percentile_approx(spark, sf_dir):
    """percentile_approx median/p90 per status (sketch-based: rows-only)."""
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5).alias("approx_median"),
        F.percentile_approx("o_totalprice", 0.9).alias("approx_p90"),
    )


@query(
    "pivot_status_by_segment",
    oracle="""
    SELECT c_mktsegment,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS f_orders,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS o_orders,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS p_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_status_by_segment(spark, sf_dir):
    """pivot order status into per-segment count columns (NULL cells zeroed)."""
    t = Tables(spark, sf_dir)
    joined = t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
    piv = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for empty cells; the CASE-sum oracle yields 0
    return piv.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0)).alias("f_orders"),
        F.coalesce(F.col("O"), F.lit(0)).alias("o_orders"),
        F.coalesce(F.col("P"), F.lit(0)).alias("p_orders"),
    )


@query("agg_hll_sketch_union")  # rows-only: Datasketches HLL binaries
# are Spark-specific; the exact/rel_err columns make it self-auditing
def agg_hll_sketch_union(spark, sf_dir):
    """Mergeable-sketch rollup — THE at-scale distinct-count pattern:
    build one HLL sketch per nation (map-side, fixed-size binary),
    merge sketches up to region with hll_union_agg, estimate once.
    Re-aggregating a sketch tree is O(sketch bytes); re-counting raw
    keys at each rollup level is O(rows) per level. Emits the exact
    per-region distinct alongside for a self-contained error audit
    (asserted < 5% in tests/test_quality.py)."""
    t = Tables(spark, sf_dir)
    cust = t.customer.join(
        F.broadcast(t.nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    per_nation = cust.groupBy("n_regionkey", "n_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.countDistinct("c_custkey").alias("exact_n"),
    )
    region = per_nation.groupBy("n_regionkey").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_customers"),
        F.sum("exact_n").alias("exact_customers"),  # custkeys are disjoint
    )
    return region.join(
        F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(
        "r_name",
        "est_customers",
        "exact_customers",
        r4(
            F.abs(F.col("est_customers") - F.col("exact_customers"))
            / F.col("exact_customers")
        ).alias("rel_err"),
    )


@query(
    "agg_mode_per_group",
    oracle="""
    WITH c AS (
        SELECT c_mktsegment, o_orderpriority, count(*) AS n
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment, o_orderpriority
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY c_mktsegment
            ORDER BY n DESC, o_orderpriority
        ) AS rk
        FROM c
    )
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n AS mode_n
    FROM r WHERE rk = 1
    """,
)
def agg_mode_per_group(spark, sf_dir):
    """Statistical mode per group with a deterministic tiebreak
    (highest count, then lexical) via count → rank-1 window — the
    portable spelling of mode() whose tie behavior engines disagree
    on. Two-phase: the count aggregate is map-side partial; the window
    runs over group×value cardinality rows, not the fact table."""
    t = Tables(spark, sf_dir)
    c = (
        t.orders.join(
            F.broadcast(t.customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window as _Window

    w = _Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_n"),
        )
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    WITH words AS (
      SELECT o_orderstatus,
             o_custkey // 32 AS wrd,
             bit_or(1::BIGINT << CAST(o_custkey % 32 AS INT)) AS bits
      FROM orders GROUP BY o_orderstatus, o_custkey // 32
    )
    SELECT o_orderstatus,
           CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct_cust
    FROM words GROUP BY o_orderstatus
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """Exact COUNT DISTINCT via bitmap words — the roaring-bitmap OLAP
    recipe in pure built-ins: first aggregate ORs each key's bit into
    its 32-key word (map-side combine turns billions of key rows into
    ≤ keyspace/32 words per status; 32-bit words because DuckDB
    overflow-checks `1 << 63` while Spark wraps), second sums
    popcounts. The
    shuffle carries (status, word, 8 bytes) regardless of row count —
    compare `count_distinct`, whose first phase shuffles every
    distinct key. Trade-off honestly: wins when keys are dense
    integers (FK surrogate keys — this case); HLL (`approx_count_
    distinct`) is the sparse/high-cardinality twin."""
    t = Tables(spark, sf_dir)
    words = t.orders.groupBy(
        "o_orderstatus",
        F.expr("o_custkey div 32").alias("wrd"),
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(o_custkey % 32 AS INT))")
        ).alias("bits")
    )
    return words.groupBy("o_orderstatus").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct_cust")
    )


@query(
    "agg_argminmax",
    oracle="""
    WITH k AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             lpad(CAST(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)
                       AS VARCHAR), 14, '0')
               || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS ord_key
      FROM orders
    )
    SELECT o_orderstatus,
           arg_min(o_orderkey, ord_key) AS cheapest_order,
           arg_max(o_orderkey, ord_key) AS priciest_order,
           CAST(floor(min(o_totalprice) * 10000 + 0.5) AS BIGINT)
               / 10000.0 AS min_price,
           CAST(floor(max(o_totalprice) * 10000 + 0.5) AS BIGINT)
               / 10000.0 AS max_price
    FROM k GROUP BY o_orderstatus
    """,
)
def agg_argminmax(spark, sf_dir):
    """ARGMIN/ARGMAX (min_by / arg_min): which order is cheapest and
    priciest per status. Ties on the raw price are broken by a
    composite sort key — fixed-point price then orderkey, zero-padded
    so lexicographic order equals numeric order (neither engine's
    arg_min accepts a tuple key, and an untied key is the only way
    min_by is deterministic at all: Spark documents ties as
    arbitrary). Single partial+final aggregate, no window, no sort."""
    t = Tables(spark, sf_dir)
    ord_key = F.concat(
        F.lpad(F.floor(F.col("o_totalprice") * 10000 + 0.5).cast("long").cast("string"), 14, "0"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return (
        t.orders.withColumn("ord_key", ord_key)
        .groupBy("o_orderstatus")
        .agg(
            F.min_by("o_orderkey", F.col("ord_key")).alias("cheapest_order"),
            F.max_by("o_orderkey", F.col("ord_key")).alias("priciest_order"),
            (fixed(F.min("o_totalprice")) / 10000.0).alias("min_price"),
            (fixed(F.max("o_totalprice")) / 10000.0).alias("max_price"),
        )
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH b AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT) AS wf,
             sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT))
               OVER (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS cum,
             sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT))
               OVER (PARTITION BY l_returnflag) AS tot
      FROM lineitem
    )
    SELECT l_returnflag, round(min(price), 4) AS weighted_median_price
    FROM b WHERE 2 * cum >= tot
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Exact weighted median (quantity-weighted price per flag): the
    lower weighted median is the first price, in sorted order, whose
    running weight reaches half the total. All comparisons run on
    fixed-point LONG weights — the 2·cum ≥ tot boundary is integer-
    exact, so both engines pick the identical row even when the
    boundary lands mid-tie. One shuffle (the per-flag sort serves the
    running sum; the per-flag total reuses the same partitioning);
    at 100 TB swap the global sort for percentile_approx unless
    exactness is contractual."""
    t = Tables(spark, sf_dir)
    wf = fixed("l_quantity")
    w_run = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("l_returnflag")
    b = t.lineitem.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.sum(wf).over(w_run).alias("cum"),
        F.sum(wf).over(w_all).alias("tot"),
    )
    return (
        b.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.round(F.min("price"), 4).alias("weighted_median_price"))
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT l_orderkey) AS n_orders,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark, sf_dir):
    """Several COUNT(DISTINCT …) over different columns in one
    aggregate: Catalyst rewrites this with an Expand operator (one
    row per distinct-column per input row, tagged by gid) feeding a
    single two-phase aggregate — one shuffle total, instead of one
    join-merged aggregation per distinct column. The expansion
    multiplies shuffle rows by the distinct-count arity, which is the
    knob to watch at 100 TB: beyond ~3 distinct columns, switch the
    wide ones to approx_count_distinct."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_corr_exact",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qx,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS px
        FROM lineitem
    ),
    m AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(qx) AS DOUBLE) AS sx,
               CAST(sum(px) AS DOUBLE) AS sy,
               CAST(sum(qx * qx) AS DOUBLE) AS sxx,
               CAST(sum(px * px) AS DOUBLE) AS syy,
               CAST(sum(qx * px) AS DOUBLE) AS sxy
        FROM s GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           floor((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                 * 1000000 + 0.5) / 1000000.0 AS corr_qty_price
    FROM m
    """,
)
def agg_corr_exact(spark, sf_dir):
    """Pearson correlation (quantity vs price per return flag) that is
    EXACT across engines — native corr() accumulates doubles in
    schedule-dependent order, so its low bits differ run to run and
    engine to engine. Instead: all five moments are integer sums of
    fixed-point values (scale 100 — exact for 2-decimal money), summed
    as DECIMAL(38,0)/HUGEINT (overflow-proof at any corpus size), cast
    once to double, then one mirrored IEEE expression tree produces
    the coefficient. One partial+final hash aggregate, no window, no
    second pass; the shuffle carries 6 longs per group."""
    t = Tables(spark, sf_dir)
    qx = F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")
    px = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    dec = "decimal(38,0)"
    s = t.lineitem.select(
        "l_returnflag", qx.alias("qx"), px.alias("px")
    )
    m = s.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum((F.col("qx")).cast(dec)).cast("double").alias("sx"),
        F.sum((F.col("px")).cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("qx") * F.col("qx")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("px") * F.col("px")).cast(dec)).cast("double").alias("syy"),
        F.sum((F.col("qx") * F.col("px")).cast(dec)).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ) * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return m.select(
        "l_returnflag",
        (F.floor(num / den * 1000000 + 0.5) / 1000000.0).alias(
            "corr_qty_price"
        ),
    )


def _cms_pos():
    """Portable CMS cell hash: conv(md5-prefix) — Spark
    ``conv(substr(md5(k||':'||r),1,15),16,10)`` is bit-identical to
    DuckDB ``('0x'||substr(md5(…),1,15))::BIGINT`` (60-bit value, no
    sign issues), which is what upgraded this op from rows-only to
    hash-checked (r7). xxhash64 would be ~3× cheaper per row but is
    Spark-only; a production build on one engine would use it."""
    key = F.concat(
        F.col("user_id").cast("string"), F.lit(":"), F.col("r").cast("string")
    )
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"),
        F.lit(CMS_WIDTH),
    )


#: Count-Min geometry: depth 4 × width 64.  Width is deliberately
#: SMALLER than the key cardinality at test scale so collisions (and
#: therefore visible overcounts) actually occur — the est ≥ exact
#: one-sided error is property-tested in tests/test_properties.py.
CMS_DEPTH, CMS_WIDTH = 4, 64


@query(
    "agg_cms_frequency",
    oracle="""
    WITH r AS (SELECT unnest(generate_series(0, 3)) AS r),
    cells AS (
        SELECT r.r,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                                   || CAST(r.r AS VARCHAR)), 1, 15))::BIGINT
                   % 64 AS pos
        FROM events, r
    ),
    sketch AS (SELECT r, pos, count(*) AS c FROM cells GROUP BY r, pos),
    exact AS (SELECT user_id, count(*) AS exact
              FROM events GROUP BY user_id),
    probes AS (
        SELECT user_id, exact, r.r,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                                   || CAST(r.r AS VARCHAR)), 1, 15))::BIGINT
                   % 64 AS pos
        FROM exact, r
    )
    SELECT user_id, min(c) AS est, exact,
           min(c) - exact AS overcount
    FROM probes JOIN sketch USING (r, pos)
    GROUP BY user_id, exact
    """,
)
def agg_cms_frequency(spark, sf_dir):
    """Count-Min sketch frequency estimation: build a d×w counter grid
    over the event stream's user_id traffic, then answer per-key
    frequency queries from the SKETCH (min over d hashed counters) —
    the fixed-memory substitute for exact per-key counts when the key
    space is unbounded (IPs, URLs, session ids).

    Distributed build: each event contributes +1 to d (row, hash(key,
    row) mod w) cells — a groupBy on the d×w cell space, so the
    shuffle carries AT MOST d·w rows per map partition regardless of
    input size; the finished sketch is d·w longs (2 KB here) however
    large the stream. Estimates join the candidate keys' d probe cells
    back against the sketch and take the min — one broadcast join.
    Exact counts ride along for the audit columns; CMS guarantees
    est ≥ exact (one-sided), with overshoot bounded by ε·N for
    w = ⌈e/ε⌉ at confidence 1−(1/2)^d. Width 64 < |keys| here forces
    real collisions so the audit is non-vacuous. A production heavy-
    hitter query filters est ≥ φ·N on the sketch alone; the full
    per-key audit here exists to exhibit the one-sided error."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id")
    rows = F.array(*[F.lit(r) for r in range(CMS_DEPTH)])
    cells = ev.select(
        F.explode(rows).alias("r"), F.col("user_id")
    ).select("r", _cms_pos().alias("pos"))
    sketch = cells.groupBy("r", "pos").agg(F.count("*").alias("c"))

    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact"))
    probes = exact.select(
        "user_id",
        "exact",
        F.explode(rows).alias("r"),
    ).select("user_id", "exact", "r", _cms_pos().alias("pos"))
    est = (
        probes.join(F.broadcast(sketch), ["r", "pos"])
        .groupBy("user_id", "exact")
        .agg(F.min("c").alias("est"))
    )
    return est.select(
        "user_id",
        "est",
        "exact",
        (F.col("est") - F.col("exact")).alias("overcount"),
    )


@query(
    "agg_moments_skew_kurtosis",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CAST(CAST(floor(value * 10000 + 0.5) AS BIGINT) AS HUGEINT)
                   AS v
        FROM events
    ),
    s AS (
        SELECT event_type, count(*) AS n,
               sum(v) AS s1, sum(v * v) AS s2,
               sum(v * v * v) AS s3, sum(v * v * v * v) AS s4
        FROM x GROUP BY event_type
    ),
    d AS (
        SELECT event_type, n,
               CAST(n AS DOUBLE) AS nn,
               CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
               CAST(s3 AS DOUBLE) AS d3, CAST(s4 AS DOUBLE) AS d4
        FROM s
    ),
    m AS (
        SELECT event_type, n,
               (d2 - d1 * d1 / nn) / nn AS m2,
               (d3 - 3 * d1 * d2 / nn + 2 * d1 * d1 * d1 / (nn * nn)) / nn
                   AS m3,
               (d4 - 4 * d1 * d3 / nn + 6 * d1 * d1 * d2 / (nn * nn)
                   - 3 * d1 * d1 * d1 * d1 / (nn * nn * nn)) / nn AS m4
        FROM d
    )
    SELECT event_type, n,
           floor(m3 / (m2 * sqrt(m2)) * 10000 + 0.5) / 10000.0 AS skewness,
           floor((m4 / (m2 * m2) - 3) * 10000 + 0.5) / 10000.0
               AS excess_kurtosis
    FROM m WHERE m2 > 0
    """,
)
def agg_moments_skew_kurtosis(spark, sf_dir):
    """Population skewness and excess kurtosis per event type, computed
    from EXACT integer power sums — the engines' built-in skewness()/
    kurtosis() disagree on bias correction AND on float accumulation
    order, so the built-ins are unusable cross-engine; raw moments are
    not.

    Σx..Σx⁴ accumulate in 128-bit integer space (DECIMAL(38,0) /
    HUGEINT: x ≤ 5·10⁶ in fixed-point units → Σx⁴ ≲ 10³² « 10³⁸),
    which is merge-order-proof like every fixed-point sum in this
    repo; the central-moment algebra then runs in doubles with the
    SAME operation order both sides (sqrt not pow — IEEE sqrt is
    correctly rounded, pow is not guaranteed). One hash aggregate,
    map-side combined; the moment algebra costs nothing at any
    scale."""
    t = Tables(spark, sf_dir)
    x = t.events.select(
        "event_type", fixed("value").cast("decimal(38,0)").alias("v")
    )
    v = F.col("v")
    s = x.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    nn = F.col("n").cast("double")
    d1, d2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    d3, d4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    m2 = (d2 - d1 * d1 / nn) / nn
    m3 = (d3 - 3 * d1 * d2 / nn + 2 * d1 * d1 * d1 / (nn * nn)) / nn
    m4 = (
        d4
        - 4 * d1 * d3 / nn
        + 6 * d1 * d1 * d2 / (nn * nn)
        - 3 * d1 * d1 * d1 * d1 / (nn * nn * nn)
    ) / nn
    return (
        s.select(
            "event_type",
            "n",
            m2.alias("m2"),
            m3.alias("m3"),
            m4.alias("m4"),
        )
        .filter(F.col("m2") > 0)
        .select(
            "event_type",
            "n",
            (F.floor(F.col("m3") / (F.col("m2") * F.sqrt("m2")) * 10000 + 0.5)
             / 10000.0).alias("skewness"),
            (F.floor((F.col("m4") / (F.col("m2") * F.col("m2")) - 3) * 10000
                     + 0.5) / 10000.0).alias("excess_kurtosis"),
        )
    )


@query(
    "agg_weighted_mean",
    oracle="""
    WITH x AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT) AS p_fp,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(sum(q) AS BIGINT) AS total_qty,
           CAST(sum(p_fp * q) AS BIGINT) / 10000.0 / CAST(sum(q) AS BIGINT)
               AS wavg_price
    FROM x GROUP BY l_returnflag
    """,
)
def agg_weighted_mean(spark, sf_dir):
    """Quantity-weighted mean price per return flag — the weighted
    average that a plain avg() silently gets wrong (unit price and
    volume are correlated), computed exactly: quantities are whole
    numbers (cast BIGINT exactly), prices fixed-point, so Σ(p·q) is
    pure integer arithmetic (≤ 10⁹·50·|rows| « 2⁶³ at any tested
    scale) and ONE double division at the end is the only float op —
    both engines divide identical integers. Map-side-combined hash
    aggregate; nothing but the 3-row result leaves the executors."""
    t = Tables(spark, sf_dir)
    x = t.lineitem.select(
        "l_returnflag",
        fixed("l_extendedprice").alias("p_fp"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    return x.groupBy("l_returnflag").agg(
        F.sum("q").cast("bigint").alias("total_qty"),
        (
            F.sum(F.col("p_fp") * F.col("q")).cast("bigint")
            / 10000.0
            / F.sum("q").cast("bigint")
        ).alias("wavg_price"),
    )


@query("agg_hll_precision_sweep")  # rows-only: estimator internals
def agg_hll_precision_sweep(spark, sf_dir):
    """approx_count_distinct at three precision settings (rsd 0.01 /
    0.05 / 0.1) against the exact distinct count of l_partkey — the
    calibration table an engine publishes so users can pick the
    memory/accuracy point (HLL++ register count grows ~1/rsd²).

    r17 (guide §2.3): mixing countDistinct with the approx trio in ONE
    agg makes Catalyst's distinct-rewrite group the approx PARTIALS by
    the distinct key — every distinct l_partkey carried 1705 flattened
    HLL register columns (~13 KB/key) through the first exchange
    (plans/r17/agg_hll_precision_sweep_before.txt node (2)). Split:
    the approx trio is a plain 2-stage agg (one sketch set per
    partition), exact distinct is its own 2-stage count, and the two
    1-row results cross-join. HLL sketches are hash-deterministic and
    merge order-insensitively, so the values are identical.

    The relative-error audit |est − exact| / exact ≤ 3·rsd is
    pytest-gated per precision in tests/test_properties.py — a bound
    loose enough to be stable and tight enough to catch a mis-wired
    precision knob."""
    t = Tables(spark, sf_dir)
    c = F.col("l_partkey")
    li = t.lineitem.where(c.isNotNull())
    exact = (
        li.select(c.alias("pk"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    )
    approx = li.agg(
        F.approx_count_distinct(c, 0.01).alias("est_rsd_001"),
        F.approx_count_distinct(c, 0.05).alias("est_rsd_005"),
        F.approx_count_distinct(c, 0.10).alias("est_rsd_010"),
    )
    return exact.crossJoin(approx)


@query(
    "agg_grouping_id_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, '__ALL__') AS flag,
           coalesce(l_linestatus, '__ALL__') AS status,
           CAST(CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END
                + CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id_rollup(spark, sf_dir):
    """ROLLUP with grouping_id(): the bitmask that tells subtotal rows
    apart from data rows — indispensable the moment a grouping column
    can itself be NULL (coalesce alone can't distinguish 'NULL flag'
    from 'all flags'; the id can). Spark emits grouping_id() natively;
    the oracle reconstructs the same bitmask from the rollup's NULL
    pattern (valid here because the grouping keys are non-null in the
    data — exactly the situation where the two encodings agree, which
    the hash verifies).

    Same single Expand + hash aggregate as every grouping-sets query
    — the id column is metadata, not an extra pass."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("__ALL__")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("__ALL__")).alias("status"),
            "gid",
            "n",
        )
    )


@query(
    "agg_minmax_scaling",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(min(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS mn,
               CAST(max(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS mx
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CASE WHEN mx > mn THEN
               floor(CAST(CAST(floor(e.value * 10000 + 0.5) AS BIGINT) - mn
                          AS DOUBLE) / (mx - mn) * 1000000 + 0.5) / 1000000.0
           END AS value_scaled
    FROM events e JOIN b ON e.event_type = b.event_type
    """,
)
def agg_minmax_scaling(spark, sf_dir):
    """Per-group min-max normalization to [0,1] — the feature-scaling
    primitive of an ML prep pipeline, grouped by event type so each
    signal normalizes against its own range. Bounds come from one
    fixed-point aggregate broadcast back onto the stream (the same
    two-pass-one-shuffle shape as dq_outlier_iqr); the scaled value
    divides exact integers, floored at 6 dp. Degenerate groups
    (mx = mn) emit NULL rather than a divide-by-zero."""
    t = Tables(spark, sf_dir)
    b = t.events.groupBy("event_type").agg(
        F.min(fixed("value")).cast("bigint").alias("mn"),
        F.max(fixed("value")).cast("bigint").alias("mx"),
    )
    scaled = (fixed("value") - F.col("mn")).cast("double") / (
        F.col("mx") - F.col("mn")
    )
    return (
        t.events.join(F.broadcast(b), "event_type")
        .select(
            "event_id",
            "event_type",
            F.when(
                F.col("mx") > F.col("mn"),
                F.floor(scaled * 1000000 + 0.5) / 1000000.0,
            ).alias("value_scaled"),
        )
    )


@query(
    "agg_mode_categorical",
    oracle="""
    WITH c AS (
        SELECT c_mktsegment, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
    ),
    r AS (
        SELECT *, row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY n DESC, o_orderpriority) AS rn,
               CAST(count(*) FILTER (WHERE TRUE) OVER (
                   PARTITION BY c_mktsegment, n) AS BIGINT) AS n_at_count
        FROM c
    )
    SELECT c_mktsegment,
           o_orderpriority AS modal_priority,
           n AS modal_count,
           n_at_count AS n_tied
    FROM r WHERE rn = 1
    """,
)
def agg_mode_categorical(spark, sf_dir):
    """Exact categorical mode per group — modal order priority per
    market segment — with a DETERMINISTIC tie-break and a tie count.

    Both Spark (3.4+) and DuckDB ship a built-in ``mode()`` aggregate,
    but neither defines tie order (Spark picks an arbitrary hash-map
    winner, DuckDB first-seen), so the built-ins can disagree run to
    run AND engine to engine — unusable under a value-hash contract.
    The portable pattern: count per (group, value), then
    ``row_number() OVER (ORDER BY n DESC, value)`` — one extra window
    over the (already tiny) count table, fully deterministic, and it
    exposes ``n_tied`` (how many values share the modal count), which
    the built-ins silently discard.

    Scale: the count aggregate reduces the fact table to
    |groups × distinct values| rows before the window — the window
    never sees fact-table cardinality."""
    t = Tables(spark, sf_dir)
    c = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("n"), "o_orderpriority"
    )
    wt = Window.partitionBy("c_mktsegment", "n")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .withColumn("n_tied", F.count("*").over(wt).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("n").alias("modal_count"),
            "n_tied",
        )
    )


#: HLL-portable geometry: m=64 buckets, 32-bit rank window, rank via
#: TRAILING zeros (same geometric law as leading zeros, but the lowest
#: set bit v & -v is an exact power of two — rank extraction becomes an
#: integer array lookup, no log2 anywhere)
HLLP_M = 64
HLLP_POWERS = [1 << k for k in range(33)]  # 2^0 .. 2^32
#: alpha_64 = 0.709; estimate×1e4 = (709·m²·10)·2^33 / Σterms — the
#: constant folds to ONE int64-safe literal so the whole estimator is
#: exact integer division (709·4096·10·2^33 ≈ 2.5e17 < 2^63)
HLLP_NUM = 709 * HLLP_M * HLLP_M * 10 * (1 << 33)


@query(
    "agg_hll_portable",
    oracle=f"""
    WITH h AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   ::BIGINT AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, hv % {HLLP_M} AS bucket,
               CASE WHEN (hv // {HLLP_M}) % 4294967296 = 0 THEN 33
                    ELSE list_position(
                        [{", ".join(str(p) for p in HLLP_POWERS)}]
                            ::BIGINT[],
                        ((hv // {HLLP_M}) % 4294967296)
                        & -((hv // {HLLP_M}) % 4294967296))
               END AS rnk
        FROM h
    ),
    regs AS (
        SELECT event_type, bucket, max(rnk) AS reg
        FROM ranked GROUP BY event_type, bucket
    ),
    sums AS (
        SELECT event_type,
               sum(1::BIGINT << (33 - reg))
                   + (({HLLP_M} - count(*))::BIGINT << 33) AS sum_terms,
               {HLLP_M} - count(*) AS n_empty
        FROM regs GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    )
    SELECT s.event_type,
           CAST({HLLP_NUM} // sum_terms AS BIGINT) AS estimate_x1e4,
           CAST(sum_terms AS BIGINT) AS sum_terms,
           CAST(n_empty AS BIGINT) AS n_empty_buckets,
           CAST(exact_distinct AS BIGINT) AS exact_distinct
    FROM sums s JOIN exact e ON s.event_type = e.event_type
    """,
)
def agg_hll_portable(spark, sf_dir):
    """HyperLogLog with the sketch ITSELF hash-checked — the answer to
    "approx ops can't be oracle-pinned" (agg_approx_count_distinct
    stays rows-only because Spark's sketch seeds are engine-private;
    THIS sketch's every bit is engine-portable):

    - portable md5-conv 60-bit hash of the key (CLAUDE.md recipe);
    - m=64 buckets from the low bits, rank from a 32-bit window via
      TRAILING zeros — the lowest set bit ``w & -w`` is an exact power
      of two, so rank extraction is an integer array-position lookup
      (leading-zero rho would need log2; Spark's LOG2 is
      Math.log(x)/Math.log(2) and is NOT exact at powers of two);
    - the harmonic estimator folds to EXACT INTEGERS end-to-end:
      Σ 2^(-reg) is scaled by 2^33 so every term is an int64
      (2^(33-reg), empty buckets contribute 2^33), and
      alpha·m²·1e4 = 709·4096·10 merges with the scale into ONE
      in-range numerator literal — the published estimate is a single
      BIGINT division. No float exists anywhere in the pipeline.

    Emits the fixed-point estimate, the raw register sum, the empty-
    bucket count, and the exact distinct for visible relative error
    (1.04/√m ≈ 13% standard error at m=64; the small-cardinality
    linear-counting correction is DELIBERATELY omitted — it needs ln,
    whose last-ulp rounding is engine-unportable — so below ~2.5m the
    raw estimator reads high, ~20% on this corpus's 150-user groups;
    n_empty_buckets is emitted precisely so a consumer can apply any
    correction downstream). Scale: the sketch is a 64-row register
    table per group — the mergeable-state shape that makes HLL the
    100 TB distinct-counter; the groupBy(bucket) pass is one
    map-side-combinable shuffle of (type, bucket, max-rank)."""
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("user_id").isNotNull())
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    powers = "array(" + ", ".join(f"{p}L" for p in HLLP_POWERS) + ")"
    ranked = ev.select(
        "event_type", (hv % HLLP_M).alias("bucket"), hv.alias("hv")
    ).select(
        "event_type",
        "bucket",
        F.expr(
            f"""CASE WHEN (hv div {HLLP_M}) % 4294967296 = 0 THEN 33
            ELSE array_position({powers},
                 ((hv div {HLLP_M}) % 4294967296)
                 & -((hv div {HLLP_M}) % 4294967296)) END"""
        ).cast("long").alias("rnk"),
    )
    regs = ranked.groupBy("event_type", "bucket").agg(
        F.max("rnk").alias("reg")
    )
    sums = regs.groupBy("event_type").agg(
        (
            F.sum(F.expr("shiftleft(1L, cast(33 - reg as int))"))
            + F.expr(
                f"shiftleft(cast({HLLP_M} - count(*) as bigint), 33)"
            )
        ).alias("sum_terms"),
        (F.lit(HLLP_M) - F.count(F.lit(1))).cast("bigint").alias(
            "n_empty_buckets"
        ),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return sums.join(exact, "event_type").select(
        "event_type",
        F.expr(f"{HLLP_NUM}L div sum_terms").cast("bigint").alias(
            "estimate_x1e4"
        ),
        F.col("sum_terms").cast("bigint").alias("sum_terms"),
        "n_empty_buckets",
        "exact_distinct",
    )


@query(
    "agg_hll_portable_union",
    oracle=f"""
    WITH h AS (
        SELECT event_type, event_id % 2 AS shard,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   ::BIGINT AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, shard, hv % {HLLP_M} AS bucket,
               CASE WHEN (hv // {HLLP_M}) % 4294967296 = 0 THEN 33
                    ELSE list_position(
                        [{", ".join(str(p) for p in HLLP_POWERS)}]
                            ::BIGINT[],
                        ((hv // {HLLP_M}) % 4294967296)
                        & -((hv // {HLLP_M}) % 4294967296))
               END AS rnk
        FROM h
    ),
    shard_regs AS (
        SELECT event_type, shard, bucket, max(rnk) AS reg
        FROM ranked GROUP BY event_type, shard, bucket
    ),
    merged AS (  -- sketch UNION = per-bucket max over shard registers
        SELECT event_type, bucket, max(reg) AS reg
        FROM shard_regs GROUP BY event_type, bucket
    ),
    direct AS (
        SELECT event_type, bucket, max(rnk) AS reg
        FROM ranked GROUP BY event_type, bucket
    ),
    est_m AS (
        SELECT event_type,
               {HLLP_NUM} // (sum(1::BIGINT << (33 - reg))
                   + (({HLLP_M} - count(*))::BIGINT << 33)) AS e
        FROM merged GROUP BY event_type
    ),
    est_d AS (
        SELECT event_type,
               {HLLP_NUM} // (sum(1::BIGINT << (33 - reg))
                   + (({HLLP_M} - count(*))::BIGINT << 33)) AS e
        FROM direct GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(m.e AS BIGINT) AS merged_estimate_x1e4,
           CAST(d.e AS BIGINT) AS direct_estimate_x1e4,
           m.e = d.e AS lossless_merge
    FROM est_m m JOIN est_d d ON m.event_type = d.event_type
    """,
)
def agg_hll_portable_union(spark, sf_dir):
    """Sketch MERGEABILITY, hash-pinned: the events stream splits into
    two shards (event_id parity — the distributed-partial shape), each
    shard builds its own portable-HLL register table, the shard
    sketches UNION by per-bucket max, and the merged estimate must
    equal the single-pass estimate EXACTLY — max-merge is lossless for
    HLL registers, which is the whole reason the sketch works as
    distributed partial state at 100 TB (combine on any tree shape,
    same answer). Both estimates and the equality flag are in the
    hashed output, and everything is exact integers end-to-end
    (see agg_hll_portable), so 'lossless' is an oracle-verified
    claim, not a test assertion."""
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("user_id").isNotNull())
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    powers = "array(" + ", ".join(f"{p}L" for p in HLLP_POWERS) + ")"
    ranked = ev.select(
        "event_type",
        (F.col("event_id") % 2).alias("shard"),
        (hv % HLLP_M).alias("bucket"),
        hv.alias("hv"),
    ).select(
        "event_type",
        "shard",
        "bucket",
        F.expr(
            f"""CASE WHEN (hv div {HLLP_M}) % 4294967296 = 0 THEN 33
            ELSE array_position({powers},
                 ((hv div {HLLP_M}) % 4294967296)
                 & -((hv div {HLLP_M}) % 4294967296)) END"""
        ).cast("long").alias("rnk"),
    )
    shard_regs = ranked.groupBy("event_type", "shard", "bucket").agg(
        F.max("rnk").alias("reg")
    )
    merged = shard_regs.groupBy("event_type", "bucket").agg(
        F.max("reg").alias("reg")
    )
    direct = ranked.groupBy("event_type", "bucket").agg(
        F.max("rnk").alias("reg")
    )

    def estimate(regs, name):
        return regs.groupBy("event_type").agg(
            F.expr(
                f"""{HLLP_NUM}L div (sum(shiftleft(1L,
                cast(33 - reg as int)))
                + shiftleft(cast({HLLP_M} - count(*) as bigint), 33))"""
            ).cast("bigint").alias(name)
        )

    em = estimate(merged, "merged_estimate_x1e4")
    ed = estimate(direct, "direct_estimate_x1e4")
    return em.join(ed, "event_type").select(
        "event_type",
        "merged_estimate_x1e4",
        "direct_estimate_x1e4",
        (
            F.col("merged_estimate_x1e4") == F.col("direct_estimate_x1e4")
        ).alias("lossless_merge"),
    )


#: KMV-sample size for the portable percentile sketch
PCTK_K = 256


@query(
    "agg_percentile_sketch_portable",
    oracle=f"""
    WITH h AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                                   CAST(l_linenumber AS VARCHAR)), 1, 15)
               )::BIGINT AS hk
        FROM lineitem
    ),
    keep AS (
        SELECT flag, v FROM (
            SELECT flag, v,
                   row_number() OVER (PARTITION BY flag
                                      ORDER BY hk, v) AS rn
            FROM h
        ) WHERE rn <= {PCTK_K}
    ),
    s AS (
        SELECT flag, list_sort(list(v)) AS arr, count(*) AS n
        FROM keep GROUP BY flag
    )
    SELECT flag, CAST(q.q AS BIGINT) AS q_pct, CAST(n AS BIGINT) AS n_sample,
           arr[((n - 1) * q.q) // 100 + 1] AS est
    FROM s, (SELECT unnest([20, 50, 80]) AS q) q
    """,
)
def agg_percentile_sketch_portable(spark, sf_dir):
    """APPROXIMATE percentiles that hash-match the oracle bit-for-bit
    — the percentile twin of agg_hll_portable (that one proved
    "approximate" and "reproducible" are orthogonal for distinct
    counts; this one proves it for quantiles, the other rows-only-by-
    design §2 boundary). Two deterministic stages:

    1. KMV sample: per group keep the {PCTK_K} rows with the SMALLEST
       portable 60-bit md5 hash of the row key — a uniform sample
       BOTH engines derive identically (no RNG, no engine sketch),
       and mergeable state: the union of per-partition bottom-k sets
       re-cut to k is the group's bottom-k, the same combine shape
       percentile_approx's KLL sketch uses at 100 TB.
    2. Type-1 (lower-rank) discrete quantile over the sorted sample:
       index = (n−1)·q_pct div 100 — ALL-INTEGER rank arithmetic and
       pure element selection, no interpolation float whose last ulp
       engines could round apart.

    The engine-private percentile_approx stays rows-only next to
    this (agg_percentile_approx); accuracy is the standard KMV bound
    (~1/√k ≈ 6% rank error at k={PCTK_K}), traded for cross-engine
    replayability."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    hk = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    base = t.lineitem.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        hk.alias("hk"),
    )
    # ORDER BY (hk, v), not hk alone: the corpus contains duplicate
    # (l_orderkey, l_linenumber) rows, so hk has ~5k ties at sf0.01 —
    # a tie group straddling the k-boundary makes row_number's pick
    # engine- AND run-nondeterministic (the REAL cause of the r13
    # official hash-fail; it passed locally because the flake needs a
    # tie at the boundary). Adding v gives a total order over kept
    # MULTISETS: rows identical in (flag, hk, v) are interchangeable.
    w = Window.partitionBy("flag").orderBy("hk", "v")
    keep = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PCTK_K)
        .select("flag", "v")
    )
    s = keep.groupBy("flag").agg(
        F.sort_array(F.collect_list("v")).alias("arr"),
        F.count(F.lit(1)).alias("n"),
    )
    # BIGINT, not the int32 F.lit default: int32 output columns are the
    # documented driver-canonicalizer FAIL class (r13's one red row).
    qs = F.explode(
        F.array(*[F.lit(q).cast("bigint") for q in (20, 50, 80)])
    )
    return s.select("flag", qs.alias("q_pct"), "arr", "n").select(
        "flag",
        "q_pct",
        F.col("n").cast("bigint").alias("n_sample"),
        F.expr(
            "element_at(arr, CAST(((n - 1) * q_pct) div 100 AS INT) + 1)"
        ).alias("est"),
    )


@query(
    "agg_percentile_sketch_union",
    oracle=f"""
    WITH h AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               l_orderkey % 2 AS shard,
               ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                                   CAST(l_linenumber AS VARCHAR)), 1, 15)
               )::BIGINT AS hk
        FROM lineitem
    ),
    skeep AS (
        SELECT flag, v, hk FROM (
            SELECT flag, v, hk,
                   row_number() OVER (PARTITION BY flag, shard
                                      ORDER BY hk, v) AS rn
            FROM h
        ) WHERE rn <= {PCTK_K}
    ),
    merged AS (
        SELECT flag, v FROM (
            SELECT flag, v,
                   row_number() OVER (PARTITION BY flag
                                      ORDER BY hk, v) AS rn
            FROM skeep
        ) WHERE rn <= {PCTK_K}
    ),
    direct AS (
        SELECT flag, v FROM (
            SELECT flag, v,
                   row_number() OVER (PARTITION BY flag
                                      ORDER BY hk, v) AS rn
            FROM h
        ) WHERE rn <= {PCTK_K}
    ),
    ms AS (
        SELECT flag, list_sort(list(v)) AS arr, count(*) AS n
        FROM merged GROUP BY flag
    ),
    ds AS (
        SELECT flag, list_sort(list(v)) AS arr, count(*) AS n
        FROM direct GROUP BY flag
    )
    SELECT ms.flag, CAST(q.q AS BIGINT) AS q_pct,
           ms.arr[((ms.n - 1) * q.q) // 100 + 1] AS est_merged,
           ds.arr[((ds.n - 1) * q.q) // 100 + 1] AS est_direct,
           ms.arr[((ms.n - 1) * q.q) // 100 + 1]
               = ds.arr[((ds.n - 1) * q.q) // 100 + 1] AS lossless_merge
    FROM ms JOIN ds ON ms.flag = ds.flag,
         (SELECT unnest([20, 50, 80]) AS q) q
    """,
)
def agg_percentile_sketch_union(spark, sf_dir):
    """KMV-quantile MERGEABILITY, hash-pinned — the quantile analogue
    of agg_hll_portable_union (r13 verdict #8, proof shape from
    sample_bottom_k_sketch): rows split into two shards (l_orderkey
    parity — the distributed-partial shape), each shard keeps its own
    bottom-{PCTK_K} sample per group, the shard partials UNION and
    re-cut to the {PCTK_K} smallest, and the percentile estimated from
    the merged sample must equal the single-pass estimate EXACTLY.
    Why that holds: every member of the group's global bottom-k is by
    definition within its own shard's bottom-k, so the re-cut union
    loses nothing — the same combine-on-any-tree-shape property that
    makes KLL/t-digest partials work as distributed aggregation state
    at 100 TB. Both estimates and the equality flag are in the hashed
    output, so 'lossless' is oracle-verified, not asserted.

    Ordering is (hk, v) on BOTH cuts and BOTH engines — the corpus has
    duplicate (l_orderkey, l_linenumber) rows, so hk alone has ties
    and a boundary-straddling tie makes the kept set nondeterministic
    (the r13 agg_percentile_sketch_portable hash-fail, fixed r14)."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    hk = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    base = t.lineitem.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") % 2).alias("shard"),
        hk.alias("hk"),
    )
    w_shard = Window.partitionBy("flag", "shard").orderBy("hk", "v")
    w_flag = Window.partitionBy("flag").orderBy("hk", "v")

    def cut(df, w):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= PCTK_K)
            .drop("rn")
        )

    skeep = cut(base, w_shard).select("flag", "v", "hk")
    merged = cut(skeep, w_flag).select("flag", "v")
    direct = cut(base, w_flag).select("flag", "v")

    def sample(df, est_name):
        s = df.groupBy("flag").agg(
            F.sort_array(F.collect_list("v")).alias("arr"),
            F.count(F.lit(1)).alias("n"),
        )
        qs = F.explode(
            F.array(*[F.lit(q).cast("bigint") for q in (20, 50, 80)])
        )
        return s.select("flag", qs.alias("q_pct"), "arr", "n").select(
            "flag",
            "q_pct",
            F.expr(
                "element_at(arr, CAST(((n - 1) * q_pct) div 100 AS INT)"
                " + 1)"
            ).alias(est_name),
        )

    m = sample(merged, "est_merged")
    d = sample(direct, "est_direct")
    return m.join(d, ["flag", "q_pct"]).select(
        "flag",
        "q_pct",
        "est_merged",
        "est_direct",
        (F.col("est_merged") == F.col("est_direct")).alias(
            "lossless_merge"
        ),
    )
