"""§2.6 Sorts / limits / top-k.

Spark compiles orderBy().limit(n) to TakeOrderedAndProject: each
partition keeps its local top-n, the driver merges — no global sort,
no full shuffle. That plan shape is exactly what survives at 100 TB;
verified in tests/test_plans.py. Every LIMIT query carries a unique
tiebreaker so the row set is deterministic (SURVEY §2 notes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi_key(spark, sf_dir):
    """Multi-key ORDER BY (status asc, price desc, key asc) with LIMIT."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@query(
    "sort_nulls_first_last",
    oracle="""
    (SELECT 'nulls_first' AS mode, o_orderkey, p
     FROM (SELECT o_orderkey,
                  CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS p
           FROM orders)
     ORDER BY p ASC NULLS FIRST, o_orderkey LIMIT 50)
    UNION ALL
    (SELECT 'nulls_last' AS mode, o_orderkey, p
     FROM (SELECT o_orderkey,
                  CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS p
           FROM orders)
     ORDER BY p ASC NULLS LAST, o_orderkey LIMIT 50)
    """,
)
def sort_nulls_first_last(spark, sf_dir):
    """NULLS FIRST vs NULLS LAST orderings, tagged and unioned."""
    t = Tables(spark, sf_dir)
    base = t.orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("p"),
    )
    nf = (
        base.orderBy(F.col("p").asc_nulls_first(), F.col("o_orderkey"))
        .limit(50)
        .select(F.lit("nulls_first").alias("mode"), "o_orderkey", "p")
    )
    nl = (
        base.orderBy(F.col("p").asc_nulls_last(), F.col("o_orderkey"))
        .limit(50)
        .select(F.lit("nulls_last").alias("mode"), "o_orderkey", "p")
    )
    return nf.unionByName(nl)


@query(
    "topk_global",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def topk_global(spark, sf_dir):
    """Global top-20 by price via orderBy+limit (TakeOrderedAndProject exhibit)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select(
            "l_orderkey",
            F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
            "l_extendedprice",
        )
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(20)
    )


@query(
    "topk_per_group_agg",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY coalesce(CAST(floor(o_totalprice * 10000 + 0.5)
                                    AS BIGINT), -4611686018427387904)
                   DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def topk_per_group_agg(spark, sf_dir):
    """Top-3 orders per customer WITHOUT a window sort: collect each
    group's (price, key) pairs into an array aggregate, sort and
    slice k per group. Same result as the row_number formulation
    (the oracle), different physical plan: one hash aggregate instead
    of shuffle+sort+window — wins when groups are small and k is tiny
    (the aggregate buffer holds ≤ group rows, map-side combine
    pre-shrinks), loses when a single group can exceed memory; pick
    per workload. Sort key is (−fixed_price, orderkey) on BOTH sides —
    the oracle ranks by the same fixed-point expression, so two prices
    within 5e-5 of each other tie (and fall back to o_orderkey)
    identically in both engines."""
    t = Tables(spark, sf_dir)
    # NULL price ranks LAST on both engines: coalesce the fixed-point
    # key to -2^62 before negating (struct-sort NULL placement and SQL
    # DESC NULL placement would otherwise disagree; r10 stress corpus)
    item = F.struct(
        (
            -F.coalesce(
                F.floor(F.col("o_totalprice") * 10000 + 0.5).cast("long"),
                F.lit(-4611686018427387904),
            )
        ).alias("neg_pf"),
        F.col("o_orderkey").alias("k"),
    )
    top3 = F.slice(F.sort_array(F.collect_list(item)), 1, 3)
    return (
        t.orders.groupBy("o_custkey")
        .agg(top3.alias("top"))
        .select(
            "o_custkey",
            F.posexplode("top").alias("pos", "item"),
        )
        .select(
            "o_custkey",
            F.col("item.k").alias("o_orderkey"),
            (F.col("pos") + 1).cast("bigint").alias("rn"),
        )
    )
