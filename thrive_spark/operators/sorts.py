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
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def topk_global(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(20)
    )
