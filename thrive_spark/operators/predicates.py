"""§2.2 Projection / filter / predicate operators.

All are single-table scans: Catalyst pushes every predicate here into
the parquet reader (verified via ``PushedFilters`` in tests), so at
100 TB these queries touch only matching row groups — no shuffle at
all except the final (tiny) aggregate where present.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import r4


@query(
    "project_select_rename",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_quantity AS qty,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    """,
)
def project_select_rename(spark, sf_dir):
    """Projection with alias + derived net-price column (column pruning exhibit)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.col("l_quantity").alias("qty"),
        r4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@query(
    "project_cast_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS BIGINT)
               AS prio_num,
           CAST(TRY_CAST(o_orderpriority AS INTEGER) AS BIGINT) AS bad_int,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           CAST(CAST(o_orderkey AS INTEGER) AS DOUBLE) AS key_dbl,
           TRY_CAST('not-a-date' AS TIMESTAMP) AS bad_ts
    FROM orders
    """,
)
def project_cast_matrix(spark, sf_dir):
    """Cast matrix: string/int/date/double + try_cast failure → NULL exhibits."""
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.substring("o_orderpriority", 1, 1)
        .try_cast("int")
        .cast("bigint")
        .alias("prio_num"),
        F.col("o_orderpriority").try_cast("int").cast("bigint").alias("bad_int"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.col("o_orderkey").cast("int").cast("double").alias("key_dbl"),
        F.lit("not-a-date").try_cast("timestamp").alias("bad_ts"),
    )


@query(
    "filter_simple_pred",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 30
    """,
)
def filter_simple_pred(spark, sf_dir):
    """Single comparison predicate pushed to the parquet scan."""
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(F.col("l_quantity") > 30).select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        "l_quantity",
        "l_extendedprice",
    )


@query(
    "filter_compound_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'O' AND o_totalprice > 150000.0)
       OR (NOT o_orderstatus = 'O' AND o_totalprice < 50000.0)
    """,
)
def filter_compound_pred(spark, sf_dir):
    """Compound boolean predicate: (open AND pricey) OR (closed AND cheap)."""
    t = Tables(spark, sf_dir)
    is_o = F.col("o_orderstatus") == "O"
    return t.orders.filter(
        (is_o & (F.col("o_totalprice") > 150000.0))
        | (~is_o & (F.col("o_totalprice") < 50000.0))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "filter_in_between",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000.0 AND 200000.0
    """,
)
def filter_in_between(spark, sf_dir):
    """IN-list + BETWEEN range predicate on orders."""
    t = Tables(spark, sf_dir)
    return t.orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(100000.0, 200000.0)
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@query(
    "filter_null_semantics",
    oracle="""
    WITH d AS (SELECT nullif(o_orderstatus, 'P') AS st FROM orders)
    SELECT count(*) FILTER (WHERE st IS NULL) AS n_null,
           count(*) FILTER (WHERE st IS NOT NULL) AS n_not_null,
           count(*) FILTER (WHERE st IS NOT DISTINCT FROM NULL) AS n_nullsafe_eq_null,
           count(*) FILTER (WHERE st IS NOT DISTINCT FROM 'O') AS n_nullsafe_eq_o
    FROM d
    """,
)
def filter_null_semantics(spark, sf_dir):
    """Three-valued logic exhibit: nullif + IS NULL / eqNullSafe counts."""
    t = Tables(spark, sf_dir)
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    d = t.orders.select(st.alias("st"))
    return d.agg(
        F.count(F.when(F.col("st").isNull(), 1)).alias("n_null"),
        F.count(F.when(F.col("st").isNotNull(), 1)).alias("n_not_null"),
        F.count(F.when(F.col("st").eqNullSafe(F.lit(None)), 1)).alias(
            "n_nullsafe_eq_null"
        ),
        F.count(F.when(F.col("st").eqNullSafe(F.lit("O")), 1)).alias("n_nullsafe_eq_o"),
    )


@query(
    "filter_like_regex",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE '%ol%' AND regexp_matches(p_name, '[aeiou]{2}')
    """,
)
def filter_like_regex(spark, sf_dir):
    """LIKE pattern + rlike regex over part names."""
    t = Tables(spark, sf_dir)
    return t.part.filter(
        F.col("p_name").like("%ol%") & F.col("p_name").rlike("[aeiou]{2}")
    ).select("p_partkey", "p_name")


@query(
    "distinct_rows",
    oracle="""SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                     c_mktsegment FROM customer""",
)
def distinct_rows(spark, sf_dir):
    """dropDuplicates over a 2-column projection (DISTINCT exhibit)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(
            F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
            "c_mktsegment",
        ).dropDuplicates()
    )
