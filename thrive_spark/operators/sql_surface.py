"""SQL entry-point operators (SURVEY §3.2.2): the same Catalyst plans
driven through ``spark.sql`` over registered views — CTEs, scalar
subqueries, correlated EXISTS (decorrelated by Catalyst into joins),
and the salted-skew aggregation exhibit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.salting import salted_agg
from ..registry import query
from ..tables import Tables
from ._util import fixed, osum


@query(
    "sql_cte_scalar_subquery",
    oracle=f"""
    WITH cust_orders AS (
        SELECT o_custkey, count(*) AS n_orders,
               {osum('o_totalprice')} AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, c_acctbal,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(total_spend, 0.0) AS total_spend
    FROM customer LEFT JOIN cust_orders ON c_custkey = o_custkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def sql_cte_scalar_subquery(spark, sf_dir):
    """CTE + uncorrelated scalar subquery through the SQL surface.
    Catalyst turns the scalar subquery into a broadcast of one row;
    the CTE is inlined and optimized with the outer query."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        f"""
        WITH cust_orders AS (
            -- 10000.0D: Spark SQL parses a bare decimal literal as
            -- DECIMAL (unlike the Python API), which would make the
            -- quotient a Decimal column
            SELECT o_custkey, count(*) AS n_orders,
                   sum(CAST(floor(o_totalprice * 10000 + 0.5D) AS BIGINT)) / 10000.0D
                       AS total_spend
            FROM orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_acctbal,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(total_spend, 0.0D) AS total_spend
        FROM customer LEFT JOIN cust_orders ON c_custkey = o_custkey
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


@query(
    "sql_correlated_exists",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.09)
    """,
)
def sql_correlated_exists(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS through SQL — Catalyst
    decorrelates into left-semi and left-anti joins (the §2.3 plans),
    verified by the shared plan tests."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.09)
        """
    )


@query(
    "agg_salted_skew",
    oracle=f"""
    SELECT event_type, count(*) AS n, {osum('value')} AS sum_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark, sf_dir):
    """Skew-safe two-stage aggregation over the hot event_type key
    (5 distinct values — every group is a hot key). Identical result
    to the plain groupBy; the salted plan splits each group across 8
    reducers first (plans/salting.py)."""
    t = Tables(spark, sf_dir)
    out = salted_agg(
        t.events,
        key="event_type",
        unique_col="event_id",
        aggs={
            "n": F.count(F.lit(1)),
            "sum_fixed": F.sum(fixed("value")),
        },
    )
    return out.select(
        "event_type", "n", (F.col("sum_fixed") / 10000.0).alias("sum_value")
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE anc(s_suppkey, node, depth) AS (
        SELECT s_suppkey, s_suppkey, 0 FROM supplier
        UNION ALL
        SELECT s_suppkey, node // 2, depth + 1 FROM anc WHERE node > 1
    )
    SELECT s_suppkey, CAST(max(depth) AS BIGINT) AS depth_to_root,
           CAST(sum(node) AS BIGINT) AS ancestor_sum,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM anc GROUP BY s_suppkey
    """,
)
def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE through the SQL surface (Spark 4 recursive CTE):
    walk every supplier key up an implicit binary-tree hierarchy
    (parent = key div 2) to the root, emitting depth, ancestor sum and
    path length. The recursion's per-step frame is one projection of
    the previous frame — Spark executes it as an iterative union of
    narrow maps, no joins, so depth scales with log(max key), not
    data volume. The same query text (modulo `div` spelling) runs on
    the DuckDB oracle."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        WITH RECURSIVE anc(s_suppkey, node, depth) AS (
            SELECT s_suppkey, s_suppkey, 0 FROM supplier
            UNION ALL
            SELECT s_suppkey, node div 2, depth + 1 FROM anc WHERE node > 1
        )
        SELECT s_suppkey, CAST(max(depth) AS BIGINT) AS depth_to_root,
               CAST(sum(node) AS BIGINT) AS ancestor_sum,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM anc GROUP BY s_suppkey
        """
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) / 10000.0
             AS total
    FROM orders
    WHERE o_totalprice >= 150000.0 AND o_orderstatus <> 'P'
    GROUP BY o_orderstatus
    """,
)
def sql_parameterized(spark, sf_dir):
    """Named-parameter SQL (Spark 4 parameterized queries): literals
    arrive as bind parameters, not string interpolation — the
    injection-safe path for templated analytics. Parameters are
    substituted at parse time, so Catalyst still constant-folds and
    pushes the predicate to the scan exactly as with inline
    literals."""
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n,
               sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                 / CAST(10000.0 AS DOUBLE) AS total
        FROM orders_v
        WHERE o_totalprice >= :min_price AND o_orderstatus <> :skip
        GROUP BY o_orderstatus
        """,
        args={"min_price": 150000.0, "skip": "P"},
    )


@query(
    "sql_lateral_topn",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice
             FROM orders o WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
    WHERE c.c_custkey <= 200
    """,
)
def sql_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL-standard spelling of top-N-per-group, driven through the SQL
    surface. Catalyst decorrelates the lateral into a join + per-key
    Window (rank ≤ 2) rather than executing one subquery per outer row
    — the textbook example of why declaring the plan beats hand
    iteration: the same statement that would be O(|outer|) subquery
    executions on a naive engine compiles to ONE shuffle on the join
    key. Double-valued ranking carries the o_orderkey tiebreak, so
    both engines cut identical top-2 sets."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice
                 FROM orders o WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        WHERE c.c_custkey <= 200
        """
    )


@query(
    "sql_pivot_clause",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
           sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
               FILTER (WHERE o_orderstatus = 'F') / 10000.0 AS f_rev,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
           sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
               FILTER (WHERE o_orderstatus = 'O') / 10000.0 AS o_rev,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
           sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
               FILTER (WHERE o_orderstatus = 'P') / 10000.0 AS p_rev
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_pivot_clause(spark, sf_dir):
    """The SQL PIVOT clause with MULTIPLE aggregates per pivot value
    (count + exact revenue per order status) — the spreadsheet-shaped
    rotation driven through the SQL surface rather than the DataFrame
    ``pivot()`` API (pivot_status_by_segment covers that form).

    Catalyst compiles PIVOT to the same single Expand + hash aggregate
    as GROUPING SETS — one shuffle, no per-column scans; the oracle
    spells the rotation as FILTERed aggregates, which is also the
    portable form for engines without PIVOT. The IN list is explicit:
    an unlisted-values pivot needs a driver-side distinct pass first,
    which is why auto-pivot is an anti-pattern at 100 TB."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        SELECT * FROM (
            SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders
        )
        PIVOT (
            count(*) AS n,
            sum(CAST(floor(o_totalprice * 10000 + 0.5D) AS BIGINT)) / 10000.0D
                AS rev
            FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p)
        )
        """
    )


@query(
    "sql_cluster_by",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderstatus
    FROM orders WHERE o_totalprice > 300000
    """,
)
def sql_cluster_by(spark, sf_dir):
    """The physical-layout SQL surface: CLUSTER BY (= DISTRIBUTE BY +
    SORT BY) routes rows to partitions by key hash and sorts within
    each — the statement form of repartition().sortWithinPartitions(),
    and the pre-shaping step before a bucketed write or a
    partition-local merge. Row CONTENT is layout-independent (the
    oracle is a plain filter — hashing is order-insensitive); the
    plan must carry the exchange + partition-local sort, asserted in
    tests/test_plans.py, with no global sort node (CLUSTER BY is NOT
    ORDER BY — that distinction is the scale point: partition-local
    sorts parallelize, global total orders funnel)."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_orderstatus
        FROM orders WHERE o_totalprice > 300000
        CLUSTER BY o_custkey
        """
    )


@query(
    "sql_window_qualify",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT) / 10000.0
               AS o_totalprice,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
    QUALIFY rnk <= 2
    """,
)
def sql_window_qualify(spark, sf_dir):
    """QUALIFY-style window filtering through the SQL surface: each
    customer's two priciest orders. Spark has no QUALIFY keyword, so
    the filter sits one subquery out — but Catalyst's
    WindowGroupLimit/TopK pushdown recognizes the rank-then-filter
    shape and prunes per-partition before the full window sort, which
    IS the QUALIFY execution strategy (the DuckDB oracle literally
    uses QUALIFY; both produce the identical relation). Ties broken by
    orderkey so the top-2 cut is deterministic."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               floor(o_totalprice * 10000 + 0.5) / 1e4
                   AS o_totalprice,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders
        ) WHERE rnk <= 2
        """
    )


@query(
    "sql_values_inline_dim",
    oracle=f"""
    WITH tier(o_orderpriority, tier, weight) AS (
        VALUES ('1-URGENT',  'expedite', 3),
               ('2-HIGH',    'expedite', 2),
               ('3-MEDIUM',  'standard', 1),
               ('4-NOT SPECIFIED', 'standard', 1),
               ('5-LOW',     'defer',    0)
    )
    SELECT tier, count(*) AS n_orders,
           CAST(sum(weight) AS BIGINT) AS weight_sum,
           {osum('o_totalprice')} AS revenue
    FROM orders JOIN tier USING (o_orderpriority)
    GROUP BY tier
    """,
)
def sql_values_inline_dim(spark, sf_dir):
    """Inline VALUES dimension join through the SQL surface — the
    ad-hoc lookup-table idiom (priority → SLA tier) analysts paste
    into queries instead of creating a table. Catalyst folds the
    VALUES into a LocalRelation and broadcasts it, so the fact scan
    joins against an in-memory 5-row dim: no shuffle, no temp table,
    and the aggregate partial-combines map-side on the 3-value tier
    key."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        WITH tier AS (
            SELECT * FROM VALUES
                ('1-URGENT',  'expedite', 3),
                ('2-HIGH',    'expedite', 2),
                ('3-MEDIUM',  'standard', 1),
                ('4-NOT SPECIFIED', 'standard', 1),
                ('5-LOW',     'defer',    0)
            AS tier(o_orderpriority, tier, weight)
        )
        SELECT tier, count(*) AS n_orders,
               sum(weight) AS weight_sum,
               sum(cast(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                   / 1e4 AS revenue
        FROM orders JOIN tier USING (o_orderpriority)
        GROUP BY tier
        """
    )


@query(
    "sql_any_all_rewrite",
    oracle=f"""
    SELECT s_suppkey, s_name,
           CAST(floor(s_acctbal * 10000 + 0.5) AS BIGINT) / 10000.0
               AS s_acctbal
    FROM supplier
    WHERE s_acctbal > ALL (
        SELECT c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 5000
    )
    """,
)
def sql_any_all_rewrite(spark, sf_dir):
    """Quantified comparison (x > ALL (subquery)) — Spark SQL has no
    ALL/ANY subquery operator, so the portable rewrite is the scalar
    aggregate: > ALL S ≡ > coalesce((SELECT max(S)), -inf) when S is
    null-free (acctbal is NOT NULL here). The coalesce handles the
    empty-set edge — ALL over an empty set is vacuously TRUE, and
    x > -infinity is TRUE for every finite acctbal, so the rewrite is
    equivalent even if no BUILDING customer sits below the cutoff
    (ADVICE r7). The oracle runs the genuine ALL form — the rewrite
    must produce the identical relation. Catalyst executes the scalar
    subquery as a one-row broadcast: the big scan is filtered
    map-side, no join materializes."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        SELECT s_suppkey, s_name,
               floor(s_acctbal * 10000 + 0.5) / 1e4 AS s_acctbal
        FROM supplier
        WHERE s_acctbal > coalesce((
            SELECT max(c_acctbal) FROM customer
            WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 5000
        ), CAST('-Infinity' AS DOUBLE))
        """
    )


@query(
    "sql_group_order_by_all",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS order_year,
           count(*) AS n, {osum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def sql_group_order_by_all(spark, sf_dir):
    """Modern SQL sugar exhibit: GROUP BY ALL (every non-aggregate
    select item becomes a grouping key) and ORDER BY ALL — both
    engines support the clauses NATIVELY (Spark 3.4+/4, DuckDB), so
    the oracle runs the same sugar, hash-pinning that both expansions
    pick the same keys and the same total order. Year extraction is
    engine-portable as a string-format cast; no DATE-typed outputs
    (CLAUDE.md output rules); ORDER BY ALL is deterministic because
    the grouped key set is unique. The plan is the ordinary partial +
    final hash aggregate — sugar must not change the physical shape
    (asserted by the global plan sweep)."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(date_format(o_orderdate, 'yyyy') AS BIGINT)
                   AS order_year,
               count(*) AS n,
               sum(CAST(floor(o_totalprice * 1e4 + 0.5) AS BIGINT)) / 1e4
                   AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey AS custkey,
           o_orderkey AS last_orderkey,
           CAST(o_orderdate AS VARCHAR) AS last_orderdate,
           o_totalprice AS last_price
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
)
def sql_distinct_on(spark, sf_dir):
    """DISTINCT ON — the Postgres/DuckDB "newest row per key" sugar
    Spark does NOT ship. Re-expressed Spark-first as the canonical
    row_number()-over-window top-1 (partition by the DISTINCT ON key,
    order by the query's ORDER BY tail), which is what Catalyst turns
    into a single shuffle + per-partition TopK — the same physical
    work DuckDB's DISTINCT ON does. Full determinism needs the same
    tiebreaker rule on both engines: the ORDER BY must pin a unique
    column (o_orderkey) after the ranking column, or DISTINCT ON
    returns an arbitrary member of ties (the classic footgun this
    exhibit documents). Dates cross as strings (output-column rule)."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        t.orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_orderdate").cast("string").alias("last_orderdate"),
            F.col("o_totalprice").alias("last_price"),
        )
    )
