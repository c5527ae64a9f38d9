"""§2.7 Set operations.

UNION/INTERSECT/EXCEPT with distinct semantics shuffle on the full
row; EXCEPT ALL additionally tracks multiplicities. All compile to
hash-based aggregation/join plans — linear shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


def _slices(t):
    a = t.customer.filter(F.col("c_nationkey") < 13).select(
        "c_custkey", "c_mktsegment"
    )
    b = t.customer.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
    ).select("c_custkey", "c_mktsegment")
    return a, b


@query(
    "union_all_dedup",
    oracle="""
    WITH a AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_nationkey < 13),
         b AS (SELECT c_custkey, c_mktsegment FROM customer
               WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY'))
    SELECT 'union_all' AS mode, count(*) AS n FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    UNION ALL
    SELECT 'union_distinct' AS mode, count(*) AS n FROM (SELECT * FROM a UNION SELECT * FROM b)
    """,
)
def union_all_dedup(spark, sf_dir):
    """Single-action form: one union scan feeds one aggregate that
    computes both cardinalities (count(*) + count(distinct struct)),
    then explodes into the two labeled rows — one Spark job, one scan
    of customer, fully lazy (the driver triggers the only action)."""
    t = Tables(spark, sf_dir)
    a, b = _slices(t)
    counts = a.unionByName(b).agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count_distinct(F.struct("c_custkey", "c_mktsegment")).alias(
            "n_distinct"
        ),
    )
    return counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("union_all").alias("mode"), F.col("n_all").alias("n")
                ),
                F.struct(
                    F.lit("union_distinct").alias("mode"),
                    F.col("n_distinct").alias("n"),
                ),
            )
        ).alias("r")
    ).select("r.mode", "r.n")


@query(
    "intersect_except",
    oracle="""
    WITH o_open AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         o_done AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT 'intersect' AS op, o_custkey FROM (SELECT * FROM o_open INTERSECT SELECT * FROM o_done)
    UNION ALL
    SELECT 'except' AS op, o_custkey FROM (SELECT * FROM o_open EXCEPT SELECT * FROM o_done)
    """,
)
def intersect_except(spark, sf_dir):
    """INTERSECT and EXCEPT of open-vs-fulfilled customer key sets, tagged and unioned."""
    t = Tables(spark, sf_dir)
    o_open = (
        t.orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    )
    o_done = (
        t.orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    both = o_open.intersect(o_done).select(F.lit("intersect").alias("op"), "o_custkey")
    only_open = o_open.subtract(o_done).select(F.lit("except").alias("op"), "o_custkey")
    return both.unionByName(only_open)


@query(
    "except_all_multiset",
    oracle="""
    SELECT l_returnflag FROM (
        SELECT l_returnflag FROM lineitem WHERE l_quantity > 25
        EXCEPT ALL
        SELECT l_returnflag FROM lineitem WHERE l_discount > 0.05
    )
    """,
)
def except_all_multiset(spark, sf_dir):
    """EXCEPT ALL keeps multiplicity: a flag appearing x times on the
    left and y on the right survives max(x-y, 0) times."""
    t = Tables(spark, sf_dir)
    left = t.lineitem.filter(F.col("l_quantity") > 25).select("l_returnflag")
    right = t.lineitem.filter(F.col("l_discount") > 0.05).select("l_returnflag")
    return left.exceptAll(right)


@query(
    "union_by_name_evolved",
    oracle="""
    SELECT doc_id, lang, n_chars, source FROM (
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
               CAST(NULL AS VARCHAR) AS source
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, lang, CAST(NULL AS BIGINT), source
        FROM documents WHERE doc_id % 2 = 1
    )
    """,
)
def union_by_name_evolved(spark, sf_dir):
    """unionByName(allowMissingColumns=True) across two generations
    with DIFFERENT projections — the schema-evolution-tolerant union
    (positional unionAll would silently pair lang with n_chars; this
    matches by NAME and null-fills the gaps), i.e. how you read a
    table whose old files lack a column without rewriting them.

    The oracle spells the same thing as explicit NULL-padded UNION
    ALL — the portable form, and the documentation of exactly which
    columns each branch is missing. Pure map-side: union is a plan
    concatenation, no shuffle."""
    t = Tables(spark, sf_dir)
    old_gen = t.documents.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    new_gen = t.documents.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "source"
    )
    return old_gen.unionByName(new_gen, allowMissingColumns=True).select(
        "doc_id", "lang", "n_chars", "source"
    )


@query(
    "intersect_all_multiset",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0
    """,
)
def intersect_all_multiset(spark, sf_dir):
    """INTERSECT ALL — the multiset intersection that preserves
    duplicate counts (each key appears min(count_left, count_right)
    times), completing the set-op family next to except_all_multiset.
    Catalyst rewrites it as a count-min aggregation + generate, one
    shuffle per side — no distinct pass flattens the multiplicities,
    which is the entire semantic difference from plain INTERSECT."""
    t = Tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey")
    b = t.orders.filter(F.col("o_orderkey") % 3 == 0).select("o_custkey")
    return a.intersectAll(b)
