"""Bucketed-table co-located join — the shuffle-free fact–fact join
(SCALE.md §joins).

`bucketBy(n, key).sortBy(key)` persists both tables pre-partitioned
and pre-sorted on the join key; a later SortMergeJoin needs neither
Exchange nor Sort on either side. At 100 TB this converts the biggest
recurring shuffle (fact ⋈ fact) into a map-side merge. The only
Exchange left in this query's plan is the post-join aggregation —
asserted in tests/test_plans.py.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import dsum, osum

N_BUCKETS = 8


@query(
    "join_bucketed_colocated",
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n_lines,
           {osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Same result as join_inner_shuffle, via bucketed tables: the
    join itself runs shuffle-free (bucket-aligned SMJ)."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_buckets_")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    try:
        for name, df, key in (
            ("thrive_li_b", t.lineitem, "l_orderkey"),
            ("thrive_ord_b", t.orders, "o_orderkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                # repartition ON the bucket key first: each reducer
                # owns exactly one bucket, so the write is one file
                # per bucket instead of tasks x buckets small files
                # (the small-file explosion that kills bucketed
                # tables at scale) -- and the write parallelizes
                # across buckets (measured 3.6 -> 1.8 s at sf0.1)
                df.repartition(N_BUCKETS, F.col(key))
                .write.mode("overwrite")
                .option("path", f"{out}/{name}")
                .bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(name)
            )
        joined = spark.table("thrive_li_b").join(
            spark.table("thrive_ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        return (
            joined.groupBy("o_orderstatus")
            .agg(F.count("*").alias("n_lines"), dsum(rev).alias("revenue"))
            .localCheckpoint()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS thrive_li_b")
        spark.sql("DROP TABLE IF EXISTS thrive_ord_b")
        shutil.rmtree(out, ignore_errors=True)


def bucketed_join_plan(spark, sf_dir):
    """Build the bucketed join WITHOUT cleanup, for plan inspection:
    returns (DataFrame, cleanup_fn)."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_buckets_plan_")
    for name, df, key in (
        ("thrive_li_p", t.lineitem, "l_orderkey"),
        ("thrive_ord_p", t.orders, "o_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.repartition(N_BUCKETS, F.col(key))
            .write.mode("overwrite")
            .option("path", f"{out}/{name}")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    # hint MERGE: at test scale the planner would broadcast the small
    # side (and skip bucketed reads entirely); the exhibit is the
    # fact-fact case where both sides are too big to broadcast
    joined = spark.table("thrive_li_p").hint("merge").join(
        spark.table("thrive_ord_p"), F.col("l_orderkey") == F.col("o_orderkey")
    )

    def cleanup():
        spark.sql("DROP TABLE IF EXISTS thrive_li_p")
        spark.sql("DROP TABLE IF EXISTS thrive_ord_p")
        shutil.rmtree(out, ignore_errors=True)

    return joined, cleanup
