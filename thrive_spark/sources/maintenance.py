"""Table maintenance: small-file compaction and aged-partition purge —
the reference's cleanup_handler role [R] (SURVEY §3.1.3), which at
100 TB is what keeps scan task counts sane (a partition with 10k tiny
files costs 10k tasks; compacted to row-group-sized files it costs
dozens).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators._util import dsum, osum
from ..registry import query
from ..smalldf import small_df
from ..tables import Tables


def compact_partitioned(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> tuple[int, int]:
    """Rewrite a partitioned parquet table with right-sized files.

    Returns (files_before, files_after). Uses dynamic partition
    overwrite onto a staged rewrite so readers never see a partial
    table; file count per partition is sized from the partition's
    bytes (coalesce — no shuffle needed to merge small files).
    """

    def count_files(p):
        return sum(
            1
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    before = count_files(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, total_bytes // (target_file_mb * 1024 * 1024))
    df = spark.read.parquet(path)
    part_cols = [c for c in df.columns if c == "dt"]
    staged = path.rstrip("/") + "_compacted"
    writer = df.coalesce(int(n_files * 4)).write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(staged)
    shutil.rmtree(path)
    os.rename(staged, path)
    return before, count_files(path)


def purge_partitions(path: str, keep_pred) -> list[str]:
    """Drop aged partitions (directory-granular delete — the partition
    layout IS the index). Returns dropped partition names."""
    dropped = []
    for d in sorted(os.listdir(path)):
        if d.startswith("dt=") and not keep_pred(d[3:]):
            shutil.rmtree(os.path.join(path, d))
            dropped.append(d)
    return dropped


@query("maintenance_compact")  # rows-only: filesystem state operation
def maintenance_compact(spark, sf_dir):
    """End-to-end compaction: write events fragmented (one file per
    date × 8 shuffle partitions), compact, verify row parity and the
    file-count drop, then purge partitions older than a cutoff."""
    t = Tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="thrive_compact_")
    tbl = f"{root}/events_tbl"
    try:
        ev = t.events.withColumn("dt", F.col("ts").cast("date"))
        ev.repartition(8).write.partitionBy("dt").parquet(tbl)
        n_before = spark.read.parquet(tbl).count()
        files_before, files_after = compact_partitioned(spark, tbl)
        n_after = spark.read.parquet(tbl).count()
        assert n_after == n_before, (n_after, n_before)
        # data-driven retention cutoff (the median partition date):
        # a fixed calendar literal purges EVERYTHING on a corpus from
        # another era (r10 stress corpus lives in 1969-70) and a scan
        # over zero remaining partitions cannot even infer a schema
        dts = sorted(
            d[3:] for d in os.listdir(tbl) if d.startswith("dt=")
        )
        cutoff = dts[len(dts) // 2]
        dropped = purge_partitions(tbl, keep_pred=lambda d: d >= cutoff)
        n_purged = spark.read.parquet(tbl).count()
        return small_df(
            spark,
            [
                (
                    int(n_before),
                    int(files_before),
                    int(files_after),
                    len(dropped),
                    int(n_purged),
                )
            ],
            "n_rows long, files_before long, files_after long, "
            "partitions_purged long, n_rows_after_purge long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- Z-order clustering ---------------------------------------------------

#: spread the low 16 bits of ``c`` to even bit positions (Morton).
#: Pure integer shift/mask arithmetic — bit-identical in Spark SQL and
#: DuckDB, so the z-value itself is oracle-checkable.
def _spread_sql(col: str) -> str:
    s = f"(({col} & 65535) | (({col} & 65535) << 8)) & 16711935"
    s = f"(({s}) | (({s}) << 4)) & 252645135"
    s = f"(({s}) | (({s}) << 2)) & 858993459"
    s = f"(({s}) | (({s}) << 1)) & 1431655765"
    return s


def zvalue_sql(xcol: str, ycol: str) -> str:
    """Morton / Z-order interleave of two 16-bit bucketed columns."""
    return f"({_spread_sql(xcol)}) | (({_spread_sql(ycol)}) << 1)"


def zorder_layout(df, xcol: str, ycol: str, n_ranges: int = 16):
    """Cluster ``df`` for 2-D data skipping: normalize both dims to
    8-bit buckets, range-partition by their Morton code, sort within
    partitions.

    Bucketing first matters: interleaving raw values lets the wider-
    domain column dominate the high z-bits and the narrow column never
    gets split. Min/max come from one 1-row aggregate (driver-bounded
    metadata, same class as the IVF centroid sample).

    At 100 TB this is the write-side half of multi-dimension pruning:
    each output file covers a compact z-tile, so BOTH columns' parquet
    min/max footer stats become selective — a filter on either column
    skips most files, where a plain sort on one column helps only that
    column. The shuffle is one range exchange (sampled boundaries),
    the sort is per-partition — same cost as any ORDER BY write.
    """
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(xcol), F.max(xcol), F.min(ycol), F.max(ycol)
    ).first()
    span_x = max(1, hi_x - lo_x)
    span_y = max(1, hi_y - lo_y)
    bx = f"CAST(({xcol} - {lo_x}) * 255 / {span_x} AS BIGINT)"
    by = f"CAST(({ycol} - {lo_y}) * 255 / {span_y} AS BIGINT)"
    return (
        df.withColumn("_z", F.expr(zvalue_sql(bx, by)))
        .repartitionByRange(n_ranges, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


@query(
    "maintenance_zorder",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {zvalue_sql('l_partkey', 'l_suppkey')} AS zval
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    """,
)
def maintenance_zorder(spark, sf_dir):
    """Z-order (Morton) clustering key for 2-D data skipping.

    The hash-checked part is the z-value mapping itself (identical
    shift/mask arithmetic in both engines); the physical rewrite is
    :func:`zorder_layout`, whose skipping quality is asserted in
    tests/test_tables.py::test_zorder_layout_skips (per-file min/max
    spans of BOTH dims shrink vs a single-column sort).
    """
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(F.col("l_orderkey") % 10 == 0).select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.expr(zvalue_sql("l_partkey", "l_suppkey")).alias("zval"),
    )


@query(
    "maintenance_cache_reuse",
    oracle=f"""
    WITH sl AS (
        SELECT o_orderstatus, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 4 = 0
    )
    SELECT 'status' AS grain, o_orderstatus AS key,
           count(*) AS n, {osum('o_totalprice')} AS revenue
    FROM sl GROUP BY o_orderstatus
    UNION ALL
    SELECT 'priority', o_orderpriority, count(*), {osum('o_totalprice')}
    FROM sl GROUP BY o_orderpriority
    """,
)
def maintenance_cache_reuse(spark, sf_dir):
    """Explicit materialization surface: a filtered projection is
    persist()-ed once and served to two aggregations at different
    grains — the interactive-session pattern (and the manual
    counterpart of AQE's automatic exchange reuse, which only fires
    when subtrees are exactly equal).

    The second branch must hit InMemoryTableScan, not re-read parquet
    (plan-asserted in tests/test_plans.py). Cache columnar batches
    hold ONLY the projected 3 columns post-filter — at 100 TB you
    persist the reduced relation, never the raw scan, and prefer
    MEMORY_AND_DISK (the default) so eviction degrades to local disk
    instead of recomputation."""
    t = Tables(spark, sf_dir)
    sl = (
        t.orders.filter(F.col("o_orderkey") % 4 == 0)
        .select("o_orderstatus", "o_orderpriority", "o_totalprice")
        .persist()
    )
    a = sl.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("revenue")
    ).select(
        F.lit("status").alias("grain"),
        F.col("o_orderstatus").alias("key"),
        "n",
        "revenue",
    )
    b = sl.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("revenue")
    ).select(
        F.lit("priority").alias("grain"),
        F.col("o_orderpriority").alias("key"),
        "n",
        "revenue",
    )
    return a.unionAll(b)
