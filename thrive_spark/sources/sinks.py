"""§2.1 Sink operators: Hive-style partitioned parquet, catalog table,
and the Vertica-role database sink.

Partitioned parquet (``partitionBy``) is the Hive-partition layout the
reference targets with ``ALTER TABLE ADD PARTITION`` [R] — in Spark the
layout IS the partitioning, and downstream reads get static + dynamic
partition pruning for free.
"""

from __future__ import annotations

import math
import os
import shutil
import sqlite3
import tempfile

from pyspark.sql import functions as F

from ..operators._util import dsum, osum
from ..registry import query
from ..smalldf import small_df
from ..tables import Tables


@query(
    "sink_parquet_partitioned",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n, {osum('value')} AS sum_value
    FROM events GROUP BY dt
    """,
)
def sink_parquet_partitioned(spark, sf_dir):
    """Write events partitioned by event date (Hive layout), read the
    partitioned copy back, aggregate per partition. At scale the write
    is a single shuffle-free pass and readers prune partitions."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_part_")
    try:
        t.events.withColumn("dt", F.col("ts").cast("date")).write.mode(
            "overwrite"
        ).partitionBy("dt").parquet(out)
        back = spark.read.parquet(out)
        return (
            back.groupBy(F.col("dt").cast("date").cast("string").alias("dt"))
            .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "sink_hive_table",
    oracle="""
    SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
           count(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
)
def sink_hive_table(spark, sf_dir):
    """saveAsTable into the session catalog, read back via spark.table.
    Uses an explicit external path so the warehouse location of the
    hosting session does not matter. Hash-checked: the read-back
    aggregate must equal the same aggregate stated over the source
    table — a true write→read round-trip oracle."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_tbl_")
    try:
        spark.sql("DROP TABLE IF EXISTS thrive_sink_check")
        t.nation.write.mode("overwrite").option("path", f"{out}/tbl").saveAsTable(
            "thrive_sink_check"
        )
        back = spark.table("thrive_sink_check")
        return (
            back.groupBy(F.col("n_regionkey").cast("bigint").alias("n_regionkey"))
            .agg(F.count("*").alias("n_nations"))
            .localCheckpoint()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS thrive_sink_check")
        shutil.rmtree(out, ignore_errors=True)


def dbapi_sink(df, db_path: str, table: str, columns: list[str]) -> None:
    """Vertica-role database sink (the reference's vsql COPY [R]).

    If a JDBC driver jar is on the classpath, ``df.write.jdbc`` is the
    right call; this container ships none, so the fallback is a
    partition-parallel DBAPI writer: each partition batch-inserts via
    executemany. sqlite serializes writers with a busy timeout — a real
    MPP target (Vertica/Postgres) takes the parallel inserts directly.
    """
    cols = ", ".join(columns)
    ph = ", ".join(["?"] * len(columns))
    insert = f"INSERT INTO {table} ({cols}) VALUES ({ph})"

    def write_partition(rows):
        con = sqlite3.connect(db_path, timeout=60)
        try:
            con.execute("PRAGMA busy_timeout=60000")
            batch = [tuple(r[c] for c in columns) for r in rows]
            if batch:
                con.executemany(insert, batch)
                con.commit()
        finally:
            con.close()

    df.foreachPartition(write_partition)


@query(
    "sink_jdbc",
    oracle="""
    SELECT o_orderstatus, count(*) AS n
    FROM orders WHERE o_orderkey % 4 = 0
    GROUP BY o_orderstatus
    """,
)
def sink_jdbc(spark, sf_dir):
    """Round-trip through the database sink: write an orders slice,
    read back aggregate counts per status. Hash-checked against the
    same aggregate on the source table — the partition-parallel
    executemany writer must deliver every row exactly once."""
    t = Tables(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="thrive_db_")
    db = f"{tmp}/sink.db"
    try:
        con = sqlite3.connect(db)
        con.execute(
            "CREATE TABLE orders_sink (o_orderkey INTEGER, o_orderstatus TEXT, o_totalprice REAL)"
        )
        con.commit()
        con.close()
        slice_df = t.orders.filter(F.col("o_orderkey") % 4 == 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        dbapi_sink(slice_df, db, "orders_sink", ["o_orderkey", "o_orderstatus", "o_totalprice"])
        con = sqlite3.connect(db)
        rows = con.execute(
            "SELECT o_orderstatus, count(*) FROM orders_sink GROUP BY o_orderstatus ORDER BY o_orderstatus"
        ).fetchall()
        con.close()
        return small_df(
            spark, [(s, int(n)) for s, n in rows], "o_orderstatus string, n long"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "sink_jsonl_shards",
    oracle="""
    SELECT doc_id // 100 AS shard, count(*) AS n_docs,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total,
           min(md5(text)) AS content_probe
    FROM documents GROUP BY doc_id // 100
    """,
)
def sink_jsonl_shards(spark, sf_dir):
    """JSONL shard export — the interchange format LLM training reads
    (one JSON object per line, sharded). Documents are assigned to
    shards by key range (deterministic, unlike partition-dependent
    file splits), written as partitioned JSON, then read back with an
    explicit schema; the oracle states the expected per-shard content
    from the source, so the round-trip proves text survives JSON
    encoding byte-exactly (md5 probe). At 100 TB: shard key = dirs,
    files per shard sized by maxRecordsPerFile; writers are map-only.
    """
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_jsonl_")
    try:
        t.documents.withColumn(
            "shard", F.expr("doc_id div 100")
        ).write.mode("overwrite").partitionBy("shard").json(out)
        back = spark.read.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long, shard int"
        ).json(out)
        return (
            back.groupBy(F.col("shard").cast("bigint").alias("shard"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("chars_total"),
                F.min(F.md5("text")).alias("content_probe"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "sink_partition_overwrite_dynamic",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN lang = 'en'
                         THEN CAST(n_chars AS BIGINT) + 1
                         ELSE CAST(n_chars AS BIGINT) END) AS BIGINT)
               AS chars_total
    FROM documents GROUP BY lang
    """,
)
def sink_partition_overwrite_dynamic(spark, sf_dir):
    """Dynamic partition overwrite (INSERT OVERWRITE semantics with
    ``partitionOverwriteMode=dynamic``): the full documents table is
    written partitioned by lang, then a REVISED en-slice (n_chars+1)
    is overwrite-written — and only the lang=en directory is replaced;
    every other partition must survive untouched. The oracle states
    the expected post-merge per-partition totals, so a STATIC
    overwrite (which would have truncated the other partitions — the
    classic production data-loss foot-gun this mode exists to prevent)
    fails the hash.

    At 100 TB this is the nightly-restatement pattern: recompute only
    the partitions that changed, leave the rest of the table's files
    in place; the write cost scales with the restated slice, not the
    table."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_dynover_")
    try:
        docs = t.documents.select("doc_id", "n_chars", "lang")
        docs.write.mode("overwrite").partitionBy("lang").parquet(out)
        revised = docs.filter(F.col("lang") == "en").withColumn(
            "n_chars", F.col("n_chars") + 1
        )
        (
            revised.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("lang")
            .parquet(out)
        )
        back = spark.read.parquet(out)
        return (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("chars_total"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query("sink_compression_matrix")  # rows-only: byte sizes are
# layout-deterministic but not SQL-derivable
def sink_compression_matrix(spark, sf_dir):
    """Codec matrix for the parquet sink: the same sorted
    single-file slice written with snappy / zstd / gzip / none,
    reporting bytes on disk and the compression ratio vs uncompressed
    — the measurement behind a storage-codec decision (at 100 TB the
    answer is usually zstd for cold data, snappy for hot, and this
    operator is the harness that proves it on YOUR data).

    The write is coalesce(1) + sortWithinPartitions so the byte counts
    are run-deterministic; read-back row counts pin that every codec
    round-trips losslessly. tests/test_pipeline.py asserts
    zstd < snappy < uncompressed ordering."""
    t = Tables(spark, sf_dir)
    slice_df = (
        t.documents.select("doc_id", "text", "lang")
        .coalesce(1)
        .sortWithinPartitions("doc_id")
    )
    out = tempfile.mkdtemp(prefix="thrive_codec_")
    rows = []
    try:
        for codec in ("none", "snappy", "zstd", "gzip"):
            path = f"{out}/{codec}"
            slice_df.write.mode("overwrite").option(
                "compression", codec
            ).parquet(path)
            nbytes = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            n_back = spark.read.parquet(path).count()
            rows.append((codec, nbytes, n_back))
        base = next(b for c, b, _ in rows if c == "none")
        return small_df(
            spark,
            [
                (c, b, n, math.floor(b / base * 10000 + 0.5) / 10000.0)
                for c, b, n in rows
            ],
            "codec string, n_bytes long, n_rows long, ratio double",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
