"""§2.1 Scan operators: parquet, CSV roundtrip, JSON flatten/corrupt,
incremental dirlist ingestion.

JSON parsing is the reference's core mapper semantics (SURVEY §2.1 [R]:
thrive's streaming mapper flattens JSON events to columns); here it is
``from_json`` with an explicit schema — JVM-side, codegen'd, no Python.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators._util import dsum, osum
from ..registry import query
from ..tables import Tables
from ..smalldf import small_df
from .incremental import IncrementalLoader, run_incremental


@query(
    "scan_parquet",
    oracle=f"""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           {osum('l_extendedprice')} AS sum_price
    FROM lineitem
    """,
)
def scan_parquet(spark, sf_dir):
    """Plain parquet scan: row count, distinct orders, fixed-point price sum."""
    t = Tables(spark, sf_dir)
    return t.lineitem.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_extendedprice").alias("sum_price"),
    )


@query(
    "scan_csv_roundtrip",
    oracle=f"""
    SELECT l_returnflag, count(*) AS n, {osum('l_extendedprice')} AS sum_price
    FROM lineitem WHERE l_orderkey % 10 = 0
    GROUP BY l_returnflag
    """,
)
def scan_csv_roundtrip(spark, sf_dir):
    """Write a lineitem slice as CSV, read it back with an explicit
    StructType (never inferSchema in production — one extra full pass),
    and aggregate. Doubles survive the roundtrip exactly: Spark writes
    shortest-roundtrip decimal representations.
    """
    t = Tables(spark, sf_dir)
    slice_df = t.lineitem.filter(F.col("l_orderkey") % 10 == 0).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    out = tempfile.mkdtemp(prefix="thrive_csv_")
    try:
        slice_df.write.mode("overwrite").option("header", "true").csv(out)
        schema = T.StructType(
            [
                T.StructField("l_orderkey", T.LongType()),
                T.StructField("l_linenumber", T.IntegerType()),
                T.StructField("l_returnflag", T.StringType()),
                T.StructField("l_extendedprice", T.DoubleType()),
            ]
        )
        back = spark.read.schema(schema).option("header", "true").csv(out)
        return (
            back.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("sum_price"))
            .localCheckpoint()  # materialize before the temp dir vanishes
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_json_flatten",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN json_valid(props) THEN
                    CAST(json_extract_string(props, '$.k') AS BIGINT) END)
                AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def scan_json_flatten(spark, sf_dir):
    """from_json over the props payload flattened into typed columns, then rolled up."""
    t = Tables(spark, sf_dir)
    parsed = t.events.withColumn(
        "p", F.from_json("props", "k BIGINT")
    ).withColumn("k", F.col("p.k"))
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("k").alias("sum_k")
    )


@query(
    "scan_json_corrupt",
    oracle="""
    WITH d AS (
        SELECT CASE WHEN event_id % 7 = 0 THEN 'x' || props ELSE props END AS raw
        FROM events
    ),
    g AS (
        SELECT CASE WHEN coalesce(json_valid(raw), false)
                    THEN CASE WHEN json_extract_string(raw, '$.k')
                                   IS NOT NULL THEN 1 END
               END AS ok
        FROM d
    )
    SELECT count(ok) AS n_good,
           count(*) - count(ok) AS n_bad
    FROM g
    """,
)
def scan_json_corrupt(spark, sf_dir):
    """Malformed-row diversion (the reference's parse-error quarantine
    [R]): PERMISSIVE from_json yields NULL for unparseable input; rows
    split into good/bad counts instead of failing the job.
    """
    t = Tables(spark, sf_dir)
    # leading garbage — Spark's Jackson parser tolerates *trailing*
    # junk in PERMISSIVE mode, so corrupt the front to fail both engines
    raw = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("x"), F.col("props"))
    ).otherwise(F.col("props"))
    d = t.events.select(F.from_json(raw, "k BIGINT").alias("p"))
    return d.agg(
        F.count(F.when(F.col("p").isNotNull() & F.col("p.k").isNotNull(), 1)).alias(
            "n_good"
        ),
        F.count(F.when(F.col("p").isNull() | F.col("p.k").isNull(), 1)).alias("n_bad"),
    )


@query(
    "incremental_dir_scan",
    oracle="""
    WITH c AS (SELECT o_orderkey % 3 AS m, count(*) AS n
               FROM orders WHERE o_orderkey < 1000 GROUP BY m)
    SELECT CAST(1 AS BIGINT) AS run,
           'd' || CAST(m + 1 AS VARCHAR) AS dir, n AS n_rows
    FROM c
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'd4', count(*)
    FROM orders WHERE o_orderkey < 100
    """,
)
def incremental_dir_scan(spark, sf_dir):
    """Dirlist semantics end-to-end: run 1 sees dirs {d1,d2,d3} and
    processes all; d4 appears before run 2, which processes ONLY d4.
    Output: one row per (run, dir) actually processed — 4 rows total.
    Hash-checked: run 1's per-dir counts must equal the modulo split
    of the orders slice, run 2 must contain EXACTLY the late d4 — a
    ledger that reprocessed d1-d3 (or missed d4) fails the oracle, so
    exactly-once semantics are what is being hashed. The dirs hold a
    filtered slice (o_orderkey < 1000), not the full table: the
    ledger/dirlist mechanics under test are row-count-independent and
    the full-table write tripled this query's census cost for nothing.
    """
    t = Tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="thrive_incr_")
    try:
        orders = t.orders.filter(F.col("o_orderkey") < 1000)
        for i in range(3):
            orders.filter(F.col("o_orderkey") % 3 == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{root}/d{i + 1}")
        ledger = f"{root}/_ledger"
        loader = IncrementalLoader(spark, ledger)
        sink = lambda df: df.count()  # noqa: E731 — audit-count sink
        rows = []
        r1 = run_incremental(
            spark, loader, [f"{root}/d{i + 1}" for i in range(3)], sink
        )
        rows += [(1, os.path.basename(name), n) for name, n in r1]
        # new directory lands between runs
        orders.filter(F.col("o_orderkey") < 100).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/d4")
        r2 = run_incremental(
            spark, loader, [f"{root}/d{i + 1}" for i in range(4)], sink
        )
        rows += [(2, os.path.basename(name), n) for name, n in r2]
        return small_df(
            spark, sorted(rows), "run long, dir string, n_rows long"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "scan_partition_pruned",
    oracle="""
    SELECT lang, source, count(*) AS n,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total
    FROM documents WHERE lang IN ('en', 'de')
    GROUP BY lang, source
    """,
)
def scan_partition_pruned(spark, sf_dir):
    """Partition-pruned read: documents written Hive-partitioned by
    lang, then scanned with a lang predicate — the reader lists and
    opens ONLY the matching partition directories (PartitionFilters
    in the plan, asserted in tests/test_plans.py), the file-level
    pruning that makes 100 TB layouts queryable. The residual
    aggregate is grouped per (lang, source)."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_prune_")
    try:
        t.documents.write.mode("overwrite").partitionBy("lang").parquet(out)
        back = spark.read.parquet(out)
        return (
            back.filter(F.col("lang").isin("en", "de"))
            .groupBy(F.col("lang").cast("string").alias("lang"), "source")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("n_chars").cast("bigint")).alias("chars_total"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_v2,
           CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                         THEN o_custkey ELSE NULL END) AS BIGINT)
             AS sum_new_col
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def scan_schema_evolution(spark, sf_dir):
    """Schema evolution across a partitioned lake: v1 files wrote
    (o_orderkey, o_orderstatus), a later pipeline added o_custkey —
    ``mergeSchema`` reads both generations as one table with NULLs
    where v1 predates the column. The oracle states the expected
    merged content directly from the source. At 100 TB: schema merge
    costs one footer read per file at planning time (no data pass);
    production tables pin the merged schema in a catalog instead, but
    the read path proven here is what backfills and late columns rely
    on."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_evo_")
    try:
        v1 = t.orders.filter(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
        ).select("o_orderkey", "o_orderstatus")
        v2 = t.orders.filter(
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
        ).select("o_orderkey", "o_orderstatus", "o_custkey")
        v1.write.mode("overwrite").parquet(f"{out}/gen=1")
        v2.write.mode("overwrite").parquet(f"{out}/gen=2")
        back = spark.read.option("mergeSchema", "true").parquet(
            f"{out}/gen=1", f"{out}/gen=2"
        )
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0)
                ).cast("bigint").alias("n_v2"),
                F.sum("o_custkey").cast("bigint").alias("sum_new_col"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "join_dynamic_partition_pruning",
    oracle="""
    SELECT lang, count(*) AS n,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total
    FROM documents
    WHERE lang IN (SELECT DISTINCT lang FROM documents
                   WHERE source = 'src3')
    GROUP BY lang
    """,
)
def join_dynamic_partition_pruning(spark, sf_dir):
    """Dynamic partition pruning: the fact side is lang-partitioned on
    disk, the pruning predicate arrives from a JOIN (languages that
    appear in source src3), not a literal — so the partitions to read
    are only known at runtime. Spark broadcasts the dim-side keys and
    injects them as a partition filter (``dynamicpruning`` subquery in
    the plan, asserted in tests/test_plans.py) — at 100 TB this is
    what keeps star-join fact scans from reading every date partition
    when the dimension filter is selective."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_dpp_")
    try:
        t.documents.write.mode("overwrite").partitionBy("lang").parquet(out)
        fact = spark.read.parquet(out)
        dim = (
            t.documents.filter(F.col("source") == "src3")
            .select(F.col("lang").alias("dim_lang"))
            .distinct()
        )
        return (
            fact.join(dim, fact.lang == dim.dim_lang)
            .groupBy(F.col("lang").cast("string").alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("n_chars").cast("bigint")).alias("chars_total"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_csv_malformed",
    oracle="""
    SELECT (SELECT count(*) FROM orders WHERE o_orderkey % 6 = 0)
             AS n_good,
           CAST(3 AS BIGINT) AS n_bad
    """,
)
def scan_csv_malformed(spark, sf_dir):
    """Malformed-row tolerance on CSV: a clean export plus three
    hand-corrupted lines (wrong arity, non-numeric key, truncated
    quote), read back in PERMISSIVE mode with a corrupt-record
    column — the load keeps going and quarantines the bad rows
    instead of failing the job (DROPMALFORMED/FAILFAST are the
    stricter dials). The oracle pins both counts, so silently
    dropping OR double-counting malformed lines fails the hash."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_badcsv_")
    try:
        good = t.orders.filter(F.col("o_orderkey") % 6 == 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        good.coalesce(1).write.mode("overwrite").option(
            "header", "false"
        ).csv(out)
        import glob as g

        part = g.glob(f"{out}/part-*.csv")[0]
        with open(part, "a") as fh:
            fh.write("1,2,3,4,5,extra,columns\n")
            fh.write("not_a_number,O,123.45\n")
            fh.write('17,"unterminated quote,99.9\n')
        for crc in g.glob(f"{out}/.*.crc"):
            os.remove(crc)  # stale Hadoop checksums after the append
        schema = T.StructType(
            [
                T.StructField("o_orderkey", T.LongType()),
                T.StructField("o_orderstatus", T.StringType()),
                T.StructField("o_totalprice", T.DoubleType()),
                T.StructField("_corrupt", T.StringType()),
            ]
        )
        back = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .csv(out)
            .cache()  # SPARK-21610: corrupt-record counts need materialization
        )
        return (
            back.agg(
                F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_good"),
                F.count(F.when(F.col("_corrupt").isNotNull(), 1)).alias(
                    "n_bad"
                ),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_binary_files",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) + 1 AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents WHERE doc_id < 64
    """,
)
def scan_binary_files(spark, sf_dir):
    """Whole-file binary ingest via the ``binaryFile`` source — the
    entry point of every multimodal pipeline (images/audio arrive as
    files, not rows). A deterministic per-doc file tree is written
    (one UTF-8 text file per document), then read back as opaque
    bytes; the record key is parsed from the PATH (the only metadata a
    file brings), and the oracle pins byte count (+1 for the writer's
    newline) and content digest against the source rows — proving the
    bytes survive the write→binary-read round trip exactly.

    Scale shape: binaryFile scans parallelize per-file with
    ``maxPartitionBytes`` packing of small files; md5/length run on
    the binary column JVM-side, so no bytes cross into Python. For
    real media the decode step downstream is the Arrow mapInPandas in
    operators/multimodal.py; this operator is the ingest half.
    """
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_binscan_")
    try:
        (
            t.documents.filter(F.col("doc_id") < 64)
            .select("text", "doc_id")
            .repartition("doc_id")
            .write.mode("overwrite")
            .partitionBy("doc_id")
            .text(out)
        )
        back = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.txt")
            .load(out + "/doc_id=*")
        )
        body = F.expr(
            "substring(decode(content, 'UTF-8'), 1, "
            "char_length(decode(content, 'UTF-8')) - 1)"
        )
        return (
            back.select(
                F.regexp_extract("path", r"doc_id=(\d+)", 1)
                .cast("bigint")
                .alias("doc_id"),
                F.length("content").cast("bigint").alias("n_bytes"),
                F.md5(body).alias("digest"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_time_travel",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        WHERE o_orderkey % 3 = 0
    ),
    merged AS (
        SELECT k, CASE WHEN k % 5 = 0 THEN p + 1000 ELSE p END AS p
        FROM base
    )
    SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
           {osum('p')} AS revenue
    FROM base
    UNION ALL
    SELECT CAST(2 AS BIGINT), count(*), {osum('p')}
    FROM merged
    """,
)
def scan_time_travel(spark, sf_dir):
    """Snapshot time travel over a generation-partitioned table: gen 1
    is the base orders slice, gen 2 a price-correction delta on every
    15th key; querying AS OF version 1 replays only gen 1, while the
    latest view merges generations latest-wins. The oracle derives
    both snapshots from the source relation, proving the versioned
    store reproduces history exactly.

    This is the file-layout core of Iceberg/Delta time travel without
    their metadata layer: generations are partition directories, so
    AS OF v prunes to gen ≤ v AT THE SCAN (partition pruning on the
    gen column — old snapshots cost nothing to keep), and latest-wins
    is one row_number over the merge key ordered by gen DESC — the
    same single-shuffle shape as merge_upsert_cdc. Deltas hold ONLY
    changed keys, so storage and merge cost scale with churn, not
    table size."""
    t = Tables(spark, sf_dir)
    base = t.orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    delta = base.filter(F.col("k") % 5 == 0).select(
        "k", (F.col("p") + 1000).alias("p")
    )
    out = tempfile.mkdtemp(prefix="thrive_timetravel_")
    try:
        base.write.mode("overwrite").parquet(f"{out}/gen=1")
        delta.write.mode("overwrite").parquet(f"{out}/gen=2")
        tbl = spark.read.option("basePath", out).parquet(
            f"{out}/gen=1", f"{out}/gen=2"
        )

        def snapshot(version: int):
            w = Window.partitionBy("k").orderBy(F.col("gen").desc())
            latest = (
                tbl.filter(F.col("gen") <= version)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
            )
            return latest.agg(
                F.lit(version).cast("bigint").alias("version"),
                F.count("*").alias("n_rows"),
                dsum("p").alias("revenue"),
            ).select("version", "n_rows", "revenue")

        return snapshot(1).unionAll(snapshot(2)).localCheckpoint()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_csv_dialect",
    oracle="""
    WITH payload AS (
        SELECT doc_id,
               'v="' || lang || '",' || CAST(n_chars AS VARCHAR)
                   || chr(10) || source AS tricky
        FROM documents WHERE doc_id < 256
    )
    SELECT count(*) AS n_rows,
           min(md5(tricky)) AS content_probe,
           CAST(sum(strlen(tricky)) AS BIGINT) AS bytes_logical
    FROM payload
    """,
)
def scan_csv_dialect(spark, sf_dir):
    """CSV dialect torture round trip: a synthesized field containing
    the SEPARATOR, the QUOTE character, and an EMBEDDED NEWLINE per
    row is written with quoting/escaping on and read back with
    ``multiLine`` — the oracle pins the digest of the ORIGINAL
    strings, so any mis-quoting, mis-escaping, or record-splitting
    corruption fails the hash. This is the failure mode that silently
    shreds real-world CSV feeds; the explicit-dialect options
    (quote, escape, multiLine) are the contract under test.

    Scale caveat stated honestly: multiLine CSV cannot split files on
    newlines, so each file parses on ONE task — acceptable for
    moderate feed files, a reason to re-encode to parquet at ingest
    for anything bigger (scan_csv_roundtrip covers the splittable
    fast path)."""
    t = Tables(spark, sf_dir)
    tricky = F.concat(
        F.lit('v="'),
        F.col("lang"),
        F.lit('",'),
        F.col("n_chars").cast("string"),
        F.lit("\n"),
        F.col("source"),
    )
    src = t.documents.filter(F.col("doc_id") < 256).select(
        "doc_id", tricky.alias("tricky")
    )
    out = tempfile.mkdtemp(prefix="thrive_csvd_")
    try:
        (
            src.write.mode("overwrite")
            .option("header", "true")
            .option("quote", '"')
            .option("escape", '"')
            .csv(out)
        )
        back = (
            spark.read.schema("doc_id long, tricky string")
            .option("header", "true")
            .option("quote", '"')
            .option("escape", '"')
            .option("multiLine", "true")
            .csv(out)
        )
        return (
            back.agg(
                F.count("*").alias("n_rows"),
                F.min(F.md5("tricky")).alias("content_probe"),
                F.sum(F.length("tricky")).cast("bigint").alias(
                    "bytes_logical"
                ),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "dq_schema_diff",
    oracle="""
    SELECT * FROM (VALUES
        ('doc_id',  'BIGINT', 'BIGINT',  'unchanged'),
        ('lang',    'STRING', NULL,      'removed'),
        ('n_chars', 'BIGINT', 'DOUBLE',  'type_changed'),
        ('source',  NULL,     'STRING',  'added'),
        ('text',    'STRING', 'STRING',  'unchanged')
    ) AS t(col_name, old_type, new_type, status)
    """,
)
def dq_schema_diff(spark, sf_dir):
    """Structural drift report between two table generations: per
    column, old type / new type / added / removed / type_changed —
    the schema-registry check run BEFORE mergeSchema quietly unions a
    widened column into your table (scan_schema_evolution proves
    Spark CAN merge; this operator is the governance gate deciding
    whether it SHOULD). The diff is computed from the parquet footers
    alone — no data is scanned, so the check is free at any table
    size.

    Two generations are derived from documents with a removed column,
    an added column, and an n_chars widening; the oracle pins the
    expected report as literals — a drift in how Spark reports parquet
    logical types would surface here."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_schemadiff_")
    try:
        t.documents.select("doc_id", "text", "lang", "n_chars").limit(
            10
        ).write.mode("overwrite").parquet(f"{out}/g1")
        t.documents.select(
            "doc_id",
            "text",
            "source",
            F.col("n_chars").cast("double").alias("n_chars"),
        ).limit(10).write.mode("overwrite").parquet(f"{out}/g2")
        old = {
            f.name: f.dataType.simpleString().upper()
            for f in spark.read.parquet(f"{out}/g1").schema.fields
        }
        new = {
            f.name: f.dataType.simpleString().upper()
            for f in spark.read.parquet(f"{out}/g2").schema.fields
        }
        rows = []
        for col in sorted(set(old) | set(new)):
            if col not in new:
                rows.append((col, old[col], None, "removed"))
            elif col not in old:
                rows.append((col, None, new[col], "added"))
            elif old[col] != new[col]:
                rows.append((col, old[col], new[col], "type_changed"))
            else:
                rows.append((col, old[col], new[col], "unchanged"))
        return small_df(
            spark,
            rows,
            "col_name string, old_type string, new_type string, "
            "status string",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_file_metadata_provenance",
    oracle="""
    SELECT lang, count(*) AS n_rows,
           count(DISTINCT CAST(n_chars AS BIGINT)) AS n_char_variants
    FROM documents GROUP BY lang
    """,
)
def scan_file_metadata_provenance(spark, sf_dir):
    """Per-file provenance via the hidden ``_metadata`` struct: the
    documents table is re-written partitioned by lang, read back with
    ``_metadata.file_path`` / ``file_size`` projected, and the
    per-language rollup is ASSERTED to agree with file provenance —
    every row's file path must sit under its own lang= directory (a
    row whose content and provenance disagree fails the filter and
    the count drops). The lineage columns every audit pipeline wants
    come from the reader for free — no path-parsing UDFs.

    The oracle states the content-side truth; the Spark side only
    matches it if the provenance check holds for every row."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_meta_")
    try:
        t.documents.write.mode("overwrite").partitionBy("lang").parquet(out)
        back = spark.read.parquet(out).select(
            "lang",
            "n_chars",
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.file_size").alias("fs"),
        )
        consistent = back.filter(
            F.col("fp").contains(F.concat(F.lit("lang="), F.col("lang")))
            & (F.col("fs") > 0)
        )
        return (
            consistent.groupBy("lang")
            .agg(
                F.count("*").alias("n_rows"),
                F.countDistinct(F.col("n_chars").cast("bigint")).alias(
                    "n_char_variants"
                ),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_ignore_corrupt_files",
    oracle=f"""
    SELECT count(*) AS n_rows, {osum('o_totalprice')} AS revenue
    FROM orders WHERE o_orderkey % 9 = 0
    """,
)
def scan_ignore_corrupt_files(spark, sf_dir):
    """Corrupt-file resilience: a directory holding one valid parquet
    file AND one garbage file (truncated bytes with a .parquet name —
    the torn upload / partial write every object store eventually
    serves) is read with ``ignoreCorruptFiles`` — the job completes
    with exactly the valid file's rows, pinned by the oracle. Without
    the option this read THROWS (asserted in tests/test_tables.py),
    so the operator documents both sides of the trade: availability
    with explicit data-loss accounting vs fail-fast.

    File-level skip happens at footer validation, before any row
    decoding — the check costs one footer read per file."""
    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_corrupt_")
    try:
        t.orders.filter(F.col("o_orderkey") % 9 == 0).coalesce(
            1
        ).write.mode("overwrite").parquet(out)
        with open(os.path.join(out, "part-corrupt.parquet"), "wb") as fh:
            fh.write(b"PAR1garbage-not-a-real-footer")
        back = (
            spark.read.option("ignoreCorruptFiles", "true")
            .parquet(out)
        )
        return back.agg(
            F.count("*").alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_text_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents
    WHERE NOT regexp_matches(text, '[\t\n\r]')
    GROUP BY lang
    """,
)
def scan_text_roundtrip(spark, sf_dir):
    """Plain-text source round trip — the rawest ingestion format an
    LLM corpus pipeline meets (one record per line, no schema, no
    types): documents serialize as tab-separated ``doc_id\\tlang\\ttext``
    lines via the text sink, come back through ``spark.read.text`` as a
    single ``value`` column, and are re-parsed with split(). Docs containing tab/newline/CR cannot ride this framing and are
    filtered on both sides, so the round trip is lossless on its domain — which the per-language char-count aggregate
    proves against the parquet originals.

    Scale shape: the text source is line-splittable, so a 100 TB dump
    parallelizes like CSV; parsing is two split() calls, map-only, and
    the only shuffle is the tiny per-lang rollup. substring_index
    keeps everything after the second tab intact (text itself could
    legally contain no delimiter only — no regex, no quoting pass)."""
    t = Tables(spark, sf_dir)
    # the line format's intrinsic domain: a record IS a line, so docs
    # containing the delimiters (tab/newline/CR) cannot be framed —
    # they are excluded on BOTH sides (r10 stress corpus plants some).
    # A production dump of arbitrary text needs an encoding pass
    # (base64 or \-escaping) — that is a different exhibit; this one
    # shows the raw splittable format at its honest boundary.
    lines = t.documents.filter(
        ~F.col("text").rlike("[\t\n\r]")
    ).select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            "lang",
            "text",
        ).alias("value")
    )
    out = tempfile.mkdtemp(prefix="thrive_text_")
    try:
        lines.write.mode("overwrite").text(out)
        back = spark.read.text(out).select(
            F.split_part("value", F.lit("\t"), F.lit(1))
            .cast("bigint")
            .alias("doc_id"),
            F.split_part("value", F.lit("\t"), F.lit(2)).alias("lang"),
            F.substring_index("value", "\t", -1).alias("text"),
        )
        return (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.length("text")).cast("bigint").alias("total_chars"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc"),
            )
            .localCheckpoint()  # materialize before the temp dir vanishes
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
