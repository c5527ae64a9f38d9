"""Additional source formats: ORC roundtrip and Spark-4 VARIANT
(open-schema JSON) — rounding out the format matrix beyond
parquet/CSV/JSON (§2.1).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ..operators._util import dsum, osum
from ..registry import query
from ..tables import Tables


@query(
    "scan_orc_roundtrip",
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n, {osum('o_totalprice')} AS sum_price
    FROM orders WHERE o_orderkey % 5 = 0
    GROUP BY o_orderstatus
    """,
)
def scan_orc_roundtrip(spark, sf_dir):
    """Write an orders slice as ORC, read it back, aggregate — ORC is
    the second columnar format the reference's Hive targets commonly
    use [R]; Spark's ORC reader is vectorized with pushdown like
    parquet."""
    t = Tables(spark, sf_dir)
    slice_df = t.orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = tempfile.mkdtemp(prefix="thrive_orc_")
    try:
        slice_df.write.mode("overwrite").orc(out)
        back = spark.read.orc(out)
        return (
            back.groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("sum_price"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "scan_variant_json",
    oracle="""
    SELECT event_type,
           CAST(sum(CASE WHEN json_valid(props) THEN
                    CAST(json_extract_string(props, '$.k') AS BIGINT) END)
                AS BIGINT) AS sum_k,
           count(CASE WHEN json_valid(props)
                      THEN json_extract_string(props, '$.k') END)
               AS n_with_k
    FROM events GROUP BY event_type
    """,
)
def scan_variant_json(spark, sf_dir):
    """Open-schema JSON via Spark 4 VARIANT: parse once into a variant
    column, extract typed paths lazily — the schema-on-read answer for
    payloads whose shape drifts (vs from_json's fixed StructType).
    Extraction pushdown happens per-path at query time."""
    t = Tables(spark, sf_dir)
    # try_parse_json: corrupt payloads become NULL variants instead of
    # a FAILFAST job abort — one bad record must not kill a 100 TB scan
    v = t.events.select(
        "event_type", F.try_parse_json("props").alias("v")
    )
    return v.groupBy("event_type").agg(
        F.sum(F.variant_get("v", "$.k", "bigint")).alias("sum_k"),
        F.count(F.variant_get("v", "$.k", "bigint")).alias("n_with_k"),
    )


@query(
    "scan_xml_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total,
           min(md5(text)) AS content_probe
    FROM documents WHERE doc_id < 400
    GROUP BY lang
    """,
)
def scan_xml_roundtrip(spark, sf_dir):
    """XML round trip via Spark 4's built-in XML source: a documents
    slice is written as ``<doc>`` records and read back with an
    explicit schema; the oracle pins per-language counts and a
    content digest from the SOURCE rows, so the round trip proves
    text (including multi-byte scripts and XML-escaped characters)
    survives entity encoding byte-exactly.

    Scale notes: the XML reader splits files on rowTag boundaries and
    infers nothing here (explicit schema — inference is a full extra
    pass at 100 TB); writers are map-only. XML is the slowest of the
    format matrix (tag overhead, no columnar pushdown) — it's an
    interchange format, not a storage one; this operator exists so
    feeds that arrive as XML land correctly, not as a recommendation.
    """
    t = Tables(spark, sf_dir)
    slice_df = t.documents.filter(F.col("doc_id") < 400).select(
        "doc_id", "text", "lang", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="thrive_xml_")
    try:
        slice_df.write.mode("overwrite").option("rowTag", "doc").format(
            "xml"
        ).save(out)
        back = (
            spark.read.format("xml")
            .option("rowTag", "doc")
            .schema("doc_id long, text string, lang string, n_chars long")
            .load(out)
        )
        return (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("chars_total"),
                F.min(F.md5("text")).alias("content_probe"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
