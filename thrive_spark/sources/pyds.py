"""Spark 4 Python DataSource API: a custom source implemented in pure
Python (``pyspark.sql.datasource``) — the extension point for feeds
that have no built-in connector (internal REST APIs, bespoke binary
logs, simulators).

The exhibit source is a deterministic sensor-reading generator, so the
DuckDB oracle can re-derive every row from ``generate_series`` and the
driver hash-checks a CUSTOM SOURCE end-to-end — reader registration,
schema declaration, partition planning, and per-partition iteration.

Scale notes: ``partitions()`` is the parallelism contract — each
InputPartition becomes one Spark task reading independently (here 8
synthetic splits; for a real feed: one per file/shard/offset-range).
Rows yielded from ``read()`` cross into the JVM via Arrow batches, so
generator-style sources stream without materializing a partition in
memory. Python sources pay the Python-worker tax per partition — the
right use is ingest-once into parquet, not hot-path re-reads.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..operators._util import dsum, osum
from ..registry import query

#: generator geometry: 8 planned splits × 1250 rows
PDS_PARTS, PDS_ROWS = 8, 1250


class SensorDataSource(DataSource):
    """``format("thrive_sensor")`` — deterministic synthetic feed."""

    @classmethod
    def name(cls) -> str:
        return "thrive_sensor"

    def schema(self) -> str:
        return "reading_id bigint, sensor_id bigint, value double"

    def reader(self, schema):  # noqa: ARG002 — fixed schema
        return SensorReader(self.options)


class SensorReader(DataSourceReader):
    def __init__(self, options):
        self.parts = int(options.get("partitions", PDS_PARTS))
        self.rows = int(options.get("rowsperpartition", PDS_ROWS))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        base = partition.value * self.rows
        for i in range(self.rows):
            rid = base + i
            # integer-derived value: (rid·37 mod 1000)/10 is the same
            # double in any engine
            yield (rid, rid % 8, ((rid * 37) % 1000) / 10.0)


@query(
    "scan_python_datasource",
    oracle=f"""
    WITH g AS (
        SELECT unnest(generate_series(0, {PDS_PARTS * PDS_ROWS} - 1)) AS rid
    )
    SELECT rid % 8 AS sensor_id, count(*) AS n,
           CAST(max(rid) AS BIGINT) AS max_reading,
           {osum('((rid * 37) % 1000) / 10.0')} AS sum_value
    FROM g GROUP BY rid % 8
    """,
)
def scan_python_datasource(spark, sf_dir):  # noqa: ARG001 — source is synthetic
    """Read through the registered custom Python data source and
    aggregate per sensor; the oracle reconstructs the deterministic
    feed relationally, so the hash verifies the full custom-source
    path (plan → partitions → Arrow batches → rows)."""
    try:
        spark.dataSource.register(SensorDataSource)
    except Exception:  # noqa: BLE001 — already registered on this session
        pass
    df = spark.read.format("thrive_sensor").load()
    return df.groupBy("sensor_id").agg(
        F.count("*").alias("n"),
        F.max("reading_id").cast("bigint").alias("max_reading"),
        dsum("value").alias("sum_value"),
    )
