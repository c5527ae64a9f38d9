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
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

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


class JsonlSinkDataSource(DataSource):
    """``df.write.format("thrive_jsonl_sink")`` — a pure-Python SINK
    via Spark 4's DataSourceWriter API, completing the custom-source
    surface (scan_python_datasource covers the read side).

    The exhibit is the TWO-PHASE COMMIT contract, which is the whole
    point of the writer API: each task writes a `.tmp` file and
    returns a WriterCommitMessage; only the DRIVER's commit() renames
    tmps to visible `part-*.jsonl` and stamps `_SUCCESS` — so a
    failed/speculative task attempt can never leak a partial file
    into readers (abort() unlinks its tmps). This is the same
    task-commit protocol FileOutputCommitter runs for parquet, here
    implemented explicitly in ~30 lines of Python."""

    @classmethod
    def name(cls) -> str:
        return "thrive_jsonl_sink"

    def writer(self, schema, overwrite):
        return JsonlWriter(self.options["path"], [f.name for f in schema.fields])


class JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp: str, n_rows: int):
        self.tmp = tmp
        self.n_rows = n_rows


class JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, cols):
        self.path = path
        self.cols = cols

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".{uuid.uuid4().hex[:12]}.tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(
                    {c: row[c] for c in self.cols}, separators=(",", ":")
                ) + "\n")
                n += 1
        return JsonlCommit(tmp, n)

    def commit(self, messages):
        import json
        import os

        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.replace(m.tmp, os.path.join(self.path, f"part-{i:05d}.jsonl"))
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"n_rows": total}, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp):
                os.unlink(m.tmp)


@query(
    "sink_python_datasource",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total,
           min(md5(text)) AS content_probe
    FROM documents WHERE doc_id % 3 = 0
    GROUP BY lang
    """,
)
def sink_python_datasource(spark, sf_dir):
    """Round trip through the pure-Python two-phase-commit sink: a
    documents slice (content carried as an md5 probe — the JSONL
    payload stays ASCII) writes via format("thrive_jsonl_sink"),
    the committed part files read back under an explicit schema, and
    the oracle pins per-language counts/sums/digests from the SOURCE
    rows — the hash verifies task-write → driver-commit → visible
    files with no loss, duplication, or tmp leakage (asserted
    in-query)."""
    import os
    import tempfile

    from ..tables import Tables

    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="thrive_pyds_sink_")
    path = os.path.join(out, "docs")
    try:
        spark.dataSource.register(JsonlSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered on this session
        pass
    (
        t.documents.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", "lang", "n_chars", F.md5("text").alias("h"))
        .write.format("thrive_jsonl_sink")
        .mode("append")
        .save(path)
    )
    files = os.listdir(path)
    assert "_SUCCESS" in files, files
    assert not [f for f in files if f.endswith(".tmp")], files
    back = (
        spark.read.schema("doc_id long, lang string, n_chars long, h string")
        .json(os.path.join(path, "part-*.jsonl"))
    )
    agg = back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
        F.min("h").alias("content_probe"),
    )
    from .acid import _detach_and_cleanup

    return _detach_and_cleanup(spark, agg, out)
