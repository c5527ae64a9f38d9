"""ACID table as a STREAMING SOURCE (Delta streaming-source role):
``readStream.format("thrive_table")`` tails a ThriveTable's commit
log, emitting each new version's appended rows as a micro-batch.

Offsets are table VERSIONS — the natural exactly-once cursor: the
checkpoint records (start_version, end_version] per batch, a restart
replans exactly the uncommitted versions, and the manifest log is
immutable so replays are byte-identical. This closes the loop with
acid_stream_sink (stream → table): table → stream → table pipelines
compose with exactly-once on both edges.

Append-only discipline, exactly like Delta's streaming source: a
version that REMOVES files (delete/merge/compact rewrites) raises by
default — a stream consumer would otherwise silently miss deletes;
``ignorechanges=true`` opts into skipping such versions' removed-file
semantics and emitting only their added rows (Delta's ignoreChanges).

Scale shape: one InputPartition per (version, data file) — executor
parallelism is the commit's file count, rows cross as Arrow batches
via pyarrow on the executor (no SparkSession exists there). Driver
planning cost is manifest reads: O(segments) after the r12
manifest-of-manifests split.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _manifest(root: str, v: int) -> dict:
    with open(os.path.join(root, "_manifests", f"v{v}.json")) as f:
        return json.load(f)


def _versions(root: str) -> list[int]:
    mdir = os.path.join(root, "_manifests")
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    )


def _files_of(root: str, m: dict) -> list[str]:
    import pyarrow.parquet as pq

    out: list[str] = []
    for seg in m.get("segments", []):
        out.extend(pq.read_table(seg["path"])["path"].to_pylist())
    out.extend(m.get("files", []))
    return out


class TableStreamDataSource(DataSource):
    """``readStream.format("thrive_table")`` — options: ``path`` (table
    root, required), ``ignorechanges`` (accept rewrite commits by
    emitting only their added files; default false = raise)."""

    @classmethod
    def name(cls) -> str:
        return "thrive_table"

    def schema(self) -> str:
        # the LATEST manifest schema governs the stream (schema
        # evolution widens with NULL backfill, same as snapshot reads)
        root = self.options["path"]
        vs = _versions(root)
        if not vs:
            raise ValueError(f"no committed versions under {root}")
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(
            json.loads(_manifest(root, vs[-1])["schema"])
        )
        return schema

    def streamReader(self, schema):
        return TableStreamReader(self.options, schema)


class TableStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.root = options["path"]
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        vs = _versions(self.root)
        return {"version": vs[-1] if vs else 0}

    def partitions(self, start: dict, end: dict):
        parts = []
        prev_files: set = set()
        sv, ev = int(start["version"]), int(end["version"])
        if sv > 0:
            prev_files = set(_files_of(self.root, _manifest(self.root, sv)))
        for v in range(sv + 1, ev + 1):
            m = _manifest(self.root, v)
            cur = set(_files_of(self.root, m))
            removed = prev_files - cur
            if removed and not self.ignore_changes:
                raise ValueError(
                    f"version {v} ({m['op']}) rewrites files; the "
                    "streaming source is append-only — set "
                    "ignorechanges=true to stream added rows anyway "
                    "(deletes will NOT be propagated)"
                )
            for f in sorted(cur - prev_files):
                parts.append(InputPartition((f, [fld.name for fld in self.schema.fields])))
            prev_files = cur
        # an empty range still needs >=1 partition to plan
        return parts or [InputPartition((None, []))]

    def commit(self, end: dict) -> None:
        pass  # the checkpoint WAL is the source of truth

    def read(self, partition):
        path, cols = partition.value
        if path is None:
            return
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        names = set(tbl.column_names)
        pdf = tbl.to_pandas()
        for col in cols:
            if col not in names:
                pdf[col] = None  # schema-evolution NULL backfill
        for row in pdf[cols].itertuples(index=False, name=None):
            yield tuple(row)


def register(spark) -> None:
    try:
        spark.dataSource.register(TableStreamDataSource)
    except Exception:  # noqa: BLE001 — already registered on this session
        pass


from pyspark.sql import functions as F  # noqa: E402

from ..operators._util import dsum, osum  # noqa: E402
from ..registry import query  # noqa: E402


@query(
    "scan_table_stream",
    oracle=f"""
    WITH rows_ AS (
        SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        WHERE o_orderkey % 17 IN (0, 5, 9)
    )
    SELECT CAST(k % 5 AS BIGINT) AS grp, count(*) AS n,
           {osum('p')} AS sum_p
    FROM rows_ GROUP BY 1
    """,
)
def scan_table_stream(spark, sf_dir):
    """The ACID table as a streaming source, driver-verified: three
    commits land (create + two appends), a Structured Streaming query
    tails the commit log with VERSIONS as offsets and drains every
    appended row, and the result aggregate hash-matches the
    relational union of the three slices — produce → version-offset
    planning → per-file partitions → drain, the table-to-stream twin
    of acid_stream_ingest's stream-to-table edge."""
    import tempfile

    from ..sources.acid import ThriveTable, _detach_and_cleanup
    from ..tables import Tables

    t = Tables(spark, sf_dir)
    orders = t.orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    root = tempfile.mkdtemp(prefix="thrive_tbl_stream_")
    tdir = os.path.join(root, "table")
    tbl = ThriveTable(spark, tdir)
    tbl.create(orders.filter("k % 17 = 0").repartition(3))
    tbl.append(orders.filter("k % 17 = 5").repartition(3))
    tbl.append(orders.filter("k % 17 = 9").repartition(3))
    register(spark)
    out = os.path.join(root, "out")
    q = (
        spark.readStream.format("thrive_table")
        .option("path", tdir)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    agg = (
        spark.read.parquet(out)
        .groupBy((F.col("k") % 5).cast("bigint").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("p").alias("sum_p"))
    )
    return _detach_and_cleanup(spark, agg, root)
