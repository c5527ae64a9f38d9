"""Hudi table as a STREAMING SOURCE without the connector jar —
``readStream.format("thrive_hudi")`` tails the timeline, emitting
each completed instant's CHANGED ROWS as a micro-batch: the streaming
form of Hudi's incremental query, and the third jar-free lakehouse
source next to thrive_delta and thrive_iceberg.

Offsets are INSTANTS (lexicographically ordered timeline ids — the
same cursor the real incremental source uses). Planning never lists
the data directory: each instant's .commit/.deltacommit metadata
names exactly the files that write produced, so a trigger plans
O(changed files) from the timeline alone.

COPY_ON_WRITE: a rewritten slice physically carries old rows too; the
per-row ``_hoodie_commit_time`` the writer preserves on carried rows
is what lets the executor-side read filter each slice to ONLY the
rows that instant actually changed — no duplicates across batches,
the exactly-once shape downstream CDC needs.  MERGE_ON_READ (r15):
a deltacommit's stats name LOG FILES — the partition reader decodes
their Avro data blocks (hudi_lite's spec-shaped block parser) and
emits the records whose block header INSTANT_TIME equals the batch's
instant, which is exactly the upserted rows; base files a deltacommit
opens for NEW keys stream like COW slices.  A compaction commit
re-emits nothing: its base files carry only pre-existing commit
times.

Honest bounds: completed instants only (requested/inflight writes are
invisible until their atomic rename), a committed offset whose
timeline files were archived away raises rather than re-labels
history, and DELETE blocks emit no rows (the batch feed carries
upserts; a CDC consumer needing delete events reads the blocks via
hudi_lite directly).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _meta_dir(root: str) -> str:
    return os.path.join(root, ".hoodie")


def _timeline(root: str) -> list[str]:
    """Completed instants: .commit (COW write / compaction) and
    .deltacommit (MOR write) markers, ascending."""
    d = _meta_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        for act in ("deltacommit", "commit"):
            if f.endswith("." + act) and f.count(".") == 1:
                out.append(f[: -(len(act) + 1)])
                break
    return sorted(out)


def _commit_meta(root: str, instant: str) -> dict:
    d = _meta_dir(root)
    for act in ("deltacommit", "commit"):
        p = os.path.join(d, f"{instant}.{act}")
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
    raise ValueError(f"instant {instant!r} not in timeline")


def _check_type(root: str) -> None:
    props = {}
    with open(os.path.join(_meta_dir(root), "hoodie.properties")) as fh:
        for line in fh:
            if "=" in line:
                k, v = line.strip().split("=", 1)
                props[k] = v
    if props.get("hoodie.table.type") not in (
        "COPY_ON_WRITE", "MERGE_ON_READ"
    ):
        raise NotImplementedError(
            "thrive_hudi streams COPY_ON_WRITE and MERGE_ON_READ "
            f"tables (got {props.get('hoodie.table.type')!r})"
        )


def _schema_of(root: str):
    """Schema from any committed slice's parquet footer (pyarrow —
    planning runs on the data source's driver thread, no session)."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    tl = _timeline(root)
    if not tl:
        raise ValueError(f"no completed Hudi commits under {root}")
    for ins in tl:
        for stats in _commit_meta(
            root, ins
        )["partitionToWriteStats"].values():
            for st in stats:
                if st["path"].endswith(".parquet"):
                    sch = pq.read_schema(
                        os.path.join(root, st["path"])
                    )
                    return from_arrow_schema(sch)
    raise ValueError(f"no base parquet file committed under {root}")


class HudiStreamDataSource(DataSource):
    """``readStream.format("thrive_hudi")`` — option ``path`` (table
    root, required). Emits the table's full row shape including the
    _hoodie meta columns (consumers group/filter on
    _hoodie_commit_time)."""

    @classmethod
    def name(cls) -> str:
        return "thrive_hudi"

    def schema(self):
        return _schema_of(self.options["path"])

    def streamReader(self, schema):
        return HudiStreamReader(self.options, schema)


class HudiStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.root = options["path"]
        self.schema = schema
        _check_type(self.root)

    def initialOffset(self) -> dict:
        return {"instant": ""}

    def latestOffset(self) -> dict:
        tl = _timeline(self.root)
        return {"instant": tl[-1] if tl else ""}

    def partitions(self, start: dict, end: dict):
        s, e = start["instant"], end["instant"]
        cols = [f.name for f in self.schema.fields]
        parts: list[InputPartition] = []
        for ins in _timeline(self.root):
            if not (s < ins <= e):
                continue
            meta = _commit_meta(self.root, ins)
            for stats in meta["partitionToWriteStats"].values():
                for st in stats:
                    p = os.path.join(self.root, st["path"])
                    if not os.path.exists(p):
                        raise ValueError(
                            f"hudi stream: file {st['path']} of "
                            f"instant {ins} no longer exists "
                            "(cleaned?) — the incremental feed "
                            "cannot be reconstructed"
                        )
                    parts.append(InputPartition((p, cols, ins)))
        return parts or [InputPartition((None, cols, ""))]

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint WAL is the source of truth

    def read(self, partition):
        path, cols, instant = partition.value
        if path is None:
            return
        if ".log." in os.path.basename(path):
            # MOR log file: decode the blocks THIS instant appended
            # (a log file holds one commit's block in this writer,
            # but the header check is what the spec guarantees)
            from ..sources.hudi_lite import decode_log_records

            with open(path, "rb") as fh:
                data = fh.read()
            for is_del, ins, rec in decode_log_records(
                data, frozenset([instant]), instant
            ):
                if is_del or ins != instant:
                    continue
                yield tuple(rec.get(c) for c in cols)
            return
        import pyarrow.parquet as pq

        pdf = pq.read_table(path).to_pandas()
        # a rewritten slice carries prior rows with their ORIGINAL
        # commit times — only this instant's rows belong to the batch
        pdf = pdf[pdf["_hoodie_commit_time"] == instant]
        for row in pdf[cols].itertuples(index=False, name=None):
            yield tuple(row)


def register(spark) -> None:
    try:
        spark.dataSource.register(HudiStreamDataSource)
    except Exception:  # noqa: BLE001 — already registered on this session
        pass


from pyspark.sql import functions as F  # noqa: E402

from ..operators._util import dsum, osum  # noqa: E402
from ..registry import query  # noqa: E402


@query(
    "scan_hudi_stream",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        WHERE o_orderkey % 43 = 0
    ),
    upd AS (
        SELECT k, p + 1e5 AS p FROM base WHERE k % 2 = 0
    ),
    ins AS (
        SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        WHERE o_orderkey % 43 = 6
    )
    SELECT '00000000000001' AS instant, count(*) AS n_rows,
           {osum('p')} AS sum_p FROM base
    UNION ALL
    SELECT '00000000000002', count(*), {osum('p')}
    FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
    """,
)
def scan_hudi_stream(spark, sf_dir):
    """Hudi INCREMENTAL PULL as a Structured Streaming source,
    driver-verified: a bulk insert and an upsert land on the
    timeline, then ``readStream.format("thrive_hudi")`` drains the
    table with instants as offsets — batch 1 is the initial insert,
    batch 2 is EXACTLY the upsert's changed rows (updates + new
    keys), even though the rewritten slice physically carries every
    old row of its file group: the per-row commit-time filter is
    what the oracle's per-instant hash pins. Planning reads the
    .commit metadata, never a directory listing — O(changed files)
    per trigger, the property that makes a 100 TB table tailable."""
    import tempfile

    from ..sources.acid import _detach_and_cleanup
    from ..sources.hudi_lite import HudiLiteTable
    from ..tables import Tables

    t = Tables(spark, sf_dir)
    orders = t.orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    base = orders.filter("k % 43 = 0")
    root = tempfile.mkdtemp(prefix="thrive_hudi_stream_")
    tdir = os.path.join(root, "table")
    tbl = HudiLiteTable(spark, tdir, key_field="k")
    tbl.bulk_insert(base, groups=2)
    upd = base.filter("k % 2 = 0").select(
        "k", (F.col("p") + F.lit(1e5)).alias("p")
    )
    ins = orders.filter("k % 43 = 6")
    tbl.upsert(upd.unionByName(ins))
    register(spark)
    out = os.path.join(root, "out")
    q = (
        spark.readStream.format("thrive_hudi")
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
        .groupBy(F.col("_hoodie_commit_time").alias("instant"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("p").alias("sum_p"),
        )
    )
    return _detach_and_cleanup(spark, agg, root)

@query(
    "scan_hudi_mor_stream",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        WHERE o_orderkey % 53 = 0
    ),
    upd AS (
        SELECT k, p + 1e5 AS p FROM base WHERE k % 2 = 0
    ),
    ins AS (
        SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        WHERE o_orderkey % 53 = 7
    )
    SELECT '00000000000001' AS instant, count(*) AS n_rows,
           {osum('p')} AS sum_p FROM base
    UNION ALL
    SELECT '00000000000002', count(*), {osum('p')}
    FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
    """,
)
def scan_hudi_mor_stream(spark, sf_dir):
    """Hudi MERGE_ON_READ as a Structured Streaming source,
    driver-verified (r14 verdict #1's stream-source half): a MOR
    bulk insert and an upsert land on the timeline as deltacommits,
    then ``readStream.format("thrive_hudi")`` drains the table —
    batch 1 streams the base files, batch 2 is EXACTLY the upsert's
    changed rows, assembled from TWO kinds of files the deltacommit's
    stats name: updates decoded from the log file's Avro data block
    (hudi_lite's spec-shaped block parser, header INSTANT_TIME
    matched to the batch's instant) and inserts read from the new
    key's base file. A final COMPACTION commit folds the logs and
    must re-emit NOTHING (its base files carry only pre-existing
    commit times) — pinned because the streamed groupBy would grow a
    third instant row and break the oracle hash if compaction
    leaked. Planning reads commit metadata only — O(changed files)
    per trigger at 100 TB."""
    import tempfile

    from ..sources.acid import _detach_and_cleanup
    from ..sources.hudi_lite import HudiLiteTable
    from ..tables import Tables

    t = Tables(spark, sf_dir)
    orders = t.orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    base = orders.filter("k % 53 = 0")
    root = tempfile.mkdtemp(prefix="thrive_hudi_mor_stream_")
    tdir = os.path.join(root, "table")
    tbl = HudiLiteTable(spark, tdir, key_field="k")
    tbl.bulk_insert(base, groups=2, table_type="MERGE_ON_READ")
    upd = base.filter("k % 2 = 0").select(
        "k", (F.col("p") + F.lit(1e5)).alias("p")
    )
    ins = orders.filter("k % 53 = 7")
    tbl.upsert(upd.unionByName(ins))
    # the upsert's stats must name BOTH file kinds: a log file for
    # the updates and a base parquet for the inserted keys
    stats = tbl.commit_meta(tbl.timeline()[-1])["partitionToWriteStats"]
    kinds = {
        ".log." in st["path"] for sts in stats.values() for st in sts
    }
    assert kinds == {True, False}, stats
    tbl.compact()
    register(spark)
    out = os.path.join(root, "out")
    q = (
        spark.readStream.format("thrive_hudi")
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
        .groupBy(F.col("_hoodie_commit_time").alias("instant"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("p").alias("sum_p"),
        )
    )
    return _detach_and_cleanup(spark, agg, root)
