"""Iceberg table as a Structured Streaming SOURCE, jar-free (r14) —
the Iceberg twin of streaming/delta_source.py.

Offsets are SNAPSHOT IDS in table-metadata commit order (the
``snapshots`` list — Iceberg snapshot ids are arbitrary longs, so
ordinal position, not numeric order, defines progress). Each
micro-batch plans the file-set DIFF between consecutive snapshots via
the same pure-Python metadata walk the batch reader uses
(metadata.json → Avro manifest list → Avro manifests — no
SparkSession on the data-source planning thread), and emits one input
partition per ADDED data file with its identity-partition values
re-materialized. Snapshots that remove files (COW deletes,
overwrites) break the append-only contract and refuse unless
``ignorechanges=true`` (adds stream, removals are NOT propagated —
the same semantics as the Delta source).

Expiration interacts with restarts exactly like Delta's cleanup_log:
a committed snapshot id that expire_snapshots() removed is
unreconstructible — default is an actionable error;
``allowoffsetgaps=true`` resumes from the OLDEST retained snapshot,
skipping rows added in the gap (documented data loss, opt-in only).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..sources.iceberg_lite import _ICE_TO_SPARK, IcebergLiteTable


def _tbl(root: str) -> IcebergLiteTable:
    return IcebergLiteTable(None, root)  # planning never touches spark


class IcebergStreamDataSource(DataSource):
    """``readStream.format("thrive_iceberg")`` — options: ``path``
    (table root, required), ``ignorechanges``, ``allowoffsetgaps``."""

    @classmethod
    def name(cls) -> str:
        return "thrive_iceberg"

    def schema(self) -> str:
        md = _tbl(self.options["path"]).metadata()
        return ", ".join(
            f"{f['name']} {_ICE_TO_SPARK[f['type']]}"
            for f in md["schema"]["fields"]
        )

    def streamReader(self, schema):
        return IcebergStreamReader(self.options, schema)


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.root = options["path"]
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.allow_offset_gaps = (
            str(options.get("allowoffsetgaps", "false")).lower() == "true"
        )
        self.schema = schema
        md = _tbl(self.root).metadata()
        self.part_names = [
            f["name"]
            for f in next(
                s for s in md["partition-specs"]
                if s["spec-id"] == md["default-spec-id"]
            )["fields"]
        ]

    def initialOffset(self) -> dict:
        return {"sid": -1}

    def latestOffset(self) -> dict:
        snaps = _tbl(self.root).snapshots()
        return {"sid": snaps[-1]["snapshot-id"] if snaps else -1}

    def partitions(self, start: dict, end: dict):
        sv, ev = int(start["sid"]), int(end["sid"])
        tbl = _tbl(self.root)
        snaps = tbl.snapshots()  # metadata commit order
        ids = [s["snapshot-id"] for s in snaps]
        if ev == -1 or sv == ev:
            return [InputPartition((None, [], [], {}))]
        if sv == -1:
            lo = 0
        elif sv in ids:
            lo = ids.index(sv) + 1
        elif self.allow_offset_gaps and snaps:
            # skip semantics, matching the Delta source's gap resume:
            # the oldest RETAINED snapshot counts as already consumed
            # (its state becomes `prev`), so only files added by LATER
            # snapshots emit — gap rows are knowingly skipped, and
            # nothing already drained duplicates
            sv = ids[0]
            lo = 1
        else:
            raise ValueError(
                f"iceberg stream: committed snapshot {sv} has been "
                "expired from the table metadata. Either re-create "
                "the query checkpoint, or set allowoffsetgaps=true to "
                "resume from the oldest retained snapshot — rows "
                "added between the committed offset and it will be "
                "SKIPPED. Operationally: expire_snapshots must not "
                "outrun consumer offsets."
            )
        try:
            hi = ids.index(ev) + 1
        except ValueError:
            raise ValueError(
                f"iceberg stream: end snapshot {ev} not in metadata"
            ) from None

        fields = [
            (f.name, f.dataType.simpleString())
            for f in self.schema.fields
        ]
        parts: list[InputPartition] = []
        prev: dict[str, dict] = {}
        prev_del: set[str] = set()
        if sv != -1:
            pf, pd, _ = tbl._plan(sv)
            prev = {f["file_path"]: f for f in pf}
            prev_del = {d["file_path"] for d in pd}
        for i in range(lo, hi):
            cf, cd, _ = tbl._plan(ids[i])
            cur = {f["file_path"]: f for f in cf}
            cur_del = {d["file_path"] for d in cd}
            removed = set(prev) - set(cur)
            if removed and not self.ignore_changes:
                raise ValueError(
                    f"iceberg stream: snapshot {ids[i]} removes "
                    "files; the streaming source is append-only — "
                    "set ignorechanges=true to stream added rows "
                    "anyway (deletes will NOT be propagated)"
                )
            if cur_del - prev_del:
                # v2 position deletes mark rows dead in files ALREADY
                # emitted — no flag makes that append-only-safe
                raise ValueError(
                    f"iceberg stream: snapshot {ids[i]} adds position "
                    "delete files; the streaming source would leave "
                    "deleted rows in the output — read via "
                    "IcebergLiteTable.snapshot() instead"
                )
            prev_del = cur_del
            for p in sorted(set(cur) - set(prev)):
                parts.append(InputPartition((
                    os.path.join(self.root, p),
                    [n for n, _ in fields],
                    [t for _, t in fields],
                    {
                        c: cur[p]["partition"].get(c)
                        for c in self.part_names
                    },
                )))
            prev = cur
        return parts or [InputPartition((None, [], [], {}))]

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint WAL is the source of truth

    def read(self, partition):
        path, cols, types, pvs = partition.value
        if path is None:
            return
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        names = set(tbl.column_names)
        pdf = tbl.to_pandas()
        for col in cols:
            if col in pvs:
                pdf[col] = pvs[col]  # already typed (Avro long/string)
            elif col not in names:
                pdf[col] = None
        for row in pdf[cols].itertuples(index=False, name=None):
            yield tuple(row)


def register(spark) -> None:
    try:
        spark.dataSource.register(IcebergStreamDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass


from pyspark.sql import functions as F  # noqa: E402

from ..operators._util import dsum, osum  # noqa: E402
from ..registry import query  # noqa: E402


@query(
    "scan_iceberg_stream",
    oracle=f"""
    WITH rows_ AS (
        SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        WHERE o_orderkey % 17 IN (0, 5, 9)
    )
    SELECT CAST(k % 3 AS BIGINT) AS grp, count(*) AS n,
           {osum('p')} AS sum_p
    FROM rows_ GROUP BY 1
    """,
)
def scan_iceberg_stream(spark, sf_dir):
    """An Iceberg table tailed as a STREAM, jar-free and driver-
    verified — the Iceberg twin of scan_delta_stream: create + append
    land, expire_snapshots(keep_last=1) erases the older snapshot (the
    mature-table shape), a third slice appends — then a Structured
    Streaming query drains the table with snapshot ids as offsets.
    The first batch is the oldest RETAINED snapshot's full state
    (per-snapshot attribution below it is expired by design), the
    tail diffs incrementally via the manifest walk, and the drained
    aggregate hash-matches the relational union of all three slices:
    metadata walk → snapshot diff → per-file partitions → drain."""
    import tempfile

    from ..sources.acid import _detach_and_cleanup
    from ..tables import Tables

    t = Tables(spark, sf_dir)
    orders = t.orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    root = tempfile.mkdtemp(prefix="thrive_iceberg_stream_")
    tdir = os.path.join(root, "table")
    tbl = IcebergLiteTable(spark, tdir)
    tbl.create(orders.filter("k % 17 = 0").repartition(2))
    tbl.append(orders.filter("k % 17 = 5").repartition(2))
    stats = tbl.expire_snapshots(keep_last=1)
    assert stats["snapshots"] == 1, stats
    tbl.append(orders.filter("k % 17 = 9").repartition(2))
    register(spark)
    out = os.path.join(root, "out")
    q = (
        spark.readStream.format("thrive_iceberg")
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
        .groupBy((F.col("k") % 3).cast("bigint").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("p").alias("sum_p"))
    )
    return _detach_and_cleanup(spark, agg, root)
