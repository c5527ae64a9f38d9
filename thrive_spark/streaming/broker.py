"""Broker-shim streaming source (r11, verdict #5): a Kafka-shape
message log + a Spark 4 Python ``DataSourceStreamReader`` with real
offset bookkeeping — the exactly-once story exercised beyond the
file-source checkpoint, with no broker in the sandbox.

The broker is an append-only log directory:

    <root>/p0.log    newline-terminated JSON records (partition 0)
    <root>/p0.idx    one line per produce() call: byte offset of the
                     log end after that segment (Kafka segment roles)
    <root>/_commits/<group>.json   consumer-committed offsets

Offsets are BYTE offsets into each partition log (seekable O(1), the
Kafka log-addressing model — record counts would make read() O(offset)
in line skipping). ``produce()`` only ever appends, so every offset a
checkpoint recorded stays valid across restarts; segment boundaries in
the .idx file are the only legal batch cut points, so a rate-limited
``latestOffset`` never splits a record.

Exactly-once across kill/resume: Spark's checkpoint stores the
(start, end] byte ranges per micro-batch; on restart the engine
replans ``partitions(start, end)`` from the last committed checkpoint
entry and re-reads exactly the uncommitted range, and the idempotent
foreachBatch sink (streaming/sinks.py) makes the replayed batch
overwrite itself. ``commit(end)`` additionally persists the consumer
group's position into the broker's own bookkeeping — the equivalent of
Kafka's __consumer_offsets, INCLUDING its trailing semantics: the
microbatch engine commits batch N's offsets while planning batch N+1,
so the marker lags the live position by one batch and the checkpoint
WAL stays the exactly-once source of truth. The rate limiter reads
the marker so ``maxsegmentspertrigger`` survives restarts too.

Scale notes: one InputPartition per broker partition per micro-batch —
executor parallelism is the partition count, exactly the Kafka source
contract; rows cross to the JVM as Arrow batches. The Python-worker
tax is paid once per partition per batch, not per row.

tests/test_streaming_recovery.py kills a rate-limited query mid-stream
and resumes it; ``scan_broker_stream`` below hash-checks the full
produce → offset-plan → read → drain path against a relational oracle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..operators._util import dsum, osum
from ..registry import query

SCHEMA = (
    "partition_id int, offset bigint, event_id bigint, ts_us bigint, "
    "user_id bigint, event_type string, value double"
)
_FIELDS = ("event_id", "ts_us", "user_id", "event_type", "value")


class BrokerLog:
    """Producer + admin handle for the file-backed log."""

    def __init__(self, root: str, n_partitions: int = 2):
        self.root = root
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)
        existing = [
            f for f in os.listdir(root)
            if f.startswith("p") and f.endswith(".log")
        ]
        self.n_partitions = max(n_partitions, len(existing))
        for p in range(self.n_partitions):
            for ext in (".log", ".idx"):
                path = self._path(p, ext)
                if not os.path.exists(path):
                    open(path, "ab").close()

    def _path(self, p: int, ext: str) -> str:
        return os.path.join(self.root, f"p{p}{ext}")

    def produce(self, rows) -> None:
        """Append one SEGMENT per partition: rows are routed by
        user_id % n_partitions (the keyed-producer contract — one key
        always lands in one partition, preserving per-key order)."""
        buckets: dict[int, list] = {}
        for row in rows:
            buckets.setdefault(
                int(row["user_id"]) % self.n_partitions, []
            ).append(row)
        for p, batch in sorted(buckets.items()):
            payload = b"".join(
                json.dumps(
                    {k: rec[k] for k in _FIELDS}, separators=(",", ":")
                ).encode() + b"\n"
                for rec in batch
            )
            with open(self._path(p, ".log"), "ab") as f:
                f.write(payload)
                end = f.tell()
            with open(self._path(p, ".idx"), "ab") as f:
                f.write(f"{end}\n".encode())

    def end_offsets(self) -> dict:
        return {
            str(p): os.path.getsize(self._path(p, ".log"))
            for p in range(self.n_partitions)
        }

    def committed(self, group: str = "default") -> dict | None:
        path = os.path.join(self.root, "_commits", f"{group}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)


class BrokerDataSource(DataSource):
    """``readStream.format("thrive_broker")`` — options: ``path``
    (broker root, required), ``group`` (consumer group, default
    "default"), ``maxsegmentspertrigger`` (rate limit, default
    unlimited)."""

    @classmethod
    def name(cls) -> str:
        return "thrive_broker"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema):  # noqa: ARG002 — fixed schema
        return BrokerStreamReader(self.options)


class BrokerStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.root = options["path"]
        self.group = options.get("group", "default")
        self.max_segs = int(options.get("maxsegmentspertrigger", 0))
        self.n_partitions = len(
            [f for f in os.listdir(self.root) if f.endswith(".log")]
        )
        # rate-limit base within this reader's lifetime: the last
        # offset we HANDED TO the engine. The durable base across
        # restarts is the committed marker (latestOffset merges both —
        # planning must never wait on the commit callback, or
        # processAllAvailable sees "no new data" between a batch
        # completing and its commit landing and stops early).
        self._planned: dict[str, int] = {}

    # -- offset bookkeeping (driver side) --

    def _segments(self, p: int) -> list[int]:
        with open(os.path.join(self.root, f"p{p}.idx")) as f:
            return [int(line) for line in f if line.strip()]

    def initialOffset(self) -> dict:
        return {str(p): 0 for p in range(self.n_partitions)}

    def latestOffset(self) -> dict:
        """Newest segment boundary per partition — rate-limited to
        ``maxsegmentspertrigger`` segments past the rate-limit base:
        max(last offset planned this session, consumer group's last
        COMMITTED position). The committed marker (our
        __consumer_offsets twin) makes the limit durable across
        restarts; the in-session planned cursor keeps planning ahead
        of the asynchronous commit callback."""
        commits_path = os.path.join(
            self.root, "_commits", f"{self.group}.json"
        )
        committed = {}
        if os.path.exists(commits_path):
            with open(commits_path) as f:
                committed = json.load(f)
        out = {}
        for p in range(self.n_partitions):
            segs = self._segments(p)
            end = segs[-1] if segs else 0
            if self.max_segs:
                cur = max(
                    int(committed.get(str(p), 0)),
                    self._planned.get(str(p), 0),
                )
                ahead = [s for s in segs if s > cur]
                if ahead:
                    end = ahead[min(self.max_segs, len(ahead)) - 1]
                else:
                    end = cur
            out[str(p)] = end
        self._planned = {
            k: max(v, self._planned.get(k, 0)) for k, v in out.items()
        }
        return out

    def partitions(self, start: dict, end: dict):
        # a restart replans from checkpoint offsets that may be ahead
        # of both our marker and this reader's cursor — adopt them
        for k, v in start.items():
            if int(v) > self._planned.get(k, 0):
                self._planned[k] = int(v)
        parts = []
        for p in range(self.n_partitions):
            s, e = int(start.get(str(p), 0)), int(end.get(str(p), 0))
            if e > s:
                parts.append(InputPartition((p, s, e)))
        # an empty micro-batch still needs >=1 partition to plan
        return parts or [InputPartition((0, 0, 0))]

    def commit(self, end: dict) -> None:
        """Persist the consumer group's position (atomic rename)."""
        path = os.path.join(self.root, "_commits", f"{self.group}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({k: int(v) for k, v in end.items()}, f)
        os.replace(tmp, path)

    # -- executor side --

    def read(self, partition):
        p, start, end = partition.value
        if end <= start:
            return
        with open(os.path.join(self.root, f"p{p}.log"), "rb") as f:
            f.seek(start)
            buf = f.read(end - start)
        pos = start
        for line in buf.splitlines():
            rec = json.loads(line)
            yield (
                p,
                pos,
                int(rec["event_id"]),
                int(rec["ts_us"]),
                int(rec["user_id"]),
                rec["event_type"],
                float(rec["value"]),
            )
            pos += len(line) + 1


def register(spark) -> None:
    try:
        spark.dataSource.register(BrokerDataSource)
    except Exception:  # noqa: BLE001 — already registered on this session
        pass


#: deterministic feed geometry for the hash-checked exhibit
BRK_PARTS, BRK_SEGS, BRK_ROWS = 4, 3, 500


def _synth_rows(seg: int):
    """Segment ``seg`` of the deterministic feed: integer-derived
    fields only, so DuckDB re-derives every record relationally."""
    base = seg * BRK_ROWS
    for i in range(BRK_ROWS):
        rid = base + i
        yield {
            "event_id": rid,
            "ts_us": 1_700_000_000_000_000 + rid * 1_000_000,
            "user_id": rid % 23,
            "event_type": "t%d" % (rid % 5),
            "value": ((rid * 37) % 1000) / 10.0,
        }


@query(
    "scan_broker_stream",
    oracle=f"""
    WITH g AS (
        SELECT unnest(generate_series(0, {BRK_SEGS * BRK_ROWS} - 1)) AS rid
    )
    SELECT rid % 23 % {BRK_PARTS} AS partition_id,
           't' || CAST(rid % 5 AS VARCHAR) AS event_type,
           count(*) AS n, CAST(max(rid) AS BIGINT) AS max_event,
           {osum('((rid * 37) % 1000) / 10.0')} AS sum_value
    FROM g GROUP BY 1, 2
    """,
)
def scan_broker_stream(spark, sf_dir):  # noqa: ARG001 — feed is synthetic
    """The broker path END TO END, driver-verified: produce the
    deterministic feed into a fresh broker log (3 segments x 4
    partitions), drain it with a real Structured Streaming query
    (rate-limited to one segment per trigger, so the offset planner
    runs across MULTIPLE micro-batches), then aggregate the drained
    rows. The oracle re-derives the feed relationally — the hash
    verifies produce → segment-index offset planning → seek/read →
    commit bookkeeping → drain, the same machinery the kill/resume
    test exercises."""
    import tempfile

    root = tempfile.mkdtemp(prefix="thrive_broker_")
    log = BrokerLog(os.path.join(root, "log"), n_partitions=BRK_PARTS)
    for seg in range(BRK_SEGS):
        log.produce(_synth_rows(seg))
    register(spark)
    stream = (
        spark.readStream.format("thrive_broker")
        .option("path", log.root)
        .option("maxsegmentspertrigger", 1)
        .load()
    )
    out = os.path.join(root, "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    from ..sources.acid import _detach_and_cleanup

    agg = (
        spark.read.parquet(out)
        .groupBy("partition_id", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("event_id").cast("bigint").alias("max_event"),
            dsum("value").alias("sum_value"),
        )
    )
    # BRK_PARTS x 5 event types = bounded rows; drop the temp
    # log/checkpoint tree instead of leaking one per invocation
    return _detach_and_cleanup(spark, agg, root)
