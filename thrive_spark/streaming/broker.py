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
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)

from ..operators._util import dsum, osum
from ..registry import query

SCHEMA = (
    "partition_id bigint, offset bigint, event_id bigint, ts_us bigint, "
    "user_id bigint, event_type string, value double"
)
_FIELDS = ("event_id", "ts_us", "user_id", "event_type", "value")


def _load_remap(root: str, p: int) -> tuple[int, dict[int, int]]:
    """Compaction remap for partition p: (shrink, {logical: physical}).

    Offsets handed to Spark are LOGICAL — monotone forever, stable
    across compaction, so every checkpointed range and committed
    marker survives a compaction run. The remap translates logical
    boundaries to physical file positions; offsets beyond the mapped
    boundaries (post-compaction appends) translate as o - shrink."""
    path = os.path.join(root, f"p{p}.remap")
    if not os.path.exists(path):
        return 0, {}
    with open(path) as f:
        j = json.load(f)
    return int(j["shrink"]), {int(k): int(v) for k, v in j["map"].items()}


def _stable_cap(root: str) -> dict | None:
    """Last-STABLE-offset cap (r13 advice): a produce intent whose
    batchId never reached the producer ledger marks the log tail past
    its recorded ends as UNCOMMITTED — either a mid-produce crash
    (recovery will truncate it at the next commit()) or a produce in
    flight right now. Read-side offset planning must stop at those
    ends, or a reader racing the crash consumes rows that recovery
    then rolls back, leaving its consumer checkpoint pointing past the
    log end. Returns {partition: logical_end} or None when the whole
    log is stable — the read_committed isolation level of a real
    broker's transactional producer."""
    intent = os.path.join(root, "_produce_intent.json")
    try:
        with open(intent) as f:
            j = json.load(f)
    except FileNotFoundError:
        return None
    ledger = os.path.join(root, "_produced_batches.json")
    try:
        with open(ledger) as f:
            done = json.load(f)
    except FileNotFoundError:
        done = []
    if j["batchId"] in done:
        return None  # ledger landed; the tail is committed
    return {str(k): int(v) for k, v in j["ends"].items()}


def _phys(root: str, p: int, o: int) -> int:
    shrink, m = _load_remap(root, p)
    return m.get(o, o - shrink)


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
            shrink, _ = _load_remap(self.root, p)
            with open(self._path(p, ".log"), "ab") as f:
                f.write(payload)
                end = f.tell()
            with open(self._path(p, ".idx"), "ab") as f:
                # idx entries are LOGICAL offsets (physical + shrink):
                # they stay valid across compaction rewrites
                f.write(f"{end + shrink}\n".encode())

    def end_offsets(self) -> dict:
        cap = _stable_cap(self.root)
        out = {}
        for p in range(self.n_partitions):
            shrink, _ = _load_remap(self.root, p)
            end = os.path.getsize(self._path(p, ".log")) + shrink
            if cap is not None:
                end = min(end, cap.get(str(p), 0))
            out[str(p)] = end
        return out

    def truncate_to(self, ends: dict) -> None:
        """Roll every partition log back to the given LOGICAL end
        offsets, dropping idx boundaries past them. Only used by the
        sink's crash recovery to undo a produce whose commit marker
        never landed (the tail past a recorded end is by construction
        the uncommitted append — nothing else writes the tail)."""
        for p in range(self.n_partitions):
            target = int(ends.get(str(p), 0))
            phys = _phys(self.root, p, target)
            with open(self._path(p, ".log"), "r+b") as f:
                f.truncate(phys)
            bounds = [b for b in self._boundaries(p) if b <= target]
            with open(self._path(p, ".idx"), "w") as f:
                f.writelines(f"{b}\n" for b in bounds)

    def _boundaries(self, p: int) -> list[int]:
        with open(self._path(p, ".idx")) as f:
            return [int(line) for line in f if line.strip()]

    def compact(self, key: str = "user_id", upto: dict | None = None) -> dict:
        """Kafka log-cleaner role: rewrite each partition's CLEAN HEAD
        keeping only the newest record per ``key``; the tail rides
        unchanged. ``upto`` is the cleaner point per partition in
        logical offsets (clamped down to a segment boundary); default
        is the MINIMUM committed offset across consumer groups — never
        compact bytes someone still plans to read for the first time.
        (Kafka itself compacts regardless of consumer position; the
        conservative default here keeps the shim's exactly-once tests
        layout-independent, and callers can pass end_offsets() for the
        full-log Kafka behavior.)

        Offsets stay LOGICAL (see _load_remap): checkpointed ranges,
        committed markers and idx boundaries all survive; only the
        physical layout shrinks. Returns per-partition
        {records_before, records_after, bytes_reclaimed}."""
        commits_dir = os.path.join(self.root, "_commits")
        group_marks = []
        for g in os.listdir(commits_dir):
            with open(os.path.join(commits_dir, g)) as f:
                group_marks.append(json.load(f))
        stats = {}
        for p in range(self.n_partitions):
            shrink0, map0 = _load_remap(self.root, p)

            def phys0(o, _m=map0, _s=shrink0):
                return _m.get(o, o - _s)

            bounds = self._boundaries(p)
            logical_end = os.path.getsize(self._path(p, ".log")) + shrink0
            if upto is not None:
                point = int(upto.get(str(p), 0))
            elif group_marks:
                point = min(int(m.get(str(p), 0)) for m in group_marks)
            else:
                point = 0
            head_bounds = [b for b in bounds if b <= point]
            limit = head_bounds[-1] if head_bounds else 0
            if limit <= 0:
                stats[str(p)] = {
                    "records_before": None,
                    "records_after": None,
                    "bytes_reclaimed": 0,
                }
                continue
            with open(self._path(p, ".log"), "rb") as f:
                data = f.read()
            phys_limit = phys0(limit)
            head, tail = data[:phys_limit], data[phys_limit:]
            records = head.splitlines(keepends=True)
            last_idx: dict = {}
            for i, line in enumerate(records):
                last_idx[json.loads(line)[key]] = i
            keep = set(last_idx.values())
            # physical positions of every logical boundary in the new
            # layout: cumulative retained bytes per head segment, then
            # tail boundaries shifted by the reclaimed head bytes
            # logical 0 is always a legal range start (fresh groups,
            # initialOffset) and always lands at the file head
            new_map: dict[int, int] = {0: 0}
            pos = 0  # physical cursor in OLD head
            out_pos = 0
            retained = []
            bi = 0
            head_boundaries = [b for b in bounds if b <= limit]
            for i, line in enumerate(records):
                while (
                    bi < len(head_boundaries)
                    and phys0(head_boundaries[bi]) <= pos
                ):
                    new_map[head_boundaries[bi]] = out_pos
                    bi += 1
                if i in keep:
                    retained.append(line)
                    out_pos += len(line)
                pos += len(line)
            for b in head_boundaries[bi:]:
                new_map[b] = out_pos
            new_head = b"".join(retained)
            reclaimed = len(head) - len(new_head)
            for b in bounds:
                if b > limit:
                    new_map[b] = phys0(b) - reclaimed
            new_shrink = logical_end - (len(new_head) + len(tail))
            tmp = self._path(p, ".log") + ".tmp"
            with open(tmp, "wb") as f:
                f.write(new_head + tail)
            rtmp = self._path(p, ".remap") + ".tmp"
            with open(rtmp, "w") as f:
                json.dump(
                    {
                        "shrink": new_shrink,
                        "map": {str(k): v for k, v in new_map.items()},
                    },
                    f,
                )
            # remap first, then log: a reader pairing the NEW remap
            # with the OLD log would mis-seek — but readers translate
            # then read, and both renames are atomic; the shim accepts
            # the (test-sequential) non-racing window a real broker
            # would close with segment-file generations
            os.replace(rtmp, self._path(p, ".remap"))
            os.replace(tmp, self._path(p, ".log"))
            stats[str(p)] = {
                "records_before": len(records),
                "records_after": len(retained),
                "bytes_reclaimed": reclaimed,
            }
        return stats

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
        cap = _stable_cap(self.root)
        for p in range(self.n_partitions):
            segs = self._segments(p)
            if cap is not None:  # read_committed: stop at stable ends
                segs = [s for s in segs if s <= cap.get(str(p), 0)]
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
        # (start, end] are LOGICAL segment boundaries; translate to
        # physical file positions through the compaction remap (a
        # compacted range simply yields fewer records)
        sp, ep = _phys(self.root, p, start), _phys(self.root, p, end)
        with open(os.path.join(self.root, f"p{p}.log"), "rb") as f:
            f.seek(sp)
            buf = f.read(ep - sp)
        # per-record offsets advance from the logical range start by
        # retained bytes: unique (ranges are disjoint, retained ≤
        # span) and per-key order-preserving, which is the contract
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


@query(
    "scan_broker_compacted",
    oracle=f"""
    WITH g AS (
        SELECT unnest(generate_series(0, {BRK_SEGS * BRK_ROWS} - 1)) AS rid
    ),
    last AS (
        SELECT rid % 23 AS user_id, max(rid) AS last_rid
        FROM g GROUP BY 1
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(1 AS BIGINT) AS n_records,
           CAST(last_rid AS BIGINT) AS last_event,
           ((last_rid * 37) % 1000) / 10.0 AS last_value
    FROM last
    """,
)
def scan_broker_compacted(spark, sf_dir):  # noqa: ARG001 — synthetic feed
    """Kafka-compacted-topic semantics END TO END, driver-verified:
    the deterministic keyed feed is produced (every user_id updated
    ~65×), the log cleaner compacts the FULL log (upto=end_offsets(),
    the Kafka behavior) keeping the newest record per user_id, and a
    fresh consumer group drains the compacted log from offset 0. The
    oracle pins exactly ONE surviving record per key with the LAST
    value — n_records=1 is a literal in the oracle, so any
    resurrection or loss hash-fails. Logical offsets mean the drain
    uses the same planner/remap path a pre-compaction checkpoint
    would (tests cover the resumed-group case)."""
    import tempfile

    root = tempfile.mkdtemp(prefix="thrive_broker_compact_")
    log = BrokerLog(os.path.join(root, "log"), n_partitions=BRK_PARTS)
    for seg in range(BRK_SEGS):
        log.produce(_synth_rows(seg))
    stats = log.compact(key="user_id", upto=log.end_offsets())
    assert any(
        s["records_after"] < s["records_before"]
        for s in stats.values()
        if s["records_before"] is not None
    ), stats
    register(spark)
    q = (
        spark.readStream.format("thrive_broker")
        .option("path", log.root)
        .option("group", "compacted-reader")
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(root, "out"))
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    from ..sources.acid import _detach_and_cleanup

    agg = (
        spark.read.parquet(os.path.join(root, "out"))
        .groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            F.count("*").alias("n_records"),
            F.max("event_id").cast("bigint").alias("last_event"),
            F.max_by("value", "event_id").alias("last_value"),
        )
    )
    return _detach_and_cleanup(spark, agg, root)


class BrokerSinkDataSource(DataSource):
    """``writeStream.format("thrive_broker_sink")`` — the broker as a
    streaming SINK via Spark 4's DataSourceStreamWriter, completing
    the custom-source matrix (batch read: thrive_sensor; stream read:
    thrive_broker; batch write: thrive_jsonl_sink; stream write:
    here). Options: ``path`` (broker root), ``partitions``.

    Exactly-once producer: tasks STAGE their rows (one temp JSON file
    per task per epoch, returned through the WriterCommitMessage);
    only the driver's commit() routes the staged rows into the log as
    ONE produce() segment batch, under a batch-id ledger —
    a checkpoint-replayed epoch is recognized and skipped, so the log
    never double-appends (the transactional-producer idiom, shim
    grain). abort() unlinks the stage files."""

    @classmethod
    def name(cls) -> str:
        return "thrive_broker_sink"

    def streamWriter(self, schema, overwrite):  # noqa: ARG002 — fixed schema
        return BrokerStreamWriter(self.options)


class _BrokerStageCommit(WriterCommitMessage):
    def __init__(self, stage: str, n: int):
        self.stage = stage
        self.n = n


class BrokerStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.root = options["path"]
        self.n_partitions = int(options.get("partitions", 2))

    def write(self, iterator):
        import tempfile

        fd, stage = tempfile.mkstemp(
            prefix="thrive_bsink_", suffix=".jsonl"
        )
        n = 0
        with os.fdopen(fd, "w") as f:
            for row in iterator:
                f.write(json.dumps(
                    {k: row[k] for k in _FIELDS}, separators=(",", ":")
                ) + "\n")
                n += 1
        return _BrokerStageCommit(stage, n)

    def _ledger(self) -> str:
        return os.path.join(self.root, "_produced_batches.json")

    def _intent(self) -> str:
        return os.path.join(self.root, "_produce_intent.json")

    def commit(self, messages, batchId: int) -> None:
        """Two-phase transactional produce with a WRITE-AHEAD INTENT:
        the pre-produce log ends are recorded before produce() and the
        marker is cleared only after the ledger lands, so a crash in
        ANY window (mid-produce, or between produce and ledger) leaves
        an intent whose recovery truncates the log back to the
        recorded ends before the replayed epoch re-produces — the log
        never double-appends (r12 advice closed the produce→ledger
        crash window)."""
        log = BrokerLog(self.root, n_partitions=self.n_partitions)
        done: list = []
        if os.path.exists(self._ledger()):
            with open(self._ledger()) as f:
                done = json.load(f)
        # crash recovery MUST run before the replay early-return: an
        # intent from a died epoch means the log may hold an append
        # whose commit marker never landed — roll it back
        if os.path.exists(self._intent()):
            with open(self._intent()) as f:
                j = json.load(f)
            if j["batchId"] not in done:
                log.truncate_to(j["ends"])
            os.unlink(self._intent())
        try:
            if batchId in done:
                return  # replayed epoch: the log already has it
            rows = []
            for m in messages:
                if m is None:
                    continue
                with open(m.stage) as f:
                    rows.extend(json.loads(line) for line in f)
            if rows:
                tmp = self._intent() + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(
                        {"batchId": batchId, "ends": log.end_offsets()},
                        f,
                    )
                os.replace(tmp, self._intent())
                log.produce(rows)
            tmp = self._ledger() + ".tmp"
            with open(tmp, "w") as f:
                json.dump(done + [batchId], f)
            os.replace(tmp, self._ledger())
            if rows:
                os.unlink(self._intent())
        finally:
            for m in messages:
                if m is not None and os.path.exists(m.stage):
                    os.unlink(m.stage)

    def abort(self, messages, batchId: int) -> None:  # noqa: ARG002
        for m in messages:
            if m is not None and os.path.exists(m.stage):
                os.unlink(m.stage)


@query(
    "sink_broker_stream",
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
def sink_broker_stream(spark, sf_dir):  # noqa: ARG001 — feed is synthetic
    """The broker as a streaming SINK, driver-verified end to end: the
    deterministic feed streams from files (one file per trigger, so
    MULTIPLE epochs run the two-phase producer commit), each epoch's
    staged rows land as one produce() batch under the batch-id
    ledger, a REPLAYED epoch is forced (manual commit with a spent
    batchId — asserted a no-op on the log), and the produced log is
    drained back through the broker stream source and aggregated.
    The oracle re-derives the feed relationally, so the hash verifies
    stage → transactional produce → keyed partition routing → log
    read-back. Completes the Python DataSource matrix: batch read,
    stream read, batch write, stream write."""
    import tempfile

    from ..sources.acid import _detach_and_cleanup

    root = tempfile.mkdtemp(prefix="thrive_bsink_q_")
    src = os.path.join(root, "src")
    rows = [r for seg in range(BRK_SEGS) for r in _synth_rows(seg)]
    for i in range(BRK_SEGS):
        spark.createDataFrame(
            [tuple(r[k] for k in _FIELDS)
             for r in rows[i * BRK_ROWS : (i + 1) * BRK_ROWS]],
            "event_id long, ts_us long, user_id long, "
            "event_type string, value double",
        ).coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    try:
        spark.dataSource.register(BrokerSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered on this session
        pass
    register(spark)
    log_root = os.path.join(root, "log")
    q = (
        spark.readStream.schema(
            "event_id long, ts_us long, user_id long, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
        .writeStream.format("thrive_broker_sink")
        .option("path", log_root)
        .option("partitions", str(BRK_PARTS))
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # forced epoch replay: a commit with an already-spent batchId must
    # be a ledger no-op — the log's logical ends are untouched
    log = BrokerLog(log_root, n_partitions=BRK_PARTS)
    ends = log.end_offsets()
    w = BrokerStreamWriter({"path": log_root, "partitions": str(BRK_PARTS)})
    w.commit([_BrokerStageCommit("/nonexistent", 0)], 0)
    assert log.end_offsets() == ends, "replayed epoch re-produced"
    # drain the produced log back through the broker SOURCE
    out = os.path.join(root, "out")
    q2 = (
        spark.readStream.format("thrive_broker")
        .option("path", log_root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, "ckpt2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    agg = (
        spark.read.parquet(out)
        .groupBy("partition_id", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("event_id").cast("bigint").alias("max_event"),
            dsum("value").alias("sum_value"),
        )
    )
    return _detach_and_cleanup(spark, agg, root)
