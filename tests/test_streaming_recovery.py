"""Checkpoint recovery: stop a streaming pipeline, add new input,
restart from the same checkpoint — the seen-files log must skip
everything already delivered (exactly-once across restarts, the
streaming twin of the dirlist ledger)."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from thrive_spark.streaming.sinks import start_file_pipeline
from thrive_spark.tables import Tables


def test_restart_from_checkpoint_no_duplicates(spark, sf_dir, stream_dir, tmp_path):
    src_all, schema = stream_dir
    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(src)
    chunks = sorted(
        f for f in os.listdir(src_all) if f.startswith("chunk_")
    )
    half = len(chunks) // 2

    def reader():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # phase 1: first half of the input
    for i, f in enumerate(chunks[:half]):
        shutil.copy(f"{src_all}/{f}", f"{src}/{f}")
        os.utime(f"{src}/{f}", (time.time() + i, time.time() + i))
    q = start_file_pipeline(spark, reader(), out, ckpt)
    q.processAllAvailable()
    q.stop()
    n_phase1 = spark.read.parquet(out).count()
    assert n_phase1 > 0

    # phase 2: rest of the input lands; RESTART from the checkpoint
    for i, f in enumerate(chunks[half:]):
        shutil.copy(f"{src_all}/{f}", f"{src}/{f}")
        os.utime(
            f"{src}/{f}", (time.time() + half + i, time.time() + half + i)
        )
    q = start_file_pipeline(spark, reader(), out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    want = Tables(spark, sf_dir).events
    assert got.count() == want.count()  # nothing duplicated, nothing lost
    assert got.select("event_id").distinct().count() == want.count()
    # and the second run really did append beyond phase 1
    assert got.count() > n_phase1
    assert got.select(F.max("batch_id")).collect()[0][0] >= half


def test_available_now_incremental_batches(spark, sf_dir, tmp_path):
    """Trigger.AvailableNow: the batch-like incremental run — each
    invocation drains exactly the files the checkpoint hasn't seen,
    then stops. This is Structured Streaming's native counterpart of
    the dirlist ledger (sources/incremental.py): same exactly-once
    contract, state in the checkpoint instead of a parquet ledger."""
    from pyspark.sql import functions as F

    from thrive_spark.tables import Tables

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = "t_avnow"
    ev = Tables(spark, sf_dir).events.select("event_id", "user_id", "value")
    ev.filter(F.col("event_id") % 3 == 0).write.parquet(f"{src}/f1")

    def drain():
        q = (
            spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
            .groupBy()
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.table(out).collect()[0][0]

    n1_expected = ev.filter(F.col("event_id") % 3 == 0).count()
    assert drain() == n1_expected
    # new file lands; the next AvailableNow run picks up ONLY the delta
    ev.filter(F.col("event_id") % 3 == 1).write.parquet(f"{src}/f2")
    total = drain()
    assert total == ev.filter(F.col("event_id") % 3 != 2).count()


def test_broker_source_kill_resume_exactly_once(spark, sf_dir, tmp_path):
    """Broker-shim source (streaming/broker.py): a rate-limited query
    is KILLED mid-stream (1 segment per trigger, stopped at the first
    committed batch), more segments are produced, and the restart must
    resume from the checkpointed byte offsets — final output equals
    the produced feed exactly once, and the broker's own consumer
    bookkeeping lands on the end offsets."""
    import json

    from thrive_spark.streaming.broker import BrokerLog, register

    rows = (
        Tables(spark, sf_dir)
        .events.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .orderBy("event_id")
        .collect()
    )
    n_total = len(rows)
    assert n_total > 100
    seg_size = max(n_total // 8, 1)
    segments = [
        rows[i : i + seg_size] for i in range(0, n_total, seg_size)
    ]

    log = BrokerLog(str(tmp_path / "broker"), n_partitions=3)
    register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def reader():
        return (
            spark.readStream.format("thrive_broker")
            .option("path", log.root)
            .option("maxsegmentspertrigger", 1)
            .load()
        )

    # phase 1: most of the feed lands; kill at the first sign of
    # committed progress (mid-stream — segments still unread)
    for seg in segments[:-2]:
        log.produce(seg)
    q = start_file_pipeline(spark, reader(), out, ckpt)
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q.recentProgress):
            break
        time.sleep(0.05)
    q.stop()

    # phase 2: the rest of the feed; RESTART from the same checkpoint
    for seg in segments[-2:]:
        log.produce(seg)
    q = start_file_pipeline(spark, reader(), out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    assert got.count() == n_total  # nothing duplicated, nothing lost
    assert got.select("event_id").distinct().count() == n_total
    # value payload survived the JSON log roundtrip
    src_sum = sum(int(r["value"] * 10 + 0.5) for r in rows)
    got_sum = (
        got.select(F.sum(F.expr("CAST(value * 10 + 0.5 AS BIGINT)")))
        .collect()[0][0]
    )
    assert got_sum == src_sum
    # keyed-producer contract: per user, broker offsets preserve
    # event order WITHIN the partition that owns the key
    pdf = got.select("user_id", "offset", "event_id").toPandas()
    for _, g in pdf.groupby("user_id"):
        s = g.sort_values("offset")["event_id"].tolist()
        assert s == sorted(s)
    # consumer bookkeeping: commit() fires when the NEXT batch is
    # planned (microbatch engine), so the marker TRAILS the last
    # batch — Kafka's __consumer_offsets semantics exactly. It must
    # have advanced past zero on every partition and never exceed the
    # log end; the checkpoint WAL is the exactly-once source of truth
    # (already proven by the count assertions above).
    committed = log.committed()
    ends = log.end_offsets()
    assert set(committed) == set(ends)
    for p, c in committed.items():
        assert 0 < int(c) <= int(ends[p])
    # and the rate limiter really split the drain into many batches:
    # every micro-batch advanced at most one segment per partition
    with open(f"{ckpt}/offsets/0") as f:
        pass  # offsets log exists — the checkpoint drove the resume
    n_batches = len(os.listdir(f"{ckpt}/offsets"))
    assert n_batches >= len(segments) / 3


def test_broker_log_bookkeeping(tmp_path):
    """Pure log mechanics, no Spark: byte offsets, segment index,
    commit marker atomicity."""
    from thrive_spark.streaming.broker import BrokerLog, BrokerStreamReader

    log = BrokerLog(str(tmp_path / "b"), n_partitions=2)
    log.produce(
        [
            {"event_id": 1, "ts_us": 10, "user_id": 0,
             "event_type": "a", "value": 1.5},
            {"event_id": 2, "ts_us": 20, "user_id": 1,
             "event_type": "b", "value": 2.5},
            {"event_id": 3, "ts_us": 30, "user_id": 2,
             "event_type": "a", "value": 3.5},
        ]
    )
    ends = log.end_offsets()
    assert set(ends) == {"0", "1"} and all(v > 0 for v in ends.values())
    rdr = BrokerStreamReader({"path": log.root})
    assert rdr.initialOffset() == {"0": 0, "1": 0}
    assert rdr.latestOffset() == {k: int(v) for k, v in ends.items()}
    rows = list(
        rdr.read(type("P", (), {"value": (0, 0, int(ends["0"]))})())
    )
    # partition 0 owns user_ids 0 and 2, in produce order
    assert [r[2] for r in rows] == [1, 3]
    assert rows[0][:2] == (0, 0)  # (partition_id, byte offset)
    # a second segment appends; offsets of segment 1 stay valid
    log.produce(
        [{"event_id": 4, "ts_us": 40, "user_id": 0,
          "event_type": "c", "value": 4.5}]
    )
    assert rdr._segments(0) == [int(ends["0"]),
                                int(log.end_offsets()["0"])]
    rdr.commit({"0": 5, "1": 7})
    assert log.committed() == {"0": 5, "1": 7}


def test_broker_to_acid_kill_resume_exactly_once(spark, sf_dir, tmp_path):
    """End-to-end exactly-once into the ACID table (verdict r11 item
    3): broker stream → foreachBatch → ThriveTable.append under the
    (app_id, batch_id) transaction token. The query is killed
    mid-stream, the newest checkpoint commit marker is DELETED (so the
    restart is GUARANTEED to re-deliver an already-committed batch —
    the recovery replay path), more segments are produced, and after
    the resumed drain the table must equal the batch twin exactly:
    the manifest txn log absorbed the replay as a no-op."""
    import os as _os

    from thrive_spark.sources.acid import ThriveTable, acid_stream_sink
    from thrive_spark.streaming.broker import BrokerLog, register

    rows = (
        Tables(spark, sf_dir)
        .events.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .orderBy("event_id")
        .collect()
    )
    n_total = len(rows)
    seg_size = max(n_total // 8, 1)
    segments = [rows[i : i + seg_size] for i in range(0, n_total, seg_size)]

    log = BrokerLog(str(tmp_path / "broker"), n_partitions=3)
    register(spark)
    ckpt = str(tmp_path / "ckpt")
    tbl = ThriveTable(spark, str(tmp_path / "table"))
    schema = (
        "partition_id long, offset long, event_id long, ts_us long, "
        "user_id long, event_type string, value double"
    )
    tbl.create(spark.createDataFrame([], schema))
    sink = acid_stream_sink(tbl, app_id="kill-resume-test")

    def start():
        return (
            spark.readStream.format("thrive_broker")
            .option("path", log.root)
            .option("maxsegmentspertrigger", 1)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # phase 1: most of the feed; kill at first committed progress
    for seg in segments[:-2]:
        log.produce(seg)
    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q.recentProgress):
            break
        time.sleep(0.05)
    q.stop()

    # force a replay: drop the newest commit marker so the engine
    # re-delivers that batch to foreachBatch on restart
    commits = sorted(
        (f for f in _os.listdir(f"{ckpt}/commits") if f.isdigit()),
        key=int,
    )
    if commits:
        _os.unlink(f"{ckpt}/commits/{commits[-1]}")
        crc = f"{ckpt}/commits/.{commits[-1]}.crc"  # hadoop sidecar
        if _os.path.exists(crc):
            _os.unlink(crc)
    v_after_phase1 = tbl.latest_version()

    # phase 2: rest of the feed; RESTART from the same checkpoint
    for seg in segments[-2:]:
        log.produce(seg)
    q = start()
    q.processAllAvailable()
    q.stop()

    got = tbl.snapshot()
    assert got.count() == n_total  # nothing duplicated, nothing lost
    assert got.select("event_id").distinct().count() == n_total
    src_sum = sum(int(r["value"] * 10 + 0.5) for r in rows)
    got_sum = got.select(
        F.sum(F.expr("CAST(value * 10 + 0.5 AS BIGINT)"))
    ).collect()[0][0]
    assert got_sum == src_sum
    # the replayed batch landed as a manifest-token no-op: every
    # committed txn token is unique in the version log
    tokens = [
        tuple(m["txn"]) for m in tbl.history() if m.get("txn") is not None
    ]
    assert len(tokens) == len(set(tokens))
    assert tbl.latest_version() > v_after_phase1  # phase 2 did commit


def test_broker_compaction_resumed_group_and_independence(
    spark, sf_dir, tmp_path
):
    """Log compaction (r12, verdict missing #5) with LOGICAL offsets:
    a consumer group drains phase 1 and commits; the cleaner compacts
    the committed head (keep newest per user_id); phase 2 lands; the
    group RESUMES from its checkpoint across the rewritten layout and
    must read exactly the phase-2 records. A second, fresh group then
    drains from 0 and sees the compacted view — groups are fully
    independent positions."""
    from thrive_spark.streaming.broker import BrokerLog, register

    rows = (
        Tables(spark, sf_dir)
        .events.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .orderBy("event_id")
        .limit(600)
        .collect()
    )
    half = len(rows) // 2
    log = BrokerLog(str(tmp_path / "broker"), n_partitions=3)
    register(spark)

    def drain(group, out, ckpt):
        q = (
            spark.readStream.format("thrive_broker")
            .option("path", log.root)
            .option("group", group)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # phase 1: group g1 drains and its offsets commit
    log.produce(rows[:half])
    out1, ck1 = str(tmp_path / "o1"), str(tmp_path / "c1")
    drain("g1", out1, ck1)
    n1 = spark.read.parquet(out1).count()
    assert n1 == half
    # cleaner: compact the full produced head (Kafka behavior)
    stats = log.compact(key="user_id", upto=log.end_offsets())
    assert sum(s["bytes_reclaimed"] for s in stats.values()) > 0
    # phase 2 appends land in LOGICAL coordinates past the compaction
    log.produce(rows[half:])
    # resumed group reads exactly the unseen tail, never the head
    drain("g1", out1, ck1)
    got = spark.read.parquet(out1)
    assert got.count() == len(rows)
    assert got.select("event_id").distinct().count() == len(rows)
    # fresh group from 0: compacted head (newest per user) + full tail
    out2, ck2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    drain("g2", out2, ck2)
    g2 = spark.read.parquet(out2)
    head_users = {int(r["user_id"]) for r in rows[:half]}
    want_n = len(head_users) + (len(rows) - half)
    assert g2.count() == want_n
    # the survivor per head user is the NEWEST phase-1 record
    last = {}
    for r in rows[:half]:
        last[int(r["user_id"])] = int(r["event_id"])
    head_ids = {
        int(r.event_id)
        for r in g2.filter(
            F.col("event_id") < rows[half]["event_id"]
        ).collect()
    }
    assert head_ids == set(last.values())
    # group bookkeeping stayed independent: the commit marker trails
    # by one batch (Kafka __consumer_offsets semantics), so restart g2
    # once — replanning commits the drained batch — then check both
    # groups hold their own positions
    g1_mark = log.committed("g1")
    # the marker only lands when a NEXT batch is planned — feed one
    # more record so g2's restart plans a batch and commits the drain
    log.produce([rows[0].asDict()])
    drain("g2", out2, ck2)
    assert log.committed("g2") is not None
    assert log.committed("g1") == g1_mark  # untouched by g2's drain


def test_broker_double_compaction_mechanics(tmp_path):
    """Pure log mechanics: two compaction passes compose — the second
    remap is built THROUGH the first, and logical end offsets stay
    monotone across both."""
    from thrive_spark.streaming.broker import BrokerLog, _phys

    log = BrokerLog(str(tmp_path / "b"), n_partitions=1)

    def rec(i, uid, v):
        return {"event_id": i, "ts_us": i * 10, "user_id": uid,
                "event_type": "a", "value": float(v)}

    log.produce([rec(1, 0, 1.0), rec(2, 0, 2.0)])
    log.produce([rec(3, 0, 3.0), rec(4, 1, 4.0)])
    e1 = log.end_offsets()
    log.compact(key="user_id", upto=e1)   # keeps ids 3, 4
    e2 = log.end_offsets()
    assert e2 == e1  # logical size never shrinks
    log.produce([rec(5, 0, 5.0)])
    e3 = log.end_offsets()
    assert int(e3["0"]) > int(e1["0"])
    log.compact(key="user_id", upto=e3)   # keeps ids 4, 5
    import json as _json

    with open(log._path(0, ".log"), "rb") as f:
        ids = [
            _json.loads(line)["event_id"] for line in f.read().splitlines()
        ]
    assert ids == [4, 5]
    assert _phys(log.root, 0, 0) == 0
    # every idx boundary still translates inside the physical file
    import os as _os

    size = _os.path.getsize(log._path(0, ".log"))
    for b in log._boundaries(0):
        assert 0 <= _phys(log.root, 0, b) <= size


def test_table_stream_source_resume_and_append_only(spark, sf_dir, tmp_path):
    """ACID-table streaming source: versions are the offsets — a
    stopped query resumes from its checkpoint and drains ONLY the
    versions committed while it was down; a rewrite commit (delete)
    raises by default (append-only discipline) and streams added rows
    under ignorechanges=true."""
    import pytest as _pytest

    from thrive_spark.sources.acid import ThriveTable
    from thrive_spark.streaming.table_source import register

    o = _orders_ts(spark, sf_dir)
    tdir = str(tmp_path / "table")
    tbl = ThriveTable(spark, tdir)
    tbl.create(o.filter("k % 7 = 0"))
    register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain(**opts):
        r = spark.readStream.format("thrive_table").option("path", tdir)
        for k, v in opts.items():
            r = r.option(k, v)
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == o.filter("k % 7 = 0").count()
    # two more commits while the stream is down; resume drains exactly
    # the delta
    tbl.append(o.filter("k % 7 = 1"))
    tbl.append(o.filter("k % 7 = 2"))
    drain()
    got = spark.read.parquet(out)
    want = o.filter("k % 7 IN (0, 1, 2)")
    assert got.count() == want.count()
    assert got.select("k").distinct().count() == want.count()
    # a rewrite commit poisons the default stream...
    tbl.delete_where("p > 200000")
    from pyspark.errors import StreamingQueryException

    with _pytest.raises(StreamingQueryException, match="append-only"):
        drain()
    # ...but ignorechanges accepts it (rewritten survivors re-emit —
    # Delta's documented ignoreChanges contract — and deletes are not
    # propagated)
    drain(ignorechanges="true")
    assert spark.read.parquet(out).count() >= want.count()


def _orders_ts(spark, sf_dir):
    return Tables(spark, sf_dir).orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )


def test_broker_sink_crash_between_produce_and_ledger(tmp_path):
    """r12 advice: a crash AFTER log.produce() but BEFORE the ledger
    records the batchId used to double-append the epoch on checkpoint
    replay. The write-ahead intent now rolls the log back to the
    recorded pre-produce ends before the replayed epoch re-produces —
    simulate the crash by hand-writing the intent and the orphan
    append, then replaying commit()."""
    import json as _json

    from thrive_spark.streaming.broker import (
        BrokerLog,
        BrokerStreamWriter,
        _BrokerStageCommit,
    )

    root = str(tmp_path / "log")
    w = BrokerStreamWriter({"path": root, "partitions": "2"})
    log = BrokerLog(root, n_partitions=2)

    def rows(tag, n):
        return [
            {
                "event_id": i,
                "ts_us": i,
                "user_id": i,
                "event_type": tag,
                "value": 1.0,
            }
            for i in range(n)
        ]

    def stage(rs):
        p = str(tmp_path / f"stage_{len(os.listdir(tmp_path))}.jsonl")
        with open(p, "w") as f:
            for r in rs:
                f.write(_json.dumps(r) + "\n")
        return _BrokerStageCommit(p, len(rs))

    w.commit([stage(rows("b0", 4))], 0)  # epoch 0 lands cleanly
    ends_after_b0 = log.end_offsets()

    # CRASH SIMULATION for epoch 1: intent written, produce ran, but
    # the process died before the ledger update
    with open(w._intent() + ".tmp", "w") as f:
        _json.dump({"batchId": 1, "ends": ends_after_b0}, f)
    os.replace(w._intent() + ".tmp", w._intent())
    log.produce(rows("b1", 6))  # the orphan (uncommitted) append
    # r13 advice: while the intent is uncommitted, read-side planning
    # must NOT see the orphan tail (read_committed) — end_offsets caps
    # at the intent's recorded pre-produce ends
    assert log.end_offsets() == ends_after_b0
    orphan_phys = {
        p: os.path.getsize(os.path.join(root, f"p{p}.log"))
        for p in range(2)
    }

    # replayed epoch 1: recovery must truncate the orphan, then the
    # re-produce lands exactly once
    w.commit([stage(rows("b1", 6))], 1)
    final_ends = log.end_offsets()
    # same bytes as the orphan append, landed ONCE — and with the
    # intent cleared the full log is stable (visible) again
    assert {
        p: os.path.getsize(os.path.join(root, f"p{p}.log"))
        for p in range(2)
    } == orphan_phys
    assert all(
        final_ends[str(p)] > ends_after_b0[str(p)]
        for p in range(2)
        if orphan_phys[p] > 0
    )
    assert not os.path.exists(w._intent())
    # every record appears exactly once across both partitions
    seen = []
    for p in range(2):
        with open(os.path.join(root, f"p{p}.log")) as f:
            seen += [_json.loads(line) for line in f if line.strip()]
    by_type = {}
    for r in seen:
        by_type.setdefault(r["event_type"], []).append(r["event_id"])
    assert sorted(by_type["b0"]) == list(range(4))
    assert sorted(by_type["b1"]) == list(range(6))

    # a replay of an already-committed epoch with a STALE intent left
    # behind (crash after ledger, before intent unlink) is a no-op
    with open(w._intent() + ".tmp", "w") as f:
        _json.dump({"batchId": 1, "ends": ends_after_b0}, f)
    os.replace(w._intent() + ".tmp", w._intent())
    w.commit([stage(rows("b1", 6))], 1)
    assert log.end_offsets() == final_ends
    assert not os.path.exists(w._intent())


def test_broker_reader_ignores_uncommitted_tail(tmp_path):
    """r13 advice: between a mid-produce crash and the writer's next
    commit() (where intent recovery truncates the orphan), a reader
    planning offsets must not consume the uncommitted tail — otherwise
    its consumer checkpoint ends up pointing PAST the post-recovery
    log end. latestOffset/end_offsets stop at the intent's recorded
    stable ends; once the ledger marks the batch committed, the cap
    lifts without waiting for the intent unlink."""
    import json as _json

    from thrive_spark.streaming.broker import (
        BrokerLog,
        BrokerStreamReader,
        BrokerStreamWriter,
    )

    root = str(tmp_path / "log")
    w = BrokerStreamWriter({"path": root, "partitions": "2"})
    log = BrokerLog(root, n_partitions=2)

    def rows(tag, n):
        return [
            {"event_id": i, "ts_us": i, "user_id": i,
             "event_type": tag, "value": 1.0}
            for i in range(n)
        ]

    log.produce(rows("stable", 4))
    stable = log.end_offsets()

    # mid-produce crash: intent present (batchId 7 not in ledger),
    # orphan bytes + idx boundaries already appended
    with open(w._intent() + ".tmp", "w") as f:
        _json.dump({"batchId": 7, "ends": stable}, f)
    os.replace(w._intent() + ".tmp", w._intent())
    log.produce(rows("orphan", 6))

    rdr = BrokerStreamReader({"path": root})
    assert rdr.latestOffset() == stable
    assert log.end_offsets() == stable

    # ledger landing (commit completed, intent unlink racing) lifts
    # the cap: the tail is committed even while the intent file exists
    with open(os.path.join(root, "_produced_batches.json"), "w") as f:
        _json.dump([7], f)
    lifted = rdr.latestOffset()
    assert all(
        lifted[str(p)] >= stable[str(p)] for p in range(2)
    ) and lifted != stable
