"""Jar-free Hudi COW reader (sources/hudi_lite.py) — mirrors the
delta_lite/iceberg_lite test strategy: construct genuine spec-shaped
trees (timeline, file groups/slices, per-row meta columns), read
them back through real planning, pin the semantics (atomic instant
completion, slice-based time travel, preserved commit times driving
incremental pull, honest MOR refusal)."""

from __future__ import annotations

import os

import pytest

from thrive_spark.sources.hudi_lite import HudiLiteTable


def _mk(spark, tmp_path, rows=20):
    t = HudiLiteTable(spark, str(tmp_path / "t"), key_field="k")
    df = spark.createDataFrame(
        [(i, float(i) * 10) for i in range(rows)], "k bigint, p double"
    )
    i1 = t.bulk_insert(df, groups=2)
    return t, i1


def test_snapshot_and_time_travel_by_slice(spark, tmp_path):
    t, i1 = _mk(spark, tmp_path)
    assert sorted(r.k for r in t.snapshot().collect()) == list(range(20))
    upd = spark.createDataFrame(
        [(3, 999.0), (100, 1.0)], "k bigint, p double"
    )
    i2 = t.upsert(upd)
    # current: update visible exactly once, insert present
    cur = {r.k: r.p for r in t.snapshot().collect()}
    assert cur[3] == 999.0 and cur[100] == 1.0 and len(cur) == 21
    # as-of the first instant: the upsert's rewrites invisible
    old = {r.k: r.p for r in t.snapshot(i1).collect()}
    assert old[3] == 30.0 and 100 not in old and len(old) == 20
    assert t.timeline() == [i1, i2]


def test_upsert_touches_only_matching_groups(spark, tmp_path):
    t, i1 = _mk(spark, tmp_path)
    slices1 = t.file_slices()
    i2 = t.upsert(
        spark.createDataFrame([(3, 999.0)], "k bigint, p double")
    )
    slices2 = t.file_slices()
    advanced = [
        fid for fid in slices1 if slices2[fid][0] == i2
    ]
    untouched = [
        fid for fid in slices1 if slices2[fid] == slices1[fid]
    ]
    # exactly one group holds key 3; the other carries verbatim
    assert len(advanced) == 1 and len(untouched) == 1


def test_incremental_pull_excludes_carried_rows(spark, tmp_path):
    """Carried rows keep their ORIGINAL _hoodie_commit_time, so the
    incremental query returns exactly the changed records even though
    the rewritten slice physically contains the carried ones too."""
    t, i1 = _mk(spark, tmp_path)
    t.upsert(spark.createDataFrame(
        [(3, 999.0), (100, 1.0)], "k bigint, p double"
    ))
    inc = t.incremental(i1)
    assert sorted((r.k, r.p) for r in inc.select("k", "p").collect()) \
        == [(3, 999.0), (100, 1.0)]
    # nothing changed since the latest instant
    assert t.incremental(t.timeline()[-1]).count() == 0


def test_uncommitted_and_orphan_files_invisible(spark, tmp_path):
    t, i1 = _mk(spark, tmp_path)
    # an orphan data file stamped with a non-completed instant (the
    # torn write the requested/inflight protocol exists for)
    src = os.path.join(t.root, t.file_slices()[
        sorted(t.file_slices())[0]
    ][1])
    orphan = os.path.join(
        t.root, "deadbeefdead_0-0-0_99999999999999.parquet"
    )
    import shutil

    shutil.copyfile(src, orphan)
    assert t.snapshot().count() == 20  # orphan not planned
    # inflight markers exist during a write, but only .commit reads
    names = set(os.listdir(t.meta_dir))
    assert f"{i1}.commit" in names
    assert f"{i1}.commit.requested" in names
    assert f"{i1}.inflight" in names


def test_unknown_type_refusal_and_unknown_instant(spark, tmp_path):
    t, i1 = _mk(spark, tmp_path)
    props = t._props_path()
    body = open(props).read().replace(
        "COPY_ON_WRITE", "SOMETHING_ELSE"
    )
    with open(props, "w") as fh:
        fh.write(body)
    with pytest.raises(NotImplementedError, match="unknown"):
        t.snapshot()
    body = body.replace("SOMETHING_ELSE", "COPY_ON_WRITE")
    with open(props, "w") as fh:
        fh.write(body)
    with pytest.raises(ValueError, match="not in timeline"):
        t.snapshot("00000000000099")


def test_hudi_stream_batches_and_resume(spark, tmp_path):
    from thrive_spark.streaming.hudi_source import register

    t, i1 = _mk(spark, tmp_path)
    i2 = t.upsert(spark.createDataFrame(
        [(3, 999.0), (100, 1.0)], "k bigint, p double"
    ))
    register(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("thrive_hudi")
            .option("path", t.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    got = spark.read.parquet(out).collect()
    by_ins = {}
    for r in got:
        by_ins.setdefault(r["_hoodie_commit_time"], []).append(r["k"])
    assert sorted(by_ins[i1]) == list(range(20))
    # batch 2: exactly the changed rows, not the carried ones
    assert sorted(by_ins[i2]) == [3, 100]
    # restart resumes past the committed instant
    i3 = t.upsert(spark.createDataFrame(
        [(5, 5.5)], "k bigint, p double"
    ))
    drain()
    got2 = spark.read.parquet(out).collect()
    c1 = sum(1 for r in got2 if r["_hoodie_commit_time"] == i1)
    assert c1 == 20  # not re-emitted
    assert sorted(
        r.k for r in got2 if r["_hoodie_commit_time"] == i3
    ) == [5]


# ---------------- r15: MERGE_ON_READ ----------------


def _mk_mor(spark, tmp_path, rows=20):
    t = HudiLiteTable(spark, str(tmp_path / "m"), key_field="k")
    df = spark.createDataFrame(
        [(i, float(i) * 10) for i in range(rows)], "k bigint, p double"
    )
    i1 = t.bulk_insert(df, groups=2, table_type="MERGE_ON_READ")
    return t, i1


def test_log_block_roundtrip_and_torn_tail():
    """The spec-shaped binary block layout round-trips, and a torn
    final block (crash mid-append) is invisible, not an error."""
    from thrive_spark.sources.hudi_lite import (
        decode_log_records,
        encode_data_block,
        encode_delete_block,
        iter_log_blocks,
    )

    sch = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "k", "type": ["null", "long"]},
            {"name": "p", "type": ["null", "double"]},
        ],
    }
    blk = encode_data_block("00000000000002", sch, [
        {"k": 1, "p": 1.5}, {"k": 2, "p": None},
    ]) + encode_delete_block("00000000000003", ["7", "9"])
    got = list(decode_log_records(
        blk, frozenset(["00000000000002", "00000000000003"]), None
    ))
    assert got == [
        (False, "00000000000002", {"k": 1, "p": 1.5}),
        (False, "00000000000002", {"k": 2, "p": None}),
        (True, "00000000000003",
         {"recordKey": "7", "partitionPath": None}),
        (True, "00000000000003",
         {"recordKey": "9", "partitionPath": None}),
    ]
    # as-of cuts by the header instant; uncommitted blocks invisible
    assert [i for _, i, _ in decode_log_records(
        blk, frozenset(["00000000000002"]), None
    )] == ["00000000000002"] * 2
    assert list(decode_log_records(
        blk, frozenset(["00000000000002", "00000000000003"]),
        "00000000000002",
    )) == got[:2]
    # torn tail: truncate the second block mid-body
    torn = blk[: len(blk) - 10]
    assert [t for t, _, _ in iter_log_blocks(torn)] == [3]  # data blk


def test_mor_upsert_appends_log_no_rewrite(spark, tmp_path):
    t, i1 = _mk_mor(spark, tmp_path)
    slices1 = t.file_slices()
    i2 = t.upsert(spark.createDataFrame(
        [(3, 999.0)], "k bigint, p double"
    ))
    # no base file rewritten; the change lives in a log file
    assert t.file_slices() == slices1
    logged = [s for s in t.plan_slices() if s["logs"]]
    assert len(logged) == 1
    cur = {r.k: r.p for r in t.snapshot().collect()}
    assert cur[3] == 999.0 and len(cur) == 20
    # read-optimized view serves base freshness
    ro = {r.k: r.p for r in t.snapshot(read_optimized=True).collect()}
    assert ro[3] == 30.0
    # as-of the insert: the log block's header instant excludes it
    old = {r.k: r.p for r in t.snapshot(i1).collect()}
    assert old[3] == 30.0


def test_mor_delete_block_masks_and_compaction_folds(spark, tmp_path):
    t, i1 = _mk_mor(spark, tmp_path)
    i2 = t.upsert(spark.createDataFrame(
        [(3, 999.0), (100, 1.0)], "k bigint, p double"
    ))
    i3 = t.delete(spark.createDataFrame([(3,), (4,)], "k bigint"))
    cur = {r.k: r.p for r in t.snapshot().collect()}
    assert 3 not in cur and 4 not in cur and cur[100] == 1.0
    assert len(cur) == 19
    # incremental: upserted key 100 only (3 deleted, vanishes)
    inc = sorted(r.k for r in t.incremental(i1).collect())
    assert inc == [100]
    i4 = t.compact()
    assert all(not s["logs"] for s in t.plan_slices())
    cur2 = {r.k: r.p for r in t.snapshot().collect()}
    assert cur2 == cur
    # time travel BEFORE compaction still exact (old slices remain)
    asof = {r.k: r.p for r in t.snapshot(i2).collect()}
    assert asof[3] == 999.0 and len(asof) == 21
    # incremental across compaction: carried rows stay invisible
    assert sorted(r.k for r in t.incremental(i1).collect()) == [100]
    assert t.incremental(i4).count() == 0


def test_mor_uncommitted_log_block_invisible(spark, tmp_path):
    """A log file appended WITHOUT a completed deltacommit (crash
    between append and rename) must not change the snapshot."""
    from thrive_spark.sources.hudi_lite import encode_data_block

    t, i1 = _mk_mor(spark, tmp_path)
    t.upsert(spark.createDataFrame([(3, 999.0)], "k bigint, p double"))
    s = next(s for s in t.plan_slices() if s["logs"])
    base = t.snapshot(meta=True)
    sch = t._avro_schema(base)
    orphan = encode_data_block("00000000000099", sch, [{
        "_hoodie_commit_time": "00000000000099",
        "_hoodie_record_key": "5", "k": 5, "p": -1.0,
    }])
    t._append_log_file(
        s["partition"], s["file_id"], s["base_instant"], orphan
    )
    cur = {r.k: r.p for r in t.snapshot().collect()}
    assert cur[5] == 50.0 and cur[3] == 999.0  # orphan invisible


def test_crashed_instant_id_never_reused(spark, tmp_path):
    """r15 advice fix: a retry after a crash between data write and
    commit rename allocates a FRESH instant id, so the orphan files
    stay invisible forever."""
    t, i1 = _mk(spark, tmp_path)
    crashed = t._next_instant()
    t._begin_instant(crashed)  # markers only; no .commit rename
    src = os.path.join(t.root, t.file_slices()[
        sorted(t.file_slices())[0]
    ][1])
    import shutil

    orphan = os.path.join(
        t.root, f"deadbeefdead_0-0-0_{crashed}.parquet"
    )
    shutil.copyfile(src, orphan)
    retry = t._next_instant()
    assert retry > crashed  # never reuses the crashed id
    i2 = t.upsert(spark.createDataFrame(
        [(3, 999.0)], "k bigint, p double"
    ))
    assert i2 == retry
    assert t.snapshot().count() == 20  # orphan still not planned


# ---------------- r15: partitioned tables ----------------


def test_partitioned_layout_pruning_and_upsert(spark, tmp_path):
    t = HudiLiteTable(spark, str(tmp_path / "p"), key_field="k")
    df = spark.createDataFrame(
        [(i, "AB"[i % 2], float(i) * 10) for i in range(20)],
        "k bigint, s string, p double",
    )
    i1 = t.bulk_insert(df, groups=2, partition_field="s")
    assert t.partition_field() == "s"
    # partition-path layout on disk
    assert sorted(
        d for d in os.listdir(t.root) if not d.startswith(".")
    ) == ["A", "B"]
    # pruned planning lists only the matching directory
    plan = t.plan_slices(partition_filter={"s": "A"})
    assert plan and all(
        sl["partition"] == "A" and sl["base_path"].startswith("A/")
        for sl in plan
    )
    pr = {r.k for r in t.snapshot(
        partition_filter={"s": "A"}
    ).collect()}
    assert pr == {i for i in range(20) if i % 2 == 0}
    # an upsert into one partition touches only that partition
    i2 = t.upsert(spark.createDataFrame(
        [(2, "A", 999.0)], "k bigint, s string, p double"
    ))
    meta = t.commit_meta(i2)
    assert set(meta["partitionToWriteStats"]) == {"A"}
    cur = {r.k: r.p for r in t.snapshot().collect()}
    assert cur[2] == 999.0 and len(cur) == 20
    # meta: partitioned rows carry _hoodie_partition_path
    m = t.snapshot(meta=True).filter("k = 2").collect()[0]
    assert m["_hoodie_partition_path"] == "A"
    # wrong filter key refuses
    with pytest.raises(ValueError, match="partition field"):
        t.plan_slices(partition_filter={"nope": 1})


def test_partitioned_mor_end_to_end(spark, tmp_path):
    t = HudiLiteTable(spark, str(tmp_path / "pm"), key_field="k")
    df = spark.createDataFrame(
        [(i, "AB"[i % 2], float(i) * 10) for i in range(20)],
        "k bigint, s string, p double",
    )
    i1 = t.bulk_insert(
        df, groups=2, table_type="MERGE_ON_READ", partition_field="s"
    )
    t.upsert(spark.createDataFrame(
        [(2, "A", 999.0), (100, "B", 1.0)],
        "k bigint, s string, p double",
    ))
    t.delete(spark.createDataFrame([(4,)], "k bigint"))
    cur = {r.k: r.p for r in t.snapshot().collect()}
    assert cur[2] == 999.0 and cur[100] == 1.0 and 4 not in cur
    assert len(cur) == 20
    # log files live under their partition path
    logged = [s for s in t.plan_slices() if s["logs"]]
    assert logged and all(
        log.startswith(s["partition"] + "/")
        for s in logged for log in s["logs"]
    )
    t.compact()
    cur2 = {r.k: r.p for r in t.snapshot().collect()}
    assert cur2 == cur
    inc = sorted(r.k for r in t.incremental(i1).collect())
    assert inc == [2, 100]


def test_mor_stream_emits_log_and_base_changes(spark, tmp_path):
    from thrive_spark.streaming.hudi_source import register

    t, i1 = _mk_mor(spark, tmp_path)
    i2 = t.upsert(spark.createDataFrame(
        [(3, 999.0), (100, 1.0)], "k bigint, p double"
    ))
    i3 = t.compact()
    register(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("thrive_hudi")
        .option("path", t.root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out).collect()
    by_ins = {}
    for r in got:
        by_ins.setdefault(r["_hoodie_commit_time"], []).append(
            (r["k"], r["p"])
        )
    assert sorted(by_ins[i1]) == [
        (i, float(i) * 10) for i in range(20)
    ]
    # batch 2: update decoded from the log block + insert's base file
    assert sorted(by_ins[i2]) == [(3, 999.0), (100, 1.0)]
    # compaction re-emits nothing
    assert i3 not in by_ins


# ---------------- r15: the cleaner ----------------


def test_clean_removes_superseded_slices_and_guards(spark, tmp_path):
    t, i1 = _mk(spark, tmp_path)  # COW
    i2 = t.upsert(spark.createDataFrame(
        [(3, 999.0)], "k bigint, p double"
    ))
    # the rewritten group now has two slices; keep_last=1 drops one
    before = {r.k: r.p for r in t.snapshot().collect()}
    res = t.clean(keep_last=1)
    assert res["deleted_files"] == 1
    assert res["earliest_retained"] == i2
    after = {r.k: r.p for r in t.snapshot().collect()}
    assert after == before
    # time travel below the boundary raises the guarded error
    with pytest.raises(ValueError, match="cleaned"):
        t.snapshot(i1)
    # idempotent: nothing left to clean, no new .clean marker
    assert t.clean(keep_last=1)["deleted_files"] == 0
    assert len([
        f for f in os.listdir(t.meta_dir)
        if f.endswith(".clean") and f.count(".") == 1
    ]) == 1


def test_clean_keep2_retains_one_level_of_history(spark, tmp_path):
    t, i1 = _mk(spark, tmp_path)
    i2 = t.upsert(spark.createDataFrame(
        [(3, 90.0)], "k bigint, p double"
    ))
    i3 = t.upsert(spark.createDataFrame(
        [(3, 91.0)], "k bigint, p double"
    ))
    res = t.clean(keep_last=2)
    assert res["deleted_files"] == 1  # only the i1 slice of the group
    # i2 still serves (retained), i1 does not
    assert {r.p for r in t.snapshot(i2).filter("k=3").collect()} \
        == {90.0}
    with pytest.raises(ValueError, match="cleaned"):
        t.snapshot(i1)


def test_clean_mor_drops_compacted_logs(spark, tmp_path):
    t, i1 = _mk_mor(spark, tmp_path)
    t.upsert(spark.createDataFrame(
        [(3, 999.0), (100, 1.0)], "k bigint, p double"
    ))
    t.delete(spark.createDataFrame([(5,)], "k bigint"))
    t.compact()
    before = {r.k: r.p for r in t.snapshot().collect()}
    res = t.clean(keep_last=1)
    assert res["deleted_files"] >= 3  # old bases + their log files
    # no log file survives anywhere
    leftovers = [
        f for f in os.listdir(t.root)
        if f.startswith(".") and ".log." in f
    ]
    assert leftovers == []
    assert {r.k: r.p for r in t.snapshot().collect()} == before


def test_mor_timestamp_logical_type_roundtrip(spark, tmp_path):
    """Timestamp columns travel through log blocks as exact
    timestamp-micros longs and come back as equal timestamps."""
    import datetime

    t = HudiLiteTable(spark, str(tmp_path / "ts"), key_field="k")
    base = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1, 0, 0, i, 123456), float(i))
         for i in range(10)],
        "k bigint, ts timestamp, v double",
    )
    t.bulk_insert(base, groups=1, table_type="MERGE_ON_READ")
    t.upsert(spark.createDataFrame(
        [(3, datetime.datetime(2024, 6, 1, 12, 30, 59, 654321), 9.0),
         (11, None, 1.0)],
        "k bigint, ts timestamp, v double",
    ))
    got = {r.k: r.ts for r in t.snapshot().collect()}
    assert got[3] == datetime.datetime(2024, 6, 1, 12, 30, 59, 654321)
    assert got[11] is None  # null timestamp survives the union
    assert got[0] == datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)
    assert len(got) == 11


def test_partitioned_stream_emits_all_partitions(spark, tmp_path):
    """The stream source iterates every partition key in the commit
    stats (the r14 reader hardcoded the unpartitioned '' key)."""
    from thrive_spark.streaming.hudi_source import register

    t = HudiLiteTable(spark, str(tmp_path / "ps"), key_field="k")
    df = spark.createDataFrame(
        [(i, "AB"[i % 2], float(i)) for i in range(12)],
        "k bigint, s string, p double",
    )
    i1 = t.bulk_insert(df, groups=1, partition_field="s")
    i2 = t.upsert(spark.createDataFrame(
        [(0, "A", 100.0), (1, "B", 101.0)],
        "k bigint, s string, p double",
    ))
    register(spark)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("thrive_hudi")
        .option("path", t.root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out).collect()
    b1 = sorted(r.k for r in got if r["_hoodie_commit_time"] == i1)
    b2 = sorted(
        (r.k, r.s, r.p) for r in got if r["_hoodie_commit_time"] == i2
    )
    assert b1 == list(range(12))
    assert b2 == [(0, "A", 100.0), (1, "B", 101.0)]


def test_upsert_checkpointed_gates_replays(spark, tmp_path):
    t = HudiLiteTable(spark, str(tmp_path / "ck"), key_field="k")
    t.bulk_insert(spark.createDataFrame(
        [(0, 0.0)], "k bigint, p double"
    ), groups=1)
    one = spark.createDataFrame([(1, 1.0)], "k bigint, p double")
    t.upsert_checkpointed(one, "s1", 0)
    tl = t.timeline()
    # replay: no instant, no rows
    assert t.upsert_checkpointed(one, "s1", 0) == tl[-1]
    assert t.timeline() == tl
    assert t.snapshot().count() == 2
    assert t.latest_checkpoint("s1") == 0
    assert t.latest_checkpoint("other") == -1
    # newer checkpoint lands
    t.upsert_checkpointed(
        spark.createDataFrame([(2, 2.0)], "k bigint, p double"),
        "s1", 1,
    )
    assert t.snapshot().count() == 3


def _spark_jobs(spark, fn):
    """Run fn under a tagged job group and return how many Spark jobs
    it launched."""
    import uuid as _uuid

    sc = spark.sparkContext
    tag = f"jobcount-{_uuid.uuid4().hex[:8]}"
    sc.setJobGroup(tag, "job-count gate")
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(tag))


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", "MERGE_ON_READ"])
def test_upsert_job_count_independent_of_groups(spark, tmp_path, table_type):
    """r16 gate (r15 verdict #1): the upsert write path must cost a
    BOUNDED number of Spark jobs no matter how many file groups the
    batch touches — the old path ran O(groups) jobs and, for MOR,
    collected every matched row to the driver to encode log blocks."""
    from pyspark.sql import functions as F

    counts = {}
    for groups in (2, 8):
        t = HudiLiteTable(
            spark, str(tmp_path / f"{table_type}-{groups}"), key_field="k"
        )
        df = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("p")
        )
        t.bulk_insert(df, groups=groups, table_type=table_type)
        # touches every group (every other key) + opens a fresh group
        batch = spark.range(0, 240, 2).select(
            F.col("id").alias("k"), (F.col("id") + 0.5).alias("p")
        )
        counts[groups] = _spark_jobs(spark, lambda: t.upsert(batch))
        # the write landed correctly regardless of job accounting
        got = {r.k: r.p for r in t.snapshot().collect()}
        assert got[0] == 0.5 and got[1] == 1.0 and got[238] == 238.5
        assert len(got) == 220
    assert counts[8] == counts[2], counts
    # absolute bound covers the r16 bloom-index tagging probe (one
    # JVM-only job regardless of group count) on top of the write path
    assert counts[2] <= 14, counts


def test_bulk_insert_single_write_job(spark, tmp_path):
    """r16: bulk_insert writes all file groups in one distributed job
    (plus the partition-discovery job on partitioned tables)."""
    from pyspark.sql import functions as F

    t = HudiLiteTable(spark, str(tmp_path / "bi"), key_field="k")
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("p")
    )
    n = _spark_jobs(spark, lambda: t.bulk_insert(df, groups=16))
    assert n <= 2, n
    assert t.snapshot().count() == 300


def test_clustering_replacecommit_semantics(spark, tmp_path):
    """r16: cluster() rewrites live groups into one sorted group per
    partition under a replacecommit; replaced groups vanish from
    reads at/after the instant, survive time travel below it, stay on
    disk, and incremental pulls across the clustering see nothing."""
    from pyspark.sql import functions as F

    t = HudiLiteTable(spark, str(tmp_path / "c"), key_field="k")
    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(40)], "k bigint, p double"
    )
    i1 = t.bulk_insert(df, groups=4)
    i2 = t.upsert(spark.createDataFrame(
        [(3, 999.0), (100, 1.0)], "k bigint, p double"
    ))
    pre = t.plan_slices()
    assert len(pre) >= 4
    i3 = t.cluster("k")
    post = t.plan_slices()
    assert len(post) == 1 and post[0]["base_instant"] == i3
    meta = t.commit_meta(i3)
    assert set(meta["partitionToReplaceFileIds"][""]) == {
        s["file_id"] for s in pre
    }
    # replace is metadata-only: old files still on disk
    for s in pre:
        assert os.path.exists(os.path.join(t.root, s["base_path"]))
    # time travel below the replace serves the old layout
    assert {s["file_id"] for s in t.plan_slices(i2)} == {
        s["file_id"] for s in pre
    }
    # content identical before/after; new file physically SORTED
    got = {r.k: r.p for r in t.snapshot().collect()}
    assert len(got) == 41 and got[3] == 999.0 and got[100] == 1.0
    ks = [
        r.k for r in spark.read.parquet(
            os.path.join(t.root, post[0]["base_path"])
        ).select("k").collect()
    ]
    assert ks == sorted(ks)
    # clustering is invisible to incremental pulls
    assert t.incremental(i2).count() == 0
    assert sorted(
        r.k for r in t.incremental(i1).select("k").collect()
    ) == [3, 100]
    # writes continue normally on the clustered layout
    t.upsert(spark.createDataFrame([(3, 1.5), (200, 2.5)],
                                   "k bigint, p double"))
    got2 = {r.k: r.p for r in t.snapshot().collect()}
    assert got2[3] == 1.5 and got2[200] == 2.5 and len(got2) == 42


def test_clustering_partitioned_and_mor_refusal(spark, tmp_path):
    from pyspark.sql import functions as F

    t = HudiLiteTable(spark, str(tmp_path / "cp"), key_field="k")
    df = spark.createDataFrame(
        [(i, "AB"[i % 2], float(i)) for i in range(30)],
        "k bigint, g string, p double",
    )
    t.bulk_insert(df, groups=3, partition_field="g")
    i2 = t.cluster("p")
    post = t.plan_slices()
    assert sorted(s["partition"] for s in post) == ["A", "B"]
    assert all(s["base_instant"] == i2 for s in post)
    assert t.snapshot().count() == 30
    meta = t.commit_meta(i2)
    assert set(meta["partitionToReplaceFileIds"]) == {"A", "B"}
    # pruned planning still works on the clustered layout
    pruned = t.plan_slices(partition_filter={"g": "A"})
    assert len(pruned) == 1 and pruned[0]["partition"] == "A"

    m = HudiLiteTable(spark, str(tmp_path / "cm"), key_field="k")
    m.bulk_insert(
        spark.createDataFrame([(1, 1.0)], "k bigint, p double"),
        groups=1, table_type="MERGE_ON_READ",
    )
    with pytest.raises(NotImplementedError, match="COPY_ON_WRITE"):
        m.cluster("k")


# ---------- metadata table (files index) ----------


def test_metadata_index_matches_listing_across_lifecycle(
    spark, tmp_path
):
    """MOR lifecycle — bulk insert, post-sync upsert (log block),
    delete block, compaction, clean — the metadata-planned slices
    must stay slice-for-slice identical to listing-planned ones,
    through both a fresh sync and the stale-sync catch-up fold."""
    t, _ = _mk_mor(spark, tmp_path)

    def check():
        assert t.plan_slices(use_metadata=True) == t.plan_slices(
            use_metadata=False
        )

    t.metadata_sync()
    check()
    t.upsert(spark.createDataFrame(
        [(3, 999.0), (55, 1.0)], "k bigint, p double"
    ))  # after the sync: exercises the catch-up fold
    check()
    t.delete(spark.createDataFrame([(4,)], "k bigint"))
    check()
    t.compact()
    check()
    t.metadata_sync()  # fresh snapshot; the clean relies on catch-up
    t.clean(keep_last=1)
    check()
    cur = {r.k: r.p for r in t.snapshot().collect()}
    assert cur[3] == 999.0 and 4 not in cur and cur[55] == 1.0


def test_metadata_plan_touches_no_data_directory(
    spark, tmp_path, monkeypatch
):
    """The files index's reason to exist: with a sync in place,
    planning lists NO data directory (only .hoodie metadata paths) —
    at 100 TB the per-partition listing RPCs are the cost the
    metadata table kills."""
    import thrive_spark.sources.hudi_lite as hl

    t = HudiLiteTable(spark, str(tmp_path / "p"), key_field="k")
    df = spark.createDataFrame(
        [(i, "AB"[i % 2], float(i) * 10) for i in range(20)],
        "k bigint, s string, p double",
    )
    t.bulk_insert(df, groups=2, partition_field="s")
    t.metadata_sync()
    real_listdir = os.listdir
    meta_root = t.meta_dir

    def guarded(path="."):
        p = os.fspath(path)
        if p.startswith(t.root) and not p.startswith(meta_root):
            raise AssertionError(
                f"data-directory listing during metadata planning: {p}"
            )
        return real_listdir(path)

    monkeypatch.setattr(hl.os, "listdir", guarded)
    plan = t.plan_slices(use_metadata=True)
    assert len(plan) == 4  # 2 partitions x 2 groups
    assert {s["partition"] for s in plan} == {"A", "B"}
    pruned = t.plan_slices(
        partition_filter={"s": "A"}, use_metadata=True
    )
    assert pruned and all(s["partition"] == "A" for s in pruned)


def test_metadata_requires_sync_and_prunes_old_snapshots(
    spark, tmp_path
):
    t, _ = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="metadata_sync"):
        t.plan_slices(use_metadata=True)
    with pytest.raises(ValueError, match="metadata_sync"):
        t.metadata_files_df()
    s1 = t.metadata_sync()
    t.upsert(spark.createDataFrame([(1, 5.0)], "k bigint, p double"))
    s2 = t.metadata_sync()
    assert s2 > s1
    snaps = [
        f for f in os.listdir(t._md_dir) if f.startswith("files-")
    ]
    assert snaps == [f"files-{s2}.parquet"]  # one snapshot, newest
    names = {r.file_name for r in t.metadata_files_df().collect()}
    assert {
        s["base_path"].rpartition("/")[2] for s in t.plan_slices()
    } <= names


# ---------- metadata table (column stats) ----------


def test_range_layout_and_col_stats_pruning(spark, tmp_path):
    """Range-laid-out bulk insert + footer-synced column stats: a
    range read must SKIP non-matching files and still return exactly
    the matching rows."""
    t = HudiLiteTable(spark, str(tmp_path / "cs"), key_field="k")
    df = spark.createDataFrame(
        [(i, float(i) * 10) for i in range(100)], "k bigint, p double"
    )
    t.bulk_insert(df, groups=4, sort_field="k")
    t.col_stats_sync(["k", "p"])
    alls = t.plan_slices()
    assert len(alls) == 4
    kept = t.prune_slices("k", 0, 24)
    assert 1 <= len(kept) < len(alls)
    got = {r.k for r in t.snapshot_range("k", 0, 24).collect()}
    assert got == set(range(25))
    # double-typed bounds prune too
    keptp = t.prune_slices("p", 0.0, 240.0)
    assert 1 <= len(keptp) < len(alls)
    gp = {r.k for r in t.snapshot_range("p", 0.0, 240.0).collect()}
    assert gp == set(range(25))
    # a range that nothing matches: every file skipped, empty result
    assert t.prune_slices("k", 5000, 6000) == []
    assert t.snapshot_range("k", 5000, 6000).count() == 0


def test_col_stats_conservative_on_stale_and_logged(spark, tmp_path):
    # COW: a file written AFTER the sync has no stats row -> kept
    t = HudiLiteTable(spark, str(tmp_path / "st"), key_field="k")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "k bigint, p double"
    )
    t.bulk_insert(df, groups=2, sort_field="k")
    t.col_stats_sync(["k"])
    t.upsert(spark.createDataFrame(
        [(1000 + i, 1.0) for i in range(5)], "k bigint, p double"
    ))
    got = {r.k for r in t.snapshot_range("k", 1000, 1004).collect()}
    assert got == {1000, 1001, 1002, 1003, 1004}
    # MOR: a log block can move a VALUE column outside the base
    # file's bounds — the logged slice must be kept regardless
    m = HudiLiteTable(spark, str(tmp_path / "mo"), key_field="k")
    m.bulk_insert(df, groups=2, table_type="MERGE_ON_READ",
                  sort_field="k")
    m.col_stats_sync(["k", "p"])
    m.upsert(spark.createDataFrame(
        [(3, 999.0)], "k bigint, p double"
    ))
    rows = m.snapshot_range("p", 999.0, 999.0).collect()
    assert [(r.k, r.p) for r in rows] == [(3, 999.0)]


def test_col_stats_string_refusal_and_sync_required(spark, tmp_path):
    t = HudiLiteTable(spark, str(tmp_path / "sr"), key_field="k")
    t.bulk_insert(spark.createDataFrame(
        [(1, "x", 1.0)], "k bigint, s string, p double"
    ), groups=1)
    with pytest.raises(ValueError, match="col_stats_sync"):
        t.prune_slices("k", 0, 10)
    with pytest.raises(NotImplementedError, match="truncated"):
        t.col_stats_sync(["s"])


# ---------- bloom index (tagging candidate prune) ----------


def test_bloom_index_prunes_tagging_to_owning_group(spark, tmp_path):
    """A single-key upsert on a 4-group range-laid-out table must tag
    against exactly ONE candidate file (exact key ranges prune the
    rest before the bloom is even consulted) — the O(owning groups)
    small-delta cost the bloom index exists for."""
    t = HudiLiteTable(
        spark, str(tmp_path / "b"), key_field="k", bloom_min_slices=2
    )
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k bigint, p double"
    )
    t.bulk_insert(df, groups=4, sort_field="k")
    t.upsert(spark.createDataFrame([(3, 999.0)], "k bigint, p double"))
    assert t._last_tag_candidates == 1
    cur = {r.k: r.p for r in t.snapshot().collect()}
    assert cur[3] == 999.0 and len(cur) == 100
    # MOR delete path prunes the same way
    m = HudiLiteTable(
        spark, str(tmp_path / "bm"), key_field="k", bloom_min_slices=2
    )
    m.bulk_insert(df, groups=4, table_type="MERGE_ON_READ",
                  sort_field="k")
    m.delete(spark.createDataFrame([(7,)], "k bigint"))
    assert m._last_tag_candidates == 1
    assert 7 not in {r.k for r in m.snapshot().collect()}
    # a batch blanketing every range degrades to all candidates
    t.upsert(df.selectExpr("k", "p + 1 AS p"))
    assert t._last_tag_candidates == len(t.plan_slices())


def test_bloom_index_fallbacks(spark, tmp_path):
    import json as _json

    # below the slice gate (default 16): probe skipped
    t1 = HudiLiteTable(spark, str(tmp_path / "one"), key_field="k")
    t1.bulk_insert(spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k bigint, p double"
    ), groups=1)
    t1.upsert(spark.createDataFrame([(3, 9.0)], "k bigint, p double"))
    assert t1._last_tag_candidates is None
    assert {r.p for r in t1.snapshot().filter("k=3").collect()} == {9.0}
    # legacy table (no bloom fields in commit stats): full-scan path
    t2 = HudiLiteTable(
        spark, str(tmp_path / "leg"), key_field="k", bloom_min_slices=2
    )
    t2.bulk_insert(spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k bigint, p double"
    ), groups=4)
    for f in os.listdir(t2.meta_dir):
        if f.endswith(".commit"):
            p = os.path.join(t2.meta_dir, f)
            with open(p) as fh:
                meta = _json.load(fh)
            for sts in meta.get("partitionToWriteStats", {}).values():
                for st in sts:
                    for key in ("bloom", "minKey", "maxKey"):
                        st.pop(key, None)
            with open(p, "w") as fh:
                _json.dump(meta, fh)
    t2.upsert(spark.createDataFrame([(3, 9.0)], "k bigint, p double"))
    assert t2._last_tag_candidates is None
    cur = {r.k: r.p for r in t2.snapshot().collect()}
    assert cur[3] == 9.0 and len(cur) == 40


def test_bloom_build_probe_parity():
    """No false negatives, bounded false positives — and the Python
    probe here matches the JVM expression probe by construction
    (same md5 split-digest hashes, same little-endian bit layout),
    which test_bloom_index_prunes_tagging_to_owning_group exercises
    end-to-end."""
    from thrive_spark.sources.hudi_lite import (
        _bloom_build,
        _bloom_may_contain,
        _key_hashes,
    )

    keys = [str(i) for i in range(50)]
    bl = _bloom_build(keys)
    assert all(_bloom_may_contain(bl, *_key_hashes(k)) for k in keys)
    fp = sum(
        _bloom_may_contain(bl, *_key_hashes(str(i)))
        for i in range(1000, 2000)
    )
    assert fp < 60  # k=2, m>=16n: per-key FP ~1.6%
