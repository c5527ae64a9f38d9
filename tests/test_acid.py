"""ACID table format (sources/acid.py): snapshot isolation, the
put-if-absent commit race, copy-on-write file sharing, time travel,
and a REAL two-thread concurrent-append race with rebase."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from thrive_spark.sources.acid import CommitConflict, ThriveTable
from thrive_spark.tables import Tables


def _orders(spark, sf_dir):
    return Tables(spark, sf_dir).orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )


def test_snapshot_isolation_and_time_travel(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(o.filter("k % 7 = 0"))
    n1 = tbl.snapshot(1).count()
    tbl.append(o.filter("k % 7 = 3"))
    tbl.delete_where("p > 200000")
    # v1 re-read AFTER two later commits: byte-identical history
    assert tbl.snapshot(1).count() == n1
    assert tbl.snapshot(2).count() == n1 + o.filter("k % 7 = 3").count()
    want = (
        o.filter("(k % 7 = 0 OR k % 7 = 3) AND NOT (p > 200000)").count()
    )
    assert tbl.snapshot().count() == want == tbl.manifest(3)["n_rows"]
    assert [m["op"] for m in tbl.history()] == [
        "create", "append", "delete",
    ]


def test_commit_is_put_if_absent(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(o.limit(10))
    with pytest.raises(CommitConflict):
        tbl._try_commit(1, {"op": "create", "files": [], "n_rows": 0})
    # the losing attempt must not leave tmp litter behind
    litter = [
        f for f in (tmp_path / "t" / "_manifests").iterdir()
        if f.name.startswith(".tmp-")
    ]
    assert litter == []


def test_append_reuses_prior_files_by_reference(spark, sf_dir, tmp_path):
    """Iceberg property: commits share unchanged files — an append's
    manifest is a superset of its base, a COW delete carries every
    untouched file."""
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(o.filter("k % 7 = 0").repartition(4))
    f1 = set(tbl.manifest(1)["files"])
    tbl.append(o.filter("k % 7 = 3"))
    f2 = set(tbl.manifest(2)["files"])
    assert f1 < f2  # strict superset: base files carried by reference


def test_delete_is_copy_on_write_at_file_grain(spark, sf_dir, tmp_path):
    """Only files containing victims are rewritten: partition by a
    key range so the predicate targets a known file subset."""
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    # one parquet file per bucket: bucket 0 rows are the only victims
    buck = o.withColumn("b", (F.col("k") % 4).cast("int"))
    tbl.create(buck.repartition(4, "b").sortWithinPartitions("b"))
    files_before = set(tbl.manifest(1)["files"])
    tbl.delete_where("b = 0 AND p > 0")
    files_after = set(tbl.manifest(2)["files"])
    carried = files_before & files_after
    assert carried, "untouched files must carry by reference"
    assert files_before - files_after, "victim files must be replaced"
    # content: exactly bucket 0 removed
    assert tbl.snapshot().filter("b = 0").count() == 0
    assert (
        tbl.snapshot().count()
        == buck.filter("b <> 0").count()
        == tbl.manifest(2)["n_rows"]
    )


def test_delete_to_empty_table_keeps_schema(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(o.limit(50))
    tbl.delete_where("p >= 0 OR p < 0 OR p IS NULL")
    snap = tbl.snapshot()
    assert snap.count() == 0
    assert snap.columns == ["k", "p"]


def test_concurrent_appends_race_and_rebase(spark, sf_dir, tmp_path):
    """Two writers append CONCURRENTLY from the same base version:
    the put-if-absent link makes exactly one win each version; the
    loser rebases and lands next. Both payloads must survive."""
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(o.filter("k % 7 = 0"))
    n_base = tbl.manifest(1)["n_rows"]

    slices = ["k % 7 = 1", "k % 7 = 2"]
    counts = [o.filter(s).count() for s in slices]
    barrier = threading.Barrier(2)
    errors = []

    def writer(pred):
        try:
            df = o.filter(pred)
            barrier.wait(timeout=60)  # force the same base snapshot
            tbl.append(df)
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(s,)) for s in slices]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert errors == []
    assert tbl.versions() == [1, 2, 3]  # loser rebased onto winner
    assert tbl.snapshot().count() == n_base + sum(counts)
    assert tbl.manifest(3)["n_rows"] == n_base + sum(counts)


def test_stale_delete_rebases_over_concurrent_append(spark, sf_dir, tmp_path):
    """The rebase-correctness case from the module docstring: B plans
    a delete on v2, A appends v3 (including rows matching B's
    predicate), B conflicts and recomputes — A's matching rows must
    be deleted too, and A's non-matching rows must survive."""
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(o.filter("k % 7 = 0"))
    tbl.append(o.filter("k % 7 = 3"))
    stale = tbl.latest_version()
    tbl.append(o.filter("k % 7 = 5"))  # A wins v3
    with pytest.raises(CommitConflict):
        tbl._try_commit(stale + 1, {"op": "x", "files": [], "n_rows": 0})
    v = tbl.delete_where("p > 150000")  # B rebases
    assert v == 4
    got = tbl.snapshot()
    assert got.filter("p > 150000").count() == 0
    # A's appended non-victims survived B's rebased rewrite
    assert (
        got.filter("k % 7 = 5").count()
        == o.filter("k % 7 = 5 AND NOT (p > 150000)").count()
    )


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to
    NULL must SURVIVE — and survival must not depend on file layout
    (r11 advice, high): before the fix, NULL rows in REWRITTEN files
    were dropped (NOT(pred) excludes them) while NULL rows in
    untouched files rode along by reference."""
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    # file A: a TRUE-pred victim AND a NULL-pred row (A is rewritten);
    # file B: ONLY NULL-pred rows (B is untouched, carried by ref)
    a = spark.createDataFrame(
        [(1, 300000.0), (2, None)], "k int, p double"
    ).coalesce(1)
    b = spark.createDataFrame(
        [(3, None), (4, None)], "k int, p double"
    ).coalesce(1)
    tbl.create(a)
    tbl.append(b)
    tbl.delete_where("p > 150000")
    got = sorted(r.k for r in tbl.snapshot().collect())
    assert got == [2, 3, 4], got  # only the TRUE row deleted
    assert tbl.manifest(tbl.latest_version())["n_rows"] == 3


def test_segmented_manifest_readback_and_reuse(spark, sf_dir, tmp_path):
    """Manifest-of-manifests (r12, verdict item 5): past the
    segment_threshold the loose file tail seals into immutable parquet
    segments; appends carry prior segments BY REFERENCE (O(delta)
    commit metadata) and read-back equals the plain file-list table."""
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"), segment_threshold=3)
    tbl.create(o.filter("k % 7 = 0").repartition(4))  # 4 files > 3
    m1 = tbl.manifest(1)
    assert m1["segments"] and not m1["files"], m1
    # appends: small deltas stay loose until the tail overflows again
    tbl.append(o.filter("k % 7 = 1").repartition(2))
    m2 = tbl.manifest(2)
    assert m2["segments"] == m1["segments"]  # carried by reference
    assert len(m2["files"]) == 2
    tbl.append(o.filter("k % 7 = 2").repartition(2))
    m3 = tbl.manifest(3)
    assert m3["segments"][0] == m1["segments"][0]
    assert len(m3["segments"]) == 2 and not m3["files"]  # tail sealed
    want = o.filter("k % 7 IN (0, 1, 2)").count()
    assert tbl.snapshot().count() == want == m3["n_rows"]
    # COW delete dissolves ONLY victim segments
    v = tbl.delete_where("p > 150000")
    m4 = tbl.manifest(v)
    got = sorted(r.k for r in tbl.snapshot().collect())
    want_rows = sorted(
        r.k
        for r in o.filter(
            "k % 7 IN (0, 1, 2) AND (p > 150000) IS NOT TRUE"
        ).collect()
    )
    assert got == want_rows
    assert m4["n_files"] == len(tbl.files(m4))


def test_vacuum_prunes_history_and_orphans(spark, sf_dir, tmp_path):
    """vacuum(keep_last=N): manifests past the retention window drop,
    unreferenced data files and segments are physically deleted, and
    time travel works inside the window / raises outside it."""
    import os as _os

    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"), segment_threshold=2)
    tbl.create(o.filter("k % 7 = 0").repartition(3))
    tbl.append(o.filter("k % 7 = 1").repartition(3))
    tbl.delete_where("p > 150000")  # rewrites victims: v1/v2 files orphanable
    tbl.append(o.filter("k % 7 = 2").repartition(3))
    assert tbl.versions() == [1, 2, 3, 4]
    n_before = tbl.snapshot().count()

    stats = tbl.vacuum(keep_last=2)
    assert stats["dropped_versions"] == [1, 2]
    assert stats["deleted_data_files"] > 0  # the COW victims died
    assert tbl.versions() == [3, 4]
    # retained snapshots still read (incl. time travel to v3)
    assert tbl.snapshot().count() == n_before
    assert tbl.snapshot(3).count() == tbl.manifest(3)["n_rows"]
    # the boundary: vacuumed versions are gone, by design, with a
    # descriptive retention error (not a raw FileNotFoundError)
    with pytest.raises(ValueError, match="retention boundary"):
        tbl.manifest(1)
    # every file the retained manifests reference still exists
    for v in tbl.versions():
        for f in tbl.files(tbl.manifest(v)):
            assert _os.path.exists(f), f


def test_compact_then_vacuum_retires_small_files(spark, sf_dir, tmp_path):
    """compact() packs small files into a new snapshot without
    touching rows; vacuum() afterwards physically retires the
    pre-compaction layout once it leaves the retention window."""
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"), segment_threshold=4)
    tbl.create(o.filter("k % 7 = 0").repartition(6))
    n = tbl.snapshot().count()
    v = tbl.compact(min_file_bytes=1 << 30, target_file_bytes=1 << 30)
    assert v == 2
    assert tbl.manifest(2)["op"] == "compact"
    assert tbl.snapshot().count() == n  # rows untouched
    assert len(tbl.files(tbl.manifest(2))) < len(tbl.files(tbl.manifest(1)))
    # idempotence: a second compact on an already-packed table no-ops
    assert tbl.compact(min_file_bytes=1 << 30) == 2
    stats = tbl.vacuum(keep_last=1)
    assert stats["dropped_versions"] == [1]
    assert stats["deleted_data_files"] >= 6  # the fragmented layout died
    assert tbl.snapshot().count() == n


def test_schema_evolution_backfill_and_rejection(spark, tmp_path):
    """merge_schema appends widen the manifest schema; old files
    NULL-backfill the new column on read; each version time-travels
    under ITS OWN schema; type changes are rejected."""
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, p double"))
    tbl.append(
        spark.createDataFrame([(3, 30.0, "x")], "k int, p double, tag string"),
        merge_schema=True,
    )
    v2 = tbl.snapshot()
    assert v2.columns == ["k", "p", "tag"]
    rows = {r.k: r.tag for r in v2.collect()}
    assert rows == {1: None, 2: None, 3: "x"}  # NULL backfill
    assert tbl.snapshot(1).columns == ["k", "p"]  # v1 keeps its schema
    # a third append WITHOUT merge_schema keeps the evolved schema
    tbl.append(spark.createDataFrame([(4, 40.0, "y")], "k int, p double, tag string"))
    assert tbl.snapshot().count() == 4
    # type change rejected
    with pytest.raises(ValueError, match="cannot change type"):
        tbl.append(
            spark.createDataFrame([(5, "oops")], "k int, p string"),
            merge_schema=True,
        )


def test_change_feed_merge_and_compact(spark, tmp_path):
    """changes(v): merge surfaces as delete+insert pairs for matched
    keys and pure inserts for new keys; compaction yields an empty
    feed; appends yield pure inserts."""
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, p double"
    ).repartition(2))
    c1 = tbl.changes(1)
    assert c1.filter("_change_type = 'delete'").count() == 0
    assert c1.count() == 3
    src = spark.createDataFrame([(2, 99.0), (4, 40.0)], "k int, p double")
    tbl.merge_upsert(src, key="k")
    c2 = tbl.changes(2).collect()
    ins = {(r.k, r.p) for r in c2 if r._change_type == "insert"}
    del_ = {(r.k, r.p) for r in c2 if r._change_type == "delete"}
    assert ins == {(2, 99.0), (4, 40.0)}  # update's new image + insert
    assert del_ == {(2, 20.0)}  # update's old image only
    v = tbl.compact(min_file_bytes=1 << 30)
    assert v == 3 and tbl.changes(3).count() == 0


def test_e2e_broker_to_table_to_stream(spark, sf_dir, tmp_path):
    """Both exactly-once edges COMPOSED: broker feed → Structured
    Streaming → txn-token ACID appends → the table itself tailed as a
    second stream (versions as offsets) → final sink equals the
    original feed exactly once."""
    from pyspark.sql import functions as F

    from thrive_spark.sources.acid import acid_stream_sink
    from thrive_spark.streaming import table_source
    from thrive_spark.streaming.broker import BrokerLog
    from thrive_spark.streaming.broker import register as reg_broker
    from thrive_spark.tables import Tables

    rows = (
        Tables(spark, sf_dir)
        .events.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .limit(400)
        .collect()
    )
    log = BrokerLog(str(tmp_path / "broker"), n_partitions=2)
    for i in range(0, len(rows), 100):
        log.produce(rows[i : i + 100])
    reg_broker(spark)
    table_source.register(spark)

    tbl = ThriveTable(spark, str(tmp_path / "table"))
    schema = (
        "partition_id long, offset long, event_id long, ts_us long, "
        "user_id long, event_type string, value double"
    )
    tbl.create(spark.createDataFrame([], schema))
    # edge 1: broker → table (txn-token appends)
    q1 = (
        spark.readStream.format("thrive_broker")
        .option("path", log.root)
        .option("maxsegmentspertrigger", 1)
        .load()
        .writeStream.foreachBatch(acid_stream_sink(tbl, "e2e"))
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q1.processAllAvailable()
    q1.stop()
    # edge 2: table → stream (version offsets)
    out = str(tmp_path / "out")
    q2 = (
        spark.readStream.format("thrive_table")
        .option("path", str(tmp_path / "table"))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out)
    assert got.count() == len(rows)
    assert got.select("event_id").distinct().count() == len(rows)


def test_zone_map_pruning_survives_segments_and_cow(spark, sf_dir, tmp_path):
    """Per-file min/max zone maps: prune a range scan to intersecting
    files only; stats survive segment sealing AND a COW delete
    (dissolved segments carry their survivors' stats); pruned results
    always equal the unpruned filter."""
    o = _orders(spark, sf_dir)
    tbl = ThriveTable(spark, str(tmp_path / "t"), segment_threshold=3)
    tbl.create(  # 6 range-disjoint files -> sealed into a segment
        o.filter("k % 2 = 0").repartitionByRange(6, "k")
        .sortWithinPartitions("k")
    )
    mx = o.filter("k % 2 = 0").agg(F.max("k")).first()[0]
    lo, hi = mx // 5, mx // 3
    df, scanned, total = tbl.snapshot_pruned("k", lo, hi)
    assert scanned < total
    want = tbl.snapshot().filter(
        (F.col("k") >= lo) & (F.col("k") <= hi)
    )
    assert df.count() == want.count() > 0
    # COW delete dissolves a victim file; survivors keep their maps
    tbl.delete_where(f"k < {mx // 10}")
    df2, scanned2, total2 = tbl.snapshot_pruned("k", lo, hi)
    assert scanned2 < total2
    want2 = tbl.snapshot().filter(
        (F.col("k") >= lo) & (F.col("k") <= hi)
    )
    assert df2.count() == want2.count() > 0
    # a column with no harvested stats is never pruned (safe)
    _, s3, t3 = tbl.snapshot_pruned("p", -1e18, 1e18)
    assert s3 == t3


def test_evolution_then_cow_rewrites_keep_evolved_column(
    spark, tmp_path
):
    """r12-advice HIGH: after a merge_schema append the file set is
    mixed-schema; the COW rewrite paths (delete/merge/compact) must
    read under the MANIFEST schema — a plain parquet read infers from
    an arbitrary footer and can silently drop the evolved column from
    the rewritten survivor files."""
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, p double"
        ).repartition(2)
    )
    tbl.append(
        spark.createDataFrame(
            [(4, 40.0, "x"), (5, 50.0, "y")], "k int, p double, tag string"
        ),
        merge_schema=True,
    )

    # DELETE touches both a pre-evolution file (k=1..3) and the
    # evolved file (k=5): rewritten survivors must keep `tag`
    tbl.delete_where("k = 2 OR k = 5")
    got = {r.k: r.tag for r in tbl.snapshot().collect()}
    assert got == {1: None, 3: None, 4: "x"}

    # COMPACT rewrites the whole mixed-schema set into one layout
    v = tbl.compact(min_file_bytes=1 << 30, target_file_bytes=1 << 30)
    assert tbl.manifest(v)["op"] == "compact"
    got = {r.k: r.tag for r in tbl.snapshot().collect()}
    assert got == {1: None, 3: None, 4: "x"}

    # MERGE rewrites the matched file; non-matched rows carried into
    # the rewrite must keep their evolved values
    tbl.merge_upsert(
        spark.createDataFrame(
            [(3, 33.0, "z"), (6, 60.0, "w")], "k int, p double, tag string"
        ),
        key="k",
    )
    got = {r.k: (r.p, r.tag) for r in tbl.snapshot().collect()}
    assert got == {
        1: (10.0, None), 3: (33.0, "z"), 4: (40.0, "x"), 6: (60.0, "w"),
    }
    # CDF of the merge surfaces old/new images under the evolved schema
    c = tbl.changes(tbl.latest_version()).collect()
    assert {(r.k, r.tag) for r in c if r._change_type == "insert"} == {
        (3, "z"), (6, "w"),
    }


def test_merged_schema_does_not_mutate_caller_schema(spark):
    """_merged_schema must COPY fields: setting nullable on the
    caller DataFrame's StructField corrupts its cached schema."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("k", IntegerType(), nullable=False),
        StructField("p", DoubleType(), nullable=False),
        StructField("tag", StringType(), nullable=False),
    ])
    df = spark.createDataFrame([(1, 1.0, "a")], schema)
    base = StructType([
        StructField("k", IntegerType(), nullable=False),
        StructField("p", DoubleType(), nullable=False),
    ]).json()
    merged = ThriveTable(spark, "/nonexistent")._merged_schema(base, df)
    assert '"tag"' in merged
    # the caller's schema object is untouched
    assert df.schema["tag"].nullable is False


def test_vacuum_retention_boundary_reader_race(spark, tmp_path):
    """Verdict r12 #7: a long-lived reader's vacuumed snapshot must
    fail CLEANLY at the manifest boundary — time travel to a vacuumed
    version raises a descriptive error (never returns partial files),
    and the change feed of the OLDEST retained version (which needs
    the vacuumed previous manifest) raises the same way."""
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "k int, p double"
        ).coalesce(1)
    )
    # COW delete REWRITES v1's only file: vacuum can then orphan it
    tbl.delete_where("k = 2")
    tbl.append(spark.createDataFrame([(3, 30.0)], "k int, p double"))
    # the long-lived reader pins v1 BEFORE vacuum
    reader = tbl.snapshot(1)
    assert reader.count() == 2
    tbl.vacuum(keep_last=1)
    assert tbl.versions() == [3]
    # time travel to a vacuumed version: descriptive error, no files
    with pytest.raises(ValueError, match="retention boundary"):
        tbl.snapshot(1)
    with pytest.raises(ValueError, match="retention boundary"):
        tbl.manifest(2)
    # CDF needs v-1's manifest: the oldest retained version's feed is
    # past the boundary too, with its own descriptive error
    with pytest.raises(ValueError, match="vacuum"):
        tbl.changes(3)
    # the pinned reader's files are physically gone — re-executing it
    # fails at scan time (documented: vacuum is the retention boundary,
    # readers must finish inside it)
    with pytest.raises(Exception):  # noqa: B017 — Spark scan error class varies
        reader.count()


def test_restore_then_vacuum_keeps_restored_data(spark, tmp_path):
    """restore(v) is a NEW commit replaying v's file list; after a
    vacuum that drops every version except the restore, the restored
    data must still read (the restore re-references the files, so
    retention keeps them) while time travel to the sources raises."""
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    tbl.create(
        spark.createDataFrame(
            [(1, 10.0), (2, 300000.0)], "k int, p double"
        ).coalesce(1)
    )
    tbl.delete_where("p > 150000")  # v2: k=1 only (v1 file rewritten)
    v = tbl.restore(1)
    assert v == 3
    assert sorted(r.k for r in tbl.snapshot().collect()) == [1, 2]
    tbl.vacuum(keep_last=1)
    assert tbl.versions() == [3]
    # restored data survives retention of its source version
    assert sorted(r.k for r in tbl.snapshot().collect()) == [1, 2]
    with pytest.raises(ValueError, match="retention boundary"):
        tbl.snapshot(1)
    # restoring a vacuumed version fails at the boundary, cleanly
    with pytest.raises(ValueError, match="retention boundary"):
        tbl.restore(2)


def test_zorder_cluster_prunes_both_dims_and_vacuums(spark, tmp_path):
    """cluster_by: after the Morton rewrite BOTH clustered columns'
    zone maps prune; rows are untouched; vacuum handles the
    partitionBy subdir layout (recursive walk) and retires the
    pre-cluster files."""
    import os as _os

    rows = [(i, (i * 37) % 1000, float(i)) for i in range(1000)]
    tbl = ThriveTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(rows, "k int, c int, p double")
    tbl.create(df.repartitionByRange(8, "k").sortWithinPartitions("k"))
    _, sc0, tc0 = tbl.snapshot_pruned("c", 250, 499)
    assert sc0 == tc0  # k-clustered layout: c never prunes
    v = tbl.cluster_by(["k", "c"], n_files=8)
    assert v == 2
    n = tbl.snapshot().count()
    assert n == 1000 == tbl.manifest(2)["n_rows"]
    dfk, sk, tk = tbl.snapshot_pruned("k", 250, 499)
    dfc, sc, tc = tbl.snapshot_pruned("c", 250, 499)
    assert sk < tk and sc < tc, (sk, tk, sc, tc)
    assert dfk.count() == 250 and dfc.count() == 250
    stats = tbl.vacuum(keep_last=1)
    assert stats["deleted_data_files"] >= 8  # pre-cluster layout died
    assert tbl.snapshot().count() == 1000
    # every surviving referenced file exists (subdir layout intact)
    for f in tbl.files(tbl.manifest(2)):
        assert _os.path.exists(f), f
