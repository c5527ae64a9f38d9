"""Adversarial stress for the LAKEHOUSE WRITERS (r15 verdict #9 —
mirroring what r10's stress corpus did for the relational oracles):
pre-1970 and sub-millisecond timestamps through the MOR log codec,
NULLs through every Avro union branch, empty/degenerate commits,
all-matched and all-deleted batches, and the honest refusal for null
partition values. These paths are exactly where the r16 distributed
writers (applyInArrow task-side encode) could silently diverge from
the driver-side encode they replaced."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from thrive_spark.sources.hudi_lite import HudiLiteTable


def _ts(y, mo, d, h=0, mi=0, s=0, us=0):
    return dt.datetime(y, mo, d, h, mi, s, us)


def test_mor_log_pre1970_and_subms_timestamps(spark, tmp_path):
    """timestamp-micros through the log block must be integer-exact
    for pre-epoch (negative micros) and sub-millisecond values —
    the r15 gotcha (float .timestamp() drops sub-ms) now exercised
    through the task-side applyInArrow encode."""
    t = HudiLiteTable(spark, str(tmp_path / "t"), key_field="k")
    rows = [
        (1, _ts(1932, 3, 7, 11, 59, 59, 123456)),   # pre-1970
        (2, _ts(1969, 12, 31, 23, 59, 59, 999999)),  # -1 us
        (3, _ts(1970, 1, 1, 0, 0, 0, 1)),            # +1 us
        (4, _ts(2038, 1, 19, 3, 14, 8, 500000)),     # past int32 s
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp")
    t.bulk_insert(df, groups=2, table_type="MERGE_ON_READ")
    # shift every row by +1 hour through a LOG BLOCK
    upd = df.select(
        "k", F.expr("ts + INTERVAL 1 HOUR").alias("ts")
    )
    t.upsert(upd)
    assert any(s["logs"] for s in t.plan_slices())
    got = {r.k: r.ts for r in t.snapshot().collect()}
    want = {k: ts + dt.timedelta(hours=1) for k, ts in rows}
    assert got == want
    # micros survive compaction exactly too
    t.compact()
    assert {r.k: r.ts for r in t.snapshot().collect()} == want


def test_mor_log_nulls_in_every_union_branch(spark, tmp_path):
    """NULL long/double/string/boolean/timestamp payloads through the
    Avro unions, encoded task-side, must read back as NULLs (arrow
    to_pylist keeps None distinct from NaN — the reason the writer
    uses applyInArrow, not a pandas hop)."""
    t = HudiLiteTable(spark, str(tmp_path / "t"), key_field="k")
    schema = (
        "k bigint, l bigint, d double, s string, b boolean, "
        "ts timestamp"
    )
    base = spark.createDataFrame(
        [(1, 10, 1.5, "x", True, _ts(2020, 1, 1)),
         (2, 20, 2.5, "y", False, _ts(2020, 1, 2))],
        schema,
    )
    t.bulk_insert(base, groups=1, table_type="MERGE_ON_READ")
    upd = spark.createDataFrame(
        [(1, None, None, None, None, None)], schema
    )
    t.upsert(upd)
    got = {r.k: r for r in t.snapshot().collect()}
    r1 = got[1]
    assert (r1.l, r1.d, r1.s, r1.b, r1.ts) == (None,) * 5
    r2 = got[2]
    assert (r2.l, r2.d, r2.s, r2.b) == (20, 2.5, "y", False)


def test_upsert_all_matched_and_all_fresh_batches(spark, tmp_path):
    """Degenerate assignment splits: a batch where EVERY key matches
    (no fresh file group) and one where NONE does (no log block /
    rewrite of existing groups)."""
    for tt in ("COPY_ON_WRITE", "MERGE_ON_READ"):
        t = HudiLiteTable(
            spark, str(tmp_path / tt), key_field="k"
        )
        base = spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "k bigint, p double"
        )
        t.bulk_insert(base, groups=2, table_type=tt)
        n_files_before = len(t.plan_slices())
        # all matched
        t.upsert(spark.createDataFrame(
            [(i, float(i) + 100) for i in range(10)],
            "k bigint, p double",
        ))
        assert len(t.plan_slices()) == n_files_before
        # all fresh
        t.upsert(spark.createDataFrame(
            [(100, 0.5), (101, 1.5)], "k bigint, p double"
        ))
        got = {r.k: r.p for r in t.snapshot().collect()}
        assert len(got) == 12 and got[3] == 103.0 and got[100] == 0.5


def test_bulk_insert_more_groups_than_rows(spark, tmp_path):
    """groups > rows: empty hash buckets write NO file (the r16
    writer's documented behavior) and the table still serves."""
    t = HudiLiteTable(spark, str(tmp_path / "t"), key_field="k")
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, p double"
    )
    t.bulk_insert(df, groups=8)
    assert 1 <= len(t.plan_slices()) <= 2
    assert sorted(r.k for r in t.snapshot().collect()) == [1, 2]


def test_mor_delete_no_hits_and_compact_no_logs(spark, tmp_path):
    """A delete whose keys miss every group writes no log file; a
    compaction with nothing to fold commits empty stats and changes
    no visible row."""
    t = HudiLiteTable(spark, str(tmp_path / "t"), key_field="k")
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, p double"
    )
    t.bulk_insert(df, groups=1, table_type="MERGE_ON_READ")
    t.delete(spark.createDataFrame([(99,)], "k bigint"))
    assert all(not s["logs"] for s in t.plan_slices())
    i = t.compact()
    assert i in t.timeline()
    assert sorted(r.k for r in t.snapshot().collect()) == [1, 2]


def test_null_partition_value_refused_honestly(spark, tmp_path):
    """The pre-r16 writer silently DROPPED null-partition rows; the
    distributed writer refuses instead — both at bulk insert and at
    upsert of fresh null-partition keys."""
    t = HudiLiteTable(spark, str(tmp_path / "t"), key_field="k")
    bad = spark.createDataFrame(
        [(1, None, 1.0), (2, "A", 2.0)],
        "k bigint, part string, p double",
    )
    with pytest.raises(NotImplementedError, match="null partition"):
        t.bulk_insert(bad, groups=1, partition_field="part")
    t2 = HudiLiteTable(spark, str(tmp_path / "t2"), key_field="k")
    t2.bulk_insert(
        bad.filter("part IS NOT NULL"), groups=1,
        partition_field="part",
    )
    with pytest.raises(NotImplementedError, match="null partition"):
        t2.upsert(spark.createDataFrame(
            [(9, None, 9.0)], "k bigint, part string, p double"
        ))


def test_iceberg_pos_delete_empty_predicate(spark, tmp_path):
    """A positional delete matching zero rows must not commit a
    snapshot (the r16 distributed writer counts victims from the
    written footer and backs out)."""
    from thrive_spark.sources.iceberg_lite import IcebergLiteTable

    t = IcebergLiteTable(spark, str(tmp_path / "ice"))
    t.create(spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, p double"
    ))
    md0 = t.metadata()
    sid, n = t.delete_rows_positional("p > 1e9")
    assert n == 0 and sid == md0["current-snapshot-id"]
    assert len(t.metadata()["snapshots"]) == len(md0["snapshots"])
    # and a real delete still lands after the no-op
    sid2, n2 = t.delete_rows_positional("k = 1")
    assert n2 == 1 and sid2 != sid
    assert [r.k for r in t.snapshot().collect()] == [2]


def test_iceberg_dv_redelete_is_noop(spark, tmp_path):
    """Re-running the same DV predicate marks zero NEW rows (the
    one-scan victim collection must still subtract existing DV
    positions)."""
    from thrive_spark.sources.iceberg_lite import IcebergLiteTable

    t = IcebergLiteTable(spark, str(tmp_path / "ice"))
    t.create(spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k bigint, p double"
    ))
    sid1, n1 = t.delete_rows_vector("k % 2 = 0")
    assert n1 == 5
    sid2, n2 = t.delete_rows_vector("k % 2 = 0")
    assert n2 == 0 and sid2 == sid1
    assert sorted(r.k for r in t.snapshot().collect()) == [1, 3, 5, 7, 9]


def test_delta_remove_all_rows(spark, tmp_path):
    """File-grain remove where the predicate hits EVERY row: the
    commit carries removes only (no empty add), and the snapshot is
    empty but readable."""
    from thrive_spark.sources.delta_lite import DeltaLiteTable

    t = DeltaLiteTable(spark, str(tmp_path / "d"))
    t.create(spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, p double"
    ))
    v = t.remove_where_file_contains("p > 0")
    st = t.state(v)
    # survivors may include EMPTY part files the create job emitted
    # (they contain no matching row, so file-grain COW carries them);
    # the commit must add no non-empty rewrite and the snapshot is
    # empty but readable
    import os

    import pyarrow.parquet as pq

    assert all(
        pq.ParquetFile(
            os.path.join(t.root, a["path"])
        ).metadata.num_rows == 0
        for a in st["adds"]
    )
    assert t.snapshot(v).count() == 0


def test_iceberg_delete_writers_job_count_independent_of_files(
    spark, tmp_path
):
    """r16 gate (r15 verdict #3): the position-delete and DV writers
    must cost a BOUNDED number of Spark jobs no matter how many data
    files the table has — the old path ran one job per data file."""
    import uuid as _uuid

    from thrive_spark.sources.iceberg_lite import IcebergLiteTable

    def jobs(fn):
        sc = spark.sparkContext
        tag = f"jc-{_uuid.uuid4().hex[:8]}"
        sc.setJobGroup(tag, "gate")
        try:
            fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    counts = {}
    for nfiles in (2, 8):
        t = IcebergLiteTable(spark, str(tmp_path / f"ice{nfiles}"))
        df = spark.range(400).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS p"
        ).repartition(nfiles)
        t.create(df)
        assert len(t._plan()[0]) == nfiles
        counts[(nfiles, "pos")] = jobs(
            lambda: t.delete_rows_positional("k % 7 = 0")
        )
        counts[(nfiles, "dv")] = jobs(
            lambda: t.delete_rows_vector("k % 5 = 0")
        )
        assert t.snapshot().count() == 400 - len(
            {k for k in range(400) if k % 7 == 0 or k % 5 == 0}
        )
    assert counts[(8, "pos")] == counts[(2, "pos")], counts
    assert counts[(8, "dv")] == counts[(2, "dv")], counts
