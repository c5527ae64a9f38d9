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


def test_mor_refusal_and_unknown_instant(spark, tmp_path):
    t, i1 = _mk(spark, tmp_path)
    props = t._props_path()
    body = open(props).read().replace("COPY_ON_WRITE", "MERGE_ON_READ")
    with open(props, "w") as fh:
        fh.write(body)
    with pytest.raises(NotImplementedError, match="COPY_ON_WRITE"):
        t.snapshot()
    body = body.replace("MERGE_ON_READ", "COPY_ON_WRITE")
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
