"""Jar-free Iceberg reader (sources/iceberg_lite.py) + the pure-Python
Avro codec under it (sources/avro_lite.py) — mirrors
tests/test_delta_lite.py's strategy: construct genuine spec trees,
read them back through real scan planning, pin the spec behaviors
(by-reference manifest carry, status fold, metadata-resident pruning,
honest guards on out-of-scope features)."""

from __future__ import annotations

import json
import os
import struct

import pytest

from thrive_spark.sources.avro_lite import (
    _Reader,
    _zigzag,
    read_container,
    write_container,
)
from thrive_spark.sources.iceberg_lite import IcebergLiteTable


# ---------- avro_lite ----------

def test_zigzag_known_vectors():
    """Spec-pinned zigzag varints (Avro spec 'Binary Encoding'):
    0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01."""
    vectors = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
               2: b"\x04", -64: b"\x7f", 64: b"\x80\x01",
               2**40: b"\x80\x80\x80\x80\x80\x40"}
    for n, b in vectors.items():
        assert _zigzag(n) == b, n
        assert _Reader(b).long() == n


def test_container_roundtrip_all_types(tmp_path):
    schema = {
        "type": "record", "name": "t", "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "u", "type": ["null", "long"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "fx", "type": {"type": "fixed", "name": "f4",
                                    "size": 4}},
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["X", "Y"]}},
        ],
    }
    rows = [
        {"b": True, "l": -(2**62), "d": 3.5, "s": "héllo", "by": b"\x00\xff",
         "u": None, "arr": ["a", ""], "m": {"k1": 1, "k2": -2},
         "fx": b"abcd", "e": "Y"},
        {"b": False, "l": 0, "d": -0.0, "s": "", "by": b"",
         "u": 7, "arr": [], "m": {}, "fx": b"\x00\x00\x00\x00", "e": "X"},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_container(p, schema, rows, codec=codec)
        got, sch, meta = read_container(p)
        assert got == rows
        assert sch == schema
        assert meta["avro.codec"] == codec.encode()


def test_container_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.avro")
    with open(p, "wb") as f:
        f.write(b"PAR1 not avro")
    with pytest.raises(ValueError, match="not an Avro"):
        read_container(p)


def test_named_type_reference_resolves(tmp_path):
    """A schema that refers to an earlier named record BY NAME (the
    shape Iceberg uses for repeated struct types)."""
    schema = {
        "type": "record", "name": "outer", "fields": [
            {"name": "a", "type": {"type": "record", "name": "pt",
                                   "fields": [{"name": "x",
                                               "type": "long"}]}},
            {"name": "b", "type": "pt"},
        ],
    }
    rows = [{"a": {"x": 1}, "b": {"x": 2}}]
    p = str(tmp_path / "n.avro")
    write_container(p, schema, rows)
    got, _, _ = read_container(p)
    assert got == rows


# ---------- iceberg_lite ----------

def _mk(spark, tmp_path, name="t"):
    return IcebergLiteTable(spark, str(tmp_path / name))


def test_snapshot_fold_and_time_travel(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.create(spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k bigint, p double"))
    sid2 = tbl.append(spark.createDataFrame([(3, 30.0)],
                                            "k bigint, p double"))
    sid3 = tbl.delete_where_file_contains("k = 1")
    assert (sid2, sid3) == (2, 3)
    assert sorted(r.k for r in tbl.snapshot(1).collect()) == [1, 2]
    assert sorted(r.k for r in tbl.snapshot(2).collect()) == [1, 2, 3]
    assert sorted(r.k for r in tbl.snapshot(3).collect()) == [2, 3]
    assert sorted(r.k for r in tbl.snapshot().collect()) == [2, 3]


def test_append_carries_manifests_by_reference(spark, tmp_path):
    """Spec behavior that keeps planning O(new files): the new
    snapshot's manifest list must point at the PRIOR manifest file,
    not rewrite its entries."""
    from thrive_spark.sources.avro_lite import read_container as rc

    tbl = _mk(spark, tmp_path)
    tbl.create(spark.createDataFrame([(1, 1.0)], "k bigint, p double"))
    tbl.append(spark.createDataFrame([(2, 2.0)], "k bigint, p double"))
    md = tbl.metadata()
    paths = {}
    for s in md["snapshots"]:
        rows, _, _ = rc(os.path.join(tbl.root, s["manifest-list"]))
        paths[s["snapshot-id"]] = {r["manifest_path"] for r in rows}
    assert paths[1] <= paths[2]
    assert len(paths[2]) == len(paths[1]) + 1


def test_partition_prune_in_metadata(spark, tmp_path):
    """Zero non-matching files planned, and the pruning decisions are
    visible in plan_files' stats: whole manifests skipped via field
    summaries, remaining files skipped via partition tuples."""
    tbl = _mk(spark, tmp_path)
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(40)],
        "k bigint, bucket bigint, v double",
    )
    tbl.create(df.filter("bucket < 2"), partition_columns=["bucket"])
    tbl.append(df.filter("bucket >= 2"))
    files, stats = tbl.plan_files(partition_filter={"bucket": 2})
    assert files and all(f["partition"]["bucket"] == 2 for f in files)
    assert stats["manifests_pruned"] >= 1  # the bucket<2 manifest
    got = tbl.snapshot(partition_filter={"bucket": 2})
    assert sorted(r.k for r in got.collect()) == [
        i for i in range(40) if i % 4 == 2
    ]
    # partition values come from METADATA, not the data files
    assert set(r.bucket for r in got.collect()) == {2}


def test_string_partition_values(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    df = spark.createDataFrame(
        [(1, "us", 1.0), (2, "eu", 2.0), (3, "us", 3.0)],
        "k bigint, region string, v double",
    )
    tbl.create(df, partition_columns=["region"])
    got = tbl.snapshot(partition_filter={"region": "us"})
    assert sorted(r.k for r in got.collect()) == [1, 3]


def test_field_summaries_are_spec_serialized(spark, tmp_path):
    """Manifest-list lower/upper bounds use Iceberg single-value
    serialization: 8-byte little-endian for long."""
    from thrive_spark.sources.avro_lite import read_container as rc

    tbl = _mk(spark, tmp_path)
    df = spark.createDataFrame(
        [(i, i % 3, 0.0) for i in range(9)],
        "k bigint, bucket bigint, v double",
    )
    tbl.create(df, partition_columns=["bucket"])
    md = tbl.metadata()
    ml = md["snapshots"][-1]["manifest-list"]
    rows, _, _ = rc(os.path.join(tbl.root, ml))
    summ = rows[0]["partitions"][0]
    assert struct.unpack("<q", summ["lower_bound"])[0] == 0
    assert struct.unpack("<q", summ["upper_bound"])[0] == 2
    assert summ["contains_null"] is False


def test_v2_and_nonidentity_guards(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.create(spark.createDataFrame([(1, 1.0)], "k bigint, p double"))
    mpath = tbl._current_metadata_path()
    with open(mpath) as f:
        md = json.load(f)
    # v2 in scope since r14 (position deletes), v3 since r15
    # (deletion vectors); an unknown FUTURE version must refuse
    md["format-version"] = 4
    with open(mpath, "w") as f:
        json.dump(md, f)
    with pytest.raises(NotImplementedError, match="format-version"):
        tbl.snapshot()
    # bucket/truncate/temporal transforms are in scope since r14;
    # an UNKNOWN transform (here: the spec's `void`) must still
    # refuse rather than mis-prune
    md["format-version"] = 1
    md["partition-specs"][0]["fields"] = [
        {"name": "k_void", "transform": "void",
         "source-id": 1, "field-id": 1000}
    ]
    with open(mpath, "w") as f:
        json.dump(md, f)
    with pytest.raises(NotImplementedError, match="transform"):
        tbl.snapshot()


def test_metadata_json_is_spec_shaped(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.create(spark.createDataFrame([(1, 1.0)], "k bigint, p double"))
    with open(tbl._current_metadata_path()) as f:
        md = json.load(f)
    for key in ("format-version", "table-uuid", "location", "schema",
                "partition-specs", "default-spec-id",
                "current-snapshot-id", "snapshots", "last-column-id"):
        assert key in md, key
    snap = md["snapshots"][0]
    for key in ("snapshot-id", "timestamp-ms", "manifest-list", "summary"):
        assert key in snap, key
    # schema fields carry ids (the spec's column-identity mechanism)
    assert all("id" in f for f in md["schema"]["fields"])


def test_column_stats_written_and_spec_serialized(spark, tmp_path):
    """Manifests carry per-file lower/upper bounds as field-id-keyed
    byte maps; doubles use Appendix D 8-byte LE IEEE."""
    tbl = _mk(spark, tmp_path)
    df = spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(100)], "k bigint, p double"
    )
    tbl.create(df.repartitionByRange(2, "p").sortWithinPartitions("p"))
    files, _ = tbl.plan_files()
    assert len(files) == 2
    by_id = {f["id"]: f for f in tbl.metadata()["schema"]["fields"]}
    ranges = []
    for f in files:
        lo = {e["key"]: e["value"] for e in f["lower_bounds"]}
        hi = {e["key"]: e["value"] for e in f["upper_bounds"]}
        kid = next(i for i, fl in by_id.items() if fl["name"] == "p")
        ranges.append((
            struct.unpack("<d", lo[kid])[0],
            struct.unpack("<d", hi[kid])[0],
        ))
    ranges.sort()
    assert ranges[0][0] == 0.0 and ranges[-1][1] == 99 * 1.5
    assert ranges[0][1] < ranges[1][0]  # range clustering -> disjoint


def test_stats_prune_superset_and_missing_stats_safe(spark, tmp_path):
    """Files whose bounds exclude the band are skipped; files WITHOUT
    stats are never skipped (missing metadata widens the scan)."""
    tbl = _mk(spark, tmp_path)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k bigint, p double"
    )
    tbl.create(df.repartitionByRange(4, "p").sortWithinPartitions("p"))
    files, stats = tbl.plan_files(stats_filter={"p": (10.0, 20.0)})
    assert stats["files_pruned_by_stats"] >= 2
    got = (
        tbl.snapshot(stats_filter={"p": (10.0, 20.0)})
        .filter("p BETWEEN 10 AND 20")
    )
    assert sorted(r.k for r in got.collect()) == list(range(10, 21))
    # strip the bounds (an old-schema manifest) -> nothing prunes
    for f in files:
        f.pop("lower_bounds", None)
        f.pop("upper_bounds", None)
    cols = {f["name"]: f for f in tbl.metadata()["schema"]["fields"]}
    assert not any(
        IcebergLiteTable._stats_excludes(f, {"p": (1e9, 2e9)}, cols)
        for f in files
    )
    # open-ended bands
    _, s2 = tbl.plan_files(stats_filter={"p": (90.0, None)})
    assert s2["files_pruned_by_stats"] >= 2
    _, s3 = tbl.plan_files(stats_filter={"p": (None, 5.0)})
    assert s3["files_pruned_by_stats"] >= 2


def test_expire_snapshots_gc_and_shared_files_survive(spark, tmp_path):
    """Expiration drops old snapshots and garbage-collects ONLY what
    no survivor reaches: the create-commit's data files are shared by
    every later snapshot (by-reference manifests) so they must ride
    through, while files that existed only in a dropped COW-delete
    victim set are physically removed."""
    tbl = _mk(spark, tmp_path)
    tbl.create(spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k bigint, p double"
    ).coalesce(1))
    tbl.append(spark.createDataFrame([(10, 10.0)], "k bigint, p double"))
    # COW delete rewrites the appended file; its ORIGINAL becomes
    # reachable only from snapshots 1-2
    tbl.delete_where_file_contains("k = 10")
    f2, _ = tbl.plan_files(2)
    f3, _ = tbl.plan_files(3)
    only_old = {f["file_path"] for f in f2} - {f["file_path"] for f in f3}
    assert only_old  # the pre-delete appended file
    stats = tbl.expire_snapshots(keep_last=1)
    assert stats["snapshots"] == 2 and stats["data_files"] >= 1
    # survivors intact, current snapshot reads identically
    assert sorted(r.k for r in tbl.snapshot().collect()) == list(range(10))
    for p in only_old:
        assert not os.path.exists(os.path.join(tbl.root, p))
    # expired snapshots are gone with a clean error
    with pytest.raises(ValueError, match="not found"):
        tbl.snapshot(1)
    # the log keeps growing past expiration with non-colliding
    # metadata versions
    sid = tbl.append(spark.createDataFrame([(42, 42.0)],
                                           "k bigint, p double"))
    assert sid == 4
    assert sorted(r.k for r in tbl.snapshot().collect()) == [
        *range(10), 42
    ]
    with pytest.raises(ValueError):
        tbl.expire_snapshots(keep_last=0)


# ---------- streaming source ----------

def test_iceberg_stream_resume_append_only_and_gap(spark, tmp_path):
    """The Iceberg stream source: resume from checkpoint drains only
    new snapshots; a file-removing snapshot refuses without
    ignorechanges; an EXPIRED committed offset refuses by default and
    resumes (with documented skip) under allowoffsetgaps."""
    from thrive_spark.streaming.iceberg_source import register

    root = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    tbl = IcebergLiteTable(spark, root)
    tbl.create(spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k bigint, p double").coalesce(1))
    register(spark)

    def drain(**opts):
        r = spark.readStream.format("thrive_iceberg").option("path", root)
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
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [1, 2]
    tbl.append(spark.createDataFrame([(3, 30.0)], "k bigint, p double"))
    drain()  # resume: only the new snapshot's rows arrive
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [
        1, 2, 3
    ]
    # COW delete removes a file -> append-only refusal
    tbl.delete_where_file_contains("k = 1")
    try:
        drain()
        raise AssertionError("file-removing snapshot must refuse")
    except Exception as e:  # noqa: BLE001 — engine wraps the error
        assert "append-only" in str(e)
    # ignorechanges: the COW rewrite's new file streams (k=2 re-added)
    drain(ignorechanges="true")
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 2, 3], got
    # expire everything below the newest snapshot; the committed
    # offset (the delete snapshot) survives here, so stream continues
    tbl.append(spark.createDataFrame([(4, 40.0)], "k bigint, p double"))
    tbl.expire_snapshots(keep_last=1)
    # committed offset is the delete snapshot (id 3): now expired
    try:
        drain(ignorechanges="true")
        raise AssertionError("expired committed offset must refuse")
    except Exception as e:  # noqa: BLE001
        assert "allowoffsetgaps" in str(e)
    # opt-in: skip semantics — the oldest retained snapshot counts as
    # consumed, so the gap row (k=4) is knowingly SKIPPED and nothing
    # re-emits; later appends stream normally
    drain(ignorechanges="true", allowoffsetgaps="true")
    assert sorted(
        r.k for r in spark.read.parquet(out).collect()
    ) == [1, 2, 2, 3]
    tbl.append(spark.createDataFrame([(5, 50.0)], "k bigint, p double"))
    drain(ignorechanges="true", allowoffsetgaps="true")
    assert sorted(
        r.k for r in spark.read.parquet(out).collect()
    ) == [1, 2, 2, 3, 5]


def test_avro_roundtrip_property():
    """Hypothesis round-trip over generated rows for a fixed composite
    schema: every value the codec claims to support must survive
    encode→decode bit-for-bit across both codecs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = {
        "type": "record", "name": "row", "fields": [
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "u", "type": ["null", "long"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
        ],
    }
    finite = st.floats(allow_nan=False, width=64)
    row = st.fixed_dictionaries({
        "l": st.integers(-(2**63), 2**63 - 1),
        "d": finite,
        "s": st.text(max_size=40),
        "u": st.one_of(st.none(), st.integers(-(2**40), 2**40)),
        "arr": st.lists(st.integers(-(2**31), 2**31), max_size=8),
        "m": st.dictionaries(st.text(max_size=8),
                             st.text(max_size=8), max_size=4),
    })

    @settings(max_examples=40, deadline=None)
    @given(st.lists(row, max_size=12), st.sampled_from(["null", "deflate"]))
    def check(rows, codec):
        import tempfile

        from thrive_spark.sources.avro_lite import (
            read_container,
            write_container,
        )

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t.avro")
            write_container(p, schema, rows, codec=codec)
            got, _, _ = read_container(p)
            assert got == rows

    check()


# ---------- v2 position deletes ----------

def test_positional_delete_no_rewrite_and_accumulate(spark, tmp_path):
    """delete_rows_positional marks rows via a position delete file and
    a content=1 delete manifest — zero data-file rewrite, repeated
    deletes accumulate, already-deleted rows never re-mark, and time
    travel sees each snapshot's delete state."""
    tbl = _mk(spark, tmp_path)
    tbl.create(spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k bigint, p double"
    ).coalesce(2))
    files1 = {f["file_path"] for f in tbl.plan_files(1)[0]}
    v2, n2 = tbl.delete_rows_positional("k >= 15")
    v3, n3 = tbl.delete_rows_positional("k % 2 = 1")
    assert (v2, v3) == (2, 3)
    assert n2 == 5 and n3 == 7  # odd k in 0..14 only (live rows)
    assert tbl.metadata()["format-version"] == 2
    for sid in (2, 3):
        fs, ds, stats = tbl._plan(sid)
        assert {f["file_path"] for f in fs} == files1  # no rewrite
        assert len(ds) == sid - 1
        assert stats["delete_files"] == sid - 1
    assert sorted(r.k for r in tbl.snapshot(1).collect()) == list(range(20))
    assert sorted(r.k for r in tbl.snapshot(2).collect()) == list(range(15))
    assert sorted(r.k for r in tbl.snapshot(3).collect()) == [
        k for k in range(15) if k % 2 == 0
    ]
    # deleting already-deleted rows is a no-op
    assert tbl.delete_rows_positional("k >= 15") == (3, 0)


def test_positional_delete_with_partitions_and_guards(spark, tmp_path):
    """Deletes compose with identity partitions; equality-delete
    entries and the stream source refuse rather than mis-read."""
    from thrive_spark.streaming.iceberg_source import register

    tbl = _mk(spark, tmp_path)
    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(10)],
        "k bigint, bucket bigint, v double",
    )
    tbl.create(df, partition_columns=["bucket"])
    sid, n = tbl.delete_rows_positional("k in (2, 7)")
    assert n == 2
    got = sorted(r.k for r in tbl.snapshot().collect())
    assert got == [k for k in range(10) if k not in (2, 7)]
    pruned = tbl.snapshot(partition_filter={"bucket": 1})
    assert sorted(r.k for r in pruned.collect()) == [1, 3, 5, 9]
    # stream refuses a delete-bearing table
    register(spark)
    q = (
        spark.readStream.format("thrive_iceberg")
        .option("path", tbl.root)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        raise AssertionError("stream over deletes must refuse")
    except Exception as e:  # noqa: BLE001 — engine wraps the error
        assert "position delete" in str(e)
    finally:
        q.stop()
    # UNKNOWN delete-file content values refuse at plan time
    # (equality deletes, content=2, are supported since r14 —
    # covered in the equality-delete tests below)
    from thrive_spark.sources.avro_lite import read_container as rc
    from thrive_spark.sources.avro_lite import write_container as wc

    md = tbl.metadata()
    cur = next(s for s in md["snapshots"]
               if s["snapshot-id"] == md["current-snapshot-id"])
    rows, sch, _ = rc(os.path.join(tbl.root, cur["manifest-list"]))
    dm = next(r for r in rows if r.get("content") == 1)
    entries, esch, _ = rc(os.path.join(tbl.root, dm["manifest_path"]))
    entries[0]["data_file"]["content"] = 3  # not a spec content kind
    wc(os.path.join(tbl.root, dm["manifest_path"]), esch, entries)
    with pytest.raises(NotImplementedError, match="unknown delete"):
        tbl.snapshot()


def test_purge_deletes_rewrites_touched_files_only(spark, tmp_path):
    """purge_deletes rewrites only the data files position deletes
    touch, carries the rest by reference, retires the delete files,
    and the current snapshot reads identically."""
    import glob

    tbl = _mk(spark, tmp_path)
    # two data files; deletes will touch only one of them
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k bigint, p double"
    )
    tbl.create(df.repartitionByRange(2, "k").sortWithinPartitions("k"))
    files1 = {f["file_path"] for f in tbl.plan_files(1)[0]}
    assert len(files1) == 2
    _, n = tbl.delete_rows_positional("k in (1, 3)")  # low file only
    assert n == 2
    sid, rewritten = tbl.purge_deletes()
    assert rewritten == 1
    fs, ds, _ = tbl._plan(sid)
    assert not ds  # delete manifests gone from the new snapshot
    assert not glob.glob(os.path.join(tbl.root, "data", "delete-*"))
    kept = {f["file_path"] for f in fs}
    assert len(kept & files1) == 1  # untouched file carried by ref
    assert sorted(r.k for r in tbl.snapshot().collect()) == [
        k for k in range(20) if k not in (1, 3)
    ]
    # idempotent
    assert tbl.purge_deletes() == (sid, 0)


def test_schema_evolution_add_column_null_backfill(spark, tmp_path):
    """add_column assigns a fresh field id without touching data
    files; pre-evolution files read the new column as NULL, post-
    evolution appends carry real values, and stats/pruning still work
    on the new column for files that have it."""
    tbl = _mk(spark, tmp_path)
    tbl.create(spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, p double"))
    old_files = {f["file_path"] for f in tbl.plan_files(1)[0]}
    sch_id = tbl.add_column("score", "double")
    md = tbl.metadata()
    assert md["current-schema-id"] == sch_id
    assert md["last-column-id"] == 3
    assert len(md["schemas"]) == 2
    # ids never reuse: the new field's id is fresh
    assert [f["id"] for f in md["schema"]["fields"]] == [1, 2, 3]
    tbl.append(spark.createDataFrame(
        [(3, 3.0, 0.9)], "k bigint, p double, score double"))
    got = {(r.k, r.score) for r in tbl.snapshot().collect()}
    assert got == {(1, None), (2, None), (3, 0.9)}
    # old data files untouched
    now_files = {f["file_path"] for f in tbl.plan_files()[0]}
    assert old_files <= now_files
    with pytest.raises(ValueError, match="already exists"):
        tbl.add_column("score", "double")
    # stats prune on the evolved column: only the new file has bounds,
    # old files (no stats for the column) are never excluded
    files, stats = tbl.plan_files(stats_filter={"score": (0.0, 1.0)})
    assert {f["file_path"] for f in files} == now_files
    _, s2 = tbl.plan_files(stats_filter={"score": (5.0, 9.0)})
    assert s2["files_pruned_by_stats"] == 1  # the new file's bounds miss


# ---------- partition transforms (hidden partitioning, r14) ----------


def test_murmur3_spec_vectors():
    """The Iceberg spec's published Appendix-B hash vectors — bucket
    correctness is exactly murmur3_x86_32 of the single-value binary
    form, so these pin the whole transform."""
    from thrive_spark.sources.iceberg_lite import _murmur3_x86_32

    assert _murmur3_x86_32(struct.pack("<q", 34)) == 2017239379
    assert _murmur3_x86_32(b"iceberg") == 1210000089
    # date 2017-11-16 == day ordinal 17486; ts 2017-11-16T22:31:08
    # == 1510871468000000 micros (both hash as the long form)
    assert _murmur3_x86_32(struct.pack("<q", 17486)) == -653330422
    assert _murmur3_x86_32(struct.pack("<q", 1510871468000000)) \
        == -2047944441


def test_transform_py_spark_parity(spark):
    """The writer computes partition values with Spark columns, the
    reader prunes with driver-side Python — the two halves must agree
    on every value or pruning silently drops files."""
    import datetime

    from thrive_spark.sources.iceberg_lite import (
        _apply_transform_py,
        _transform_spark_col,
    )

    rows = [
        (i * 977 - 3000,
         f"key-{i:03d}",
         datetime.datetime(2023, 1 + (i % 12), 1 + (i % 27), i % 24, 30))
        for i in range(40)
    ] + [
        # pre-1970: hour/day/month/year must FLOOR (negative ordinals),
        # not truncate toward zero — the r15 advice fix
        (-7, "neg", datetime.datetime(1969, 12, 31, 22, 30)),
        (-1, "neg2", datetime.datetime(1968, 3, 5, 1, 15)),
    ]
    df = spark.createDataFrame(rows, "k bigint, s string, ts timestamp")
    cases = [
        ("k", "bucket[16]", "long"),
        ("k", "truncate[1000]", "long"),
        ("s", "bucket[8]", "string"),
        ("s", "truncate[5]", "string"),
        ("ts", "day", "timestamp"),
        ("ts", "month", "timestamp"),
        ("ts", "year", "timestamp"),
        ("ts", "hour", "timestamp"),
    ]
    got = df.select(
        "k", "s", "ts",
        *[
            _transform_spark_col(c, tf, t).alias(f"t{i}")
            for i, (c, tf, t) in enumerate(cases)
        ],
    ).collect()
    for r in got:
        vals = {"k": r["k"], "s": r["s"], "ts": r["ts"]}
        for i, (c, tf, t) in enumerate(cases):
            assert r[f"t{i}"] == _apply_transform_py(vals[c], tf, t), (
                c, tf, vals[c],
            )


def test_hidden_partition_bucket_prunes_and_reads(spark, tmp_path):
    from thrive_spark.sources.iceberg_lite import _apply_transform_py

    df = spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(200)], "k bigint, p double"
    )
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(df, partition_spec=[("k", "bucket[8]")])
    # the raw-value predicate prunes through the transform
    files, stats = tbl.plan_files(partition_filter={"k": 42})
    want = _apply_transform_py(42, "bucket[8]", "long")
    assert files and all(
        f["partition"]["k_bucket"] == want for f in files
    )
    assert stats["files_pruned"] >= 1, stats
    # source column stays IN the data (hidden partitioning), so the
    # filtered read returns exactly the probe rows
    got = (
        tbl.snapshot(partition_filter={"k": 42})
        .filter("k = 42").collect()
    )
    assert [(r["k"], r["p"]) for r in got] == [(42, 63.0)]
    # full read loses nothing across buckets
    assert tbl.snapshot().count() == 200


def test_hidden_partition_day_and_append(spark, tmp_path):
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i % 5), i % 24, 0), float(i))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v double")
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(df, partition_spec=[("ts", "day")])
    probe = datetime.datetime(2024, 1, 3, 12, 0)
    files, stats = tbl.plan_files(partition_filter={"ts": probe})
    assert stats["files_pruned"] >= 1, stats
    got = tbl.snapshot(partition_filter={"ts": probe}).filter(
        "to_date(ts) = '2024-01-03'"
    )
    exp = [r for r in rows if r[1].date() == datetime.date(2024, 1, 3)]
    assert got.count() == len(exp)
    # schema stays the logical schema — no ts_day column
    assert got.columns == ["k", "ts", "v"]
    # appends flow through the same transformed writer path
    tbl.append(spark.createDataFrame(
        [(900, datetime.datetime(2024, 1, 3, 1, 0), 9.0)],
        "k bigint, ts timestamp, v double",
    ))
    got2 = tbl.snapshot(partition_filter={"ts": probe}).filter(
        "to_date(ts) = '2024-01-03'"
    )
    assert got2.count() == len(exp) + 1


def test_mixed_identity_and_transform_spec(spark, tmp_path):
    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(60)],
        "region bigint, k bigint, p double",
    )
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(
        df,
        partition_spec=[("region", "identity"), ("k", "truncate[20]")],
    )
    files, stats = tbl.plan_files(
        partition_filter={"region": 1, "k": 25}
    )
    assert files and all(
        f["partition"]["region"] == 1
        and f["partition"]["k_trunc"] == 20
        for f in files
    )
    assert stats["files_pruned"] >= 1
    # identity value re-materializes from metadata; truncate source
    # stays in data — both columns come back intact
    got = tbl.snapshot().filter("region = 1 AND k = 25").collect()
    assert [(r["region"], r["k"], r["p"]) for r in got] == [(1, 25, 25.0)]
    assert tbl.snapshot().count() == 60


def test_transform_null_values_partition_and_survive(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "k bigint, s string"
    )
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(df, partition_spec=[("s", "bucket[4]")])
    # spec: null -> null partition; the row must survive a full read
    assert tbl.snapshot().count() == 3
    vals = {
        f["partition"]["s_bucket"] for f in tbl.plan_files()[0]
    }
    assert None in vals


# ---------- equality deletes (format v2, r14) ----------


def test_equality_delete_sequence_visibility(spark, tmp_path):
    """The spec's strictly-less-than rule: an equality delete at data
    sequence s drops matching rows only from files with seq < s, so a
    delete-then-reinsert leaves the reinserted rows alive."""
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(50)],
        "k bigint, ck bigint, p double",
    ))
    tbl.delete_rows_equality(["ck"], [(2,)])
    assert sorted(r.k for r in tbl.snapshot().collect()) == [
        i for i in range(50) if i % 5 != 2
    ]
    # reinsert ck=2 rows AFTER the delete — they must survive
    tbl.append(spark.createDataFrame(
        [(100, 2, 1.0), (101, 2, 2.0)], "k bigint, ck bigint, p double"
    ))
    got = sorted(r.k for r in tbl.snapshot().collect())
    assert 100 in got and 101 in got
    # time travel: the delete-era snapshot still hides ck=2
    assert all(r.ck != 2 for r in tbl.snapshot(2).collect())
    assert tbl.metadata()["format-version"] == 2


def test_equality_delete_no_rewrite_and_accumulate(spark, tmp_path):
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame(
        [(i, float(i)) for i in range(30)], "k bigint, p double"
    ))
    files1 = {f["file_path"] for f in tbl.plan_files(1)[0]}
    tbl.delete_rows_equality(["k"], [(1,), (2,)])
    tbl.delete_rows_equality(["k"], [(3,)])
    fs, ds, _ = tbl._plan()
    assert {f["file_path"] for f in fs} == files1, (
        "equality deletes must not rewrite data files"
    )
    assert sum(1 for d in ds if d.get("content") == 2) == 2
    assert sorted(r.k for r in tbl.snapshot().collect()) == [
        i for i in range(30) if i not in (1, 2, 3)
    ]


def test_equality_delete_null_safe_multicolumn(spark, tmp_path):
    """Spec: matching is IS NOT DISTINCT FROM — a null value in the
    delete tuple matches null cells, and only full-tuple matches
    drop."""
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None)],
        "k bigint, s string",
    ))
    tbl.delete_rows_equality(["k", "s"], [(1, "a"), (2, None)])
    assert sorted(r.k for r in tbl.snapshot().collect()) == [3, 4]


def test_purge_deletes_applies_equality_then_drops_them(spark, tmp_path):
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k bigint, p double"
    ))
    tbl.delete_rows_equality(["k"], [(5,), (6,)])
    before = sorted(r.k for r in tbl.snapshot().collect())
    sid, rewritten = tbl.purge_deletes()
    assert rewritten >= 1
    fs, ds, _ = tbl._plan()
    assert not ds, "purge must retire every delete file"
    assert sorted(r.k for r in tbl.snapshot().collect()) == before


def test_equality_delete_guards(spark, tmp_path):
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(
        spark.createDataFrame(
            [(1, 1, 1.0)], "k bigint, region bigint, p double"
        ),
        partition_columns=["region"],
    )
    with pytest.raises(ValueError, match="unknown equality"):
        tbl.delete_rows_equality(["nope"], [(1,)])
    # identity partition columns live in metadata, not data files —
    # the read path attaches their literals BEFORE applying deletes,
    # so an equality delete keyed on one works (r14 fourth pass)
    tbl.append(spark.createDataFrame(
        [(2, 2, 2.0)], "k bigint, region bigint, p double"
    ))
    tbl.delete_rows_equality(["region"], [(1,)])
    assert sorted(
        (r.k, r.region) for r in tbl.snapshot().collect()
    ) == [(2, 2)]


# ---------- partition spec evolution (r14) ----------


def test_spec_evolution_metadata_only_and_mixed_prune(spark, tmp_path):
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i % 6), i % 24, 0), float(i))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v double")
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(df.filter("k < 30"), partition_spec=[("ts", "day")])
    gen1 = {f["file_path"] for f in tbl.plan_files()[0]}
    sp2 = tbl.evolve_spec([("ts", "month")])
    tbl.append(df.filter("k >= 30"))
    # metadata-only: no gen-1 file moved, both specs retained
    files = tbl.plan_files()[0]
    assert gen1 <= {f["file_path"] for f in files}
    assert {f["_spec_id"] for f in files} == {0, sp2}
    assert tbl.metadata()["default-spec-id"] == sp2
    # one hidden scan prunes each generation through ITS spec
    probe = datetime.datetime(2024, 1, 3, 12, 0)
    fd, stats = tbl.plan_files(partition_filter={"ts": probe})
    from thrive_spark.sources.iceberg_lite import _apply_transform_py

    for f in fd:
        if f["_spec_id"] == 0:
            assert f["partition"]["ts_day"] == _apply_transform_py(
                probe, "day", "timestamp"
            )
        else:
            assert f["partition"]["ts_month"] == _apply_transform_py(
                probe, "month", "timestamp"
            )
    assert stats["files_pruned"] >= 1
    got = tbl.snapshot(partition_filter={"ts": probe}).filter(
        "to_date(ts) = '2024-01-03'"
    )
    exp = [r for r in rows if r[1].date() == datetime.date(2024, 1, 3)]
    assert got.count() == len(exp)
    assert tbl.snapshot().count() == 60


def test_spec_evolution_identity_to_transform_read(spark, tmp_path):
    """Old files dropped their identity partition column to metadata;
    new files (bucket spec) keep every column — the union must
    re-materialize the old generation and come back whole."""
    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(30)],
        "region bigint, k bigint, p double",
    )
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(df.filter("k < 15"), partition_columns=["region"])
    tbl.evolve_spec([("k", "bucket[4]")])
    tbl.append(df.filter("k >= 15"))
    got = sorted(
        (r["region"], r["k"]) for r in tbl.snapshot().collect()
    )
    assert got == sorted((i % 3, i) for i in range(30))


def test_spec_evolution_field_id_reuse_and_guards(spark, tmp_path):
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(
        spark.createDataFrame(
            [(1, 1, 1.0)], "region bigint, k bigint, p double"
        ),
        partition_columns=["region"],
    )
    sp2 = tbl.evolve_spec([("k", "bucket[4]")])
    sp3 = tbl.evolve_spec([("region", "identity"), ("k", "bucket[4]")])
    md = tbl.metadata()
    spec = {s["spec-id"]: s for s in md["partition-specs"]}
    # same (source, transform) keeps its field id across specs
    fid2 = next(
        f["field-id"] for f in spec[sp2]["fields"]
        if f["transform"] == "bucket[4]"
    )
    fid3 = next(
        f["field-id"] for f in spec[sp3]["fields"]
        if f["transform"] == "bucket[4]"
    )
    assert fid2 == fid3
    assert next(
        f["field-id"] for f in spec[sp3]["fields"]
        if f["transform"] == "identity"
    ) == 1000
    with pytest.raises(ValueError, match="unknown partition source"):
        tbl.evolve_spec([("zzz", "identity")])


def test_metadata_tables_partitions_and_snapshots(spark, tmp_path):
    """partitions/snapshots metadata tables answer from the manifest
    tree alone, and the counts are exact through create+append."""
    import datetime

    rows = [
        (i, datetime.datetime(2024, 2, 1 + (i % 3), 0, 0), float(i))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v double")
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(df.filter("k < 18"), partition_spec=[("ts", "day")])
    tbl.append(df.filter("k >= 18"))
    pt = {
        r["ts_day"]: r["record_count"]
        for r in tbl.partitions_table().collect()
    }
    import collections

    exp = collections.Counter(
        (r[1].date() - datetime.date(1970, 1, 1)).days for r in rows
    )
    assert pt == dict(exp)
    st = tbl.snapshots_table().collect()
    assert [(r["snapshot_id"], r["sequence_number"]) for r in st] == [
        (1, 1), (2, 2),
    ]
    assert st[0]["operation"] == "append"


# ---------- refs: branches, tags, WAP (r14) ----------


def test_wap_branch_stage_publish_and_tag_pin(spark, tmp_path):
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k bigint, p double"
    ))
    tbl.create_tag("v1")
    tbl.create_branch("audit")
    sid2 = tbl.append(
        spark.createDataFrame(
            [(100 + i, 1.0) for i in range(5)], "k bigint, p double"
        ),
        branch="audit",
    )
    # staging moves only the branch head
    assert tbl.ref("main") == 1 and tbl.ref("audit") == sid2
    assert tbl.snapshot(tbl.ref("main")).count() == 20
    assert tbl.snapshot(tbl.ref("audit")).count() == 25
    files = {f["file_path"] for f in tbl.plan_files(sid2)[0]}
    assert tbl.publish("audit") == sid2
    # publish is metadata-only
    assert {f["file_path"] for f in tbl.plan_files()[0]} == files
    assert tbl.snapshot().count() == 25
    # the tag survives expiration and still reads the old state
    tbl.expire_snapshots(keep_last=1)
    assert tbl.snapshot(tbl.ref("v1")).count() == 20


def test_ref_guards_and_divergence(spark, tmp_path):
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, 1.0)], "k bigint, p double")
    tbl.create(df)
    tbl.create_tag("v1")
    with pytest.raises(ValueError, match="already exists"):
        tbl.create_tag("v1")
    with pytest.raises(ValueError, match="tag"):
        tbl.append(df, branch="v1")
    with pytest.raises(ValueError, match="unknown ref"):
        tbl.ref("nope")
    # a branch that does not descend from main cannot fast-forward
    tbl.append(spark.createDataFrame([(2, 2.0)], "k bigint, p double"))
    tbl.create_branch("b2", snapshot_id=1)
    tbl.append(
        spark.createDataFrame([(9, 9.0)], "k bigint, p double"),
        branch="b2",
    )
    with pytest.raises(ValueError, match="ancestor"):
        tbl.publish("b2")
    tbl.drop_ref("b2")
    with pytest.raises(ValueError, match="unknown ref"):
        tbl.ref("b2")


def test_rewrite_data_files_binpacks_and_guards(spark, tmp_path):
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(40)],
        "k bigint, grp bigint, p double",
    )
    tbl.create(df.filter("k < 20").repartition(4),
               partition_columns=["grp"])
    tbl.append(df.filter("k >= 20").repartition(3))
    before = tbl.plan_files()[0]
    sid, n = tbl.rewrite_data_files()
    assert n >= 2
    after = tbl.plan_files()[0]
    assert len(after) < len(before)
    per_pv: dict = {}
    for f in after:
        per_pv[f["partition"]["grp"]] = per_pv.get(
            f["partition"]["grp"], 0
        ) + 1
    assert all(c == 1 for c in per_pv.values())
    assert sorted(r.k for r in tbl.snapshot().collect()) == list(range(40))
    # time travel to the pre-compaction snapshot still works (olds
    # stay on disk until expire_snapshots GC)
    assert tbl.snapshot(2).count() == 40
    # idempotent
    assert tbl.rewrite_data_files() == (sid, 0)
    # pending row-level deletes refuse
    tbl.delete_rows_equality(["k"], [(1,)])
    with pytest.raises(ValueError, match="purge_deletes"):
        tbl.rewrite_data_files()


def test_implicit_branch_first_commit_publishes(spark, tmp_path):
    """A branch born by its first commit (no create_branch) forks
    from the current snapshot — publish's ancestor walk must still
    reach main."""
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame([(1, 1.0)], "k bigint, p double"))
    sid = tbl.append(
        spark.createDataFrame([(2, 2.0)], "k bigint, p double"),
        branch="stage",
    )
    assert tbl.ref("main") == 1 and tbl.ref("stage") == sid
    assert tbl.publish("stage") == sid
    assert sorted(r.k for r in tbl.snapshot().collect()) == [1, 2]


# ---------------- r15: format-v3 deletion vectors ----------------


def test_puffin_roundtrip_and_dv_blob():
    import pytest as _pytest

    from thrive_spark.sources.puffin_lite import (
        dv_blob_decode,
        dv_blob_segment,
        read_puffin_blob,
        read_puffin_footer,
        write_puffin,
    )

    import tempfile, os as _os

    d = tempfile.mkdtemp(prefix="puffin_")
    path = _os.path.join(d, "t.puffin")
    seg1 = dv_blob_segment([0, 5, 7, 2**33 + 1])
    seg2 = dv_blob_segment(range(10000))  # bitmap container path
    entries = write_puffin(path, [
        {"type": "deletion-vector-v1", "data": seg1,
         "properties": {"referenced-data-file": "a.parquet",
                        "cardinality": "4"}},
        {"type": "deletion-vector-v1", "data": seg2,
         "properties": {"referenced-data-file": "b.parquet",
                        "cardinality": "10000"}},
    ])
    foot = read_puffin_footer(path)
    assert [b["type"] for b in foot["blobs"]] == [
        "deletion-vector-v1"] * 2
    for e, want in zip(foot["blobs"], ([0, 5, 7, 2**33 + 1],
                                       list(range(10000)))):
        seg = read_puffin_blob(path, e["offset"], e["length"])
        assert dv_blob_decode(seg) == want
    # checksum failure is loud
    bad = bytearray(seg1)
    bad[10] ^= 0xFF
    with _pytest.raises(ValueError, match="checksum"):
        dv_blob_decode(bytes(bad))


def test_v3_dv_absorbs_pos_deletes_and_merges(spark, tmp_path):
    """The two v3 invariants: a DV absorbs the file's older parquet
    position-delete rows, and a second DV merges into one vector
    (newest by sequence number wins)."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(30)], "k bigint, p double"
    )
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(df.repartitionByRange(2, "k").sortWithinPartitions("k"))
    s2, n2 = tbl.delete_rows_positional("k < 4")
    assert n2 == 4
    s3, n3 = tbl.delete_rows_vector("k >= 26")
    assert n3 == 4
    got = sorted(r.k for r in tbl.snapshot().collect())
    assert got == list(range(4, 26))  # absorb: k<4 stays deleted
    s4, n4 = tbl.delete_rows_vector("k % 10 = 5")
    assert n4 == 3  # 5, 15, 25 all still live
    got = sorted(r.k for r in tbl.snapshot().collect())
    assert got == [k for k in range(4, 26) if k % 10 != 5]
    # re-deleting is a no-op
    s5, n5 = tbl.delete_rows_vector("k % 10 = 5")
    assert n5 == 0
    # time travel through every state
    assert sorted(r.k for r in tbl.snapshot(s2).collect()) == list(
        range(4, 30)
    )
    assert sorted(r.k for r in tbl.snapshot(s3).collect()) == list(
        range(4, 26)
    )
    assert tbl.metadata()["format-version"] == 3


# ------------- r15: maintenance after partition evolution -------------


def _mk_evolved(spark, tmp_path):
    """region-identity table → evolve to bucket(k) → append under the
    new spec: files now live under TWO specs."""
    tbl = IcebergLiteTable(spark, str(tmp_path / "ev"))
    df = spark.createDataFrame(
        [(i % 3, i, float(i) * 10) for i in range(24)],
        "region bigint, k bigint, p double",
    )
    tbl.create(df.filter("k < 12"), partition_columns=["region"])
    tbl.evolve_spec([("k", "bucket[4]")])
    tbl.append(df.filter("k >= 12"))
    return tbl, df


def test_cow_delete_after_spec_evolution(spark, tmp_path):
    """delete_where_file_contains works across specs: the predicate
    sees the old spec's identity column (re-materialized from its
    manifests), survivors rewrite into the CURRENT spec, and carried
    entries keep their own spec id."""
    tbl, df = _mk_evolved(spark, tmp_path)
    tbl.delete_where_file_contains("region = 1 AND k < 12")
    got = sorted(r.k for r in tbl.snapshot().collect())
    assert got == [k for k in range(24) if not (k % 3 == 1 and k < 12)]
    # the rewrite landed under the default (bucket) spec
    md = tbl.metadata()
    files, _, _ = tbl._plan()
    sps = {f.get("_spec_id", md["default-spec-id"]) for f in files}
    assert md["default-spec-id"] in sps


def test_compaction_migrates_old_spec_files(spark, tmp_path):
    """rewrite_data_files after evolution: old-spec groups always
    qualify and migrate into the default spec; the table's visible
    rows are untouched."""
    tbl, df = _mk_evolved(spark, tmp_path)
    before = sorted((r.region, r.k, r.p)
                    for r in tbl.snapshot().collect())
    sid, n = tbl.rewrite_data_files(min_files_per_group=2)
    assert n >= 1
    after = sorted((r.region, r.k, r.p)
                   for r in tbl.snapshot().collect())
    assert after == before
    # every live file now sits under ONE spec: the default
    md = tbl.metadata()
    files, _, _ = tbl._plan()
    assert {
        f.get("_spec_id", md["default-spec-id"]) for f in files
    } == {md["default-spec-id"]}
    # partitions_table reflects the unified layout (no all-NULL rows)
    pt = tbl.partitions_table().collect()
    assert all(r["spec_id"] == md["default-spec-id"] for r in pt)


def test_purge_deletes_after_spec_evolution(spark, tmp_path):
    """Position deletes over a two-spec table purge correctly: the
    touched old-spec file rewrites into the default spec with its
    identity literal preserved as a data column."""
    tbl, df = _mk_evolved(spark, tmp_path)
    sid, n = tbl.delete_rows_positional("k IN (2, 14)")
    assert n == 2
    sid2, rewritten = tbl.purge_deletes()
    assert rewritten >= 1
    got = sorted((r.region, r.k) for r in tbl.snapshot().collect())
    assert got == sorted(
        (k % 3, k) for k in range(24) if k not in (2, 14)
    )
    # no delete files remain; snapshot is pure parquet scans
    _, deletes, _ = tbl._plan()
    assert deletes == []


def test_expire_snapshots_keeps_referenced_puffin(spark, tmp_path):
    """Snapshot expiration must treat puffin DV files as reachable
    delete files: referenced ones survive, orphaned ones collect."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k bigint, p double"
    )
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(df)
    tbl.delete_rows_vector("k < 3")
    import glob as _glob
    import os as _os

    puffins = _glob.glob(_os.path.join(tbl.root, "data", "*.puffin"))
    assert len(puffins) == 1
    tbl.expire_snapshots(keep_last=1)
    # the current snapshot still references the DV: file survives
    assert _os.path.exists(puffins[0])
    assert sorted(r.k for r in tbl.snapshot().collect()) == list(
        range(3, 20)
    )
    # a second DV commit supersedes; expiring history may then orphan
    # nothing (the old puffin is still referenced by the live
    # manifest carrying its entry) — the snapshot stays correct
    tbl.delete_rows_vector("k = 10")
    tbl.expire_snapshots(keep_last=1)
    assert sorted(r.k for r in tbl.snapshot().collect()) == [
        k for k in range(3, 20) if k != 10
    ]


def test_append_checkpointed_gates_per_sink(spark, tmp_path):
    df1 = spark.createDataFrame([(1, 1.0)], "k bigint, p double")
    df2 = spark.createDataFrame([(2, 2.0)], "k bigint, p double")
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(df1.limit(0))
    tbl.append_checkpointed(df1, "s1", 0)
    sid = tbl.metadata()["current-snapshot-id"]
    # replay and stale ids are no-ops
    assert tbl.append_checkpointed(df1, "s1", 0) == sid
    assert tbl.append_checkpointed(df1, "s1", -5) == sid
    assert tbl.snapshot().count() == 1
    # newer id lands; other sink-ids are independent
    tbl.append_checkpointed(df2, "s1", 1)
    assert tbl.snapshot().count() == 2
    tbl.append_checkpointed(df2, "s2", 0)
    assert tbl.snapshot().count() == 3
    assert tbl.max_committed_checkpoint("s1") == 1
    assert tbl.max_committed_checkpoint("s2") == 0
    assert tbl.max_committed_checkpoint("nope") == -1


def test_rollback_to_snapshot(spark, tmp_path):
    tbl = IcebergLiteTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, p double"
    ))
    s1 = tbl.metadata()["current-snapshot-id"]
    tbl.append(spark.createDataFrame([(3, 3.0)], "k bigint, p double"))
    assert tbl.snapshot().count() == 3
    tbl.rollback_to(s1)
    assert sorted(r.k for r in tbl.snapshot().collect()) == [1, 2]
    # the rolled-back commit stays in the snapshot list (auditable)
    assert len(tbl.metadata()["snapshots"]) == 2
    # roll forward again
    s2 = max(s["snapshot-id"] for s in tbl.metadata()["snapshots"])
    tbl.rollback_to(s2)
    assert tbl.snapshot().count() == 3
    with pytest.raises(ValueError, match="not in table metadata"):
        tbl.rollback_to(999)
