"""Tables DataFrame-cache behavior: per-session keying.

The hazard being regression-tested: a cache keyed by ``id(session)``
in a process-global dict can serve DataFrames bound to a stopped
session when CPython recycles the id for a new session object. The
cache now lives as an attribute on the session object itself, so (a)
sessions never share entries, (b) each session is served DataFrames
bound to it, and (c) the cache is collected with the session.
"""

from __future__ import annotations


from thrive_spark.tables import _CACHE_ATTR, Tables


def test_cache_is_per_session(spark, sf_dir):
    t1 = Tables(spark, sf_dir)
    df1 = t1.lineitem
    assert t1.lineitem is df1  # cached within a session

    s2 = spark.newSession()
    t2 = Tables(s2, sf_dir)
    df2 = t2.lineitem
    assert df2 is not df1  # a different session never shares plans
    assert df2.sparkSession is s2
    assert t2.lineitem is df2
    # and the second session's cache never leaked into the first
    assert getattr(spark, _CACHE_ATTR) is not getattr(s2, _CACHE_ATTR)


def test_no_process_global_cache(spark, sf_dir):
    """The module must hold no global DataFrame cache: the cache hangs
    off the session object, so nothing in thrive_spark pins a stopped
    session or can serve its plans to a successor (PySpark internals
    may still reference sessions; that's outside our control)."""
    from thrive_spark import tables as tables_mod

    Tables(spark, sf_dir).lineitem
    globals_with_df = [
        n
        for n, v in vars(tables_mod).items()
        if isinstance(v, dict) and v and not n.startswith("__")
    ]
    assert globals_with_df == [], globals_with_df


def test_fresh_session_object_gets_fresh_dataframes(spark, sf_dir):
    """Churn sessions: even if a new session object lands on a recycled
    ``id()``, it must get DataFrames bound to itself."""
    for _ in range(3):
        s = spark.newSession()
        df = Tables(s, sf_dir).lineitem
        assert df.sparkSession is s


def test_ntz_columns_normalized_to_session_tz_timestamp(spark, sf_dir):
    """Testdata regression (round 3): the driver regenerated the parquet
    with timestamp[us] isAdjustedToUTC=false, which Spark 4 reads as
    TIMESTAMP_NTZ by default — breaking unix_micros()/session_window()/
    watermarks.  Every table loaded through Tables must expose plain
    TIMESTAMP columns regardless of which conf regime read the file."""
    import pyspark.sql.functions as F

    from thrive_spark.tables import _normalize_ntz

    t = Tables(spark, sf_dir)
    for name in ("events", "orders", "lineitem"):
        for col, typ in t.load(name).dtypes:
            assert typ != "timestamp_ntz", f"{name}.{col} leaked NTZ"
    # events.ts must accept TIMESTAMP-only functions
    t.events.select(F.unix_micros("ts")).limit(1).collect()

    # the backstop itself: an explicitly-NTZ plan comes out TIMESTAMP,
    # with micros equal to the naive value read as UTC
    ntz = spark.range(1).select(
        F.to_timestamp_ntz(F.lit("2024-06-01 12:34:56.789")).alias("ts"),
        F.col("id"),
    )
    fixed = _normalize_ntz(ntz)
    assert dict(fixed.dtypes)["ts"] == "timestamp"
    [row] = fixed.select(F.unix_micros("ts").alias("us")).collect()
    import datetime as dt

    want = dt.datetime(2024, 6, 1, 12, 34, 56, 789000, tzinfo=dt.timezone.utc)
    assert row.us == int(want.timestamp() * 1_000_000)


def test_zorder_layout_skips(spark, sf_dir, tmp_path):
    """The z-ordered layout must make BOTH dimension columns selective
    in per-file min/max stats: the summed per-file span of each dim
    should be well under n_files × full-range (what a random layout
    gives), which is what drives row-group skipping at 100 TB."""
    import pyarrow.parquet as pq

    from thrive_spark.sources.maintenance import zorder_layout
    from thrive_spark.tables import Tables

    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
    out = str(tmp_path / "zordered")
    zorder_layout(li, "l_partkey", "l_suppkey", n_ranges=8).write.parquet(out)

    import glob as g

    spans_x, spans_y, files = [], [], sorted(g.glob(out + "/*.parquet"))
    assert len(files) >= 4
    for f in files:
        md = pq.read_metadata(f)
        xmin = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        xmax = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        ymin = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        ymax = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        spans_x.append(xmax - xmin)
        spans_y.append(ymax - ymin)
    full_x = max(r.l_partkey for r in li.select("l_partkey").collect()) or 1
    full_y = 10
    # random layout: every file spans ~the full range → sum ≈ n*full.
    # z-order: files cover compact z-tiles → strictly narrower on both.
    assert sum(spans_x) < 0.8 * len(files) * full_x
    assert sum(spans_y) < 0.8 * len(files) * full_y


def test_corrupt_file_fails_without_option(spark, sf_dir, tmp_path):
    """The other side of scan_ignore_corrupt_files' trade: without
    ignoreCorruptFiles the read must FAIL FAST, not silently skip."""
    import pytest
    from pyspark.sql import functions as F

    from thrive_spark.tables import Tables

    out = str(tmp_path / "d")
    Tables(spark, sf_dir).orders.limit(10).coalesce(1).write.parquet(out)
    (tmp_path / "d" / "part-corrupt.parquet").write_bytes(b"PAR1junk")
    with pytest.raises(Exception, match="(?i)parquet|corrupt|footer"):
        spark.read.option("ignoreCorruptFiles", "false").parquet(
            out
        ).count()


def test_avro_probe_or_boundary(spark, tmp_path):
    """Avro probe-or-boundary (r11 verdict item 7): spark-avro is an
    EXTERNAL module and the sandbox ships no jar for it — the probe
    documents the boundary as a test. If the env ever gains the jar,
    the probe flips to asserting a full write/read round trip, so the
    boundary self-heals exactly like the protobuf gate."""
    import pytest
    from pyspark.errors import AnalysisException

    path = str(tmp_path / "avro")
    try:
        spark.range(5).select("id").write.format("avro").save(path)
    except AnalysisException as e:
        # the documented boundary: the built-in-but-external module
        # is absent, and Spark names it explicitly
        assert "avro" in str(e).lower(), e
        pytest.skip("spark-avro jar absent (documented boundary)")
    back = spark.read.format("avro").load(path)
    assert sorted(r.id for r in back.collect()) == [0, 1, 2, 3, 4]
