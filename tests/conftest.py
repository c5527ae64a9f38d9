"""Shared fixtures: one SparkSession + one DuckDB connection per run.

``THRIVE_TEST_SF`` picks the scale dir (default sf0.001 for speed; CI
or pre-driver runs can point at sf0.01 to mirror the driver exactly).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from thrive_spark.registry import load_all
from thrive_spark.session import get_spark
from thrive_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("THRIVE_TEST_SF", "/root/testdata/sf0.001")

load_all()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("thrive-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def qdf(spark, sf_dir):
    """Session-memoized ``QUERIES[qid](spark, sf_dir)`` (r17, VERDICT
    item 1: the driver's pytest window overran). The suite-wide sweeps
    (oracle match, output-schema gate, plan antipattern sweep) each
    need the SAME frame per query id, and exhibit queries pay their
    full construction (lakehouse tables, streams — up to ~35 s each)
    at BUILD time — rebuilding per sweep tripled the suite's heaviest
    cost. DataFrames are immutable; every assertion is unchanged, it
    just runs against one shared build."""
    from thrive_spark.registry import QUERIES

    cache: dict[str, object] = {}

    def get(qid: str):
        if qid not in cache:
            cache[qid] = QUERIES[qid](spark, sf_dir)
        return cache[qid]

    return get


N_CHUNKS = 6


@pytest.fixture(scope="session")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """Events split chronologically into N parquet files (mtime
    ascending = arrival order for the streaming file source)."""
    import os
    import time

    from pyspark.sql import functions as F

    from thrive_spark.tables import Tables

    root = tmp_path_factory.mktemp("events_stream")
    ev = Tables(spark, sf_dir).events
    n = ev.count()
    # monotonically_increasing_id over a sorted single partition is rank
    ranked = ev.orderBy("ts", "event_id").coalesce(1).withColumn(
        "rn", F.monotonically_increasing_id()
    )
    for i in range(N_CHUNKS):
        lo, hi = i * n // N_CHUNKS, (i + 1) * n // N_CHUNKS
        chunk = ranked.filter((F.col("rn") >= lo) & (F.col("rn") < hi)).drop("rn")
        cdir = str(root / f"c{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(cdir)
        part = next(p for p in os.listdir(cdir) if p.endswith(".parquet"))
        dst = str(root / f"chunk_{i}.parquet")
        os.rename(f"{cdir}/{part}", dst)
        ts = time.time() + i  # strictly increasing mtimes
        os.utime(dst, (ts, ts))
    return str(root), ev.schema
