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
