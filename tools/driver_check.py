"""Simulate the driver's verify pass against __spark_entry__.py.

Mirrors the driver contract end-to-end: builds a VANILLA SparkSession
(none of thrive_spark's configs — the driver owns its session), calls
``entry(spark)``, then runs every ``queries()`` entry at sf0.01 and
compares row-count + sorted-column value sets against ``oracle_sql()``
via DuckDB. Usage:  python tools/driver_check.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional arg 2: comma-separated id prefixes — run only matching queries
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f + 0.0)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, (pd.Timestamp, dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, str):
        return v
    return repr(v)


def canon(pdf):
    cols = sorted(pdf.columns)
    return cols, sorted(
        tuple(norm(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


def main() -> int:
    # vanilla session: the driver does NOT apply our configs
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("== entry() smoke ==")
    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
    assert len(rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(qs):
        if ONLY and not any(name.startswith(p) for p in ONLY):
            continue
        t0 = time.time()
        try:
            spdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        took = time.time() - t0
        if name not in oracles:
            n_rows_only += 1
            print(f"rows  {name}: {len(spdf)} rows ({took:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {e}")
            n_fail += 1
            continue
        sc, sr = canon(spdf)
        dc, dr = canon(dpdf)
        if sc != dc:
            print(f"FAIL  {name}: cols {sc} vs {dc}")
            n_fail += 1
        elif sr != dr:
            bad = next((a, b) for a, b in zip(sr, dr) if a != b) if len(sr) == len(dr) else (len(sr), len(dr))
            print(f"FAIL  {name}: values differ; first: {bad}")
            n_fail += 1
        else:
            n_pass += 1
            print(f"ok    {name}: {len(sr)} rows ({took:.1f}s)")
    print(f"\n== {n_pass} hash-ok, {n_rows_only} rows-only, {n_fail} FAILED ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
