"""Local mirror of the driver's t2 correctness gate (SURVEY §5.2.2).

For every registered query with oracle SQL: run the Spark DataFrame
and the DuckDB SQL on the same parquet dir, canonicalize (sort columns
by name, normalize cell values, sort rows), and require exact
equality — the driver's order-insensitive value-hash can only pass if
this does.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from thrive_spark.registry import ORACLE, QUERIES


def _norm_cell(v):
    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        if f == 0.0:
            f = 0.0  # fold -0.0
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, str):
        return v
    if v != v:  # residual NaN-like
        return "NULL"
    return repr(v)


def canon(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


HASH_CHECKED = sorted(ORACLE)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLE))


@pytest.mark.parametrize("qid", HASH_CHECKED)
def test_oracle_match(qid, qdf, ddb):
    spark_pdf = qdf(qid).toPandas()
    duck_pdf = ddb.execute(ORACLE[qid]).df()
    s_cols, s_rows = canon(spark_pdf)
    d_cols, d_rows = canon(duck_pdf)
    assert s_cols == d_cols, f"{qid}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{qid}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{qid}: {len(mismatches)} row mismatches; first: {mismatches[0]}"


@pytest.mark.parametrize("qid", ROWS_ONLY)
def test_rows_only_runs(qid, qdf):
    df = qdf(qid)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_no_complex_output_columns(qid, qdf):
    """Driver-canonicalizer output-type gate. Two FAIL classes seen in
    official grades that the local simulator does NOT reproduce:

    - list-typed cells (round-1 agg_collect_sorted FAIL): no
      array/map/struct output columns — serialize to delimited strings.
    - narrow integer / DATE outputs (r13 agg_percentile_sketch_portable
      hash-fail: int32 q_pct): no IntegerType/ShortType/ByteType/DateType
      output columns — cast to BIGINT / string on BOTH sides.

    No whitelist: every registered query's output schema must pass."""
    from pyspark.sql import types as T

    df = qdf(qid)
    banned = (
        T.ArrayType,
        T.MapType,
        T.StructType,
        T.IntegerType,
        T.ShortType,
        T.ByteType,
        T.DateType,
    )
    bad_cols = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, banned)
    ]
    assert not bad_cols, f"{qid} emits banned-typed output columns: {bad_cols}"
