"""Shared helpers for oracle-parity arithmetic.

The driver compares Spark results to DuckDB with an *exact* value hash,
so any aggregate whose floating-point summation order is
engine-dependent must be made deterministic. The recipe (SURVEY.md §2
notes, extended): sum money-scale doubles through ``DECIMAL(38,10)``
(exact addition; the double→decimal conversion itself is deterministic
for both engines), cast back to double, round to 4 decimals. Small
magnitude aggregates (averages of bounded values, stddev, corr) stay
plain doubles — their association error is orders of magnitude below
the rounding grid.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, nd: int = 4) -> Column:
    """Order-insensitive exact sum of doubles → rounded double."""
    return F.round(F.sum(_c(col).cast(DEC)).cast("double"), nd)


def r4(col: Column | str, nd: int = 4) -> Column:
    return F.round(_c(col), nd)


def osum(expr: str, nd: int = 4) -> str:
    """DuckDB SQL twin of :func:`dsum`."""
    return f"round(CAST(sum(CAST(({expr}) AS DECIMAL(38,10))) AS DOUBLE), {nd})"


def oround(expr: str, nd: int = 4) -> str:
    """DuckDB round with the float→double cast (SURVEY §2: DuckDB round
    on FLOAT leaves float32 artifacts)."""
    return f"round(CAST(({expr}) AS DOUBLE), {nd})"
