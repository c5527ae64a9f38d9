"""Vector math over array<float> embedding columns.

All pure built-in higher-order functions (zip_with / aggregate /
transform) — JVM-side, no Python, no UDF. These are the kernels for
the §2.11 similarity operators and are reused by the LSH scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(arr: Column) -> Column:
    """array<float> → array<double> (float32 arithmetic drifts from
    DuckDB's double path; always widen before math — SURVEY §2)."""
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays.

    ``try_divide``: a zero-norm vector (corrupt/blank embedding — the
    r10 stress corpus plants some) must yield NULL, not kill a 100 TB
    job with an ANSI DIVIDE_BY_ZERO. Operators that hash-check against
    an oracle still exclude zero-norm rows explicitly (DuckDB's
    list_cosine_similarity returns -1.0 there, so NULL-vs--1.0 would
    diverge): filter with ``sq_norm(...) > 0`` / NONZERO_EMB_SQL."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def sq_norm(a: Column) -> Column:
    """Σx² — the zero-vector guard predicate (`sq_norm(c) > 0`)."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


#: oracle-side twin of `sq_norm(embedding) > 0` for the embeddings table
NONZERO_EMB_SQL = (
    "list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) > 0"
)
