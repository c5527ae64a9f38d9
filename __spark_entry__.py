"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``thrive_spark``: the registry collects every operator
implemented from SURVEY.md §2 (each module registers its queries and
DuckDB oracle SQL at import time).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from thrive_spark import registry
from thrive_spark.session import prepare

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: 5-way star join + hash aggregate
    (TPC-H Q5 shape) — exercises broadcast dims, a fact shuffle join,
    and exact-decimal aggregation in one plan."""
    prepare(spark)
    return registry.QUERIES["join_star_multiway"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checked query;
    stateful/approx/engine-seeded ops are omitted → rows-only check."""
    return dict(registry.ORACLE)
