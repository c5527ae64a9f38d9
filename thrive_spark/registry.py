"""Query/oracle registry backing ``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers itself with the
:func:`query` decorator, pairing the PySpark implementation with the
equivalent DuckDB-runnable ANSI SQL (the driver's correctness oracle).
Operators whose semantics are not SQL-expressible (stateful, approx,
Spark-seeded hashes) register with ``oracle=None`` → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(qid: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as ``queries()[qid]`` (+ its oracle SQL if given)."""

    def deco(fn: QueryFn) -> QueryFn:
        if qid in QUERIES:
            raise ValueError(f"duplicate query id: {qid}")
        QUERIES[qid] = fn
        if oracle is not None:
            ORACLE[qid] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .operators import (  # noqa: F401
        aggregations,
        analytics,
        ann,
        bucketed,
        cdc,
        clustering,
        curation,
        dedup_extra,
        graph,
        ivf,
        ivfpq,
        lm_score,
        matching,
        joins,
        llm,
        mllib_lsh,
        multimodal,
        pq,
        predicates,
        setops,
        sorts,
        sql_surface,
        streaming_twins,
        text_analysis,
        timeseries,
        tokenizer,
        tpch,
        udfs,
        vectors,
        windows,
    )
    from .sources import (  # noqa: F401
        acid,
        delta_lite,
        formats,
        hudi_lite,
        iceberg_lite,
        maintenance,
        pipeline,
        pyds,
        scans,
        sinks,
    )
    from .functions import banks  # noqa: F401
    from .streaming import (  # noqa: F401
        broker,
        delta_source,
        hudi_source,
        iceberg_source,
        sinks as stream_sinks,
        table_source,
    )
