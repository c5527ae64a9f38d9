"""Plan inspection helpers: assert the physical strategy, not just the
result. A correct answer from a CartesianProduct is still a bug at
100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    plan = physical_plan(df)
    for n in needles:
        assert n in plan, f"expected {n!r} in plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str) -> str:
    plan = physical_plan(df)
    for n in needles:
        assert n not in plan, f"did NOT expect {n!r} in plan:\n{plan}"
    return plan
