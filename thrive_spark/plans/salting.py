"""Skew-salting rewrite: two-stage aggregation over a salted key.

A hot key (one event_type = half the table) funnels its whole group
through one reducer. Salting splits each key into ``n_salts``
sub-groups — stage 1 aggregates (key, salt) partials in parallel,
stage 2 merges the ``n_salts`` partials per key. For algebraic
aggregates (sum/count/min/max) the result is identical; the cost is
one extra (tiny) shuffle of key×salt partial rows.

The salt must be deterministic (repeatable runs, resumable stages), so
it hashes a unique column instead of using a random number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    unique_col: str,
    aggs: dict[str, Column],
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name → stage-1 aggregate Column; stage 2
    merges with the matching combiner (sum for sums/counts, min/max
    for extrema) inferred from the expression name prefix.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts))
    )
    stage1 = salted.groupBy(key, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, c in aggs.items()]
    )

    def combiner(name: str) -> Column:
        p = F.col(f"_p_{name}")
        if name.startswith("min"):
            return F.min(p)
        if name.startswith("max"):
            return F.max(p)
        return F.sum(p)  # sums and counts both merge by summation

    return stage1.groupBy(key).agg(
        *[combiner(name).alias(name) for name in aggs]
    )
