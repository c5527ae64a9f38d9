"""Band-join bucketing rewrite (SURVEY.md §4.3.1).

A band join ``|a.v - b.v| < w`` is a theta join; Spark plans it as
BroadcastNestedLoop / CartesianProduct — O(n²) work that cannot scale.
The rewrite: bucket both sides by ``floor(v / w)``; a qualifying pair
is always within one bucket of each other, so explode ONE side to
buckets {k-1, k, k+1} and equi-join on the bucket id. This runs as a
plain shuffle (or broadcast) hash join with a residual band filter —
linear shuffle volume, AQE-skew-splittable, works at any scale. Each
qualifying pair matches exactly once (the non-exploded side has a
single bucket), so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_value: str,
    right_value: str,
    width: float,
) -> DataFrame:
    """Pairs (a from left, b from right) with |a.value - b.value| < width.

    Returns columns ``a_key, a_val, b_key, b_val``.
    """
    bucket = lambda c: F.floor(F.col(c) / F.lit(width))  # noqa: E731
    l = left.select(
        F.col(left_key).alias("a_key"),
        F.col(left_value).cast("double").alias("a_val"),
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                bucket("a_val") - 1,
                bucket("a_val"),
                bucket("a_val") + 1,
            )
        ),
    )
    r = right.select(
        F.col(right_key).alias("b_key"),
        F.col(right_value).cast("double").alias("b_val"),
    ).withColumn("_bucket", bucket("b_val"))
    return (
        l.join(r, "_bucket")
        .filter(F.abs(F.col("a_val") - F.col("b_val")) < width)
        .drop("_bucket")
    )


def band_self_join(df: DataFrame, key: str, value: str, width: float) -> DataFrame:
    """Self band join with the canonical ``a_key < b_key`` dedup."""
    return band_join(df, df, key, key, value, value, width).filter(
        F.col("a_key") < F.col("b_key")
    )
