"""AQE skew-join handling: with a pathologically hot key, the skewed
partition must be split at runtime (OptimizeSkewedJoin) instead of one
straggler task doing most of the join. This is the mechanism SCALE.md
relies on for un-salted fact joins at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    # 200k rows, 95% on key 0; right side small-but-not-broadcast
    left = spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(5_000).select(F.col("id").alias("k"))

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # force SMJ + make the skew detector fire at toy scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        joined = left.join(right, "k")
        # materialize THIS dataset (count() would plan its own query
        # and leave joined's AQE plan unfinalized)
        n = len(joined.toPandas())
        assert n > 0
        executed = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "skew=true" in executed, executed[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
