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


def test_salted_agg_balances_partition_load(spark):
    """Demonstrate (not just document) the salting recipe: on a
    90%-one-key distribution, the salted stage-1 shuffle layout must
    keep the max partition within a small factor of the mean, while
    the unsalted layout funnels ~90% of rows through one partition —
    and the salted aggregate must still equal the plain one."""
    from thrive_spark.plans.salting import salted_agg

    n, n_salts, parts = 100_000, 32, 32
    df = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 97).cast("string")))
        .alias("event_type"),
        F.col("id").alias("event_id"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )

    def partition_loads(keyed, *cols):
        loads = (
            keyed.repartition(parts, *cols)
            .withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .count()
            .collect()
        )
        return [r["count"] for r in loads]

    unsalted = partition_loads(df, "event_type")
    salted = partition_loads(
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(n_salts))
        ),
        "event_type",
        "_salt",
    )
    assert max(unsalted) >= 0.9 * n  # the pathology is real
    mean = n / parts
    assert max(salted) <= 4 * mean, (max(salted), mean)
    assert max(salted) <= max(unsalted) / 5

    # and the two-stage rewrite is still exact on this distribution
    got = {
        r["event_type"]: (r["cnt"], r["sum_v"])
        for r in salted_agg(
            df,
            "event_type",
            "event_id",
            {"cnt": F.count(F.lit(1)), "sum_v": F.sum("value")},
            n_salts=n_salts,
        ).collect()
    }
    want = {
        r["event_type"]: (r["cnt"], r["sum_v"])
        for r in df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_v"))
        .collect()
    }
    assert got == want
