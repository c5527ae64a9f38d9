"""SparkSession factory with scale-tuned defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores);
the same configs are what we would ship to a 1000-executor cluster,
minus the driver-memory knob which only matters in local mode.

Two layers:

- :func:`get_spark` builds a session (used by tests/bench).
- :func:`prepare` applies the *runtime-settable* SQL confs to an
  externally-provided session (the driver constructs its own
  SparkSession and passes it to ``queries()`` callables, so anything
  we require beyond builder-time defaults must be settable here).
  Verified runtime-settable on Spark 4.1.2: ``spark.sql.legacy.
  parquet.nanosAsLong``, ``spark.sql.session.timeZone``, AQE flags,
  ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are runtime-settable and required for correctness.
_RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS); Spark 4 refuses it unless
    # read as long (SURVEY.md §2 notes). tables.load_events converts back.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # events.parquet (current testdata) stores timestamp[us] with
    # isAdjustedToUTC=false; by default Spark 4 reads that as
    # TIMESTAMP_NTZ, which unix_micros()/window()/watermarks reject.
    # Read it as session-TZ TIMESTAMP instead (session TZ is UTC, so
    # epoch values equal the naive value read by the DuckDB oracle).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # DuckDB (the oracle) uses UTC-naive timestamps; pin the session TZ
    # so collected timestamps and date functions agree bit-for-bit.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-planning (partition coalescing, skew-join split,
    # broadcast conversion) — essential at 100 TB, harmless at sf0.001.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def _n_cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent).

    A locked-down conf must not crash the query, but it must not fail
    silently either: without ``nanosAsLong`` every events-table scan
    dies with an opaque Parquet type error, and without the UTC TZ the
    oracle comparison drifts — so name the consequence loudly once.
    """
    import warnings

    failed = []
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:  # noqa: BLE001 — any failure is reportable
            failed.append((k, v, repr(exc)))
    if failed:
        details = "; ".join(f"{k}={v} ({err})" for k, v, err in failed)
        warnings.warn(
            "thrive_spark: could not set required SQL confs on the "
            f"provided SparkSession: {details}. Consequences: "
            "'nanosAsLong' missing → every events.parquet scan fails "
            "(TIMESTAMP(NANOS) unsupported); 'timeZone' missing → "
            "timestamp results may disagree with the DuckDB oracle; "
            "AQE flags missing → degraded plans only. Recreate the "
            "session with these confs at builder time.",
            RuntimeWarning,
            stacklevel=2,
        )
    return spark


def get_spark(app_name: str = "thrive_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Shuffle partitions default to the core count: at local test scale
    200 partitions would mean 200 tiny tasks per shuffle; on a real
    cluster this is overridden per-deployment (AQE coalescing makes the
    initial number less critical).
    """
    cpus = _n_cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return prepare(spark)
