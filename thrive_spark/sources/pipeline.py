"""Declarative pipeline runner — the thrive-equivalent surface
(SURVEY §3.2.3).

The reference is a metadata-driven ETL framework [R]: a dataset config
declares source directories, a JSON→columns mapping, type casts,
derived partition columns, and Hive/Vertica targets; the load phase
diffs a dirlist ledger and processes only new directories. This module
is that surface on Spark: a spec (dict or YAML) lowers to a DataFrame
chain — no custom execution, Catalyst optimizes the whole load as one
plan.

Spec shape::

    name: events_hourly
    source: {path: /data/in, format: json|parquet|csv, options: {...}}
    transforms:
      - {op: parse_json, col: props, schema: "k BIGINT", prefix: p_}
      - {op: cast, col: value, type: double}
      - {op: rename, col: ts, to: event_ts}
      - {op: derive, name: dt, expr: "CAST(event_ts AS DATE)"}
      - {op: filter, expr: "value IS NOT NULL"}
      - {op: select, cols: [event_id, event_ts, p_k, value, dt]}
    sink: {kind: parquet, path: /data/out, partition_by: [dt],
           mode: overwrite_partitions}
    ledger: /data/_meta/events_hourly

Exactly-once: sink first, ledger commit second; with
``overwrite_partitions`` (dynamic partition overwrite) a re-run of a
crashed load rewrites the same partitions — idempotent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prepare
from .incremental import IncrementalLoader


@dataclass
class Pipeline:
    spec: dict[str, Any]
    spark: SparkSession

    @classmethod
    def from_yaml(cls, spark: SparkSession, path: str) -> "Pipeline":
        try:
            import yaml  # gated: not guaranteed in every image
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "pyyaml not installed; pass the spec as a dict instead"
            ) from e
        with open(path) as fh:
            return cls(yaml.safe_load(fh), prepare(spark))

    # -- transform lowering -------------------------------------------------
    def _apply_transform(self, df: DataFrame, t: dict[str, Any]) -> DataFrame:
        op = t["op"]
        if op == "parse_json":
            prefix = t.get("prefix", "")
            parsed = F.from_json(F.col(t["col"]), t["schema"])
            df = df.withColumn("__p", parsed)
            for f_ in df.schema["__p"].dataType.fieldNames():
                df = df.withColumn(prefix + f_, F.col(f"__p.{f_}"))
            return df.drop("__p")
        if op == "cast":
            return df.withColumn(t["col"], F.col(t["col"]).cast(t["type"]))
        if op == "try_cast":
            return df.withColumn(t["col"], F.col(t["col"]).try_cast(t["type"]))
        if op == "rename":
            return df.withColumnRenamed(t["col"], t["to"])
        if op == "derive":
            return df.withColumn(t["name"], F.expr(t["expr"]))
        if op == "filter":
            return df.filter(t["expr"])
        if op == "select":
            return df.select(*t["cols"])
        raise ValueError(f"unknown transform op: {op}")

    def _transform(self, df: DataFrame) -> DataFrame:
        for t in self.spec.get("transforms", []):
            df = self._apply_transform(df, t)
        return df

    # -- sink ---------------------------------------------------------------
    def _sink(self, df: DataFrame) -> None:
        sink = self.spec["sink"]
        kind = sink.get("kind", "parquet")
        if kind == "parquet":
            mode = sink.get("mode", "append")
            writer = df.write
            if mode == "overwrite_partitions":
                # dynamic partition overwrite: replace only partitions
                # present in this load — the idempotent re-run story
                self.spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", "dynamic"
                )
                writer = writer.mode("overwrite")
            else:
                writer = writer.mode(mode)
            if sink.get("partition_by"):
                writer = writer.partitionBy(*sink["partition_by"])
            writer.parquet(sink["path"])
        elif kind == "table":
            df.write.mode(sink.get("mode", "overwrite")).saveAsTable(sink["table"])
        else:
            raise ValueError(f"unknown sink kind: {kind}")

    # -- run ----------------------------------------------------------------
    def run(self) -> list[str]:
        """One incremental load cycle; returns the dirs processed."""
        src = self.spec["source"]
        root = src["path"]
        candidates = sorted(
            os.path.join(root, d)
            for d in os.listdir(root)
            if not d.startswith("_") and os.path.isdir(os.path.join(root, d))
        )
        loader = IncrementalLoader(self.spark, self.spec["ledger"])
        new = loader.pending(candidates)
        if not new:
            return []
        reader = self.spark.read.format(src.get("format", "parquet"))
        for k, v in src.get("options", {}).items():
            reader = reader.option(k, v)
        if src.get("schema"):
            reader = reader.schema(src["schema"])
        df = self._transform(reader.load(new))
        self._sink(df)
        loader.commit(new, {})
        return new

    def rollback(self, dirs: list[str]) -> None:
        IncrementalLoader(self.spark, self.spec["ledger"]).rollback(dirs)
