"""Incremental directory ingestion with an exactly-once ledger.

This is the Spark-first re-expression of the reference's core idea
(SURVEY.md §3.1 [R]): a metadata store records which input directories
have been processed; each load run diffs the candidate listing against
the ledger and processes only the new ones, committing the ledger
entry after a successful load.

Design for scale:

- The ledger is a parquet table of processed paths — tiny (one row per
  ingested directory), read once per run, broadcast into the anti-join
  against the candidate listing.
- Directory listing happens driver-side (it is metadata, not data);
  the *data* read is a single ``spark.read.parquet(*new_dirs)`` so
  Catalyst schedules one scan over all new partitions.
- Commit order is data-sink-then-ledger: a crash between the two
  re-processes a directory (at-least-once) rather than losing one;
  idempotent sinks (overwrite-by-partition) make it exactly-once.
- The Structured Streaming twin of this operator is the file source
  with checkpointing (streaming/file_stream.py), which maintains the
  same seen-files ledger inside the checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..smalldf import small_df


class IncrementalLoader:
    """Dirlist-diff loader: process each input directory exactly once."""

    def __init__(self, spark: SparkSession, ledger_path: str):
        self.spark = spark
        self.ledger_path = ledger_path

    def processed_paths(self) -> set[str]:
        if not os.path.exists(self.ledger_path):
            return set()
        rows = self.spark.read.parquet(self.ledger_path).select("path").collect()
        return {r["path"] for r in rows}

    def pending(self, candidate_dirs: list[str]) -> list[str]:
        seen = self.processed_paths()
        return sorted(d for d in candidate_dirs if os.path.abspath(d) not in seen)

    def load(self, candidate_dirs: list[str], fmt: str = "parquet"):
        """Read only unprocessed dirs; returns (df | None, new_dirs)."""
        new = self.pending(candidate_dirs)
        if not new:
            return None, []
        df = self.spark.read.format(fmt).load(new)
        return df, new

    def commit(self, new_dirs: list[str], counts: dict[str, int]) -> None:
        """Append processed dirs to the ledger (call after the sink)."""
        if not new_dirs:
            return
        rows = [(os.path.abspath(d), int(counts.get(d, -1))) for d in new_dirs]
        ledger = small_df(self.spark, rows, "path string, n_rows long")
        ledger.coalesce(1).write.mode("append").parquet(self.ledger_path)

    def rollback(self, dirs: list[str]) -> None:
        """Rewind the ledger: forget ``dirs`` so the next run reloads
        them (the reference's rollback_handler role [R], SURVEY §3.1.3).
        The ledger is tiny (one row per ingested directory), so a full
        rewrite is the right move — no merge machinery needed.
        """
        import shutil

        if not os.path.exists(self.ledger_path):
            return
        drop = {os.path.abspath(d) for d in dirs}
        kept = [
            (r["path"], r["n_rows"])
            for r in self.spark.read.parquet(self.ledger_path).collect()
            if r["path"] not in drop
        ]
        shutil.rmtree(self.ledger_path, ignore_errors=True)
        if kept:
            small_df(
                self.spark, kept, "path string, n_rows long"
            ).coalesce(1).write.mode("overwrite").parquet(self.ledger_path)


def run_incremental(
    spark: SparkSession,
    loader: IncrementalLoader,
    candidate_dirs: list[str],
    sink,
) -> list[tuple[str, int]]:
    """One load cycle: diff → read new → sink → commit. Returns
    (dir_basename, n_rows) per processed dir.

    Per-dir audit counts come from ONE distributed aggregation over
    the combined scan (``input_file_name()`` keys each row back to its
    source directory) — NOT a read+count job per directory, which at
    1000 new dirs would mean 1000 driver-scheduled jobs against the
    same data. The collect is bounded: one row per new directory.
    """
    from pyspark.sql import functions as F

    df, new = loader.load(candidate_dirs)
    results: list[tuple[str, int]] = []
    if df is None:
        return results
    audit = (
        df.groupBy(
            F.regexp_replace(
                F.input_file_name(), "/[^/]*$", ""
            ).alias("src_dir")
        )
        .count()
        .collect()
    )
    by_base = {os.path.basename(r["src_dir"]): int(r["count"]) for r in audit}
    counts = {d: by_base.get(os.path.basename(d), 0) for d in new}
    results = [(os.path.basename(d), counts[d]) for d in new]
    sink(df)
    loader.commit(new, counts)
    return results
