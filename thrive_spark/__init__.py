"""thrive_spark — a PySpark-native analytics engine.

A from-scratch engine providing the query and data-processing
capabilities of the intuit/thrive ETL framework (reference surveyed in
SURVEY.md; the reference mount was empty, so SURVEY.md §2 is the
binding operator contract), re-expressed Spark-first:

- DataFrame/SQL logical plans optimized by Catalyst (no RDDs).
- Incremental, metadata-driven batch loads (the reference's core idea:
  dirlist-diff exactly-once directory ingestion) built on parquet
  ledgers and Structured Streaming file-source checkpoints.
- A full relational operator surface (joins, aggregates, windows,
  set ops, function banks) plus LLM-data-pipeline operators (dedup,
  similarity search, multimodal columns, text analysis) designed for
  100 TB scale: broadcast-vs-shuffle discipline, partition pruning,
  band-join bucketing rewrites, LSH candidate pruning.

Layout:
    session.py    SparkSession factory with scale-tuned defaults
    tables.py     corpus loaders (handles TIMESTAMP(NANOS) events)
    registry.py   query/oracle registration used by __spark_entry__
    operators/    relational + streaming-twin + LLM operators
    sources/      scans, sinks, incremental ledger, pipeline runner
    functions/    scalar function banks and vector helpers
    plans/        scale rewrites (band-join bucketing) + plan checks
    streaming/    true Structured Streaming implementations
"""

__version__ = "0.1.0"
