"""Relational, streaming-twin, UDF, and LLM-pipeline operators.

Each module registers its SURVEY.md §2 queries via
``thrive_spark.registry.query``.
"""
