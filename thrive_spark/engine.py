"""User-facing engine API — the three entry points (SURVEY §3.2).

    from thrive_spark.engine import Engine

    eng = Engine.local()                       # or Engine(spark)
    eng.attach("/root/testdata/sf0.01")        # register the corpus

    eng.table("lineitem").filter(...)          # 1. DataFrame API
    eng.sql("SELECT ... FROM lineitem")        # 2. SQL over registered views
    eng.run_pipeline(spec)                     # 3. declarative pipeline spec
    eng.query("agg_hash_groupby")              # any §2 operator by id
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from . import registry
from .session import get_spark, prepare
from .sources.pipeline import Pipeline
from .tables import TABLE_NAMES, Tables


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = prepare(spark)
        self.sf_dir: str | None = None
        self._tables: Tables | None = None
        registry.load_all()

    @classmethod
    def local(cls, app_name: str = "thrive_spark") -> "Engine":
        return cls(get_spark(app_name))

    # -- data ----------------------------------------------------------------
    def attach(self, sf_dir: str) -> "Engine":
        """Point the engine at a corpus dir and register temp views for
        the SQL entry point."""
        self.sf_dir = sf_dir
        self._tables = Tables(self.spark, sf_dir)
        self._tables.register_views()
        return self

    def table(self, name: str) -> DataFrame:
        if self._tables is None:
            raise ValueError("no corpus attached — call attach(sf_dir) first")
        if name in TABLE_NAMES:
            return self._tables.load(name)
        return self.spark.table(name)

    # -- query surfaces ------------------------------------------------------
    def sql(self, text: str) -> DataFrame:
        return self.spark.sql(text)

    def query(self, qid: str) -> DataFrame:
        """Run a registered §2 operator against the attached corpus."""
        if self.sf_dir is None:
            raise ValueError("no corpus attached — call attach(sf_dir) first")
        return registry.QUERIES[qid](self.spark, self.sf_dir)

    def queries(self) -> list[str]:
        return sorted(registry.QUERIES)

    # -- pipeline ------------------------------------------------------------
    def run_pipeline(self, spec: dict[str, Any] | str) -> list[str]:
        """Run one incremental load cycle; spec is a dict or a YAML path."""
        if isinstance(spec, str):
            return Pipeline.from_yaml(self.spark, spec).run()
        return Pipeline(spec, self.spark).run()
