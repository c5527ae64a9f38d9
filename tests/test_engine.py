"""Engine facade: the three entry points over an attached corpus."""

from __future__ import annotations

import pytest

from thrive_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark).attach(sf_dir)


def test_table_and_dataframe_api(engine):
    from pyspark.sql import functions as F

    n = (
        engine.table("lineitem")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey")
        .count()
    )
    assert n > 0


def test_sql_entry_point(engine):
    row = engine.sql(
        "SELECT count(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey"
    ).collect()[0]
    assert row["n"] == engine.table("orders").count()


def test_query_by_id(engine):
    df = engine.query("agg_hash_groupby")
    assert df.count() == 6
    assert "join_star_multiway" in engine.queries()


def test_unattached_engine_raises(spark):
    with pytest.raises(ValueError, match="attach"):
        Engine(spark).table("orders")
