"""Quality gates for approximate operators: rows-only ops still need
their values bounded against the exact twins — the hash gate cannot
see them, so this is their only correctness net."""

from __future__ import annotations

from pyspark.sql import functions as F

from thrive_spark.registry import QUERIES
from thrive_spark.tables import Tables


def test_approx_count_distinct_close_to_exact(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["agg_approx_count_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in Tables(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        rel = abs(approx[k] - n) / n
        assert rel < 0.1, (k, approx[k], n)


def test_percentile_approx_close_to_exact(spark, sf_dir):
    approx = {
        r["o_orderstatus"]: (r["approx_median"], r["approx_p90"])
        for r in QUERIES["agg_percentile_approx"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderstatus"]: (r["median_price"], r["p90_price"])
        for r in QUERIES["agg_percentile_exact"](spark, sf_dir).collect()
    }
    for k, (em, ep) in exact.items():
        am, ap = approx[k]
        assert abs(am - em) / em < 0.05, (k, am, em)
        assert abs(ap - ep) / ep < 0.05, (k, ap, ep)


def test_salted_agg_equals_plain(spark, sf_dir):
    """The salting rewrite must be result-identical to plain groupBy."""
    salted = QUERIES["agg_salted_skew"](spark, sf_dir).toPandas()
    ev = Tables(spark, sf_dir).events
    from thrive_spark.operators._util import dsum

    plain = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .toPandas()
    )
    s = salted.sort_values("event_type").reset_index(drop=True)
    p = plain.sort_values("event_type").reset_index(drop=True)
    assert s.equals(p), (s, p)


def test_hll_sketch_union_error_bounded(spark, sf_dir):
    """Sketch-merge estimate within 5% of exact at every rollup node."""
    rows = QUERIES["agg_hll_sketch_union"](spark, sf_dir).collect()
    assert rows, "no regions"
    for r in rows:
        assert r["exact_customers"] > 0
        assert r["rel_err"] < 0.05, (r["r_name"], r["rel_err"])
