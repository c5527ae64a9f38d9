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


def test_float_sensitive_queries_are_run_deterministic(spark, sf_dir):
    """Two executions of the most float-exposed queries must be
    IDENTICAL — the fixed-point/identical-op-order design means no
    result may depend on task scheduling or partial-merge order."""
    from thrive_spark.registry import QUERIES

    for qid in (
        "ts_ewma_halflife",
        "ts_rolling_corr",
        "text_bm25_topk",
        "agg_moments_skew_kurtosis",
        "attribution_linear_window",
        "dedup_shingle_containment",
    ):
        a = sorted(map(str, QUERIES[qid](spark, sf_dir).collect()))
        b = sorted(map(str, QUERIES[qid](spark, sf_dir).collect()))
        assert a == b, f"{qid} differs between runs"


def test_grading_rotation_invariants():
    """The driver grades the first 50 queries() keys: canaries must sit
    inside the window, never-graded contract scans/sinks must not be
    displaced by round-5 ids, and every registered id must appear
    exactly once."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = list(m.queries())
    window = qs[:50]
    for canary in m.GRADE_CANARIES:
        assert canary in window
    graded = m._graded_ids()
    for cid in ("scan_parquet", "sink_jdbc", "sink_hive_table"):
        if cid not in graded:
            assert cid in window, f"ungraded contract id {cid} displaced"
    assert len(qs) == len(set(qs))
    from thrive_spark import registry

    assert set(qs) == set(registry.QUERIES)

    # r6 discipline: while ANY hash-checkable id is still ungraded, no
    # rows-only id may hold a window slot (the window is the scarce
    # resource; rows-only checks are strictly weaker evidence)
    fresh = [k for k in window if k not in graded and k not in m.GRADE_CANARIES]
    ungraded_oracle = [
        k for k in registry.QUERIES if k not in graded and k in registry.ORACLE
    ]
    if len(ungraded_oracle) >= len(fresh):
        assert all(k in registry.ORACLE for k in fresh), [
            k for k in fresh if k not in registry.ORACLE
        ]


def test_bench_compact_recap_fits_driver_tail_capture():
    """The driver archives only the last ~2000 chars of bench stdout;
    the compact recap line (metric/value/queries/reps/sf) must stay
    comfortably inside that window even with worst-case widths."""
    import json

    import bench

    recap = json.dumps(
        {
            "metric": "suite_warm_sec",
            "value": 9999.999,
            "unit": "sec",
            "queries": {qid: 9999.999 for qid in bench.HEADLINE},
            "n_errors": 99,
            "reps": 99,
            "sf": 0.1,
        }
    )
    assert len(recap) < 1800, len(recap)


def test_oracle_upgrade_requeues_rows_only_verdicts():
    """r7 rule: an id graded rows-only in a past round re-enters the
    grading queue once it GAINS an oracle — the official artifact must
    eventually record the stronger hash verdict. The four r7
    seeded→portable upgrades are the live fixture."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from thrive_spark import registry

    graded = m._graded_ids()
    for qid in (
        "agg_cms_frequency",
        "dedup_simhash",
        "graph_pagerank",
        "text_textrank_keywords",
    ):
        assert qid in registry.ORACLE, f"{qid} lost its oracle"
        # rows-only history + oracle now => must be queued for grading
        # (drops out again once a hash-checked row lands in a future
        # CORRECTNESS artifact — both states are valid)
        import glob
        import json

        hash_row = False
        for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
            row = json.load(open(path)).get(qid)
            if row and row.get("err") is None and row.get("hash_match"):
                hash_row = True
        assert (qid in graded) == hash_row


def test_rotating_canaries_advance_by_round():
    """r11 (verdict item 6): with the whole registry officially graded,
    the window must carry a ROTATING stratified canary sample — picks
    sit in the window, differ across rounds, and stay deterministic
    for a fixed round."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from thrive_spark import registry

    registry.load_all()
    mapping = dict(registry.QUERIES)
    r_now = m._round_no()
    picks_now = m._rotating_canaries(mapping, r_now)
    assert len(picks_now) >= 5
    assert picks_now == m._rotating_canaries(mapping, r_now)  # deterministic
    assert picks_now != m._rotating_canaries(mapping, r_now + 1)  # advances
    window = list(m.queries())[:50]
    in_window = [k for k in picks_now if k in window]
    assert len(in_window) >= 5, (picks_now, window)
