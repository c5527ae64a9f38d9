"""Semantic invariants for the round-7 operators — properties the
oracle hash can't express (monotonicity, conservation, bounds), so a
future refactor that stays self-consistent in BOTH engines still trips
these if it breaks the meaning."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from thrive_spark.registry import QUERIES
from thrive_spark.tables import Tables


def test_jaccard_neighbors_bounded_and_edgewise(spark, sf_dir, qdf):
    rows = qdf("graph_jaccard_neighbors").collect()
    assert rows
    for r in rows:
        assert r["src"] < r["dst"]  # canonical orientation
        if r["n_union"] == 0:  # isolated 2-node component: NULL ratio
            assert r["jaccard"] is None
        else:
            assert 0 <= r["n_common"] <= r["n_union"]
            assert 0.0 <= r["jaccard"] <= 1.0


def test_degree_histogram_conserves_vertices(spark, sf_dir, qdf):
    hist = qdf("graph_degree_histogram").collect()
    assert hist
    # Σ degree·n_vertices = 2·|E| (handshake lemma) — even total
    stubs = sum(r["degree"] * r["n_vertices"] for r in hist)
    assert stubs % 2 == 0 and stubs > 0


def test_ohlc_bars_ordering_invariants(spark, sf_dir, qdf):
    for r in qdf("ts_ohlc_bars").collect():
        assert r["low"] <= r["high"]
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_ticks"] >= 1


def test_vwap_between_min_and_max_price(spark, sf_dir, qdf):
    t = Tables(spark, sf_dir)
    bounds = (
        t.lineitem.agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        ).collect()[0]
    )
    for r in qdf("ts_vwap_daily").collect():
        assert bounds["lo"] - 1e-6 <= r["vwap"] <= bounds["hi"] + 1e-6


def test_dow_hour_profile_cell_count(spark, sf_dir, qdf):
    rows = qdf("ts_dow_hour_profile").collect()
    assert len(rows) <= 168
    assert all(0 <= r["dow"] <= 6 and 0 <= r["hr"] <= 23 for r in rows)
    t = Tables(spark, sf_dir)
    assert sum(r["n_events"] for r in rows) == t.events.count()


def test_pareto_share_monotone_to_one(spark, sf_dir, qdf):
    rows = sorted(
        qdf("analytics_pareto_share").collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    shares = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    assert math.isclose(shares[-1], 1.0, abs_tol=1e-3)
    # deciles ordered best-first: first decile's revenue is the max
    revs = [r["decile_revenue"] for r in rows]
    assert revs[0] == max(revs)


def test_new_vs_returning_partitions_actives(spark, sf_dir, qdf):
    rows = qdf("analytics_new_vs_returning").collect()
    assert rows
    for r in rows:
        assert r["n_new"] + r["n_returning"] == r["n_customers"]
    # every customer is new exactly once across all months
    t = Tables(spark, sf_dir)
    assert sum(r["n_new"] for r in rows) == (
        t.orders.select("o_custkey").distinct().count()
    )


def test_cohort_ltv_cumulative_monotone(spark, sf_dir, qdf):
    from collections import defaultdict

    curves = defaultdict(list)
    for r in qdf("analytics_cohort_ltv").collect():
        curves[r["cohort"]].append((r["age_months"], r["cum_revenue"]))
    assert curves
    for pts in curves.values():
        pts.sort()
        vals = [v for _, v in pts]
        assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))


def test_exact_substring_shared_frac_bounds(spark, sf_dir, qdf):
    rows = qdf("dedup_exact_substring").collect()
    assert rows
    n_docs_with_overlap = 0
    for r in rows:
        assert 0 <= r["n_shared"] <= r["n_windows"]
        assert 0.0 <= r["shared_frac"] <= 1.0
        n_docs_with_overlap += r["n_shared"] > 0
    # sharing is mutual: overlapping docs come in groups >= 2 (or none)
    assert n_docs_with_overlap != 1


def test_vocab_coverage_monotone_in_cut(spark, sf_dir, qdf):
    rows = sorted(
        qdf("tokenizer_vocab_coverage").collect(),
        key=lambda r: r["vocab_size"],
    )
    assert rows
    cov = [r["coverage"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cov, cov[1:]))
    for r in rows:
        assert r["covered_tokens"] <= r["total_tokens"]
        # a cut >= the whole vocabulary must cover everything
        if r["vocab_size"] >= r["distinct_words"]:
            assert r["covered_tokens"] == r["total_tokens"]


def test_temporal_holdout_no_date_leakage(spark, sf_dir, qdf):
    from thrive_spark.operators.curation import HOLDOUT_CUTOFF

    t = Tables(spark, sf_dir)
    rows = {
        r["split"]: r
        for r in qdf("split_temporal_holdout").collect()
    }
    assert set(rows) == {"train", "test"}
    cut = F.lit(HOLDOUT_CUTOFF).cast("timestamp")
    assert rows["train"]["n_orders"] == t.orders.filter(
        F.col("o_orderdate") < cut
    ).count()
    assert (
        rows["train"]["n_orders"] + rows["test"]["n_orders"]
        == t.orders.count()
    )
    # overlap symmetric: both splits report the same overlap census
    assert (
        rows["train"]["n_overlap_customers"]
        == rows["test"]["n_overlap_customers"]
    )


def test_freshness_lag_has_zero_row(spark, sf_dir, qdf):
    rows = qdf("dq_freshness_lag").collect()
    assert rows
    # the stream holding the global max has zero lag
    assert min(r["lag_minutes"] for r in rows) == 0
    assert all(r["lag_minutes"] >= 0 for r in rows)


def test_readability_flesch_sane_range(spark, sf_dir, qdf):
    rows = qdf("text_readability_flesch").collect()
    assert rows
    for r in rows:
        assert r["n_words"] > 0
        # proxy-syllable Flesch stays in a plausible band
        assert -400.0 < r["flesch"] <= 206.835


def test_qualify_returns_top2_per_customer(spark, sf_dir, qdf):
    rows = qdf("sql_window_qualify").collect()
    from collections import Counter

    per_cust = Counter(r["o_custkey"] for r in rows)
    assert max(per_cust.values()) <= 2
    assert all(r["rnk"] in (1, 2) for r in rows)


def test_canonical_mapping_covers_corpus(spark, sf_dir, qdf):
    t = Tables(spark, sf_dir)
    rows = qdf("dedup_canonical_mapping").collect()
    assert len(rows) == t.documents.count()  # total function: every doc
    keepers = {r["keep_id"] for r in rows}
    ids = {r["doc_id"] for r in rows}
    assert keepers <= ids  # keepers are real docs
    for r in rows:
        assert r["keep_id"] <= r["doc_id"]  # min-id canonical pick
        assert r["is_dup"] == (r["doc_id"] != r["keep_id"])
        # a keeper row for a group of n has the same n_copies
        assert r["n_copies"] >= 1


def test_dup_rate_consistent_with_mapping(spark, sf_dir, qdf):
    rates = qdf("dedup_rate_by_source").collect()
    assert rates
    for r in rates:
        assert 1 <= r["n_unique"] <= r["n_docs"]
        assert 0.0 <= r["dup_rate"] < 1.0


def test_interarrival_stats_ordered(spark, sf_dir, qdf):
    for r in qdf("ts_interarrival_stats").collect():
        assert (
            r["min_gap_s"]
            <= r["median_gap_s"]
            <= r["p90_gap_s"]
            <= r["max_gap_s"]
        )
        assert r["n_gaps"] > 0


def test_centroids_inside_data_range(spark, sf_dir, qdf):
    import numpy as np

    t = Tables(spark, sf_dir)
    rows = qdf("embed_centroid_by_label").collect()
    n_labels = t.embeddings.select("label").distinct().count()
    assert len(rows) == n_labels
    dim = len(t.embeddings.select("embedding").first()["embedding"])
    total = 0
    for r in rows:
        c = np.array([int(x) for x in r["centroid_fp"].split(",")]) / 1e4
        assert len(c) == dim
        assert np.all(np.isfinite(c))
        total += r["n_vecs"]
    assert total == t.embeddings.count()
    # centroid of a label ~ mean: cross-check one label exactly
    lbl = rows[0]["label"]

    vecs = (
        t.embeddings.filter(F.col("label") == lbl)
        .select("embedding")
        .toPandas()["embedding"]
    )
    exact = np.mean(np.stack(vecs.to_numpy()).astype("float64"), axis=0)
    got = np.array(
        [int(x) for x in rows[0]["centroid_fp"].split(",")]
    ) / 1e4
    assert np.allclose(exact, got, atol=2e-4)  # fixed-point grid error


def test_asof_tolerance_never_exceeds_bound(spark, sf_dir, qdf):
    from thrive_spark.operators.joins import ASOF_TOLERANCE_S

    df = qdf("join_asof_tolerance")
    bad = df.filter(
        F.col("matched")
        & (
            (F.unix_micros("ts") - F.col("signup_us"))
            > ASOF_TOLERANCE_S * 1_000_000
        )
    ).count()
    assert bad == 0
    # tolerance is a strict subset of the unbounded as-of matches
    unbounded = qdf("join_asof_backward")
    n_unbounded = unbounded.filter(F.col("prev_signup_ts").isNotNull()).count()
    n_bounded = df.filter(F.col("matched")).count()
    assert n_bounded <= n_unbounded


def test_rolling_extrema_envelope_contains_value(spark, sf_dir, qdf):
    for r in qdf("win_rolling_extrema").collect():
        assert r["roll_min"] <= r["day_value"] <= r["roll_max"]
        assert abs(r["roll_range"] - (r["roll_max"] - r["roll_min"])) < 1e-9


def test_psi_contributions_nonnegative(spark, sf_dir, qdf):
    rows = qdf("dq_psi_drift").collect()
    assert rows
    # each PSI term (p-q)·ln(p/q) is >= 0: sign(p-q) == sign(ln(p/q))
    assert all(r["psi_contrib"] >= 0.0 for r in rows)
    total = sum(r["psi_contrib"] for r in rows)
    assert total < 0.25  # the same distribution split in time: stable


def test_order_width_histogram_conserves_lines(spark, sf_dir, qdf):
    t = Tables(spark, sf_dir)
    rows = qdf("agg_order_width_histogram").collect()
    assert sum(r["n_lines"] * r["n_orders"] for r in rows) == (
        t.lineitem.count()
    )
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-2


def test_timezone_bank_offsets_sane(spark, sf_dir, qdf):
    for r in qdf("fn_timezone_bank").collect():
        assert 0 <= r["ny_hour"] <= 23
        assert r["ny_local"] < r["ts"]  # NY is always behind UTC
        assert r["tokyo_local"] > r["ts"]  # Tokyo always ahead


def test_nearest_centroid_confusion_conserves(spark, sf_dir, qdf):
    t = Tables(spark, sf_dir)
    rows = qdf("cluster_nearest_centroid").collect()
    assert sum(r["n"] for r in rows) == t.embeddings.count()
    for r in rows:
        # n_correct is n on the diagonal, 0 off it
        if r["true_label"] == r["assigned_label"]:
            assert r["n_correct"] == r["n"]
        else:
            assert r["n_correct"] == 0
        assert 0 <= r["assigned_label"] <= 9


def test_kmeans_exact_partition_and_rerun_stability(spark, sf_dir):
    t = Tables(spark, sf_dir)
    rows = {
        r["cluster"]: (r["n_members"], r["inertia_fp"])
        for r in QUERIES["cluster_kmeans_exact"](spark, sf_dir).collect()
    }
    from thrive_spark.operators.vectors import KMX_K

    assert sum(n for n, _ in rows.values()) == t.embeddings.count()
    assert all(0 <= c < KMX_K for c in rows)
    assert all(i >= 0 for _, i in rows.values())
    # the whole point: a re-run reproduces the clustering EXACTLY
    again = {
        r["cluster"]: (r["n_members"], r["inertia_fp"])
        for r in QUERIES["cluster_kmeans_exact"](spark, sf_dir).collect()
    }
    assert rows == again


def test_semantic_exact_pairs_within_cells_and_bounded(spark, sf_dir, qdf):
    from thrive_spark.operators.vectors import SEMX_COS_THRESHOLD

    rows = qdf("dedup_semantic_exact").collect()
    assert rows
    for r in rows:
        assert r["keep_id"] < r["dup_id"]
        assert SEMX_COS_THRESHOLD - 1e-4 <= r["cos"] <= 1.0 + 1e-9
    # pairs respect the clustering: both members share the pair's cell
    assign = {
        row["vec_id"]: row["cl"]
        for row in (
            __import__(
                "thrive_spark.operators.vectors", fromlist=["_kmx_assignments"]
            )
            ._kmx_assignments(spark, sf_dir)
            .selectExpr("vec_id", "packed % 100 AS cl")
            .collect()
        )
    }
    for r in rows:
        assert assign[r["keep_id"]] == assign[r["dup_id"]] == r["cluster"]
