"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``thrive_spark``: the registry collects every operator
implemented from SURVEY.md §2 (each module registers its queries and
DuckDB oracle SQL at import time).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from thrive_spark import registry
from thrive_spark.session import prepare

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver grades the FIRST 50 keys of queries() each round
# (verified: CORRECTNESS_r01/r02 key lists == first 50 registry keys,
# in order).  The ordering below rotates never-graded ids to the front
# so every operator eventually gets an official correctness row, and
# it is SELF-ADVANCING: ids drop out of the priority prefix once any
# CORRECTNESS_r*.json in the repo shows them graded, so each round's
# window automatically fills with whatever is still unseen (hash-
# checkable ids before rows-only ones), followed by three fixed
# prior-green canaries that stay in every window as regression
# sentinels.  GRADE_ROTATION pins this round's preferred order for
# ids not yet graded; new/unlisted ids queue after it.
GRADE_ROTATION = [
    # r6 priority (r5 verdict): the five adapted TPC-H shapes and the
    # end-to-end curation pipeline get official rows first
    "tpch_q2_adapted", "tpch_q9_adapted", "tpch_q11_adapted",
    "tpch_q16_adapted", "tpch_q20_adapted", "curation_pipeline_e2e",
    # function banks (incl. the round-2 array-output fix class)
    "fn_string_bank", "fn_date_bank", "fn_math_bank", "fn_conditional_bank",
    "fn_array_bank", "fn_array_explode", "fn_map_bank", "fn_json_bank",
    "fn_hash_bank",
    # window functions
    "win_row_number_topn", "win_rank_dense_rank", "win_ntile_percentile",
    "win_lag_lead", "win_running_sum", "win_moving_avg", "win_range_frame",
    "win_time_range_frame", "win_first_last_value", "unpivot_stack",
    # streaming batch-twins
    "stream_tumbling_count", "stream_sliding_avg", "stream_session_window",
    "stream_watermark_late", "stream_dedup_watermark", "stream_stateful_counter",
    # UDF / UDTF surface
    "udf_python_scalar", "udf_pandas_scalar", "udf_pandas_grouped_agg",
    "udf_grouped_map_normalize", "udtf_explode_words", "udtf_python_native",
    # SQL surface + skew
    "sql_cte_scalar_subquery", "sql_correlated_exists", "sql_recursive_cte",
    "agg_salted_skew",
    # text analysis
    "text_quality_score", "text_lang_id", "text_fingerprint",
    "text_token_count_bpe", "text_ngram_freq",
    # timeseries + remaining joins
    "resample_gapfill",
    "join_asof_cogroup", "join_interval_point", "join_star_multiway",
    "join_interval_overlap",
    # set ops
    "union_all_dedup", "intersect_except",
]

#: prior driver greens kept in every window as regression sentinels
GRADE_CANARIES = ["agg_collect_sorted", "agg_hash_groupby", "join_theta_band"]

#: r11 (verdict item 6): with every registered id holding an official
#: row, the window is pure canary space — widen the 3 fixed sentinels
#: with a ROTATING stratified sample so silent regressions in
#: never-again-graded ids get re-checked. Picks advance by round
#: (round number = latest CORRECTNESS_r*.json + 1, read from the repo
#: itself so the rotation is self-advancing with zero driver help) and
#: stride across the sorted id space, which is prefix-grouped — i.e.
#: roughly one pick per section band.
#: r12 (verdict item 6): 7 → 12 — the window has pure canary space
#: now, and 12 rotating picks shrink the full official-row refresh
#: cycle from ~7 rounds to ~4.
GRADE_ROTATING_CANARIES = 12


def _round_no() -> int:
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    idx = [
        int(re.search(r"_r(\d+)", p).group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    ]
    return (max(idx) + 1) if idx else 1


def _rotating_canaries(mapping: dict, rno: int) -> list:
    pool = [k for k in sorted(mapping) if k not in GRADE_CANARIES]
    if not pool:
        return []
    n = min(GRADE_ROTATING_CANARIES, len(pool))
    step = max(1, len(pool) // n)
    picks = []
    for i in range(n):
        k = pool[(rno * 13 + i * step) % len(pool)]
        if k not in picks:
            picks.append(k)
    return picks

#: ids first registered in round 5 — explicitly queued BEHIND the
#: pre-existing never-graded backlog (r4 verdict: the 51-id backlog's
#: official rows land before anything new enters the window).
GRADE_DEFER = [
    "rollup_time_hierarchy", "win_gaps_islands", "agg_corr_exact",
    "ts_ewma_halflife", "ts_rolling_corr", "ts_anomaly_zscore",
    "basket_brand_affinity", "events_pattern_triple",
    "attribution_first_touch", "graph_copurchase_stats",
    "join_fuzzy_levenshtein", "join_bloom_prefilter", "agg_entropy_gini",
    "scan_binary_files", "sql_lateral_topn", "win_period_over_period",
    "dq_benford_leading_digit", "stream_stream_join",
    "scan_xml_roundtrip", "join_hint_shuffle_hash", "dq_filter_cascade",
    "text_bm25_topk", "sim_hybrid_rrf", "merge_scd2_dimension",
    "events_markov_transition", "scan_time_travel",
    "maintenance_cache_reuse", "sim_hard_negatives",
    "analytics_rfm_segments", "win_max_drawdown", "ts_seasonal_baseline",
    "agg_cms_frequency", "text_pmi_bigrams", "analytics_audience_overlap",
    "join_asof_forward", "sink_partition_overwrite_dynamic",
    "scan_python_datasource", "win_nth_value", "agg_moments_skew_kurtosis",
    "sql_pivot_clause", "events_common_paths", "sample_oversample_minority",
    "udf_pandas_window_agg", "multimodal_audio_wav",
    "dedup_minhash_mllib", "sim_knn_mllib_brp", "cluster_kmeans_mllib",
    "graph_pagerank", "events_session_metrics", "analytics_ab_test",
    "stream_stream_join_outer", "attribution_linear_window",
    "dq_referential_integrity", "text_novelty_fraction",
    "cdc_snapshot_diff", "text_zipf_slope", "sink_compression_matrix",
    "win_sliding_median",
    "analytics_peak_concurrency", "events_dau_wau", "scan_csv_dialect",
    "fn_masking_bank", "pipeline_config_run", "fn_collation_bank",
    "split_kfold_assign", "sim_mmr_rerank", "text_lang_confusion",
    "agg_weighted_mean", "fn_try_bank", "agg_hll_precision_sweep",
    "text_textrank_keywords", "fn_surrogate_key_bank",
    "analytics_survival_table", "analytics_user_streaks",
    "dq_schema_diff", "join_point_in_time_scd2", "sql_cluster_by",
    "analytics_repurchase_intervals", "union_by_name_evolved",
    "scan_file_metadata_provenance", "text_boilerplate_prefixes",
    "agg_grouping_id_rollup", "dedup_canonical_url",
    "join_multi_semi_flags", "analytics_churn_rate",
    "scan_ignore_corrupt_files", "intersect_all_multiset",
    "agg_minmax_scaling", "dq_bot_detection", "win_frame_matrix",
    "multimodal_image_ahash",
    # r6 registrations (two ids, behind all backlog)
    "dedup_shingle_containment", "agg_mode_categorical",
    # r7 registrations (behind all backlog; oracle-bearing ids still
    # outrank older rows-only backlog via the hash-checkable-first key)
    "graph_degree_histogram", "graph_jaccard_neighbors",
    "ts_ohlc_bars", "ts_vwap_daily", "ts_dow_hour_profile",
    "analytics_pareto_share", "analytics_new_vs_returning",
    "analytics_cohort_ltv", "dedup_exact_substring",
    "text_readability_flesch", "tokenizer_vocab_coverage",
    "split_temporal_holdout",
    "sql_window_qualify", "sql_values_inline_dim", "sql_any_all_rewrite",
    "dq_freshness_lag", "scan_text_roundtrip", "events_time_to_convert",
    "dedup_canonical_mapping", "dedup_rate_by_source",
    "ts_interarrival_stats", "embed_centroid_by_label",
    "join_asof_tolerance",
    "win_rolling_extrema", "fn_timezone_bank",
    "agg_order_width_histogram", "dq_psi_drift",
    "dedup_minhash_portable", "cluster_nearest_centroid",
    "cluster_kmeans_exact", "dedup_semantic_exact",
    # r8 registrations (behind all backlog; the 41-id r7 backlog +
    # these 3 still fit the 47-slot window, so nothing is displaced)
    "events_retention_triangle", "win_running_distinct",
    "dq_uniqueness_profile",
    # r10 registrations
    "fn_interval_bank", "agg_bitwise_bool", "sim_eval_rank_metrics",
    "dedup_incremental_minhash", "split_dedup_safe",
    "dedup_incremental_exact", "dedup_incremental_embedding",
    "dedup_incremental_bucketed",
    # r11 registrations
    "multimodal_image_jpeg",
    "multimodal_image_png",
    "scan_broker_stream",
    "acid_table_commits",
    # r12 registrations
    "acid_stream_ingest",
    "acid_table_compact",
    "scan_broker_compacted",
    "acid_schema_evolution",
    "sink_python_datasource",
    "acid_change_feed",
    "scan_table_stream",
    "sample_stratified_neyman",
    "ts_cusum_changepoints",
    "sink_broker_stream",
    "acid_data_skipping",
    "sql_group_order_by_all",
    "multimodal_image_resize",
    "agg_hll_portable",
    "agg_hll_portable_union",
    # r13 registrations
    "acid_table_restore",
    "sql_distinct_on",
    "sample_bottom_k_sketch",
    "sim_knn_ivfpq",
    "scan_delta_log_table",
    "acid_optimize_zorder",
    "agg_percentile_sketch_portable",
    "scan_delta_checkpoint",
    "scan_delta_stream",
    # r14 registrations
    "scan_iceberg_log_table",
    "scan_iceberg_partition_prune",
    "agg_percentile_sketch_union",
    "scan_delta_deletion_vectors",
    "scan_avro_files",
    "scan_iceberg_stats_prune",
    "scan_iceberg_stream",
    "scan_iceberg_pos_delete",
    "scan_delta_column_mapping",
    "scan_iceberg_hidden_partition",
    "scan_iceberg_eq_delete",
    "scan_delta_cdf",
    "scan_iceberg_spec_evolution",
    "scan_iceberg_partitions_table",
    "scan_delta_cdf_stream",
    "scan_iceberg_wap_branch",
    "scan_delta_vacuum",
    "scan_iceberg_compaction",
    "scan_hudi_cow_table",
    "scan_hudi_stream",
    "lakehouse_format_migrate",
    "scan_delta_cdf_partitioned",
    # r15 registrations
    "scan_hudi_mor_table",
    "scan_hudi_partitioned",
    "scan_hudi_mor_stream",
    "scan_delta_cdf_after_vacuum",
    "scan_iceberg_v3_dv",
    "lakehouse_migrate_deletes",
    "scan_iceberg_evolved_maintenance",
    "scan_delta_cdf_dv",
    "scan_hudi_clean",
    "scan_hudi_mor_events",
    "sink_delta_stream_txn",
    "sink_iceberg_stream_ckpt",
    "sink_hudi_stream_ckpt",
    "lakehouse_cdc_mirror",
    # r16 registrations
    "scan_hudi_clustering",
    "scan_hudi_metadata_table",
    "scan_hudi_col_stats_prune",
    "scan_hudi_bloom_index",
]


def _graded_ids() -> set[str]:
    """Ids with a *clean* driver correctness row in any prior round.

    A row that errored (``err`` set) or hash-mismatched does NOT count
    as graded: those ids must re-enter the priority window so the next
    round's artifact proves the fix.  The most recent verdict wins —
    an id that failed in r3 but passed in r4 stays retired.

    A rows-only verdict also stops counting once the operator GAINS an
    oracle (r7 upgraded CMS/SimHash/PageRank/TextRank from seeded to
    portable arithmetic): the id re-enters the window so the official
    artifact records the stronger hash-checked verdict.
    """
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    verdict: dict[str, bool] = {}
    paths = sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    last_clean: dict[str, int] = {}
    for path in paths:
        rno = int(re.search(r"_r(\d+)", path).group(1))
        try:
            with open(path) as fh:
                for k, row in json.load(fh).items():
                    err = row.get("err")
                    ran_rows_only = (
                        err == "no_oracle" and row.get("spark_rows") is not None
                    )
                    hash_ok = err is None and row.get("hash_match") is not False
                    ok = hash_ok or (ran_rows_only and k not in registry.ORACLE)
                    verdict[k] = ok
                    if ok:
                        last_clean[k] = rno
        except Exception:  # noqa: BLE001 — a corrupt artifact must not kill entry()
            pass
    _graded_ids.last_clean = last_clean  # side table for backfill ordering
    return {k for k, ok in verdict.items() if ok}


_GRADE_WINDOW = 50


def _rotated(mapping: dict) -> dict:
    graded = _graded_ids()
    # never-graded ids: hand-prioritized picks first, then the rest.
    # r6 tightening: hash-checkable ids beat rows-only ids across the
    # WHOLE never-graded pool (not per-class) — rows-only entries must
    # never occupy a window slot while an oracle-bearing id waits.
    # Within each (oracle?, deferred?) class, GRADE_DEFER list order
    # then registry order decides.
    pri = [k for k in GRADE_ROTATION if k in mapping and k not in graded]
    defer_rank = {k: i for i, k in enumerate(GRADE_DEFER)}
    rest = [
        k
        for k in mapping
        if k not in graded and k not in pri and k not in GRADE_CANARIES
    ]
    pri += sorted(
        rest,
        key=lambda k: (
            k not in registry.ORACLE,  # hash-checkable first
            k in defer_rank,  # fresh backlog before deferred block
            defer_rank.get(k, -1),  # deferred keep their list order
        ),
    )
    # canaries (fixed sentinels + the r11 rotating stratified sample)
    # occupy the window's last slots; overflow queues behind
    rno = _round_no()
    canaries = [k for k in GRADE_CANARIES if k in mapping] + [
        k for k in _rotating_canaries(mapping, rno) if k not in pri
    ]
    cut = max(0, _GRADE_WINDOW - len(canaries))
    # graded ids backfill OLDEST-OFFICIAL-ROW-FIRST (r12 verdict #5:
    # "the oldest stratum"): re-grading stamps a newer round, so the
    # ordering self-rotates — the stalest ids always occupy the free
    # window slots, bounding worst-case official-row age (the r11-r12
    # circular walk bounded it only in expectation)
    last = getattr(_graded_ids, "last_clean", {})
    backfill = sorted(
        (k for k in mapping if k in graded and k not in canaries),
        key=lambda k: (last.get(k, 0), k),
    )
    # r11 advice (low): ungraded overflow (pri[cut:]) must stay AHEAD
    # of the re-grade backfill — backfill last preserves the
    # never-graded-first priority whenever the ungraded pool exceeds
    # the window.
    order = pri[:cut] + canaries + pri[cut:] + [
        k for k in backfill if k not in pri[:cut]
    ]
    seen: set = set()
    order = [k for k in order if not (k in seen or seen.add(k))]
    front = {k: mapping[k] for k in order}
    return {**front, **{k: v for k, v in mapping.items() if k not in front}}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: 5-way star join + hash aggregate
    (TPC-H Q5 shape) — exercises broadcast dims, a fact shuffle join,
    and exact-decimal aggregation in one plan."""
    prepare(spark)
    return registry.QUERIES["join_star_multiway"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checked query;
    stateful/approx/engine-seeded ops are omitted → rows-only check."""
    return _rotated(registry.ORACLE)
