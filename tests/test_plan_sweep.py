"""Global plan sweep: every registered query's physical plan is
checked for scale anti-patterns — a new operator that quietly plans a
CartesianProduct or drops into row-at-a-time Python fails here, not in
production."""

from __future__ import annotations

import pytest

from thrive_spark.plans.checks import physical_plan
from thrive_spark.registry import ORACLE, QUERIES

#: queries allowed to contain each anti-pattern, with why
ALLOWED_CARTESIAN = {
    "join_cross",  # the cross join operator itself (tiny dims)
}
ALLOWED_ROW_PYTHON = {
    "udf_python_scalar",  # the deliberate slow-path exhibit
    "udtf_python_native",  # Spark 4 UDTF API is row-based by design
}
#: Arrow-batched Python is the sanctioned slow path — allowed where the
#: operator is genuinely Python (pandas UDFs, codec stubs, BLAS blocks)
ALLOWED_ARROW_PYTHON = {
    "udf_arrow_scalar",  # Arrow-optimized scalar UDF exhibit
    "udf_pandas_scalar",
    "udf_pandas_iter_model",
    "udf_pandas_grouped_agg",
    "udf_grouped_map_normalize",
    "udtf_explode_words",
    "sim_pairs_threshold",
    "dedup_embedding_cosine",
    "dedup_incremental_embedding",  # rectangular new×corpus BLAS per label block
    "sim_knn_lsh",
    "sim_knn_ivf",
    "sim_knn_pq",
    "sim_knn_ivfpq",  # probe-bounded ADC scan, map-only Arrow pass
    "cluster_topics_kmeans",
    "dedup_semantic_cluster",  # small-regime CC union-find Arrow task (r11)
    "tokenizer_apply_bpe",  # per-doc BPE re-tokenize, map-only Arrow pass
    "multimodal_audio_wav",  # WAV codec encode/decode, map-only Arrow passes
    "sim_mmr_rerank",  # greedy MMR on the shortlist runs in one Arrow batch
    "multimodal_image_ahash",  # pixel-grid hashing over the real decoder
    "multimodal_image_resize",  # NN/bilinear resample kernels, map-only Arrow
    "multimodal_image_jpeg",  # baseline JPEG encode/decode, map-only Arrow
    "multimodal_image_png",  # PNG deflate/inflate roundtrip, map-only Arrow
    "udf_pandas_window_agg",  # pandas UDF over window frames (slow-path exhibit)
    "multimodal_decode_stub",
    "scan_avro_files",  # per-file Avro container decode, map-only Arrow
    "multimodal_frame_sample",
    "join_asof_cogroup",
    # r10: small-regime CC is single-pass union-find in ONE Arrow task
    # (measured edge count under the 2M bound picks it; wide regime
    # stays JVM large-star/small-star)
    "dedup_cluster_components",
    # r16: small-regime pagerank runs the whole damped power iteration
    # in ONE Arrow task (same measured compact_iter_state gate; wide
    # regime keeps the JVM join/aggregate rounds —
    # tests/test_graph_scale.py exercises it)
    "graph_pagerank",
    "text_textrank_keywords",
    # r16: small-regime exact-Lloyd runs the whole ladder in ONE Arrow
    # task (measured lloyd_exact_assign gate, bit-identical to the
    # wide path — tests/test_vectors_single_task.py); wide regime
    # keeps the broadcast-E-step / partial-M-step JVM rounds
    "cluster_kmeans_exact",
    "dedup_semantic_exact",
}
#: stateful/side-effecting queries that build their own inputs (temp
#: dirs, catalogs, DB files) — their plan is built during execution
SKIP = {
    "scan_csv_roundtrip",
    "scan_orc_roundtrip",
    "incremental_dir_scan",
    "sink_parquet_partitioned",
    "scan_partition_pruned",
    "scan_schema_evolution",
    "scan_csv_malformed",
    "join_dynamic_partition_pruning",
    "sink_hive_table",
    "sink_jsonl_shards",
    "sink_jdbc",
    "join_bucketed_colocated",
    "maintenance_compact",
    "mv_incremental_refresh",
}


@pytest.mark.parametrize("qid", sorted(set(QUERIES) - SKIP))
def test_no_scale_antipatterns(qid, qdf):
    plan = physical_plan(qdf(qid))
    if qid not in ALLOWED_CARTESIAN:
        assert "CartesianProduct" not in plan, f"{qid} plans a cartesian product"
    if qid not in ALLOWED_ROW_PYTHON:
        assert "BatchEvalPython" not in plan, f"{qid} uses row-at-a-time Python"
    if qid not in ALLOWED_ROW_PYTHON | ALLOWED_ARROW_PYTHON:
        for marker in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
            assert marker not in plan, f"{qid} unexpectedly drops into Python ({marker})"
    # a higher-order lambda inside a SCAN filter means Catalyst's
    # InferFiltersFromGenerate inlined an array-construction pipeline
    # into the filter (explode over a computed array) — measured
    # O(tokens²)/row; use explode_outer + isNotNull instead
    for line in plan.splitlines():
        if "Scan parquet" in line or "FileScan" in line or "DataFilters" in line:
            assert "lambdafunction" not in line, (
                f"{qid} inlines a lambda pipeline into the scan filter"
            )


def test_every_query_declared_in_oracle_or_rows_only():
    # every query is either hash-checked or a documented rows-only op;
    # ORACLE keys must be a subset of QUERIES
    assert set(ORACLE) <= set(QUERIES)
    assert len(QUERIES) >= 100
