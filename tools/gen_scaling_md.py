"""Generate SCALING.md: headline-query runtimes across the three
testdata scales plus the implied scaling factor — the local-mode
evidence for the 100 TB story (linear-or-better data scaling means the
plan has no super-linear term; flat times mean fixed overhead still
dominates and the operator has headroom).

Usage: python tools/gen_scaling_md.py > SCALING.md   (~3 min)
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from thrive_spark import registry  # noqa: E402
from thrive_spark.session import get_spark  # noqa: E402

registry.load_all()

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

IDS = [
    "agg_hash_groupby",
    "tpch_q1",
    "tpch_q5",
    "tpch_q18",
    "join_inner_shuffle",
    "join_star_multiway",
    "win_row_number_topn",
    "stream_session_window",
    "dedup_exact_hash",
    "dedup_fuzzy_minhash",
    "sim_pairs_threshold",
    "text_tfidf_topterms",
    "pack_sequences_greedy",
    "cluster_topics_kmeans",
    "merge_upsert_cdc",
    "resample_gapfill",
    "text_bm25_topk",
    "basket_brand_affinity",
    "ts_anomaly_zscore",
    "merge_scd2_dimension",
    "dedup_shingle_containment",
    "dedup_cluster_components",
    "dedup_incremental_minhash",
    "dedup_incremental_embedding",
    "dedup_incremental_bucketed",
    "split_dedup_safe",
    "dedup_exact_substring",
    "ts_ohlc_bars",
    "graph_jaccard_neighbors",
    "analytics_cohort_ltv",
]


def timed(fn, spark, sf, reps=3) -> float:
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    spark = get_spark("gen-scaling")
    print("# SCALING — measured data-scaling of the headline queries")
    print()
    print("Median of 3 warm runs per scale (`tools/gen_scaling_md.py`,")
    print(f"local mode). ×10 data per step; `t(sf0.1)/t(sf0.01)` is the")
    print("large-step scaling factor — ≤1 means overhead-dominated")
    print("(headroom), ~10 means compute-bound linear, >10 would flag a")
    print("super-linear term (none here by design: no all-pairs scans,")
    print("no broadcast of growing sides).")
    print()
    print("| query | sf0.001 | sf0.01 | sf0.1 | ×10 factor |")
    print("|---|---|---|---|---|")
    for qid in IDS:
        fn = registry.QUERIES[qid]
        row = [timed(fn, spark, sf) for sf in SFS]
        factor = round(row[2] / row[1], 2) if row[1] else float("nan")
        print(f"| `{qid}` | {row[0]} | {row[1]} | {row[2]} | {factor} |")


if __name__ == "__main__":
    main()
