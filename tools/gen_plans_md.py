"""Generate PLANS.md: the formatted physical plan of every headline
query, trimmed to the lines that matter for the 100 TB story — join
strategies, exchanges, aggregate modes, pushed filters, read schemas.

Usage: python tools/gen_plans_md.py > PLANS.md   (sf0.01 by default)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thrive_spark import registry  # noqa: E402
from thrive_spark.session import get_spark  # noqa: E402

registry.load_all()

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

#: headline queries + the TPC-H suite — the plans a reviewer would ask for
IDS = [
    "agg_hash_groupby",
    "join_star_multiway",
    "join_inner_shuffle",
    "join_theta_band",
    "win_row_number_topn",
    "topk_global",
    "dedup_fuzzy_minhash",
    "sim_pairs_threshold",
    "text_tfidf_topterms",
    "merge_upsert_cdc",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q8",
    "tpch_q18",
    "tpch_q21",
    "maintenance_zorder",
    "pack_sequences_greedy",
    "dq_expectations",
    "cluster_topics_kmeans",
    "text_bm25_topk",
    "basket_brand_affinity",
    "join_bloom_prefilter",
    "merge_scd2_dimension",
    "win_max_drawdown",
    "tpch_q2_adapted",
    "tpch_q9_adapted",
    "dedup_shingle_containment",
    "dedup_incremental_minhash",
    "dedup_incremental_embedding",
    "split_dedup_safe",
    "dedup_exact_substring",
    "graph_jaccard_neighbors",
    "ts_ohlc_bars",
    "sql_window_qualify",
]

KEEP = re.compile(
    r"\b(Scan|Filter|Project|HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"Exchange|Sort\b|SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct|TakeOrderedAndProject|"
    r"GlobalLimit|LocalLimit|Window|Expand|Generate|WholeStageCodegen|"
    r"AdaptiveSparkPlan|BroadcastExchange|AQEShuffleRead|InMemory|"
    r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|BatchEvalPython)")
DETAIL = re.compile(r"(PushedFilters: \[[^\]]*\]|ReadSchema: [^,]+)")


def trimmed_plan(df) -> str:
    full = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree, _, details = full.partition("\n\n")
    out = [ln for ln in tree.split("\n") if KEEP.search(ln)]
    # pull pushdown/schema facts out of the details section
    for m in DETAIL.finditer(details):
        txt = m.group(1)
        if len(txt) > 180:
            txt = txt[:177] + "..."
        if txt not in out:
            out.append(txt)
    return "\n".join(out)


def main() -> None:
    spark = get_spark("gen-plans", shuffle_partitions=8)
    print("# PLANS — physical plans of the headline queries (generated)")
    print()
    print(f"`tools/gen_plans_md.py` at `{SF_DIR}`; trimmed to the")
    print("operators that decide scale behavior. Full `explain('formatted')`")
    print("available by running any query; shapes are also asserted in")
    print("tests/test_plans.py and tests/test_plan_sweep.py.")
    for qid in IDS:
        df = registry.QUERIES[qid](spark, SF_DIR)
        print(f"\n## {qid}\n")
        print("```")
        print(trimmed_plan(df))
        print("```")


if __name__ == "__main__":
    main()
