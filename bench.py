"""Benchmark harness: headline queries at sf0.1 (BASELINE.md method).

Runs each headline query twice on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and reports the
WARM time (second run), excluding the one-time session startup —
mirroring BASELINE.md. Materialization is the noop sink so the full
plan executes (count() would let Catalyst prune the compute).

Prints ONE JSON line:
  {"metric": "suite_warm_sec", "value": N, "unit": "sec",
   "queries": {id: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from thrive_spark import registry  # noqa: E402
from thrive_spark.session import get_spark  # noqa: E402

registry.load_all()

HEADLINE = [
    "agg_hash_groupby",      # TPC-H Q1 shape
    "join_star_multiway",    # 5-way star (Q5 shape)
    "join_inner_shuffle",    # fact-fact SMJ
    "agg_count_distinct",
    "agg_rollup",
    "win_row_number_topn",
    "stream_session_window", # sessionization
    "sim_pairs_threshold",   # blocked cosine pair scan
    "text_tfidf_topterms",
    "dedup_fuzzy_minhash",   # MinHash LSH end-to-end
    "chunk_fixed_tokens",    # curation: context-window packing
    "resample_gapfill",      # time-series densify + ffill
    "merge_upsert_cdc",      # CDC snapshot merge
    "funnel_conversion",     # event-sequence analytics
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("thrive-bench")

    times: dict[str, float] = {}
    for qid in HEADLINE:
        fn = registry.QUERIES[qid]
        materialize(fn(spark, sf_dir))  # warm: codegen + page cache
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        times[qid] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "suite_warm_sec",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
