"""Benchmark harness: headline queries at sf0.1 (BASELINE.md method).

Runs each headline query on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1): one untimed warm-up
(codegen + page cache), then FIVE timed repetitions, reporting the
per-query MEDIAN — one run can't distinguish machine noise from a plan
regression (the r1→r2 uniform ~23% drift proved that). A `variance`
field carries each query's (max-min)/median rel spread so drift is
visible in the artifact. Materialization is the noop sink so the full
plan executes (count() would let Catalyst prune the compute).

A calibration probe is interleaved after every query (see PROBE_*
below); the headline `queries`/`value` are always RAW measurements.
When the probe's median says the box is contended, the inflation ratio
is stamped in `calibration` together with modeled steady-state values
(`calibration.queries_normalized`) as a secondary field — measurements
are never replaced by model output (r11 advice).

Prints the full JSON line (queries + variance + min + errors), then a
COMPACT recap line LAST: the driver archives only the final ~2000
chars of stdout, and in r5 the full line alone overflowed that window
so the suite total fell off the front of the artifact.  The recap
carries the contract fields ({"metric", "value", "unit", "queries",
"reps", "sf"}) and is sized to always survive the tail capture.
"""

from __future__ import annotations

import json
import os
import statistics
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
    "text_repetition_score", # map-only Gopher repetition gates (r3)
    "decontaminate_ngram_overlap",  # eval-set overlap check (r3)
    "text_perplexity_bigram",  # corpus-trained LM quality filter (r4)
    "cluster_topics_kmeans",   # iterative Lloyd contraction (r4)
    "tpch_q1",                 # canonical scan-bound aggregate (r4)
    "tpch_q5",                 # canonical broadcast-star join (r4)
    "pack_sequences_greedy",   # training-sequence packing (r4)
    "text_bm25_topk",          # shuffle-free keyword retrieval (r5)
    "basket_brand_affinity",   # market-basket pair mining (r5)
    "ts_anomaly_zscore",       # windowed anomaly detection (r5)
    "dedup_exact_substring",   # ExactSubstr overlap scan (r7)
    "ts_ohlc_bars",            # arg_min/max candle rollup (r7)
    # r10 additions: the suite total is NOT comparable to BENCH_r09 and
    # earlier (26 -> 28 queries); compare per-query.
    "dedup_incremental_minhash",  # corpus-probe ingest dedup (r10)
    "split_dedup_safe",        # leakage-safe split manifest (r10)
    # r14 addition (verdict #9): lakehouse interop gets a tracked warm
    # number — suite total not comparable to BENCH_r13 (29 -> 30).
    "scan_delta_log_table",    # Delta log fold + 3-version time travel
    # r15 addition (r14 verdict #8): the approximate-retrieval path
    # gets a tracked warm number so candidate-fraction regressions
    # show up as wall-time — suite total not comparable to BENCH_r14
    # (30 -> 31).
    "sim_knn_ivfpq",           # PQ-with-rerank ANN top-k
    # r17 additions (additive only, per the driver contract; suite
    # total not comparable to BENCH_r16, 31 -> 33): the two ops whose
    # verify/aggregate shapes were restructured this round get tracked
    # warm numbers so regressions in the bitmask regime / the split
    # sketch aggregate show up as wall-time.
    "dedup_ngram_jaccard",     # prefix-filter + bitmask verify dedup
    "agg_hll_precision_sweep",  # exact-vs-HLL calibration sweep
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Calibration probe (r8 item 2 / r9 item 3 / r10 What's-wrong #1):
# BENCH_r07/r08/r10 were silently inflated ~1.1-1.6× by box contention —
# every query drifted near-uniformly on byte-identical code. The r10
# version measured ONE probe ONCE before the suite and green-lit a run
# whose in-suite numbers were ×1.24 over floor: a single pre-suite
# sample cannot see contention that arrives (or persists) DURING the
# suite. Fix: interleave one probe sample after EVERY headline query and
# stamp the full distribution. The contention estimate is the MEDIAN
# interleaved ratio — it tracks the same minutes the suite numbers were
# recorded in. When that median exceeds PROBE_SLACK× the floor, the
# artifact stamps status=contended + the ratio and attaches modeled
# steady-state values in `calibration.queries_normalized`; the headline
# numbers stay raw measurements. Floor = the probe's min on the cleanest
# recorded run (BENCH_r09: agg_hash_groupby min 0.25 s at
# sf0.1/local[32]); only meaningful at the default sf.
PROBE_ID = "agg_hash_groupby"
PROBE_FLOOR_SEC = 0.25
PROBE_SLACK = 1.15


def probe_once(spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    materialize(registry.QUERIES[PROBE_ID](spark, sf_dir))
    return time.perf_counter() - t0


def summarize_calibration(samples: list[float], default_sf: bool) -> dict:
    cal: dict = {
        "probe": PROBE_ID,
        "floor_sec": PROBE_FLOOR_SEC,
        "samples_sec": [round(s, 3) for s in samples],
    }
    if not default_sf:
        cal["status"] = "skipped_nondefault_sf"
        return cal
    med = statistics.median(samples)
    ratio = med / PROBE_FLOOR_SEC
    cal.update(
        {
            "median_sec": round(med, 3),
            "min_sec": round(min(samples), 3),
            "max_sec": round(max(samples), 3),
            "ratio": round(ratio, 3),
            "status": "ok" if ratio <= PROBE_SLACK else "contended",
        }
    )
    return cal


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("thrive-bench")

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    times: dict[str, float] = {}
    best: dict[str, float] = {}
    spread: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Global JIT warm pass: one untimed run of every headline query
    # BEFORE any timing. A per-query warmup alone leaves the first
    # queries in the list paying JVM JIT compilation inside their
    # timed reps (measured: the list head ran 1.6× its steady-state
    # until the JIT caught up mid-suite).
    for qid in HEADLINE:
        try:
            materialize(registry.QUERIES[qid](spark, sf_dir))
        except Exception:  # noqa: BLE001 — the timed loop reports it
            pass

    # Probe warm-up AFTER the global warm pass: a cold-JVM probe reads
    # ~10-20% high even with its own warmups and would false-flag quiet
    # boxes. Then one interleaved probe sample after EVERY query so the
    # calibration distribution covers the same wall-clock minutes the
    # suite numbers were recorded in (see PROBE_* comment above).
    default_sf = sf_dir.rstrip("/").endswith("sf0.1")
    probe_once(spark, sf_dir)  # untimed probe warm
    probe_samples = [probe_once(spark, sf_dir)]

    for qid in HEADLINE:
        # Per-query isolation: one broken query must degrade to an
        # `errors` entry, not blank the whole artifact (BENCH_r03 was
        # lost to a single AnalysisException escaping the loop).
        try:
            fn = registry.QUERIES[qid]
            materialize(fn(spark, sf_dir))  # warm: codegen + page cache
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            errors[qid] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        med = statistics.median(samples)
        times[qid] = round(med, 3)
        best[qid] = round(min(samples), 3)
        spread[qid] = round((max(samples) - min(samples)) / med, 3) if med else 0.0
        if qid != PROBE_ID:  # the probe query's own reps already cover it
            probe_samples.append(probe_once(spark, sf_dir))

    calibration = summarize_calibration(probe_samples, default_sf)
    # The headline `queries`/`value` are ALWAYS raw measurements (r11
    # advice): the probe is one CPU-bound groupby, so dividing
    # shuffle/IO-heavy queries by its inflation ratio publishes modeled
    # numbers that can read systematically optimistic — and the recap
    # line (the part guaranteed to survive the driver's 2000-char tail)
    # would then carry no measurement at all. Under contention we stamp
    # the ratio and attach MODELED steady-state values as a clearly
    # secondary field instead of replacing the measurements.
    if calibration.get("status") == "contended":
        infl = calibration["ratio"]
        calibration["queries_normalized"] = {
            q: round(t / infl, 3) for q, t in times.items()
        }

    total = round(sum(times.values()), 3)
    # Both stdout lines derive from ONE dict so the contract fields can
    # never drift; the recap carries "recap": true so a consumer that
    # scans every line cannot double-count the suite total.
    headline = {
        "metric": "suite_warm_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "reps": reps,
        "sf": sf,
        "calibration": calibration,
    }
    print(
        json.dumps(
            {
                **headline,
                "variance": spread,
                "min": best,
                "errors": errors,
            }
        )
    )
    # Compact recap LAST (see module docstring): contract fields only,
    # no variance/min/errors payload, so the driver's 2000-char tail
    # always ends with one complete parseable headline line.
    # r17 (VERDICT r16 "what's wrong" #5): the recap's calibration
    # drops the 31-sample list and the modeled queries_normalized map
    # (~1.1k chars under contention) — BENCH_r15's recap was truncated
    # by exactly this payload and nulled a whole round's PERF
    # comparison. The FULL line above keeps both; the recap keeps the
    # contract fields plus the calibration summary (ratio/status).
    recap_cal = {
        k: v
        for k, v in calibration.items()
        if k not in ("samples_sec", "queries_normalized")
    }
    print(
        json.dumps(
            {
                **headline,
                "calibration": recap_cal,
                "recap": True,
                "n_errors": len(errors),
            }
        )
    )


if __name__ == "__main__":
    main()
