"""Generate BENCH_FULL.md: ONE warm run of EVERY registered query at
sf0.1, slowest first — the per-operator cost census behind bench.py's
curated headline suite. Single runs (not medians): this artifact is
for spotting order-of-magnitude outliers and regressions, not for
anchor comparisons — bench.py owns those.

Usage: python tools/gen_bench_full_md.py > BENCH_FULL.md   (~5 min)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from thrive_spark import registry  # noqa: E402
from thrive_spark.session import get_spark  # noqa: E402

registry.load_all()

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _calibrate(spark) -> str:
    """Same contention probe as bench.py (r10): time the pinned
    agg_hash_groupby floor so a noisy box is stamped INTO the
    artifact instead of silently inflating the census (the r8/r9
    lesson; BENCH_FULL is single-run and thus even more exposed)."""
    if not SF_DIR.rstrip("/").endswith("sf0.1"):
        return "skipped (non-default sf)", 0.0
    fn = registry.QUERIES["agg_hash_groupby"]
    floor, slack = 0.25, 1.15
    # r13: min of 10 steady-state samples — the old min-of-3 right
    # after session start measured JIT warmup, not contention (0.45 s
    # "CONTENDED" on an idle box whose bench.py probe read 0.23)
    samples = []
    for _ in range(10):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    measured = min(samples)
    status = "ok" if measured <= floor * slack else "CONTENDED"
    return (
        f"{status} (probe agg_hash_groupby min {measured:.3f} s vs"
        f" {floor:.2f} s quiet-box floor)",
        measured,
    )


def main() -> None:
    spark = get_spark("bench-full")
    rows, errors = [], []
    # JIT warm: a couple of representative shapes before timing
    for qid in ("agg_hash_groupby", "join_star_multiway", "win_row_number_topn"):
        try:
            registry.QUERIES[qid](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            pass
    pre_probe = _calibrate(spark)
    for qid in sorted(registry.QUERIES):
        # best-of-2 (r13): a single-run census is exposed to one-off
        # GC/page-cache spikes — run 3 of the r13 refresh inflated an
        # entire alphabetic block 5-8x while both probes read quiet
        best = None
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                registry.QUERIES[qid](spark, SF_DIR).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rows.append((round(best, 2), qid))
        except Exception as exc:  # noqa: BLE001
            errors.append((qid, f"{type(exc).__name__}: {exc}"[:120]))
    print("# BENCH_FULL — warm runtime of every query at sf0.1 (generated)")
    print()
    print(f"`tools/gen_bench_full_md.py` at `{SF_DIR}`; best of 2 warm runs,")
    print("slowest first. For median/min anchored numbers see bench.py.")
    print()
    # probe BOTH sides of the census and report the quieter reading:
    # a probe at the quiet-box floor on either side proves the box
    # could hit it; the pre-probe alone measured JIT warmup (r13)
    post_text, post_t = _calibrate(spark)
    pre_text, pre_t = pre_probe
    calibration = pre_text if pre_t <= post_t else post_text
    print(f"{len(rows)} queries ran, {len(errors)} errored,")
    print(f"total {round(sum(r[0] for r in rows), 1)} s.")
    print(
        f"Calibration: {calibration} "
        f"[pre-census min {pre_t:.3f} s, post-census min {post_t:.3f} s]."
    )
    print()
    print("| sec | query |")
    print("|---|---|")
    for sec, qid in sorted(rows, reverse=True):
        print(f"| {sec:.2f} | `{qid}` |")
    if errors:
        print("\n## Errors\n")
        for qid, err in errors:
            print(f"- `{qid}`: {err}")


if __name__ == "__main__":
    main()
