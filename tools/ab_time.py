"""Warm A/B timer for individual queries (optimization-round loop).

Usage: python tools/ab_time.py <id1,id2,...> [sf_dir] [reps]

Same methodology as bench.py (one untimed warm run, then timed reps to
the noop sink, median reported) but scoped to the named ids so an
optimization can be A/B'd in seconds instead of re-running the suite.
A calibration probe (bench.py's agg_hash_groupby, floor 0.25 s at
sf0.1/local[32]) is interleaved after every rep; each query line also
reports the probe-normalized median — the sandbox shares a host and
contention arrives in bursts, so raw medians across two runs are not
comparable without it. Numbers printed here are for the working loop;
the committed artifact numbers come from bench.py.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thrive_spark import registry  # noqa: E402
from thrive_spark.session import get_spark  # noqa: E402

registry.load_all()

PROBE_ID = "agg_hash_groupby"
PROBE_FLOOR_SEC = 0.25


def main() -> None:
    ids = [s for s in sys.argv[1].split(",") if s]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("thrive-ab")
    probe_fn = registry.QUERIES[PROBE_ID]

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    mat(probe_fn(spark, sf_dir))  # probe warm (JIT + page cache)
    for qid in ids:
        fn = registry.QUERIES[qid]
        spark.sparkContext.setJobDescription(f"ab:{qid}")
        mat(fn(spark, sf_dir))  # warm
        samples, probes = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            mat(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            mat(probe_fn(spark, sf_dir))
            probes.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        ratio = statistics.median(probes) / PROBE_FLOOR_SEC
        print(
            f"{qid}: med={med:.3f}s norm={med / max(ratio, 1.0):.3f}s "
            f"probe_ratio={ratio:.2f} min={min(samples):.3f}s "
            f"samples={[round(s, 3) for s in samples]}"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
