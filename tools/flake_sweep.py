"""Flake sweep for boundary-cut operators (r16, from the r13
`agg_percentile_sketch_portable` failure class): any op that cuts an
ORDERED set at a rank boundary (KMV/bottom-k sketches, samplers,
top-k) is run-nondeterministic if tied rows straddle the cut — one
driver_check pass proves little (CLAUDE.md r14: run boundary-cut ops
3-4x). This tool re-runs the driver simulation REPS times over the
tie-prone subset and demands an IDENTICAL per-query verdict map every
run.

Usage: python tools/flake_sweep.py [sf_dir] [prefixes] [reps]
Exit 0 = every run green and identical; 1 = a run failed;
2 = verdicts flapped between runs (the flake signature).
"""

from __future__ import annotations

import re
import subprocess
import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
#: default subset: every op whose kept set is an ordered cut
PREFIXES = sys.argv[2] if len(sys.argv) > 2 else (
    "agg_percentile_sketch,agg_percentile_exact,sample_,quota_sample,"
    "topk_,win_row_number,win_ntile,sim_knn_cosine_topk,text_bm25_topk"
)
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def one_run() -> tuple[int, dict[str, str]]:
    p = subprocess.run(
        [sys.executable, "tools/driver_check.py", SF, PREFIXES],
        capture_output=True, text=True, cwd="/root/repo",
    )
    verdicts: dict[str, str] = {}
    for line in p.stdout.splitlines():
        m = re.match(r"(ok|rows|FAIL)\s+(\S+?):", line)
        if m:
            verdicts[m.group(2)] = m.group(1)
    return p.returncode, verdicts


def main() -> int:
    base: dict[str, str] | None = None
    for i in range(REPS):
        rc, v = one_run()
        n_ok = sum(1 for s in v.values() if s == "ok")
        print(f"run {i + 1}/{REPS}: rc={rc}, {n_ok} ok / {len(v)} run")
        bad = sorted(k for k, s in v.items() if s == "FAIL")
        if bad:
            print("  FAILED:", ", ".join(bad))
        if base is None:
            base = v
        elif v != base:
            diff = {
                k: (base.get(k), v.get(k))
                for k in set(base) | set(v)
                if base.get(k) != v.get(k)
            }
            print(f"FLAKE: verdicts changed across runs: {diff}")
            return 2
        if rc:
            return 1
    assert base is not None
    print(f"stable: {len(base)} queries x {REPS} runs identical")
    return 0


if __name__ == "__main__":
    sys.exit(main())
