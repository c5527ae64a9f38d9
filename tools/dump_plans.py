"""Dump full .explain("formatted") output for named queries.

Usage: python tools/dump_plans.py <suffix> <id1,id2,...> [sf_dir]

Writes plans/$PLANS_ROUND/<id>_<suffix>.txt for each id (full
formatted plan, untrimmed — the judge checks optimization claims
against these files). PLANS_ROUND defaults to r17.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thrive_spark import registry  # noqa: E402
from thrive_spark.session import get_spark  # noqa: E402

registry.load_all()


def main() -> None:
    suffix = sys.argv[1]
    ids = [s for s in sys.argv[2].split(",") if s]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r17"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("thrive-plan-dump")
    for qid in ids:
        try:
            df = registry.QUERIES[qid](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"ERROR building plan: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{qid}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
