"""Equality gate for the r16 single-task exact-Lloyd regime: when the
measured row count picks the one-Arrow-task ladder
(vectors._lloyd_assign_single_task), every consumer's output must be
bit-identical to the multi-job wide path — same init, same packed
argmin, same fixed-point M-step means, same memberless-cell drops."""

from __future__ import annotations

import pytest

from thrive_spark.operators import vectors
from thrive_spark.registry import QUERIES


@pytest.mark.parametrize(
    "qid",
    ["cluster_kmeans_exact", "dedup_semantic_exact", "dedup_semantic_cluster"],
)
def test_lloyd_single_task_matches_wide_path(qid, spark, sf_dir, monkeypatch):
    fast = QUERIES[qid](spark, sf_dir).toPandas()
    monkeypatch.setattr(vectors, "LLOYD_SINGLE_TASK_MAX_ROWS", 0)
    wide = QUERIES[qid](spark, sf_dir).toPandas()
    cols = list(fast.columns)
    assert cols == list(wide.columns)
    f = fast.sort_values(cols).reset_index(drop=True)
    w = wide.sort_values(cols).reset_index(drop=True)
    assert f.equals(w), f"{qid}: single-task output diverges from wide path"
