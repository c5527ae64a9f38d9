"""ANN quality gate: LSH multiprobe recall@5 against the exact
operator. Random 64-dim embeddings are a worst case for LSH (no
cluster structure), so the bar is calibrated, not aspirational."""

from __future__ import annotations

from thrive_spark.registry import QUERIES


def _recall(exact, approx):
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    assert len(e) > 0
    return len(e & a) / len(e)


def test_ivf_recall_vs_exact(spark, sf_dir):
    exact = QUERIES["sim_knn_cosine_topk"](spark, sf_dir).toPandas()
    approx = QUERIES["sim_knn_ivf"](spark, sf_dir).toPandas()
    recall = _recall(exact, approx)
    # 4/16 cells probed; adaptive cells beat LSH's fixed hyperplanes
    assert recall >= 0.2, f"IVF recall@5 = {recall:.3f}"
    assert approx.groupby("query_id").size().min() >= 1


def test_lsh_recall_vs_exact(spark, sf_dir):
    exact = QUERIES["sim_knn_cosine_topk"](spark, sf_dir).toPandas()
    approx = QUERIES["sim_knn_lsh"](spark, sf_dir).toPandas()
    e = {
        (r.query_id, r.neighbor_id)
        for r in exact.itertuples()
    }
    a = {
        (r.query_id, r.neighbor_id)
        for r in approx.itertuples()
    }
    assert len(e) > 0
    recall = len(e & a) / len(e)
    # 9/256 cells probed on structure-free random vectors; measured
    # ~0.3-0.5 at sf0.001-0.01. The gate catches a broken index
    # (recall ≈ probe fraction ≈ 0.035), not a tuned one.
    assert recall >= 0.15, f"recall@5 = {recall:.3f}"
    # every query returns some neighbors
    assert approx.groupby("query_id").size().min() >= 1


def test_pq_recall_vs_exact(spark, sf_dir):
    """PQ + ADC + exact rerank: distortion from 4-bit codes is modest
    even on structure-free random vectors (measured 0.76 at sf0.01);
    the gate catches a broken codebook/LUT, not a tuned index."""
    exact = QUERIES["sim_knn_cosine_topk"](spark, sf_dir).toPandas()
    approx = QUERIES["sim_knn_pq"](spark, sf_dir).toPandas()
    recall = _recall(exact, approx)
    assert recall >= 0.4, f"PQ recall@5 = {recall:.3f}"
    assert approx.groupby("query_id").size().min() >= 1
