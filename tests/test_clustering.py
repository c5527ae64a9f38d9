"""Quality gates for the rows-only k-means topic clustering: the
output must be a complete partition of the corpus, deterministic
across runs, and Lloyd iterations must not increase inertia."""

from __future__ import annotations

import duckdb

from thrive_spark.operators import clustering
from thrive_spark.registry import QUERIES


def _corpus_size(sf_dir):
    con = duckdb.connect()
    [(n,)] = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return n


def test_kmeans_partitions_corpus(spark, sf_dir, qdf):
    out = qdf("cluster_topics_kmeans").toPandas()
    assert out["n_members"].sum() == _corpus_size(sf_dir)
    assert out["cluster_id"].is_unique
    assert (out["n_members"] > 0).all()
    assert (out["inertia_fp"] >= 0).all()


def test_kmeans_deterministic(spark, sf_dir):
    a = QUERIES["cluster_topics_kmeans"](spark, sf_dir).toPandas()
    b = QUERIES["cluster_topics_kmeans"](spark, sf_dir).toPandas()
    assert a.equals(b)


def test_lloyd_iterations_do_not_increase_inertia(spark, sf_dir):
    """Total inertia after 3 Lloyd iterations ≤ inertia at the seeds
    (monotone non-increase is the k-means contract)."""
    from thrive_spark.tables import Tables

    def total_inertia(iters):
        import numpy as np

        t = Tables(spark, sf_dir)
        c = clustering._seed_centroids(t)
        if iters:
            c = clustering._lloyd(t, c, iters=iters)
        x = np.array(
            t.embeddings.toPandas()["embedding"].tolist(), dtype=np.float64
        )
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        sims = x @ c.T
        return float((1.0 - sims.max(axis=1)).sum())

    assert total_inertia(3) <= total_inertia(0) + 1e-9


def test_mllib_kmeans_covers_all_points(spark, sf_dir, qdf):
    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    pdf = qdf("cluster_kmeans_mllib").toPandas()
    total = Tables(spark, sf_dir).embeddings.count()
    assert pdf["n_points"].sum() == total
    assert len(pdf) >= 2, "degenerate single-cluster result"


def test_pagerank_mass_and_positivity(spark, sf_dir, qdf):
    from thrive_spark.registry import QUERIES

    pdf = qdf("graph_pagerank").toPandas()
    assert (pdf["pagerank"] > 0).all()
    # rank mass conserved up to damping leakage + rounding
    assert abs(pdf["pagerank"].sum() - 1.0) < 0.01


def test_textrank_favors_connected_words(spark, sf_dir, qdf):
    from thrive_spark.registry import QUERIES

    pdf = qdf("text_textrank_keywords").toPandas()
    assert len(pdf) == 25
    assert (pdf["textrank"] > 0).all()
    # the corpus' ubiquitous vocabulary must dominate the top ranks
    top = set(pdf["word"][:10])
    assert top & {"scan", "column", "window", "order", "sort", "join",
                  "value", "key", "query", "group", "a", "part", "line",
                  "agg", "merge"}, top


def test_kmeans_single_task_matches_wide_path(spark, sf_dir, monkeypatch):
    """The r16 single-task fast path (seed + Lloyd + assign in one
    Arrow task) must be bit-identical to the multi-job wide path —
    same seeds, same centroid update order, same assignment."""
    fast = QUERIES["cluster_topics_kmeans"](spark, sf_dir).toPandas()
    monkeypatch.setattr(clustering, "_KMEANS_SINGLE_TASK_MAX_ROWS", 0)
    wide = QUERIES["cluster_topics_kmeans"](spark, sf_dir).toPandas()
    assert fast.equals(wide)
