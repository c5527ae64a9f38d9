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


def test_ivf_recall_vs_exact(spark, sf_dir, qdf):
    exact = qdf("sim_knn_cosine_topk").toPandas()
    approx = qdf("sim_knn_ivf").toPandas()
    recall = _recall(exact, approx)
    # r13 tuned: 4/32 cells probed (~12.5% candidate fraction),
    # measured 0.74-0.80 across sf0.001/0.01/0.1 — gate at measured
    # floor minus margin
    assert recall >= 0.6, f"IVF recall@5 = {recall:.3f}"
    assert approx.groupby("query_id").size().min() >= 1


def test_lsh_recall_vs_exact(spark, sf_dir, qdf):
    exact = qdf("sim_knn_cosine_topk").toPandas()
    approx = qdf("sim_knn_lsh").toPandas()
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
    # r13 tuned: 8 tables x 10 planes, radius-2 multiprobe; measured
    # 0.77/0.80/0.83 at sf0.001/0.01/0.1 — gate at floor minus margin.
    # (Single-table radius-2 measured 0.26-0.38 on these
    # structure-free random vectors.)
    assert recall >= 0.6, f"recall@5 = {recall:.3f}"
    # every query returns some neighbors
    assert approx.groupby("query_id").size().min() >= 1


def test_pq_recall_vs_exact(spark, sf_dir, qdf):
    """PQ + ADC + exact rerank, r13 tuned: 16 4-dim subspaces +
    100-candidate exact rerank measured recall@5 = 1.00/1.00/0.89 at
    sf0.001/0.01/0.1 (5% rerank fraction at sf0.1) — the index family
    that clears 0.8 under a 10% candidate budget on this corpus."""
    exact = qdf("sim_knn_cosine_topk").toPandas()
    approx = qdf("sim_knn_pq").toPandas()
    recall = _recall(exact, approx)
    assert recall >= 0.75, f"PQ recall@5 = {recall:.3f}"
    assert approx.groupby("query_id").size().min() >= 1


def test_semantic_dedup_matches_bruteforce(spark, sf_dir, qdf):
    """r11 component semantics: within each of the operator's own
    cells, every τ-connected component must collapse to its min-vec_id
    keeper — rebuilt here with a brute-force numpy gram matrix +
    union-find, independent of the Spark/SQL machinery."""
    import numpy as np

    from thrive_spark.operators.dedup_extra import SEMC_TAU
    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    out = qdf("dedup_semantic_cluster").toPandas()
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding").toPandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    m = np.array(emb["embedding"].tolist(), dtype=np.float64)
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    keep_rows = nrm[:, 0] > 0  # op excludes zero-norm vectors
    emb, m = emb[keep_rows].reset_index(drop=True), m[keep_rows] / nrm[keep_rows]
    vid = emb["vec_id"].to_numpy()

    assert len(out) == len(emb)
    assert out["kept"].sum() >= 1
    assert (~out["kept"]).sum() >= 1, "prune verdicts must be non-vacuous"
    pos = {v: i for i, v in enumerate(vid)}
    for cell, grp in out.groupby("cell"):
        grp = grp.sort_values("vec_id").reset_index(drop=True)
        rows = [pos[v] for v in grp["vec_id"]]
        sims = m[rows] @ m[rows].T
        ids = grp["vec_id"].to_numpy()
        root = {int(v): int(v) for v in ids}

        def find(x):
            while root[x] != x:
                root[x] = root[root[x]]
                x = root[x]
            return x

        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] > SEMC_TAU:
                    ri, rj = find(int(ids[i])), find(int(ids[j]))
                    if ri != rj:
                        root[max(ri, rj)] = min(ri, rj)
        want_kept = [find(int(v)) == int(v) for v in ids]
        want_dup = [-1 if k else find(int(v)) for v, k in zip(ids, want_kept)]
        assert list(grp["kept"]) == want_kept, f"cell {cell} kept mismatch"
        assert list(grp["dup_of"]) == want_dup, f"cell {cell} dup_of mismatch"


def test_maxsim_matches_numpy(spark, sf_dir, qdf):
    import numpy as np

    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    got = qdf("sim_maxsim_multivector").toPandas()
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding").toPandas()
    m = np.array(emb["embedding"].tolist(), dtype=np.float64).reshape(
        len(emb), 8, 8
    )
    pos = {v: i for i, v in enumerate(emb["vec_id"])}
    q = m[pos[7]]  # (8, 8)
    sims = np.einsum("nij,qj->nqi", m, q).max(axis=2).sum(axis=1)
    want = sorted(
        zip(np.floor(sims * 10000 + 0.5).astype("int64"), emb["vec_id"]),
        key=lambda t_: (-t_[0], t_[1]),
    )[:10]
    got_pairs = list(zip(got["maxsim_fp"], got["vec_id"]))
    assert [(int(a), int(b)) for a, b in got_pairs] == [
        (int(a), int(b)) for a, b in want
    ]


def test_mllib_minhash_agrees_with_handrolled(spark, sf_dir, qdf):
    """The MLlib MinHashLSH variant must recover most of the
    hand-rolled band-join's verified near-dup pairs (same shingle
    space, library hashes)."""
    from thrive_spark.registry import QUERIES

    hand = {
        (int(r.doc_a), int(r.doc_b))
        for r in qdf("dedup_fuzzy_minhash").collect()
    }
    lib = {
        (int(r.doc_a), int(r.doc_b))
        for r in qdf("dedup_minhash_mllib").collect()
    }
    assert hand, "hand-rolled twin found no pairs — vacuous test"
    recall = len(hand & lib) / len(hand)
    assert recall >= 0.7, f"MLlib minhash recall vs hand-rolled: {recall}"


def test_mllib_brp_recall_vs_exact(spark, sf_dir, qdf):
    """BRP-LSH top-5 on unit vectors must recover most of the exact
    cosine top-5 (euclidean order == cosine order on unit vectors)."""
    from thrive_spark.registry import QUERIES

    exact = {
        (int(r.query_id), int(r.neighbor_id))
        for r in qdf("sim_knn_cosine_topk").collect()
    }
    approx = {
        (int(r.query_id), int(r.neighbor_id))
        for r in qdf("sim_knn_mllib_brp").collect()
    }
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"BRP recall vs exact: {recall}"


def test_mmr_diversifies_over_topk(spark, sf_dir, qdf):
    """MMR's picks must be less mutually similar than the plain top-10
    (and still share the single most-relevant item)."""
    import numpy as np

    from pyspark.sql import functions as F
    from thrive_spark.functions.vectors import to_double
    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    t = Tables(spark, sf_dir)
    mmr = qdf("sim_mmr_rerank").toPandas()
    assert len(mmr) == 10 and mmr["rank"].tolist() == list(range(1, 11))

    emb = {
        int(r.vec_id): np.array(r.e)
        for r in t.embeddings.select(
            "vec_id", to_double("embedding").alias("e")
        ).collect()
    }

    def mean_pairwise(ids):
        vs = [emb[i] / np.linalg.norm(emb[i]) for i in ids]
        sims = [
            float(a @ b) for i, a in enumerate(vs) for b in vs[i + 1 :]
        ]
        return sum(sims) / len(sims)

    top10 = (
        qdf("sim_knn_cosine_topk")
        .filter(F.col("query_id") == 0)
        .orderBy("rn")
        .toPandas()["neighbor_id"][:10]
        .tolist()
    )
    # the exact top-k query returns 5; rebuild a plain top-10 list
    q0 = emb[0] / np.linalg.norm(emb[0])
    ranked = sorted(
        (i for i in emb if i != 0),
        key=lambda i: (-float(q0 @ (emb[i] / np.linalg.norm(emb[i]))), i),
    )[:10]
    assert mean_pairwise(mmr["vec_id"].tolist()) < mean_pairwise(ranked)
    assert mmr.iloc[0]["vec_id"] == ranked[0]


def test_ann_recall_gates_hold_at_sf01(spark):
    """r12 verdict #3 'Done' criterion: the tuned gates hold at sf0.1
    too (2000 vectors — 4× the default test corpus), not just at the
    small fixture SF. One exact run amortized over all three indexes."""
    import os

    sf01 = "/root/testdata/sf0.1"
    if not os.path.isdir(sf01):
        import pytest

        pytest.skip("sf0.1 testdata not present")
    exact = QUERIES["sim_knn_cosine_topk"](spark, sf01).toPandas()
    for qid, gate in (
        ("sim_knn_lsh", 0.6),
        ("sim_knn_ivf", 0.6),
        ("sim_knn_pq", 0.75),
    ):
        approx = QUERIES[qid](spark, sf01).toPandas()
        recall = _recall(exact, approx)
        assert recall >= gate, f"{qid} recall@5 = {recall:.3f} at sf0.1"


def test_ivfpq_recall_vs_exact(spark, sf_dir, qdf):
    """Composed IVF-PQ (FAISS IVFADC shape): recall is capped by the
    IVF candidate stage (measured 0.80/0.74/0.73 at sf0.001/0.01/0.1)
    while BOTH the ADC scan and the exact rerank stay probe-bounded."""
    exact = qdf("sim_knn_cosine_topk").toPandas()
    approx = qdf("sim_knn_ivfpq").toPandas()
    recall = _recall(exact, approx)
    assert recall >= 0.6, f"IVFPQ recall@5 = {recall:.3f}"
    assert approx.groupby("query_id").size().min() >= 1
