"""Product-quantization ANN — the memory-bound scale path next to the
LSH (ann.py) and IVF (ivf.py) indexes (task brief: similarity search
family).

PQ splits each unit vector into M subspaces and replaces each subspace
slice with the id of its nearest codeword from a per-subspace codebook
(M bytes per vector instead of dim×4).  Query scoring is ADC
(asymmetric distance computation): the query precomputes a lookup
table of its dot product with every codeword, and each candidate's
approximate similarity is M table lookups — no float math per
candidate.  At 100 TB this is the index you can actually hold: codes
are ~8 bytes/vector (16 GB per 2B vectors), scanned sequentially at
memory bandwidth, while exact vectors stay in parquet for the final
rerank of a tiny candidate set.

Spark shape: codebooks are trained on the deterministic 256-row
driver sample (bounded metadata, ivf.py precedent) and broadcast in
the task closure; encoding + ADC scoring is ONE `mapInPandas` pass
that emits only each batch's top-CAND candidates per query (per-batch
pruning bounds the shuffle at O(batches·Q·CAND) rows, corpus-size
independent); a window takes the global top-CAND; the exact rerank
joins back to `embeddings` for true cosine on candidates only.

Deterministic (sample + init + fixed iterations, no RNG); registered
rows-only (approximate by construction); recall gated in
tests/test_ann.py against the exact operator.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, to_double
from ..registry import query
from ..tables import Tables
from ._util import r4, unit_rows

#: r13 tuning (verdict #3), swept in numpy against the exact operator
#: at sf0.001/0.01/0.1: M=16 4-dim subspaces (8-byte codes) + a
#: 100-candidate exact rerank measures recall@5 = 1.00/1.00/0.89 at a
#: 5% rerank fraction on sf0.1 — the only index family here that
#: clears 0.8 recall under a 10% candidate budget on structure-free
#: random vectors (M=8/CAND=50 measured 0.46 at sf0.1). The ADC scan
#: is full-corpus but O(M) per vector; the EXACT work is CAND/query.
M = 16  # subspaces (dim 64 -> 4-dim slices)
KSUB = 16  # codewords per subspace (4-bit codes)
TOP_K = 5
CAND = 100
N_QUERIES = 20


def _codebooks(t):
    """Per-subspace k-means-lite codebooks from the 256-row sample."""
    import numpy as np

    sample = t.embeddings.orderBy("vec_id").limit(256).toPandas()["embedding"]
    x = np.array(sample.tolist(), dtype=np.float64)
    n = np.linalg.norm(x, axis=1, keepdims=True)
    x = x[n[:, 0] > 0] / n[n[:, 0] > 0]  # zero vectors can't seed
    dim = x.shape[1]
    ds = dim // M
    books = np.zeros((M, KSUB, ds))
    for mi in range(M):
        sub = x[:, mi * ds : (mi + 1) * ds]
        cb = sub[:KSUB].copy()  # deterministic init: first KSUB slices
        for _ in range(5):  # Lloyd on L2 within the subspace
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(KSUB):
                mem = sub[assign == j]
                if len(mem):
                    cb[j] = mem.mean(axis=0)
        books[mi] = cb
    return books


@query("sim_knn_pq")  # rows-only: approximate by construction
def sim_knn_pq(spark, sf_dir):
    """Approximate top-5 cosine neighbors for queries (vec_id < 20)
    via PQ codes + ADC lookup + exact rerank of the candidate set."""
    import numpy as np

    t = Tables(spark, sf_dir)
    books = _codebooks(t)
    ds = books.shape[2]

    # query LUTs: Q×M×KSUB dot products — bounded driver metadata
    qpd = (
        t.embeddings.filter(F.col("vec_id") < N_QUERIES)
        .orderBy("vec_id")
        .toPandas()
    )
    qids = qpd["vec_id"].to_numpy()
    q = unit_rows(np.array(qpd["embedding"].tolist(), dtype=np.float64))
    luts = np.stack(
        [
            np.stack([q[:, mi * ds : (mi + 1) * ds] @ books[mi].T for mi in range(M)], axis=1)
        ]
    )[0]  # (Q, M, KSUB)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            m_ = unit_rows(
                np.array(pdf["embedding"].tolist(), dtype=np.float64)
            )
            n = len(m_)
            approx = np.zeros((n, len(qids)))
            for mi in range(M):
                sub = m_[:, mi * ds : (mi + 1) * ds]
                d2 = ((sub[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
                codes = d2.argmin(axis=1)  # (n,) — the PQ code
                approx += luts[:, mi, codes].T  # ADC lookups → (n, Q)
            vids = pdf["vec_id"].to_numpy()
            rows = []
            take = min(CAND, n)
            for qi, qid in enumerate(qids):
                top = np.argpartition(-approx[:, qi], take - 1)[:take]
                rows.extend(
                    (int(qid), int(vids[i]), float(approx[i, qi])) for i in top
                )
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "approx"]
            )

    batch_top = t.embeddings.select("vec_id", "embedding").mapInPandas(
        score, "query_id long, neighbor_id long, approx double"
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    cands = (
        batch_top.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("crn", F.row_number().over(w_cand))
        .filter(F.col("crn") <= CAND)
        .select("query_id", "neighbor_id")
    )

    emb = t.embeddings.select(
        F.col("vec_id"), to_double("embedding").alias("e")
    )
    pairs = (
        cands.join(
            emb.select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe")),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            r4(cosine(F.col("qe"), F.col("ce"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .withColumn("rn", F.col("rn").cast("bigint"))
    )
