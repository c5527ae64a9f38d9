"""IVF-PQ — the composed production ANN shape (FAISS IVFADC,
Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search", the IVFADC system of §V): an IVF coarse quantizer bounds the
ADC scan to the probed cells, PQ codes make that scan O(M) byte
lookups per vector, and a small exact rerank fixes the quantization
error. This is the index layout real 100 TB retrieval runs: the
coarse cells shard the corpus (cell = partition key), codes are 8-byte
payloads riding the postings, and only CAND full vectors per query are
ever touched.

Composition here reuses the tuned pieces as-is: ivf._centroids /
ivf._assigned (32 cells, 4 probes — measured candidate recall ceiling
0.74-0.80) and pq._codebooks (16 4-dim subspaces). Measured recall@5
vs the exact operator: 0.80/0.74/0.73-0.76 at sf0.001/0.01/0.1 with
the EXACT work capped at CAND=50 vectors/query and the ADC scan capped
at the ~12.5% probe fraction (plain sim_knn_pq ADC-scans 100% of the
corpus; plain sim_knn_ivf exact-scores every candidate).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, to_double
from ..registry import query
from ..tables import Tables
from ._util import r4
from .ivf import N_PROBE, _assigned, _centroids
from .pq import KSUB, M, _codebooks

TOP_K = 5
CAND = 50
N_QUERIES = 20


@query("sim_knn_ivfpq")  # rows-only: approximate by construction
def sim_knn_ivfpq(spark, sf_dir):
    """Approximate top-5 cosine neighbors (queries: vec_id < 20):
    probe 4 of 32 IVF cells, ADC-score ONLY the probed cells' vectors
    via PQ lookup tables, exact-rerank the top-CAND per query."""
    import numpy as np

    from ._util import unit_rows

    t = Tables(spark, sf_dir)
    cents = _centroids(t)
    books = _codebooks(t)
    ds = books.shape[2]
    assigned = _assigned(t, cents)

    # query-side driver metadata: 20 query LUTs + probe sets (bounded)
    qpd = (
        t.embeddings.filter(F.col("vec_id") < N_QUERIES)
        .orderBy("vec_id")
        .toPandas()
    )
    qids = qpd["vec_id"].to_numpy()
    q = unit_rows(np.array(qpd["embedding"].tolist(), dtype=np.float64))
    luts = np.stack(
        [
            np.stack(
                [q[:, mi * ds : (mi + 1) * ds] @ books[mi].T for mi in range(M)],
                axis=1,
            )
        ]
    )[0]  # (Q, M, KSUB)
    qprobes = np.argsort(-(q @ cents.T), axis=1)[:, :N_PROBE]
    probe_of = {}  # cell -> [query row index]
    for qi, row in enumerate(qprobes):
        for cell in row:
            probe_of.setdefault(int(cell), []).append(qi)

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            m_ = unit_rows(
                np.array(pdf["embedding"].tolist(), dtype=np.float64)
            )
            cells = pdf["cell"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            codes = np.zeros((len(m_), M), dtype=np.int64)
            for mi in range(M):
                sub = m_[:, mi * ds : (mi + 1) * ds]
                d2 = ((sub[:, None, :] - books[mi][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, mi] = d2.argmin(axis=1)
            rows = []
            # per probed cell: ADC lookups only for the queries that
            # probe it — vectors in unprobed cells are never scored
            for cell in np.unique(cells):
                qs = probe_of.get(int(cell), [])
                if not qs:
                    continue
                sel = cells == cell
                sub_codes = codes[sel]
                sub_vids = vids[sel]
                for qi in qs:
                    approx = luts[qi, np.arange(M)[:, None], sub_codes.T].sum(
                        axis=0
                    )
                    rows.extend(
                        (int(qids[qi]), int(v), float(a))
                        for v, a in zip(sub_vids, approx)
                    )
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "approx"]
            )

    scored = assigned.mapInPandas(
        adc, "query_id long, neighbor_id long, approx double"
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    cands = (
        scored.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("crn", F.row_number().over(w_cand))
        .filter(F.col("crn") <= CAND)
        .select("query_id", "neighbor_id")
    )
    emb = t.embeddings.select("vec_id", to_double("embedding").alias("e"))
    pairs = (
        cands.join(
            emb.select(
                F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("e").alias("ce"),
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
    return pairs.withColumn(
        "rn", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rn") <= TOP_K)
