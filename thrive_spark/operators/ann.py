"""Approximate nearest neighbor — the scale path for similarity
search (task brief: "IVF or LSH-bucketed variant").

Random-hyperplane LSH: an 8-bit signature per vector (sign of the dot
product with 8 fixed hyperplanes) buckets the corpus into ≤256 cells;
a query probes its own cell plus the 8 Hamming-distance-1 cells and
exact-reranks only those candidates. Expected candidate fraction is
9/256 ≈ 3.5% of the corpus — at 100 TB that is the difference between
a full cross join and a bounded per-query scan. Recall is tunable by
(n_planes, probe radius); tests/test_ann.py measures recall@5 against
the exact operator.

Signatures are computed in one vectorized Arrow pass (matrix × planes
matmul), the same map-only shape as the MinHash signatures.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, to_double
from ..registry import query
from ..tables import Tables
from ._util import r4

#: r13 tuning (verdict #3): single-table LSH is hopeless on
#: structure-free random vectors (8 planes, radius-2 multiprobe
#: measured recall@5 = 0.26-0.38) — the classic fix is L INDEPENDENT
#: tables whose candidate sets union (E2LSH / Indyk-Motwani). Swept
#: in numpy against the exact operator: 8 tables × 10 planes,
#: radius-2 probing measures recall@5 = 0.77/0.80/0.83 at
#: sf0.001/0.01/0.1. Candidate fraction ~37% is the documented
#: random-vector worst case — clustered real embeddings reach the
#: same recall at a fraction of it, and per-table cost is one matmul.
N_PLANES = 10
N_TABLES = 8
DIM = 64
TOP_K = 5


def _signature_df(t):
    """vec_id, embedding, key — one row per (vector, table), with the
    table id packed into the join key's high bits so the L-table
    candidate union is a single equi-join."""

    def sign_batches(batches):
        import numpy as np
        import pandas as pd

        # fixed planes per table — part of the index
        planes = [
            np.random.RandomState(42 + ti).standard_normal((N_PLANES, DIM))
            for ti in range(N_TABLES)
        ]
        weights = 1 << np.arange(N_PLANES)
        for pdf in batches:
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            keys = np.stack(
                [
                    ((m @ p.T) > 0) @ weights + (ti << N_PLANES)
                    for ti, p in enumerate(planes)
                ],
                axis=1,
            ).astype("int64")
            pdf = pdf[["vec_id", "embedding"]].copy()
            pdf["keys"] = list(keys)
            yield pdf

    return t.embeddings.select("vec_id", "embedding").mapInPandas(
        sign_batches,
        "vec_id long, embedding array<float>, keys array<long>",
    )


@query("sim_knn_lsh")  # rows-only: approximate by construction
def sim_knn_lsh(spark, sf_dir):
    """Approximate top-5 cosine neighbors for queries (vec_id < 20):
    8-table LSH bucket union + radius-2 multiprobe per table + exact
    rerank of the candidate union (measured recall@5 0.77-0.83,
    tests/test_ann.py gates 0.6)."""
    t = Tables(spark, sf_dir)
    sig = _signature_df(t)

    # multiprobe per table: key ⊕ every mask of Hamming weight ≤ 2 —
    # 56 of 1024 cells per table; the table id in the key's high bits
    # is never flipped, so probes stay within their own table.
    masks = [0] + [1 << i for i in range(N_PLANES)] + [
        (1 << i) | (1 << j)
        for i in range(N_PLANES)
        for j in range(i + 1, N_PLANES)
    ]
    probes = F.flatten(
        F.transform(
            "keys",
            lambda k: F.array(*[k.bitwiseXOR(F.lit(m)) for m in masks]),
        )
    )
    q = (
        sig.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("query_id"),
            to_double("embedding").alias("qe"),
            F.explode(probes).alias("key"),
        )
    )
    cand = sig.select(
        F.col("vec_id").alias("neighbor_id"),
        to_double("embedding").alias("ce"),
        F.explode("keys").alias("key"),
    )
    pairs = (
        cand.join(F.broadcast(q), "key")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            r4(cosine(F.col("qe"), F.col("ce"))).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .withColumn("rn", F.col("rn").cast("bigint"))
    )
