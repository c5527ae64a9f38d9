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

N_PLANES = 8
DIM = 64
TOP_K = 5


def _signature_df(t):
    """vec_id, embedding, bucket (8-bit LSH signature)."""

    def sign_batches(batches):
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(42)  # fixed planes — part of the index
        planes = rng.standard_normal((N_PLANES, DIM))
        weights = 1 << np.arange(N_PLANES)
        for pdf in batches:
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            bits = (m @ planes.T) > 0
            pdf = pdf[["vec_id", "embedding"]].copy()
            pdf["bucket"] = (bits @ weights).astype("int64")
            yield pdf

    return t.embeddings.select("vec_id", "embedding").mapInPandas(
        sign_batches, "vec_id long, embedding array<float>, bucket long"
    )


@query("sim_knn_lsh")  # rows-only: approximate by construction
def sim_knn_lsh(spark, sf_dir):
    """Approximate top-5 cosine neighbors for queries (vec_id < 20):
    LSH bucket + Hamming-1 multiprobe + exact rerank of candidates."""
    t = Tables(spark, sf_dir)
    sig = _signature_df(t)

    # multiprobe: bucket ⊕ every mask of Hamming weight ≤ 2 — 37 of
    # 256 cells (~14% candidate fraction). Structure-free random
    # vectors need the wider radius; clustered real embeddings reach
    # the same recall at radius 1.
    masks = [0] + [1 << i for i in range(N_PLANES)] + [
        (1 << i) | (1 << j)
        for i in range(N_PLANES)
        for j in range(i + 1, N_PLANES)
    ]
    probes = F.array(*[F.expr(f"bucket ^ {m}") for m in masks])
    q = (
        sig.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("query_id"),
            to_double("embedding").alias("qe"),
            F.explode(probes).alias("bucket"),
        )
    )
    cand = sig.select(
        F.col("vec_id").alias("neighbor_id"),
        to_double("embedding").alias("ce"),
        "bucket",
    )
    pairs = (
        cand.join(F.broadcast(q), "bucket")
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
    return pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= TOP_K
    )
