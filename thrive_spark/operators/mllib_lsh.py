"""MLlib-backed LSH operators — the `pyspark.ml` alternates SURVEY
§4.3 designates for the hand-rolled MinHash / random-projection paths
(operators/llm.py, ann.py): same algorithms, library implementation,
exercising the ml-pipeline surface (Transformer → Estimator.fit →
approxSimilarityJoin) that a production 100 TB dedup would reach for
first.

Both are rows-only: MLlib's hash seeds are JVM-internal and cannot be
reproduced in the DuckDB oracle; quality is gated instead by pytest
(agreement with the exact/hand-rolled twins — tests/test_ann.py
pattern).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import r4

#: Jaccard-distance acceptance for the MLlib minhash join (matches the
#: hand-rolled dedup_fuzzy_minhash's 0.8 similarity bar: dist ≤ 0.2)
MLLIB_MINHASH_DIST = 0.2


def _shingled_docs(t):
    """(doc_id, tokens=word-3-shingles). The token array MATERIALIZES
    in its own projection before the shingle transform references it —
    inlining filter(split(text)) inside the lambda makes Catalyst
    re-derive the whole array per element access, the O(tokens²)
    pitfall SCALE.md documents for explode."""
    tk = F.filter(F.split("text", " "), lambda x: x != "")
    base = t.documents.select("doc_id", tk.alias("tk"))
    n2 = F.greatest(F.size("tk") - 2, F.lit(0))
    shingles = F.zip_with(
        F.slice("tk", 1, n2),
        F.zip_with(
            F.slice("tk", 2, n2),
            F.slice("tk", 3, n2),
            lambda b, c: F.concat(b, F.lit(" "), c),
        ),
        lambda a, bc: F.concat(a, F.lit(" "), bc),
    )
    return base.select("doc_id", shingles.alias("tokens")).filter(
        F.size("tokens") > 0
    )


@query("dedup_minhash_mllib")  # rows-only: MLlib hash seeds
def dedup_minhash_mllib(spark, sf_dir):
    """MinHash LSH via MLlib: tokenize → binary HashingTF →
    MinHashLSH.fit → approxSimilarityJoin, keeping pairs with Jaccard
    distance ≤ 0.2 — the library counterpart of dedup_fuzzy_minhash's
    hand-rolled band join (agreement between the two is asserted in
    tests).

    Scale notes: approxSimilarityJoin explodes each side by its hash
    tables and equi-joins on (table, hash) — the SAME banded-bucket
    plan the hand-rolled operator builds manually, so its scaling
    argument carries over; numHashTables trades recall for join
    fan-out. HashingTF keeps the token space fixed-width (2^18), so
    feature vectors never grow with vocabulary. Measured honestly:
    the hand-rolled band join is ~4× faster at sf0.1 (census: ~3 s vs
    ~14 s) because it prunes with 4-row band keys instead of carrying
    full sparse vectors through the candidate join — the library buys
    API convenience, not speed, and both are exhibited for exactly
    that comparison."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    t = Tables(spark, sf_dir)
    # word 3-shingles — the SAME feature space as the hand-rolled
    # twin; bare token SETS are far too coarse on a bounded vocabulary
    # (30k false pairs at sf0.01 when prototyped with tokens)
    # localCheckpoint = optimizer barrier: approxSimilarityJoin inlines
    # MinHash's hashFunction (which REQUIRES a non-empty vector) into a
    # Filter predicate that Catalyst reorders BELOW _shingled_docs'
    # size(tokens) > 0 filter — on a corpus with token-less docs (r10
    # stress) the UDF then sees empty vectors and aborts the job. The
    # barrier pins the pruning before the LSH plan fragment; the table
    # is the smallest in the corpus, so materializing it is cheap even
    # at scale (it holds shingle arrays, not raw text).
    docs = _shingled_docs(t).localCheckpoint(eager=False)
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=1 << 18,
        binary=True,
    )
    feats = tf.transform(docs)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, MLLIB_MINHASH_DIST, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            r4(F.col("jaccard_dist")).alias("jaccard_dist"),
        )
    )


@query("sim_knn_mllib_brp")  # rows-only: MLlib hash seeds
def sim_knn_mllib_brp(spark, sf_dir):
    """Random-projection LSH ANN via MLlib: L2-normalized embeddings →
    BucketedRandomProjectionLSH → approxSimilarityJoin of the query
    set (vec_id < 20) against the corpus → per-query top-5 by
    euclidean distance. On unit vectors euclidean order IS cosine
    order (‖a−b‖² = 2−2·a·b), so this is the library twin of
    sim_knn_cosine_topk and of the hand-rolled hyperplane LSH
    (ann.py); recall against the exact ranking is gated in tests.

    Scale: the join is bucket-equi per hash table (no all-pairs), and
    the query side broadcasts; bucketLength controls the
    recall/fan-out trade like the hand-rolled variant's band width."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    t = Tables(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    # zero-norm vectors cannot be unit-normalized (ANSI divide-by-zero,
    # r10 stress corpus) and carry no direction — exclude up front
    # filter + localCheckpoint: zero-norm vectors cannot be
    # unit-normalized and carry no direction; the barrier stops
    # approxSimilarityJoin's distance predicate (with the ÷norm
    # projection inlined) from reordering below the guard — the same
    # Catalyst filter-reordering trap as dedup_minhash_mllib above
    unit = t.embeddings.filter(norm > 0).select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double") / norm)
        ).alias("v"),
    ).localCheckpoint(eager=False)
    brp = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", numHashTables=6,
        bucketLength=0.5, seed=42,
    )
    model = brp.fit(unit)
    q = unit.filter(F.col("vec_id") < 20)
    pairs = model.approxSimilarityJoin(q, unit, 2.0, distCol="dist").filter(
        F.col("datasetA.vec_id") != F.col("datasetB.vec_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist"), F.col("neighbor_id")
    )
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.col("dist"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            r4("dist").alias("dist"),
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


@query("cluster_kmeans_mllib")  # rows-only: seeded iterative refinement
def cluster_kmeans_mllib(spark, sf_dir):
    """KMeans via pyspark.ml — the library twin of the hand-rolled
    Lloyd loop (clustering.py), exercising Estimator.fit +
    model.transform over vector columns. Emits per-cluster sizes;
    quality (full coverage, no empty/degenerate clustering) is gated
    in tests/test_clustering.py.

    Scale: MLlib KMeans runs the same per-partition-partials
    aggregation the hand-rolled loop documents, with k·dim driver
    state — the library adds KMeans|| init, which removes the
    k-scans-of-data seeding cost at 100 TB."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    t = Tables(spark, sf_dir)
    vecs = t.embeddings.select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("v"),
    )
    km = KMeans(k=8, seed=42, maxIter=20, featuresCol="v")
    model = km.fit(vecs)
    pred = model.transform(vecs)
    return (
        pred.groupBy(F.col("prediction").cast("bigint").alias("cluster_id"))
        .agg(F.count("*").alias("n_points"))
        .orderBy("cluster_id")
    )
