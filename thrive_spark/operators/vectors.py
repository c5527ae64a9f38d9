"""Embedding-vector preparation operators: the transforms an ANN /
retrieval pipeline runs between the embedder and the index builder.

Scale shape: map-only higher-order-function projections over the
``array<float>`` column — no shuffle, no Python; 100 TB scales with
bytes scanned. Quantized output is serialized to CSV text because the
driver's canonicalizer cannot hash list cells (same convention as
fn_array_bank).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "embed_normalize_quantize",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e
    )
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS n_dims,
           CAST(floor(nrm * 10000 + 0.5) AS BIGINT) AS norm_fp,
           CASE WHEN nrm > 0
                THEN array_to_string(list_transform(v,
                    x -> CAST(floor(x / nrm * 127 + 0.5) AS BIGINT)), ',')
                ELSE array_to_string(list_transform(v, x -> 0), ',')
           END AS q8_csv
    FROM n
    """,
)
def embed_normalize_quantize(spark, sf_dir):
    """L2-normalize each embedding and symmetric-quantize to int8
    (scale 127) — the standard prep for a cosine ANN index: unit norm
    makes dot product == cosine, int8 cuts index memory 4x. Norm is
    serialized fixed-point and the int8 vector as CSV (half-up
    quantization is floor(x*127+0.5), identical in both engines; a
    unit vector cannot exceed |127| so no clamp is needed)."""
    t = Tables(spark, sf_dir)
    v = F.transform("embedding", lambda x: x.cast("double"))
    n = t.embeddings.select("vec_id", v.alias("v")).select(
        "vec_id",
        "v",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)).alias(
            "nrm"
        ),
    )
    nrm = F.col("nrm")
    q8 = F.when(
        nrm > 0,
        F.array_join(
            F.transform("v", lambda x: F.floor(x / nrm * 127 + 0.5).cast("bigint")),
            ",",
        ),
    ).otherwise(
        F.array_join(F.transform("v", lambda x: F.lit(0).cast("bigint")), ",")
    )
    return n.select(
        "vec_id",
        F.size("v").cast("bigint").alias("n_dims"),
        F.floor(nrm * 10000 + 0.5).cast("bigint").alias("norm_fp"),
        q8.alias("q8_csv"),
    )
