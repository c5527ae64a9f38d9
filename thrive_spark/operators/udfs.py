"""§2.10 UDF / UDAF / UDTF surface.

Hierarchy, fastest first: built-in functions (everything else in this
engine) → Arrow-vectorized pandas UDFs (these) → row-at-a-time Python
UDFs (one deliberately included as the slow-path exhibit). Each UDF
here has a built-in twin as its oracle, demonstrating when NOT to use
a UDF: the only legitimate uses are logic the built-ins cannot
express (custom science code, model inference), not arithmetic.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import Tables


@query(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice IS NULL THEN NULL
                WHEN o_totalprice < 100000.0 THEN 'low'
                WHEN o_totalprice < 250000.0 THEN 'mid'
                ELSE 'high' END AS band
    FROM orders
    """,
)
def udf_python_scalar(spark, sf_dir):
    """Row-at-a-time Python UDF (the slow path — serde per row; kept
    as the API-surface exhibit, never for hot paths)."""
    t = Tables(spark, sf_dir)

    @F.udf(returnType=T.StringType())
    def band(p: float) -> str:
        if p is None:  # NULL in, NULL out (r10 stress corpus)
            return None
        if p < 100000.0:
            return "low"
        if p < 250000.0:
            return "mid"
        return "high"

    return t.orders.select("o_orderkey", band("o_totalprice").alias("band"))


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Arrow-vectorized scalar pandas UDF; rounding stays Spark-side
    (F.round) so both engines round identically."""
    t = Tables(spark, sf_dir)

    @F.pandas_udf(T.DoubleType())
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    return t.lineitem.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.round(net("l_extendedprice", "l_discount"), 4).alias("net_price"),
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,10)))
                      / sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 4)
               AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark, sf_dir):
    """UDAF via GROUPED_AGG pandas UDF: quantity-weighted mean price.
    math.fsum gives an exactly-rounded sum, matching the oracle's
    decimal-exact arithmetic to the final double."""
    t = Tables(spark, sf_dir)

    @F.pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return math.fsum(price * qty) / math.fsum(qty)

    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias(
            "weighted_avg_price"
        )
    )


@query(
    "udf_grouped_map_normalize",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) AS z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def udf_grouped_map_normalize(spark, sf_dir):
    """Grouped-map applyInPandas: z-score normalize value per user.
    The window twin is the oracle; NaN/inf (single-row groups) → NULL
    to match SQL null propagation."""
    t = Tables(spark, sf_dir)

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)  # ddof=1 == stddev_samp
        z = z.where(np.isfinite(z), None)
        return pd.DataFrame({"event_id": pdf["event_id"], "z": z.round(4)})

    return t.events.groupBy("user_id").applyInPandas(
        normalize, "event_id long, z double"
    )


@query(
    "udtf_explode_words",
    oracle="""
    SELECT doc_id, t.token, CAST(length(t.token) AS BIGINT) AS token_len
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id < 100) t
    WHERE t.token <> ''
    """,
)
def udtf_explode_words(spark, sf_dir):
    """Table-valued function: text → one row per token, via
    mapInPandas (the Arrow-batched UDTF pattern: iterator of input
    batches → iterator of exploded batches)."""
    t = Tables(spark, sf_dir)

    def tokenize(batches):
        for pdf in batches:
            toks = pdf[["doc_id", "text"]].copy()
            toks["token"] = toks["text"].str.split(" ")
            out = toks[["doc_id", "token"]].explode("token")
            out = out[out["token"].astype(str) != ""]
            out["token_len"] = out["token"].str.len().astype("int64")
            yield out[["doc_id", "token", "token_len"]]

    return (
        t.documents.filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .mapInPandas(tokenize, "doc_id long, token string, token_len long")
    )


@query(
    "udtf_python_native",
    oracle="""
    SELECT doc_id, t.token, CAST(length(t.token) AS BIGINT) AS token_len
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id < 100) t
    WHERE t.token <> ''
    """,
)
def udtf_python_native(spark, sf_dir):
    """Spark 4 native Python UDTF driven through SQL LATERAL — the
    row-at-a-time table function API (vs the Arrow-batched mapInPandas
    twin above). Same oracle; the batched form is the hot-path choice.
    """
    t = Tables(spark, sf_dir)

    @F.udtf(returnType="token string, token_len bigint")
    class Tokenize:
        def eval(self, text: str):
            for tok in (text or "").split(" "):
                if tok:
                    yield tok, len(tok)

    spark.udtf.register("thrive_tokenize", Tokenize)
    t.documents.filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    ).createOrReplaceTempView("thrive_udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.token, t.token_len "
        "FROM thrive_udtf_docs, LATERAL thrive_tokenize(text) t"
    )


@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice IS NULL THEN NULL
                WHEN o_totalprice < 100000.0 THEN 'low'
                WHEN o_totalprice < 250000.0 THEN 'mid'
                ELSE 'high' END AS band
    FROM orders
    """,
)
def udf_arrow_scalar(spark, sf_dir):
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): same
    scalar signature as the row-at-a-time exhibit above, but the
    harness ships columnar Arrow batches instead of pickled rows —
    the drop-in migration path when a legacy @udf can't be rewritten
    as pandas_udf. Same oracle as udf_python_scalar: identical
    semantics, different transport."""
    t = Tables(spark, sf_dir)

    @F.udf(returnType=T.StringType(), useArrow=True)
    def band(p: float) -> str:
        if p is None:  # NULL in, NULL out (r10 stress corpus)
            return None
        if p < 100000.0:
            return "low"
        if p < 250000.0:
            return "mid"
        return "high"

    return t.orders.select("o_orderkey", band("o_totalprice").alias("band"))


@query(
    "udf_pandas_iter_model",
    oracle="""
    SELECT doc_id,
           CAST(length(text) * 3 + CASE lang
                WHEN 'en' THEN 10 WHEN 'es' THEN 20 WHEN 'de' THEN 30
                WHEN 'fr' THEN 40 ELSE 50 END AS BIGINT) AS score
    FROM documents
    """,
)
def udf_pandas_iter_model(spark, sf_dir):
    """Iterator pandas UDF (``Iterator[Series] -> Iterator[Series]``):
    the batch-inference pattern — expensive state (a model, a
    tokenizer, a GPU session) initializes ONCE per task before the
    batch loop, not once per batch or per row. Here the "model" is a
    deterministic weight table so the result stays oracle-checkable;
    in production this is exactly where the real forward pass goes,
    and the Arrow batch size (spark.sql.execution.arrow.
    maxRecordsPerBatch) is the GPU-memory knob."""
    t = Tables(spark, sf_dir)

    @F.pandas_udf("long")
    def score(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # once-per-task init (the expensive part in real inference)
        model = {"en": 10, "es": 20, "de": 30, "fr": 40}

        for text, lang in batches:
            yield text.str.len() * 3 + lang.map(lambda lg: model.get(lg, 50))

    return t.documents.select(
        "doc_id",
        score("text", "lang").alias("score"),
    )


@query(
    "udf_pandas_window_agg",
    oracle="""
    SELECT event_id, user_id,
           (CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER w
                 AS DOUBLE)
            / count(*) OVER w) / 10000.0 AS mean7
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def udf_pandas_window_agg(spark, sf_dir):
    """A grouped-agg pandas UDF evaluated OVER A WINDOW FRAME — the
    API corner where custom Python aggregation meets windowing (Spark
    ships each bounded frame to the UDF as a pandas Series). The UDF
    computes an explicit sum/len mean over fixed-point longs, so the
    arithmetic (int64 sum → one float division) is exactly the
    oracle's — no pandas `.mean()` (its pairwise summation would be a
    second float provenance to reason about).

    Slow-path economics: every frame materializes through Arrow, so a
    built-in avg().over(w) beats this by an order of magnitude
    (win_moving_avg is that twin) — the operator exists because the
    reference's surface includes custom window aggregation; use it
    only for logic built-ins can't express."""
    from pyspark.sql import Window

    @F.pandas_udf("double")
    def mean_fp(v: pd.Series) -> float:
        if v.count() == 0:  # all-NULL frame: SQL sum is NULL, so is
            return None     # the mean (pandas sum would say 0.0; r10)
        return float(v.sum()) / len(v)

    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    xf = F.floor(F.col("value") * 10000 + 0.5).cast("bigint")
    return t.events.select(
        "event_id",
        "user_id",
        (mean_fp(xf).over(w) / 10000.0).alias("mean7"),
    )
