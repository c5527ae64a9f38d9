"""Corpus-trained bigram language-model scoring (SURVEY §2.11
extension; task brief: text analysis / quality scoring family).

The classic cheap "perplexity filter" a pretraining pipeline runs
before the expensive model-based one: train an add-one-smoothed bigram
LM on the corpus itself, then score every document by its total
negative log-likelihood.  High-NLL docs are gibberish / boilerplate
candidates; low-NLL docs are fluent under the corpus distribution
(CCNet-style wikipedia-LM filtering, here self-trained so the whole
thing is two hash aggregations — no external model artifact).

Scale shape (100 TB): tokenization and bigram extraction are map-only
array ops.  The model is two corpus-wide hash aggregations (unigram
and bigram counts) — one shuffle each, keyed on token / gram, with
map-side partial aggregation so the shuffle carries distinct keys per
task, not raw occurrences.  Scoring joins each document's bigram
stream to the two count tables: both joins key on the same token
domain, where natural-language frequency skew ("the …") is real —
AQE skew-join splitting (enabled in session confs) handles the hot
keys.  The vocabulary-size scalar joins as a broadcast of one row.
Everything is JVM-side built-ins; no Python in the hot path.

Cross-engine float parity: the per-bigram NLL term is quantized to
fixed-point *before* the per-document sum (see operators/_util.py) so
the aggregate is exact integer arithmetic under any merge order; ln on
identical rational doubles agrees between the engines at 1e-4
quantization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "text_perplexity_bigram",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(
                   string_split(
                       regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                       ' '),
                   x -> x <> '') AS toks
        FROM documents
    ),
    docbg AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i+1])) AS gram
        FROM d WHERE len(toks) >= 2
    ),
    uni AS (
        SELECT tok AS w1, count(*) AS cu
        FROM (SELECT unnest(toks) AS tok FROM d)
        GROUP BY 1
    ),
    voc AS (SELECT count(*) AS v FROM uni),
    bi AS (SELECT gram, count(*) AS cb FROM docbg GROUP BY 1)
    SELECT db.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CAST(floor(
               -ln(CAST(bi.cb + 1 AS DOUBLE) / CAST(u.cu + voc.v AS DOUBLE))
               * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS nll_fp
    FROM docbg db
    JOIN bi USING (gram)
    JOIN uni u ON u.w1 = string_split(db.gram, ' ')[1]
    CROSS JOIN voc
    GROUP BY db.doc_id
    """,
)
def text_perplexity_bigram(spark, sf_dir):
    """Per-document total NLL under a corpus-trained add-one bigram LM.

    Output: doc_id, n_bigrams, nll_fp (NLL summed in 1e-4 fixed point —
    divide by 10^4·n_bigrams for the mean NLL in nats)."""
    t = Tables(spark, sf_dir)
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "), " "),
        lambda x: x != "",
    )
    d = t.documents.select("doc_id", toks.alias("toks"))
    docbg = d.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks)-2),"
                " i -> concat(toks[i], ' ', toks[i+1]))"
            )
        ).alias("gram"),
    )
    uni = (
        d.select(F.explode("toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    voc = uni.agg(F.count(F.lit(1)).alias("v"))
    bi = docbg.groupBy("gram").agg(F.count(F.lit(1)).alias("cb"))
    nll_term = F.floor(
        -F.log(
            (F.col("cb") + 1).cast("double")
            / (F.col("cu") + F.col("v")).cast("double")
        )
        * 10000
        + 0.5
    ).cast("long")
    # Score each DISTINCT gram once (|grams| ≪ corpus occurrences):
    # the w1-count join and the log() run on the gram dictionary, and
    # the per-occurrence side joins that dictionary in ONE gram-keyed
    # shuffle instead of two corpus-sized shuffles (gram then w1).
    gram_scores = (
        bi.withColumn("w1", F.split("gram", " ")[0])
        .join(uni, "w1")
        .crossJoin(F.broadcast(voc))
        .select("gram", nll_term.alias("nll_term"))
    )
    return (
        docbg.join(gram_scores, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll_term").alias("nll_fp"),
        )
    )
