"""Text-analysis operators beyond the §2.11 core (task brief:
language-ID, quality scoring, token counting, fingerprinting) — the
per-document scoring passes a training-data pipeline runs before
dedup/filtering.

All map-only single-pass projections over `documents` (no shuffle at
all except the tiny distribution aggregates) — at 100 TB these scale
with bytes scanned, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import r4

#: tiny per-language stopword lists for the n-gram/stopword heuristic;
#: deliberately small so the heuristic is cheap (a real system would
#: load fastText-style profiles — same plumbing, bigger lists)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "data"],
    "es": ["el", "la", "de", "los", "datos"],
    "de": ["der", "die", "das", "und", "daten"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": ["de", "shi", "he", "zai", "shuju"],
}


@query(
    "text_quality_score",
    oracle="""
    WITH s AS (
        SELECT doc_id, lang,
               CAST(length(text) AS BIGINT) AS n_chars_m,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                    AS BIGINT) AS n_tokens,
               CAST(length(text)
                    - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                    AS BIGINT) AS n_punct
        FROM documents
    )
    SELECT doc_id, lang, n_chars_m, n_tokens, n_punct,
           round(CAST(n_chars_m AS DOUBLE) / n_tokens, 4) AS avg_token_len,
           round(CAST(n_punct AS DOUBLE) / n_chars_m, 4) AS punct_ratio,
           round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
                 * (1.0 - CAST(n_punct AS DOUBLE) / n_chars_m), 4) AS quality
    FROM s
    """,
)
def text_quality_score(spark, sf_dir):
    """Heuristic quality score: length saturation × (1 − punctuation
    ratio) — the shape of the usual pretraining quality filters
    (length / symbol-ratio gates), kept SQL-expressible for the oracle."""
    t = Tables(spark, sf_dir)
    n_chars = F.length("text").cast("bigint")
    n_tokens = F.size(
        F.filter(F.split("text", " "), lambda x: x != "")
    ).cast("bigint")
    n_punct = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
    ).cast("bigint")
    s = t.documents.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
    )
    return s.select(
        "*",
        r4(F.col("n_chars_m").cast("double") / F.col("n_tokens")).alias(
            "avg_token_len"
        ),
        r4(F.col("n_punct").cast("double") / F.col("n_chars_m")).alias(
            "punct_ratio"
        ),
        r4(
            F.least(F.col("n_tokens").cast("double") / 50.0, F.lit(1.0))
            * (1.0 - F.col("n_punct").cast("double") / F.col("n_chars_m"))
        ).alias("quality"),
    )


def _lang_hits_spark(lang: str):
    toks = F.split("text", " ")
    return F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS[lang]))
    ).cast("bigint")


def _lang_hits_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"t -> list_contains([{lst}], t))) AS BIGINT)"
    )


@query(
    "text_lang_id",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, lang,
               {_lang_hits_sql('en')} AS h_en,
               {_lang_hits_sql('es')} AS h_es,
               {_lang_hits_sql('de')} AS h_de,
               {_lang_hits_sql('fr')} AS h_fr,
               {_lang_hits_sql('zh')} AS h_zh
        FROM documents
    )
    SELECT doc_id, lang AS actual_lang,
           CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
                WHEN h_es >= h_de AND h_es >= h_fr AND h_es >= h_zh THEN 'es'
                WHEN h_de >= h_fr AND h_de >= h_zh THEN 'de'
                WHEN h_fr >= h_zh THEN 'fr'
                ELSE 'zh' END AS guessed_lang,
           h_en + h_es + h_de + h_fr + h_zh AS total_hits
    FROM h
    """,
)
def text_lang_id(spark, sf_dir):
    """Stopword-profile language ID: count hits per language list,
    argmax with a fixed precedence order (en>es>de>fr>zh on ties) so
    the guess is deterministic and oracle-expressible."""
    t = Tables(spark, sf_dir)
    langs = ["en", "es", "de", "fr", "zh"]
    h = t.documents.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[_lang_hits_spark(lg).alias(f"h_{lg}") for lg in langs],
    )
    guess = F.lit("zh")
    for lg in reversed(langs[:-1]):  # fr, de, es, en — later wins ties
        later = [f"h_{x}" for x in langs[langs.index(lg) + 1 :]]
        cond = F.lit(True)
        for other in later:
            cond = cond & (F.col(f"h_{lg}") >= F.col(other))
        guess = F.when(cond, F.lit(lg)).otherwise(guess)
    total = sum(F.col(f"h_{lg}") for lg in langs[1:]) + F.col("h_en")
    return h.select(
        "doc_id",
        "actual_lang",
        guess.alias("guessed_lang"),
        total.alias("total_hits"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text, ' '), t -> t <> ''))), ' '))
               AS set_fingerprint,
           md5(array_to_string(string_split(text, ' ')[1:8], ' '))
               AS prefix_fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprints: order-insensitive content fingerprint
    (md5 of the sorted distinct token set — catches shuffled
    near-copies) and a prefix fingerprint (md5 of the first 8 tokens —
    catches common-prefix boilerplate). Both portable hashes, fully
    oracle-checked."""
    t = Tables(spark, sf_dir)
    toks = F.split("text", " ")
    clean = F.filter(toks, lambda x: x != "")
    return t.documents.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(clean)), " ")
        ).alias("set_fingerprint"),
        F.md5(F.array_join(F.slice(toks, 1, 8), " ")).alias(
            "prefix_fingerprint"
        ),
    )


@query(
    "text_token_count_bpe",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               CAST(len(list_filter(
                   string_split_regex(text, '[^a-zA-Z0-9]+'), t -> t <> ''))
                   AS BIGINT) AS n_words,
               CAST(length(text) AS BIGINT) AS n_chars_m
        FROM documents
    )
    SELECT doc_id, n_words, n_chars_m,
           CAST(ceil(n_chars_m / 4.0) AS BIGINT) AS est_bpe_tokens,
           round(CAST(n_chars_m AS DOUBLE) / n_words, 4) AS chars_per_word
    FROM s
    """,
)
def text_token_count_bpe(spark, sf_dir):
    """Token counting two ways: regex word split (whitespace +
    punctuation boundaries) and the chars/4 BPE estimate (the standard
    budget heuristic for GPT-style tokenizers)."""
    t = Tables(spark, sf_dir)
    words = F.filter(
        F.split("text", "[^a-zA-Z0-9]+"), lambda x: x != ""
    )
    s = t.documents.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.length("text").cast("bigint").alias("n_chars_m"),
    )
    return s.select(
        "*",
        F.ceil(F.col("n_chars_m") / 4.0).cast("bigint").alias("est_bpe_tokens"),
        r4(F.col("n_chars_m").cast("double") / F.col("n_words")).alias(
            "chars_per_word"
        ),
    )


@query(
    "text_repetition_score",
    oracle="""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    base AS (
        SELECT doc_id, toks,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
               CASE WHEN len(toks) >= 2
                    THEN list_transform(generate_series(1, len(toks) - 1),
                                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END AS bigrams
        FROM tk
    ),
    cnts AS (
        SELECT doc_id, n_tok, n_unique,
               CAST(CASE WHEN n_tok = 0 THEN 0 ELSE
                   list_max(list_transform(list_distinct(toks),
                       d -> len(list_filter(toks, x -> x = d))))
                   END AS BIGINT) AS top_tok_cnt,
               CAST(CASE WHEN len(bigrams) = 0 THEN 0 ELSE
                   list_max(list_transform(list_distinct(bigrams),
                       d -> len(list_filter(bigrams, x -> x = d))))
                   END AS BIGINT) AS top_bigram_cnt
        FROM base
    )
    SELECT doc_id, n_tok, n_unique, top_tok_cnt, top_bigram_cnt,
           CASE WHEN n_tok = 0 THEN 0 ELSE
               (20000 * (n_tok - n_unique) + n_tok) // (2 * n_tok)
           END AS dup_tok_bp,
           CASE WHEN n_tok = 0 THEN 0 ELSE
               (20000 * top_tok_cnt + n_tok) // (2 * n_tok)
           END AS top_tok_bp,
           CASE WHEN n_tok < 2 THEN 0 ELSE
               (20000 * top_bigram_cnt + (n_tok - 1)) // (2 * (n_tok - 1))
           END AS top_bigram_bp
    FROM cnts
    """,
)
def text_repetition_score(spark, sf_dir):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1 adapted
    to token level): duplicate-token fraction, most-frequent-token
    fraction, most-frequent-bigram fraction. Docs failing these gates
    (boilerplate, keyword stuffing, template spam) are dropped before
    training.

    Scale shape: entirely MAP-ONLY — the per-doc top-run counts come
    from a fold over the *sorted* token/bigram array (longest equal
    run of a sorted array == max multiplicity), so no explode, no
    groupBy, no shuffle; 100 TB scales with bytes scanned. Fractions
    are exact integer half-up basis points ((20000a+b) div 2b) — no
    float round-half divergence between engines."""
    t = Tables(spark, sf_dir)

    def top_run(sorted_col):
        # longest run in a sorted array via struct-accumulator fold
        zero = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
        )

        def step(acc, x):
            run = (
                F.when(x == acc.prev, acc.run + 1)
                .otherwise(F.lit(1).cast("bigint"))
            )
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc.best, run).alias("best"),
            )

        return F.aggregate(sorted_col, zero, step, lambda acc: acc.best)

    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = t.documents.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        "toks",
        F.when(
            F.size("toks") >= 2,
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', "
                "element_at(toks, i + 1)))"
            ),
        ).otherwise(F.array().cast("array<string>")).alias("bigrams"),
    )
    cnts = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_unique"),
        top_run(F.array_sort("toks")).alias("top_tok_cnt"),
        top_run(F.array_sort("bigrams")).alias("top_bigram_cnt"),
    )
    n, nb = F.col("n_tok"), F.col("n_tok") - 1

    def bp(num, den):  # exact half-up basis points of num/den
        return F.expr(f"(20000 * ({num}) + ({den})) div (2 * ({den}))")

    return cnts.select(
        "doc_id",
        "n_tok",
        "n_unique",
        "top_tok_cnt",
        "top_bigram_cnt",
        F.when(n == 0, F.lit(0).cast("bigint"))
        .otherwise(bp("n_tok - n_unique", "n_tok"))
        .alias("dup_tok_bp"),
        F.when(n == 0, F.lit(0).cast("bigint"))
        .otherwise(bp("top_tok_cnt", "n_tok"))
        .alias("top_tok_bp"),
        F.when(nb < 1, F.lit(0).cast("bigint"))
        .otherwise(bp("top_bigram_cnt", "n_tok - 1"))
        .alias("top_bigram_bp"),
    )


@query(
    "text_ngram_freq",
    oracle="""
    WITH tk AS (
        SELECT string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
        FROM documents
    ),
    bg AS (
        SELECT unnest(CASE WHEN n >= 2
            THEN list_transform(generate_series(1, n - 1),
                                i -> t[i] || ' ' || t[i + 1])
            ELSE [] END) AS bigram
        FROM tk
    ),
    c AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram),
    r AS (
        SELECT bigram, n,
               row_number() OVER (ORDER BY n DESC, bigram) AS rk
        FROM c
    )
    SELECT bigram, n, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 20
    """,
)
def text_ngram_freq(spark, sf_dir):
    """Corpus bigram frequencies, top-20 with a total-order tiebreak —
    the vocabulary-statistics pass (collocation mining, tokenizer
    diagnostics). Bigrams are built in the array domain (index
    transform, guarded for 1-token docs since Spark's sequence(1, 0)
    counts DOWN); the ranking window runs over bigram-vocabulary
    cardinality, which is corpus-bounded, not row-bounded."""
    t = Tables(spark, sf_dir)
    bg = (
        t.documents.select(F.split("text", " ").alias("t"))
        .select(
            # explode_outer: plain explode triggers the inferred
            # size()>0 scan filter that re-inlines `t` inside the
            # transform lambda — O(tokens²)/row (see curation.py note)
            F.explode_outer(
                F.when(
                    F.size("t") >= 2,
                    F.expr(
                        "transform(sequence(1, size(t) - 1), "
                        "i -> concat(element_at(t, i), ' ', "
                        "element_at(t, i + 1)))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bigram")
        )
        .filter(F.col("bigram").isNotNull())
    )
    c = bg.groupBy("bigram").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), "bigram")
    return (
        c.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 20)
    )


@query(
    "text_entropy_score",
    oracle="""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    c AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(coalesce(list_sum(list_transform(list_distinct(toks),
                   d -> CAST(floor(
                        len(list_filter(toks, x -> x = d)) *
                        log2(len(list_filter(toks, x -> x = d))) * 10000
                        + 0.5) AS BIGINT))), 0) AS BIGINT) AS s_fp
        FROM tk
    )
    SELECT doc_id, n_tok, s_fp,
           CASE WHEN n_tok = 0 THEN 0 ELSE
               CAST(floor(log2(n_tok) * 10000 + 0.5) AS BIGINT)
               - (s_fp // n_tok)
           END AS entropy_fp
    FROM c
    """,
)
def text_entropy_score(spark, sf_dir):
    """Token-entropy quality signal: Shannon entropy of the per-doc
    token distribution, H = log2(n) - (Σ c·log2 c)/n — low-entropy
    docs are template/boilerplate spam, near-zero means one token
    repeated. Emitted in exact fixed-point (1e-4) so both engines
    agree bit-for-bit: each run's c·log2(c) is floored to a bigint
    BEFORE summing (bigint sums are order-independent; double sums are
    not), and log2 parity under this floor is exhaustively verified
    for counts up to 2e5 in tests/test_properties.py.

    Scale shape: entirely MAP-ONLY — multiplicities come from run
    lengths of the *sorted* token array (same fold as
    text_repetition_score), so no explode, no shuffle; at 100 TB this
    scales with bytes scanned. The DuckDB oracle uses the O(u·n)
    list_distinct form instead — same values, grader-scale only."""
    t = Tables(spark, sf_dir)

    def entropy_sum(sorted_col):
        # Σ floor(run·log2(run)·1e4 + 0.5) over equal-runs of a sorted
        # array, via struct-accumulator fold
        zero = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("s"),
        )

        def term(run):
            return F.when(
                run > 1,
                F.floor(run * F.log2(run) * 10000 + 0.5).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))

        def step(acc, x):
            same = x == acc.prev
            return F.struct(
                x.alias("prev"),
                F.when(same, acc.run + 1).otherwise(F.lit(1).cast("bigint")).alias("run"),
                F.when(same, acc.s).otherwise(acc.s + term(acc.run)).alias("s"),
            )

        return F.aggregate(sorted_col, zero, step, lambda acc: acc.s + term(acc.run))

    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = t.documents.select("doc_id", F.sort_array(toks).alias("toks"))
    n_tok = F.size("toks").cast("bigint")
    d = d.select("doc_id", n_tok.alias("n_tok"), entropy_sum(F.col("toks")).alias("s_fp"))
    return d.select(
        "doc_id",
        "n_tok",
        "s_fp",
        F.when(F.col("n_tok") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(F.log2("n_tok") * 10000 + 0.5).cast("bigint")
            - F.expr("s_fp div n_tok")
        )
        .alias("entropy_fp"),
    )
