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
from ..functions.vectors import NONZERO_EMB_SQL, cosine, sq_norm, to_double
from ._util import ffix, ofix, r4

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
    # try_divide: empty docs (0 tokens / 0 chars) score NULL — the same
    # NULL DuckDB's x/0 yields, so the oracle needs no change (r10)
    return s.select(
        "*",
        r4(
            F.try_divide(F.col("n_chars_m").cast("double"), F.col("n_tokens"))
        ).alias("avg_token_len"),
        r4(
            F.try_divide(F.col("n_punct").cast("double"), F.col("n_chars_m"))
        ).alias("punct_ratio"),
        r4(
            F.least(F.col("n_tokens").cast("double") / 50.0, F.lit(1.0))
            * (
                1.0
                - F.try_divide(
                    F.col("n_punct").cast("double"), F.col("n_chars_m")
                )
            )
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
           CASE WHEN text IS NOT NULL THEN
               md5(coalesce(array_to_string(list_sort(list_distinct(
                   list_filter(string_split(text, ' '), t -> t <> ''))),
                   ' '), ''))
           END AS set_fingerprint,
           CASE WHEN text IS NOT NULL THEN
               md5(coalesce(array_to_string(string_split(text, ' ')[1:8],
                                            ' '), ''))
           END AS prefix_fingerprint
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
        r4(
            F.try_divide(F.col("n_chars_m").cast("double"), F.col("n_words"))
        ).alias("chars_per_word"),
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
               list_filter(string_split(coalesce(text, ''), ' '),
                           t -> t <> '') AS toks
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

    # coalesce: NULL text scores like an empty doc on both sides (r10)
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda x: x != "",
    )
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


#: BM25 parameters and the fixed keyword query (terms chosen from the
#: corpus vocabulary with distinct document frequencies)
BM25_K1, BM25_B = 1.2, 0.75
BM25_TERMS = ("join", "vector", "scan")
BM25_TOPK = 20


def _bm25_score_sql(i: int) -> str:
    """Per-term BM25 contribution — written with the EXACT operation
    order the Spark side uses, so the doubles match bit-for-bit."""
    return (
        f"(CAST(idf{i} AS DOUBLE) / 10000.0) * (tf{i} * {BM25_K1 + 1!r})"
        f" / (tf{i} + {BM25_K1!r} * ({1 - BM25_B!r} + {BM25_B!r}"
        f" * (CAST(len * n AS DOUBLE) / sl)))"
    )


def _bm25_scored_cte() -> str:
    """WITH-body fragment producing ``scored(doc_id, score_fp)`` —
    shared by the BM25 top-k oracle and the RRF hybrid oracle."""
    tf_cols = ", ".join(
        f"len(list_filter(tk, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    idf_cols = ", ".join(
        f"CAST(floor(log2(2 * n - 2 * df{i} + 1) * 10000 + 0.5) AS BIGINT)"
        f" - CAST(floor(log2(2 * df{i} + 1) * 10000 + 0.5) AS BIGINT)"
        f" AS idf{i}"
        for i in range(len(BM25_TERMS))
    )
    score = " + ".join(_bm25_score_sql(i) for i in range(len(BM25_TERMS)))
    return f"""d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS tk
        FROM documents
    ),
    c AS (SELECT doc_id, len(tk) AS len, {tf_cols} FROM d),
    s AS (SELECT count(*) AS n, CAST(sum(len) AS BIGINT) AS sl, {df_cols}
          FROM c),
    si AS (SELECT *, {idf_cols} FROM s),
    scored AS (
        SELECT doc_id, CAST(floor(({score}) * 10000 + 0.5) AS BIGINT)
                   AS score_fp
        FROM c, si
    )"""


def _bm25_oracle() -> str:
    return f"""
    WITH {_bm25_scored_cte()}
    SELECT doc_id, score_fp / 10000.0 AS bm25
    FROM scored
    ORDER BY score_fp DESC, doc_id
    LIMIT {BM25_TOPK}
    """


def _eq_term(term: str):
    # a plain 1-arg lambda: a 2-arg lambda (even via default args) is
    # treated by F.filter as the (element, index) form
    return lambda x: x == term


@query("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark, sf_dir):
    """BM25 keyword retrieval: top-{20} documents for a fixed 3-term
    query (k1=1.2, b=0.75; idf in log2 — a positive constant factor
    off the ln form, rank-identical).

    Engine-exactness: term frequencies come from in-row array filters
    (map-only, no explode/shuffle); N, Σlen and the per-term dfs are
    ONE global aggregate broadcast back; idf is a DIFFERENCE of
    floored log2s of odd integers (2N−2df+1, 2df+1 — the
    integer-argument class whose cross-engine floor parity is
    property-tested), and the score formula is written with identical
    operation order in both engines, so the final doubles are
    bit-identical and the top-k cut (fixed-point score, doc_id
    tiebreak) is deterministic. Scale: score is embarrassingly
    parallel; the only data-sized exchange is the top-k
    TakeOrdered — no per-term posting-list shuffle exists at all.
    """
    return (
        _bm25_scored(Tables(spark, sf_dir))
        .orderBy(F.col("score_fp").desc(), "doc_id")
        .limit(BM25_TOPK)
        .select("doc_id", (F.col("score_fp") / 10000.0).alias("bm25"))
    )


def _bm25_scored(t):
    """(doc_id, score_fp) for every document — the Spark twin of
    :func:`_bm25_scored_cte`, shared by BM25 top-k and the RRF hybrid."""
    tk = F.filter(F.split("text", " "), lambda x: x != "")
    # r16: `c` feeds the global stats aggregate AND the scoring
    # projection; without the lazy checkpoint the broadcast barrier
    # serializes TWO full tokenize passes (the BroadcastExchange must
    # finish before the probe side starts, so the diamond can't even
    # overlap). The checkpoint stores 5 numeric columns per doc — one
    # corpus read, one tiny materialization.
    c = t.documents.select(
        "doc_id",
        F.size(tk).alias("len"),
        *[
            F.size(F.filter(tk, _eq_term(t_))).alias(f"tf{i}")
            for i, t_ in enumerate(BM25_TERMS)
        ],
    ).localCheckpoint(eager=False)
    stats = c.agg(
        F.count("*").alias("n"),
        F.sum("len").cast("bigint").alias("sl"),
        *[
            F.count_if(F.col(f"tf{i}") > 0).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = c.crossJoin(F.broadcast(stats))
    n, sl = F.col("n"), F.col("sl")
    total = None
    for i in range(len(BM25_TERMS)):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = (
            F.floor(F.log2(2 * n - 2 * df + 1) * 10000 + 0.5).cast("bigint")
            - F.floor(F.log2(2 * df + 1) * 10000 + 0.5).cast("bigint")
        )
        term = (
            (idf.cast("double") / 10000.0)
            * (tf * (BM25_K1 + 1))
            / (
                tf
                + BM25_K1
                * (
                    (1 - BM25_B)
                    + BM25_B * (( F.col("len") * n).cast("double") / sl)
                )
            )
        )
        total = term if total is None else total + term
    score_fp = F.floor(total * 10000 + 0.5).cast("bigint")
    return scored.select("doc_id", score_fp.alias("score_fp"))


#: RRF constant (Cormack et al. 2009's k=60) and hybrid cut
RRF_K, RRF_TOPK = 60, 15


@query(
    "sim_hybrid_rrf",
    oracle=f"""
    WITH {_bm25_scored_cte()},
    lexr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY score_fp DESC, doc_id) AS r_lex
        FROM scored
    ),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
          WHERE {NONZERO_EMB_SQL} ORDER BY vec_id LIMIT 1),
    vec AS (
        SELECT vec_id,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe),
                     4) AS sim
        FROM (SELECT * FROM embeddings WHERE {NONZERO_EMB_SQL}) embeddings, q
    ),
    vecr AS (
        SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS r_vec
        FROM vec
    ),
    fused AS (
        SELECT doc_id, r_lex, r_vec,
               CAST(1 AS DOUBLE) / ({RRF_K} + r_lex)
                   + CAST(1 AS DOUBLE) / ({RRF_K} + r_vec) AS rrf
        FROM lexr JOIN vecr ON doc_id = vec_id
    )
    SELECT doc_id, r_lex, r_vec,
           floor(rrf * 1000000 + 0.5) / 1000000.0 AS rrf
    FROM fused
    ORDER BY floor(rrf * 1000000 + 0.5) DESC, doc_id
    LIMIT {RRF_TOPK}
    """,
)
def sim_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion (k=60, Cormack et al.
    2009) of the BM25 keyword ranking and the dense cosine ranking
    against query vector vec_id=0 — the fusion step every
    lexical+vector search stack runs.

    RRF operates on RANKS, which are exact integers on both engines
    (both orderings cut on fixed-point scores with id tiebreaks), so
    the fused score 1/(60+r_lex) + 1/(60+r_vec) divides identical
    integers — no float provenance from either scorer leaks into the
    fusion. Scale: each side's global ranking is a top-k problem
    (TakeOrdered; the full row_number here ranks ALL docs only
    because the fusion wants complete rank lists — at 100 TB you cut
    both lists to the fusion window first, which bounds rank depth by
    construction). The doc↔vec join is the modality bridge on the
    shared id."""
    t = Tables(spark, sf_dir)
    lex = _bm25_scored(t).withColumn(
        "r_lex",
        F.row_number().over(
            Window.orderBy(F.col("score_fp").desc(), "doc_id")
        ),
    )
    # dense side: first nonzero-norm vector is the query (vec_id 0 on
    # the driver corpus); zero-norm vectors have no cosine rank and are
    # excluded from the dense list (r10 stress corpus)
    nz = t.embeddings.filter(sq_norm(to_double("embedding")) > 0)
    q = nz.orderBy("vec_id").limit(1).select(
        to_double("embedding").alias("qe")
    )
    vec = nz.crossJoin(F.broadcast(q)).select(
        "vec_id", r4(cosine(to_double("embedding"), F.col("qe"))).alias("sim")
    )
    vecr = vec.withColumn(
        "r_vec",
        F.row_number().over(Window.orderBy(F.col("sim").desc(), "vec_id")),
    )
    rrf = F.lit(1).cast("double") / (RRF_K + F.col("r_lex")) + F.lit(1).cast(
        "double"
    ) / (RRF_K + F.col("r_vec"))
    rrf_fp = F.floor(rrf * 1000000 + 0.5)
    return (
        lex.join(vecr, lex.doc_id == vecr.vec_id)
        .select("doc_id", "r_lex", "r_vec", rrf_fp.alias("rrf_fp"))
        .orderBy(F.col("rrf_fp").desc(), "doc_id")
        .limit(RRF_TOPK)
        .select(
            "doc_id",
            F.col("r_lex").cast("bigint").alias("r_lex"),
            F.col("r_vec").cast("bigint").alias("r_vec"),
            (F.col("rrf_fp") / 1000000.0).alias("rrf"),
        )
    )


#: PMI collocation thresholds: drop bigrams seen fewer than this many
#: times (PMI is noise below small counts)
PMI_MIN_COUNT, PMI_TOPK = 25, 40


@query(
    "text_pmi_bigrams",
    oracle=f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    bg AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM tk, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1))
                          AS i) s
    ),
    cxy AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY w1, w2),
    cx AS (SELECT w1 AS w, count(*) AS c_x FROM bg GROUP BY w1),
    cy AS (SELECT w2 AS w, count(*) AS c_y FROM bg GROUP BY w2),
    n AS (SELECT count(*) AS total FROM bg),
    scored AS (
        SELECT w1, w2, c_xy,
               CAST(floor(log2(c_xy * total) * 10000 + 0.5) AS BIGINT)
                   - CAST(floor(log2(c_x * c_y) * 10000 + 0.5) AS BIGINT)
                   AS pmi_fp
        FROM cxy
        JOIN cx ON cx.w = w1
        JOIN cy ON cy.w = w2, n
        WHERE c_xy >= {PMI_MIN_COUNT}
    )
    SELECT w1, w2, c_xy, pmi_fp / 10000.0 AS pmi
    FROM scored
    ORDER BY pmi_fp DESC, w1, w2
    LIMIT {PMI_TOPK}
    """,
)
def text_pmi_bigrams(spark, sf_dir):
    """Collocation mining: top bigrams by pointwise mutual information
    PMI = log2(c_xy·N / (c_x·c_y)) with a minimum-count gate — the
    phrase detector (word2vec's phrase pass, "new york"-style merges)
    a tokenizer pipeline runs before vocabulary induction.

    PMI's argument is a RATIO OF INTEGERS, so it is computed as a
    difference of floored log2s of integer products (c_xy·N and
    c_x·c_y both « 2^63) — the cross-engine-exact pattern shared with
    BM25's idf; ranking and the top-k cut happen on the integer
    fixed-point PMI with a word tiebreak. Scale shape: ONE explode to
    bigram pairs feeding a single (w1, w2) hash aggregate — the unigram
    marginals and the corpus total are exact sums of c_xy
    (c_x = Σ_w2 c_xy, c_y = Σ_w1 c_xy, N = Σ c_xy), so they derive from
    the |vocab²|-sized counts table instead of re-reading the corpus;
    the counts table is lazily checkpointed so its four consumers share
    one tokenize+explode pass. Marginals are |vocab|-sized and
    broadcast."""
    t = Tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    tk = t.documents.select(toks.alias("toks"))
    bg = tk.select(
        F.explode(
            F.zip_with(
                F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice(
                    "toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))
                ),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cxy = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
        .localCheckpoint(eager=False)
    )
    cx = cxy.groupBy(F.col("w1").alias("w")).agg(F.sum("c_xy").alias("c_x"))
    cy = cxy.groupBy(F.col("w2").alias("w")).agg(F.sum("c_xy").alias("c_y"))
    n = cxy.agg(F.sum("c_xy").alias("total"))
    scored = (
        cxy.filter(F.col("c_xy") >= PMI_MIN_COUNT)
        .join(F.broadcast(cx.withColumnRenamed("w", "w1")), "w1")
        .join(F.broadcast(cy.withColumnRenamed("w", "w2")), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c_xy",
            (
                F.floor(F.log2(F.col("c_xy") * F.col("total")) * 10000 + 0.5)
                .cast("bigint")
                - F.floor(F.log2(F.col("c_x") * F.col("c_y")) * 10000 + 0.5)
                .cast("bigint")
            ).alias("pmi_fp"),
        )
    )
    return (
        scored.orderBy(F.col("pmi_fp").desc(), "w1", "w2")
        .limit(PMI_TOPK)
        .select("w1", "w2", "c_xy", (F.col("pmi_fp") / 10000.0).alias("pmi"))
    )


@query(
    "text_novelty_fraction",
    oracle=f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    tg AS (
        SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
        FROM tk, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2))
                          AS i) s
        WHERE len(toks) >= 3
    ),
    firstseen AS (SELECT g, min(doc_id) AS first_doc FROM tg GROUP BY g)
    SELECT tg.doc_id,
           count(*) AS n_grams,
           count(*) FILTER (WHERE f.first_doc = tg.doc_id) AS n_novel,
           {ofix('CAST(count(*) FILTER (WHERE f.first_doc = tg.doc_id)'
                 ' AS DOUBLE) / count(*)', 6)} AS novelty
    FROM tg JOIN firstseen f ON tg.g = f.g
    GROUP BY tg.doc_id
    """,
)
def text_novelty_fraction(spark, sf_dir):
    """Corpus-order novelty scoring: the fraction of each document's
    distinct word trigrams that appear for the FIRST time in that
    document (first = lowest doc_id — ingestion order) — the
    freshness/redundancy signal curation uses to prefer novel text
    over recombinations of what the corpus already holds (and the
    aggregate view of decontaminate_ngram_overlap's pairwise check).

    Shape: trigrams build in-row (the shingle transform — no
    token-level explode), dedup per doc, then ONE gram-keyed
    aggregate finds each gram's first document and joins back on the
    same gram key — two shuffles on the gram domain total; the
    novelty ratio divides two exact counts."""
    t = Tables(spark, sf_dir)
    # shingles via zip_with over slices — the array is referenced
    # per ROW, never inside a per-element lambda (where CollapseProject
    # re-inlines the token pipeline and the build goes O(tokens²); the
    # same fix took the MLlib minhash variant from 18 s to 4 s at sf0.1)
    from .mllib_lsh import _shingled_docs

    # Single-lineage shape (r16, the tfidf/exact-substring pattern):
    # repartition the gram stream by g — hash(g) satisfies the
    # (doc_id, g) clustering, so the per-doc distinct AND the
    # first-seen window (min doc_id over g) ride ONE exchange; the
    # old firstseen self-aggregate + join re-ran the shingle lineage
    # on both sides of its join.
    tg = (
        _shingled_docs(t)
        .select("doc_id", F.explode("tokens").alias("g"))
        .repartition("g")
        .dropDuplicates(["doc_id", "g"])
    )
    joined = tg.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("g"))
    )
    novel = F.count_if(F.col("first_doc") == F.col("doc_id"))
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        novel.alias("n_novel"),
        ffix(novel.cast("double") / F.count("*"), 6).alias("novelty"),
    )


#: Zipf fit depth: regression over the top-K token ranks per language
ZIPF_TOPK = 50


@query(
    "text_zipf_slope",
    oracle=f"""
    WITH tok AS (
        SELECT lang, unnest(list_filter(string_split(text, ' '),
                                        t -> t <> '')) AS tk
        FROM documents
    ),
    c AS (SELECT lang, tk, count(*) AS cnt FROM tok GROUP BY lang, tk),
    ranked AS (
        SELECT lang, cnt,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY cnt DESC, tk) AS rnk
        FROM c
    ),
    pts AS (
        SELECT lang,
               CAST(floor(log2(rnk) * 10000 + 0.5) AS BIGINT) AS x,
               CAST(floor(log2(cnt) * 10000 + 0.5) AS BIGINT) AS y
        FROM ranked WHERE rnk <= {ZIPF_TOPK}
    ),
    s AS (
        SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM pts GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_points,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 10000 + 0.5)
               / 10000.0 AS zipf_slope
    FROM s
    """,
)
def text_zipf_slope(spark, sf_dir):
    """Zipf-law fit per language: least-squares slope of log2(count)
    against log2(rank) over the top-{50} tokens — healthy natural text
    sits near −1; a slope collapsing toward 0 flags template/spam
    corpora, making this a distribution-level quality gate (the
    corpus-level sibling of the per-doc entropy score).

    Ranks and counts are integers, so both regression coordinates are
    floored log2s of integers (the property-tested parity class) and
    the OLS slope is integer algebra (n·Σxy − ΣxΣy, n·Σx² − (Σx)²)
    down to ONE double division. Cost: the token count table, one
    |vocab|-sized window for ranks, then a {50}-point regression per
    language — the explode is this operator's only data-scale term."""
    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        "lang",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("tk"),
    )
    c = tok.groupBy("lang", "tk").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "tk")
    pts = (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= ZIPF_TOPK)
        .select(
            "lang",
            F.floor(F.log2("rnk") * 10000 + 0.5).cast("bigint").alias("x"),
            F.floor(F.log2("cnt") * 10000 + 0.5).cast("bigint").alias("y"),
        )
    )
    s = pts.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy).cast("double") / (
        n * F.col("sxx") - sx * sx
    ).cast("double")
    return s.select(
        "lang",
        n.cast("bigint").alias("n_points"),
        (F.floor(slope * 10000 + 0.5) / 10000.0).alias("zipf_slope"),
    )


@query(
    "text_lang_confusion",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, lang,
               {_lang_hits_sql('en')} AS h_en,
               {_lang_hits_sql('es')} AS h_es,
               {_lang_hits_sql('de')} AS h_de,
               {_lang_hits_sql('fr')} AS h_fr,
               {_lang_hits_sql('zh')} AS h_zh
        FROM documents
    ),
    g AS (
        SELECT lang AS actual,
               CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr
                         AND h_en >= h_zh THEN 'en'
                    WHEN h_es >= h_de AND h_es >= h_fr AND h_es >= h_zh
                        THEN 'es'
                    WHEN h_de >= h_fr AND h_de >= h_zh THEN 'de'
                    WHEN h_fr >= h_zh THEN 'fr'
                    ELSE 'zh' END AS guessed
        FROM h
    ),
    t AS (SELECT actual, count(*) AS n_actual FROM g GROUP BY actual)
    SELECT g.actual, g.guessed, count(*) AS n,
           {ofix('CAST(count(*) AS DOUBLE) / n_actual', 6)} AS row_share
    FROM g JOIN t ON g.actual = t.actual
    GROUP BY g.actual, g.guessed, t.n_actual
    """,
)
def text_lang_confusion(spark, sf_dir):
    """Classifier-evaluation rollup for the stopword language-ID: the
    (actual, guessed) confusion matrix with row-normalized shares —
    diagonal = per-language recall, off-diagonal cells name exactly
    WHICH languages bleed into which (the artifact a model card
    publishes, and the aggregate verdict on text_lang_id's per-doc
    guesses).

    Same map-only hit counting as text_lang_id, then two tiny
    aggregates on the ≤|langs|² key space; shares divide exact
    counts. The evaluation costs one corpus scan regardless of
    scale."""
    t = Tables(spark, sf_dir)
    langs = ["en", "es", "de", "fr", "zh"]
    h = t.documents.select(
        F.col("lang").alias("actual"),
        *[_lang_hits_spark(lg).alias(f"h_{lg}") for lg in langs],
    )
    guess = F.lit("zh")
    for lg in reversed(langs[:-1]):
        later = [f"h_{x}" for x in langs[langs.index(lg) + 1 :]]
        cond = F.lit(True)
        for other in later:
            cond = cond & (F.col(f"h_{lg}") >= F.col(other))
        guess = F.when(cond, F.lit(lg)).otherwise(guess)
    g = h.select("actual", guess.alias("guessed"))
    tot = g.groupBy("actual").agg(F.count("*").alias("n_actual"))
    return (
        g.groupBy("actual", "guessed")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(tot), "actual")
        .select(
            "actual",
            "guessed",
            "n",
            ffix(F.col("n").cast("double") / F.col("n_actual"), 6).alias(
                "row_share"
            ),
        )
    )


@query(
    "text_boilerplate_prefixes",
    oracle="""
    WITH p AS (
        SELECT doc_id, source,
               array_to_string(
                   list_filter(string_split(text, ' '), t -> t <> '')[1:8],
                   ' ') AS prefix
        FROM documents
    ),
    c AS (
        SELECT source, prefix, count(*) AS n_docs
        FROM p GROUP BY source, prefix
    ),
    t AS (SELECT source, sum(n_docs) AS tot FROM c GROUP BY source)
    SELECT c.source, md5(c.prefix) AS prefix_hash, c.n_docs,
           floor(CAST(c.n_docs AS DOUBLE) / tot * 1000000 + 0.5)
               / 1000000.0 AS share
    FROM c JOIN t ON c.source = t.source
    WHERE c.n_docs >= 3
    """,
)
def text_boilerplate_prefixes(spark, sf_dir):
    """Boilerplate detection: 8-token document prefixes repeated ≥3
    times within a source, with their share of that source's docs —
    the template-header finder behind C4-style boilerplate stripping
    (a prefix carried by half a source's documents is navigation/
    licence text, not content). Prefixes are reported hashed (they
    can be long); the share divides exact counts.

    Map-only prefix extraction, one (source, prefix) aggregate, and a
    source-marginal broadcast back — the same one-shuffle audit shape
    as the other corpus gates."""
    t = Tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    p = t.documents.select(
        "source", F.array_join(F.slice(toks, 1, 8), " ").alias("prefix")
    )
    c = p.groupBy("source", "prefix").agg(F.count("*").alias("n_docs"))
    tot = c.groupBy("source").agg(F.sum("n_docs").alias("tot"))
    return (
        c.filter(F.col("n_docs") >= 3)
        .join(F.broadcast(tot), "source")
        .select(
            "source",
            F.md5("prefix").alias("prefix_hash"),
            "n_docs",
            (
                F.floor(
                    F.col("n_docs").cast("double") / F.col("tot") * 1000000
                    + 0.5
                )
                / 1000000.0
            ).alias("share"),
        )
    )


@query(
    "text_readability_flesch",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]')), 1)
                   AS n_sentences,
               greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                   AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           floor((206.835
                  - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                  - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                 * 10000 + 0.5) / 10000.0 AS flesch
    FROM m
    """,
)
def text_readability_flesch(spark, sf_dir):
    """Flesch reading-ease per document — the grade-level gate corpus
    curation applies alongside Gopher-style quality rules (very low
    scores flag run-on machine text, very high ones flag word salad).

    Syllables use the standard regex proxy (maximal vowel-group runs,
    y counted as a vowel); sentences count terminal punctuation with a
    floor of 1. Everything is a map-only projection: two regexp_count
    scans + one split per row, no shuffle at all — the output is keyed
    by doc_id. The score arithmetic is three IEEE ops on exact
    integer-ratio doubles with literal constants, identical in both
    engines, then fixed-point floor presentation."""
    t = Tables(spark, sf_dir)
    n_words = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    n_sent = F.greatest(F.regexp_count("text", F.lit("[.!?]")), F.lit(1))
    n_syl = F.greatest(
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+")), F.lit(1)
    )
    m = t.documents.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syl.cast("bigint").alias("n_syllables"),
    )
    # try_divide: a 0-word doc has no readability — NULL, matching the
    # oracle's NULL-on-/0 (n_sentences/n_syllables are floored at 1)
    score = (
        F.lit(206.835)
        - F.lit(1.015)
          * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - F.lit(84.6)
          * F.try_divide(F.col("n_syllables").cast("double"), F.col("n_words"))
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.floor(score * 10000 + 0.5) / 10000.0).alias("flesch"),
    )
