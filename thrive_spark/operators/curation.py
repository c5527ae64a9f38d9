"""Training-data curation operators: deterministic sampling, dataset
splitting, token-budget quotas, PII scrubbing, context-window chunk
packing, and column profiling — the corpus-assembly passes that sit
between scoring/dedup and the tokenizer in a pretraining pipeline.

Design for 100 TB:

- Sampling and splitting are **hash-based, not random**: membership is
  a pure function of the row key (md5 hex prefix compared against a
  threshold), so the sample is reproducible across runs, engines, and
  cluster layouts, needs no seed coordination, and stays a map-only
  filter Catalyst can push to the scan boundary. This is the only
  sampling style that survives re-partitioning (rand()-based sampling
  changes membership whenever the partitioning changes).
- Quota sampling needs a per-language running total → one shuffle,
  partitioned by the (low-cardinality) language key; everything else
  in this module is shuffle-free per-row projection.
- Chunk packing explodes each doc into overlapping windows in the
  ARRAY domain (sequence → slice) — no Python, output rows ~= tokens /
  stride, linear in bytes scanned.

Reference parity: the reference's curation stage (sampler / splitter /
quota / scrubber pipeline stages) — re-expressed as Catalyst-friendly
single-pass projections rather than its imperative row loops.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import dsum, ffix, ofix, osum, r4

#: md5-hex first-char thresholds per language — the per-stratum keep
#: fraction in 16ths (en kept at 4/16, zh fully kept, etc.); tune per
#: corpus-mix target exactly like a mix-weighting table
LANG_KEEP_16THS = {"en": 4, "es": 6, "de": 8, "fr": 12, "zh": 16}

_HEX = "0123456789abcdef"


def _hex_lt(prefix_col, n_16ths: int):
    """True iff the first md5 hex char is one of the n lowest — a
    deterministic Bernoulli(n/16) on the hashed key."""
    return prefix_col.isin(*list(_HEX[:n_16ths]))


@query(
    "sample_hash_stratified",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars_m,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS hx
        FROM documents
    )
    SELECT doc_id, lang, n_chars_m
    FROM h
    WHERE CASE lang
        {" ".join(f"WHEN '{lg}' THEN hx IN ({', '.join(repr(c) for c in _HEX[:n])})" for lg, n in LANG_KEEP_16THS.items())}
        ELSE FALSE END
    """,
)
def sample_hash_stratified(spark, sf_dir):
    """Stratified deterministic sampling: per-language keep fractions
    applied via an md5-prefix test on doc_id. Membership is a pure
    function of the key — reproducible on any cluster layout and fully
    pushdown-able (a map-only filter, no rand(), no seed plumbing)."""
    t = Tables(spark, sf_dir)
    hx = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    keep = F.lit(False)
    for lg, n in LANG_KEEP_16THS.items():
        keep = F.when(F.col("lang") == lg, _hex_lt(hx, n)).otherwise(keep)
    return t.documents.filter(keep).select(
        "doc_id", "lang", F.length("text").cast("bigint").alias("n_chars_m")
    )


@query(
    "split_train_holdout",
    oracle="""
    WITH s AS (
        SELECT lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)
                         IN ('e', 'f')
                    THEN 'holdout' ELSE 'train' END AS split,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        FROM documents
    )
    SELECT lang, split, count(*) AS n_docs,
           CAST(sum(est_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY lang, split
    """,
)
def split_train_holdout(spark, sf_dir):
    """Deterministic train/holdout split (7/8 vs 1/8 by the SECOND md5
    hex char, independent of the sampling char so the two gates
    compose without correlation). Emits the per-(lang, split) doc and
    token budget — the manifest a training job reads."""
    t = Tables(spark, sf_dir)
    hx2 = F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1)
    return (
        t.documents.select(
            "lang",
            F.when(hx2.isin("e", "f"), F.lit("holdout"))
            .otherwise(F.lit("train"))
            .alias("split"),
            F.ceil(F.length("text") / 4.0).cast("bigint").alias("est_tokens"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("est_tokens").alias("total_tokens"),
        )
    )


@query(
    "split_dedup_safe",
    oracle="""
    WITH h AS (
        SELECT doc_id, lang, coalesce(md5(text), '') AS th,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        FROM documents
    ),
    k AS (
        SELECT th, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM h GROUP BY th
    ),
    s AS (
        SELECT h.lang,
               CASE WHEN substr(md5(CAST(k.keep_id AS VARCHAR)), 2, 1)
                         IN ('e', 'f')
                    THEN 'holdout' ELSE 'train' END AS split,
               h.th, h.est_tokens, k.n_copies
        FROM h JOIN k USING (th)
    )
    SELECT lang, split, count(*) AS n_docs,
           count(DISTINCT th) AS n_groups,
           CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
           CAST(sum(est_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY lang, split
    """,
)
def split_dedup_safe(spark, sf_dir):
    """Leakage-safe train/holdout split: the split decision is keyed on
    each document's exact-dup GROUP (canonical = min doc_id per content
    md5), so verbatim duplicates can never straddle train and holdout —
    the eval-contamination guard every LLM data pipeline needs in front
    of split_train_holdout's naive per-doc hash. Emits the per-(lang,
    split) manifest with group-integrity metrics (group count, docs
    living in multi-copy groups).

    Scale shape: documents shuffle once as (doc_id, 16-byte md5)
    projections to build the |distinct contents|-row group table, then
    join back on the content hash (uniform key, no skew; AQE broadcasts
    the group side when small). The split predicate is a pure function
    of the group's canonical id — reproducible on any cluster layout,
    no rand(), no seed plumbing. The same composition holds verbatim
    with a NEAR-dup canonical mapping (dedup_cluster_components roots)
    swapped in for the exact-hash grouping."""
    t = Tables(spark, sf_dir)
    # r16: `h` feeds the group aggregate AND the join probe; the
    # group side broadcasts (plan-verified), so without the lazy
    # checkpoint the broadcast barrier serializes TWO full
    # md5-of-text passes. The checkpoint stores 4 narrow columns per
    # doc (the 16-byte digest, never the text) — one corpus read.
    h = t.documents.select(
        "doc_id",
        "lang",
        F.coalesce(F.md5("text"), F.lit("")).alias("th"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("est_tokens"),
    ).localCheckpoint(eager=False)
    k = h.groupBy("th").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )
    hx2 = F.substring(F.md5(F.col("keep_id").cast("string")), 2, 1)
    s = h.join(k, "th").select(
        "lang",
        F.when(hx2.isin("e", "f"), F.lit("holdout"))
        .otherwise(F.lit("train"))
        .alias("split"),
        "th",
        "est_tokens",
        "n_copies",
    )
    return s.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("th").alias("n_groups"),
        F.sum((F.col("n_copies") > 1).cast("bigint")).alias("n_dup_docs"),
        F.sum("est_tokens").cast("bigint").alias("total_tokens"),
    )


#: per-language token budget for the quota sampler (column units:
#: chars/4 estimated tokens)
TOKEN_BUDGET = 5000


@query(
    "quota_sample_tokens",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, est_tokens,
               CAST(sum(est_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM s
    )
    SELECT doc_id, lang, est_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def quota_sample_tokens(spark, sf_dir):
    """Token-budget quota sampling: take documents per language (in
    deterministic doc_id order) until the language's token budget is
    hit — the corpus-mix assembly step. One shuffle on the tiny
    language key; the running sum is a single window pass."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.documents.select(
            "doc_id",
            "lang",
            F.ceil(F.length("text") / 4.0).cast("bigint").alias("est_tokens"),
        )
        .withColumn("cum_tokens", F.sum("est_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
    )


#: regexes shared by both engines (POSIX classes, no lookaround —
#: portable between Java regex and RE2)
_EMAIL_RE = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[.][a-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


@query(
    "text_redact_pii",
    oracle=f"""
    WITH dirty AS (
        SELECT doc_id,
               concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                      '@example.com or 555-',
                      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                   AS raw_text
        FROM documents
    ),
    red AS (
        SELECT doc_id, raw_text,
               regexp_replace(regexp_replace(raw_text,
                   '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text
        FROM dirty
    )
    SELECT doc_id, md5(clean_text) AS clean_hash,
           CAST(length(raw_text) - length(clean_text) AS BIGINT)
               AS chars_removed,
           CAST(len(regexp_extract_all(raw_text, '{_EMAIL_RE}'))
                + len(regexp_extract_all(raw_text, '{_PHONE_RE}'))
                AS BIGINT) AS n_redactions
    FROM red
    """,
)
def text_redact_pii(spark, sf_dir):
    """PII scrubbing: email + phone patterns replaced with typed
    placeholder tokens. The synthetic corpus has no PII, so the dirty
    text is constructed deterministically from doc_id first — the
    regex machinery, redaction counting, and hash verification are the
    real thing. Map-only; regexes are POSIX-portable (no lookaround)
    so the oracle runs the same patterns."""
    t = Tables(spark, sf_dir)
    dirty = t.documents.select(
        "doc_id",
        # coalesce: Spark concat() is NULL-propagating while DuckDB's
        # concat() skips NULL args — a NULL text must scrub like an
        # empty doc on both sides (r10 stress corpus)
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("raw_text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("raw_text", _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    red = dirty.select("doc_id", "raw_text", clean.alias("clean_text"))
    n_red = (
        F.size(F.regexp_extract_all("raw_text", F.lit(_EMAIL_RE), F.lit(0)))
        + F.size(F.regexp_extract_all("raw_text", F.lit(_PHONE_RE), F.lit(0)))
    ).cast("bigint")
    return red.select(
        "doc_id",
        F.md5("clean_text").alias("clean_hash"),
        (F.length("raw_text") - F.length("clean_text"))
        .cast("bigint")
        .alias("chars_removed"),
        n_red.alias("n_redactions"),
    )


#: chunk geometry: window of 40 tokens advancing by 32 (8-token overlap)
CHUNK_LEN, CHUNK_STRIDE = 40, 32


@query(
    "chunk_fixed_tokens",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, CAST(s.start AS BIGINT) AS chunk_start,
               tk[s.start:s.start + {CHUNK_LEN - 1}] AS piece
        FROM toks,
             LATERAL (SELECT unnest(generate_series(1, n, {CHUNK_STRIDE}))
                      AS start) s
    )
    SELECT doc_id, chunk_start,
           CAST(len(piece) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(piece, ' ')) AS chunk_hash
    FROM chunks
    """,
)
def chunk_fixed_tokens(spark, sf_dir):
    """Context-window packing: each document exploded into overlapping
    fixed-size token windows ({CHUNK_LEN} tokens, stride {CHUNK_STRIDE})
    — the pre-tokenizer chunking pass. Pure array-domain (sequence →
    slice → explode), no Python, no shuffle; output volume ~ tokens /
    stride regardless of document skew."""
    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        F.split("text", " ").alias("tk"),
        F.size(F.split("text", " ")).alias("n"),
    )
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.col("n"), F.lit(CHUNK_STRIDE))
        ).alias("chunk_start"),
        "tk",
    ).select(
        "doc_id",
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.slice("tk", F.col("chunk_start"), CHUNK_LEN).alias("piece"),
    )
    return chunks.select(
        "doc_id",
        "chunk_start",
        F.size("piece").cast("bigint").alias("chunk_tokens"),
        F.md5(F.array_join("piece", " ")).alias("chunk_hash"),
    )


@query(
    "dq_profile_documents",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(count(text) AS BIGINT) AS text_nonnull,
           CAST(count(DISTINCT lang) AS BIGINT) AS lang_distinct,
           CAST(count(DISTINCT source) AS BIGINT) AS source_distinct,
           CAST(min(n_chars) AS BIGINT) AS n_chars_min,
           CAST(max(n_chars) AS BIGINT) AS n_chars_max,
           round(avg(CAST(length(text) AS DOUBLE)), 4) AS chars_avg,
           round(CAST(count(CASE WHEN length(text) < 20 THEN 1 END)
                      AS DOUBLE) / count(*), 4) AS short_doc_rate
    FROM documents
    """,
)
def dq_profile_documents(spark, sf_dir):
    """Single-pass data-quality profile of the corpus table: row/null
    counts, key-column cardinalities, length extremes, and the
    short-document rate (a typical ingest gate). One global aggregate
    — partial-agg map-side, a single row crosses the wire."""
    t = Tables(spark, sf_dir)
    return t.documents.agg(
        F.count("*").alias("n_rows"),
        F.count("text").cast("bigint").alias("text_nonnull"),
        F.countDistinct("lang").cast("bigint").alias("lang_distinct"),
        F.countDistinct("source").cast("bigint").alias("source_distinct"),
        F.min("n_chars").cast("bigint").alias("n_chars_min"),
        F.max("n_chars").cast("bigint").alias("n_chars_max"),
        r4(F.avg(F.length("text").cast("double"))).alias("chars_avg"),
        r4(
            F.count(F.when(F.length("text") < 20, 1)).cast("double")
            / F.count("*")
        ).alias("short_doc_rate"),
    )


#: docs kept per language by the per-stratum sampler
K_PER_GROUP = 10


@query(
    "sample_k_per_group",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {K_PER_GROUP}
    """,
)
def sample_k_per_group(spark, sf_dir):
    """Exactly-k-per-stratum sampling: rank documents inside each
    language by the md5 of their key and keep the first k — the
    deterministic equivalent of per-group reservoir sampling (a
    uniform k-subset whose membership is a pure function of the keys,
    stable across runs and cluster layouts). One shuffle on the
    language key; at scale, rank-within-group over a hash order is
    exactly the top-k window Spark solves with a bounded per-partition
    heap (no full sort of the group)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        t.documents.select(
            "doc_id", "lang", F.row_number().over(w).cast("bigint").alias("rk")
        )
        .filter(F.col("rk") <= K_PER_GROUP)
    )


@query(
    "decontaminate_ngram_overlap",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks,
               doc_id % 50 = 0 AS is_eval
        FROM documents
    ),
    g AS (
        SELECT doc_id, is_eval,
               CASE WHEN len(toks) >= 3
                    THEN list_distinct(list_transform(
                        generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                    ELSE [] END AS grams
        FROM d
    ),
    eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE is_eval),
    tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE NOT is_eval),
    hits AS (
        SELECT tg.doc_id, count(*) AS n_hit
        FROM tg JOIN eg USING (gram) GROUP BY tg.doc_id
    ),
    base AS (
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams
        FROM g WHERE NOT is_eval
    )
    SELECT b.doc_id, b.n_grams,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           CASE WHEN b.n_grams = 0 THEN 0 ELSE
               (20000 * coalesce(h.n_hit, 0) + b.n_grams) // (2 * b.n_grams)
           END AS contaminated_bp,
           CASE WHEN b.n_grams = 0 THEN 0 ELSE
               (20000 * coalesce(h.n_hit, 0) + b.n_grams) // (2 * b.n_grams)
           END >= 5000 AS is_contaminated
    FROM base b LEFT JOIN hits h ON b.doc_id = h.doc_id
    """,
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing token
    3-grams with a held-out eval slice (the n-gram overlap check every
    serious pretraining pipeline runs — GPT-3 §C / PaLM style, short
    n here because the synthetic docs are short). Eval membership is
    the deterministic ``doc_id % 50 == 0`` slice so both engines pick
    identical sets with no seed coordination.

    Scale shape: the eval gram set is ALWAYS small relative to the
    corpus (benchmarks are a few MB) → build it distinct and
    broadcast; the training side is one map-side explode joined
    against the broadcast + one groupBy(doc_id) shuffle that carries
    (doc_id, gram-hit) rows only. No corpus self-join anywhere.
    Contamination fraction is exact integer half-up basis points."""
    t = Tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    # 3-gram build via zip_with over slices (the SCALE.md idiom) —
    # never transform(sequence(...), i -> element_at(computed, i)),
    # which CollapseProject re-inlines per element (measured 4-5×).
    # size < 3 needs no CASE: n3 = 0 → empty slices → empty grams,
    # matching the oracle's ELSE [] branch.
    n3 = F.greatest(F.size("toks") - 2, F.lit(0))
    tri = F.zip_with(
        F.zip_with(
            F.slice("toks", 1, n3),
            F.slice("toks", 2, n3),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        F.slice("toks", 3, n3),
        lambda ab, c: F.concat_ws(" ", ab, c),
    )
    d = t.documents.select(
        "doc_id",
        toks.alias("toks"),
        (F.col("doc_id") % 50 == 0).alias("is_eval"),
    ).select(
        "doc_id",
        "is_eval",
        F.array_distinct(tri).alias("grams"),
    )
    # explode_outer, NOT explode: plain explode makes Catalyst infer a
    # size(grams) > 0 scan filter that inlines the whole gram
    # construction per element (the r5 trap), and the NULL row it
    # keeps for gram-less docs is what retains them in the output.
    eval_grams = (
        d.filter("is_eval")
        .select(F.explode_outer("grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
        .withColumn("mark", F.lit(1))
    )
    # SINGLE-PASS shape (r8, measured ~1.5× the two-branch original):
    # the train side builds grams ONCE — explode, broadcast LEFT join
    # against the marked eval-gram set, then one aggregate computes
    # n_grams (count of non-null grams) and n_hit (count of marks)
    # together, instead of a base/hits self-pair that constructed the
    # gram arrays twice and re-joined on doc_id.
    agg = (
        d.filter(~F.col("is_eval"))
        .select("doc_id", F.explode_outer("grams").alias("gram"))
        .join(F.broadcast(eval_grams), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").cast("bigint").alias("n_grams"),
            F.count("mark").cast("bigint").alias("n_hit"),
        )
    )
    bp = F.when(F.col("n_grams") == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr("(20000 * n_hit + n_grams) div (2 * n_grams)")
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "n_hit",
        bp.alias("contaminated_bp"),
        (bp >= 5000).alias("is_contaminated"),
    )


@query(
    "sample_domain_rebalance",
    oracle="""
    WITH s AS (
        SELECT doc_id, source,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS hx
        FROM documents
    ),
    p AS (
        SELECT source, CAST(sum(est_tokens) AS BIGINT) AS tok
        FROM s GROUP BY source
    ),
    tt AS (
        SELECT CAST(sum(tok) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS nsrc
        FROM p
    ),
    r AS (
        SELECT source,
               CAST(greatest(1, least(16, (16 * (total // nsrc)) // tok))
                    AS BIGINT) AS n16
        FROM p, tt
    )
    SELECT s.doc_id, s.source, s.est_tokens, r.n16
    FROM s JOIN r USING (source)
    WHERE strpos('0123456789abcdef', s.hx) <= r.n16
    """,
)
def sample_domain_rebalance(spark, sf_dir):
    """Domain-mix rebalancing (the RefinedWeb/C4 per-source cap): give
    every source an equal share of the token budget by computing a
    per-source keep rate and applying it as a deterministic hash
    filter. rate_s = clamp(target/tokens_s, 1/16, 1) is computed in
    PURE INTEGER math — (16 * (total div nsrc)) div tok — so both
    engines derive identical 16ths with no float division; membership
    is the md5-first-hex-char Bernoulli from sample_hash_stratified,
    reproducible across runs and partitionings.

    Scale shape: the per-source token census is a map-side-combined
    agg to a FEW rows (one per source); rates broadcast back over the
    corpus as a map-only filter. Two scans of the corpus beat one
    shuffle of it — the census scan reads 2 columns and the rebalance
    filter never materializes a shuffle of document bytes."""
    t = Tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id",
        "source",
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("est_tokens"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("hx"),
    )
    per_src = docs.groupBy("source").agg(F.sum("est_tokens").alias("tok"))
    totals = per_src.agg(
        F.sum("tok").alias("total"), F.count(F.lit(1)).alias("nsrc")
    )
    rates = (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            F.expr(
                "CAST(greatest(1L, least(16L, (16L * (total div nsrc)) div tok)) "
                "AS BIGINT)"
            ).alias("n16"),
        )
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(
            F.expr("instr('0123456789abcdef', hx)") <= F.col("n16")
        )
        .select("doc_id", "source", "est_tokens", "n16")
    )


@query(
    "sample_importance_weighted",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang,
               least(CAST(n_chars AS BIGINT) * 5, 10000) AS weight_bp,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 10000 AS u_bp
        FROM documents
    )
    SELECT doc_id, lang, weight_bp
    FROM w WHERE u_bp < weight_bp
    """,
)
def sample_importance_weighted(spark, sf_dir):
    """Importance-weighted deterministic sampling: each doc is kept
    with probability proportional to its length-derived weight (longer
    docs carry more tokens → higher keep rate, capped at 1), decided
    by comparing a uniform hash of the key against the weight — the
    weighted generalization of the md5-threshold Bernoulli used by
    `sample_hash_stratified`. Weight and uniform are both exact
    integers in basis points, so membership is engine-identical, a
    pure function of the key (survives repartitioning), and the whole
    operator is a map-only filter pushed to the scan."""
    t = Tables(spark, sf_dir)
    weight_bp = F.least(
        F.col("n_chars").cast("bigint") * 5, F.lit(10000).cast("bigint")
    )
    u_bp = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10000
    )
    return (
        t.documents.select(
            "doc_id", "lang", weight_bp.alias("weight_bp"), u_bp.alias("u_bp")
        )
        .filter(F.col("u_bp") < F.col("weight_bp"))
        .select("doc_id", "lang", "weight_bp")
    )


PACK_CAP = 512  # tokens per packed training sequence


@query(
    "pack_sequences_greedy",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    run AS (
        SELECT doc_id, source, n_tok,
               sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM toks
    )
    SELECT doc_id, source, n_tok,
           CAST((cum - n_tok) // {PACK_CAP} AS BIGINT) AS seq_id,
           CAST((cum - n_tok) % {PACK_CAP} AS BIGINT) AS seq_offset
    FROM run
    """,
)
def pack_sequences_greedy(spark, sf_dir):
    """Sequential sequence packing: concatenate documents (per source,
    in doc_id order) into fixed-capacity training sequences — the
    context-window packing pass that turns a ragged corpus into dense
    {PACK_CAP}-token rows for pretraining.

    Deterministic formulation: a running token cumsum per source;
    a document starts sequence ``prev_cum // cap`` at offset
    ``prev_cum % cap`` (documents spanning a boundary continue into
    the next sequence — the standard "pack then split" recipe, no
    first-fit bin search). One window over (source, doc_id) — a
    single shuffle on source, linear state, and the window key is the
    natural write-partitioning for the packed output. Skew: a giant
    source serializes its scan; salt the source key into
    sub-partitions of ~10⁶ docs and offset seq_id per salt for true
    100 TB runs.
    """
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = toks.withColumn("cum", F.sum("n_tok").over(w))
    # integer div, not floor(double /): cumsums at corpus scale exceed
    # double's 2^53 exact-integer range
    return run.select(
        "doc_id",
        "source",
        "n_tok",
        F.expr(f"(cum - n_tok) div {PACK_CAP}").alias("seq_id"),
        F.expr(f"(cum - n_tok) % {PACK_CAP}").alias("seq_offset"),
    )


@query(
    "sample_temperature_domains",
    oracle="""
    WITH w AS (
        SELECT source, sqrt(CAST(count(*) AS DOUBLE)) AS wgt
        FROM documents GROUP BY source
    ),
    mx AS (SELECT max(wgt) AS mw FROM w),
    gate AS (
        SELECT source,
               CAST(floor((wgt / mw) * 4294967296.0) AS BIGINT) AS cutoff
        FROM w, mx
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN gate g ON d.source = g.source
    WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 9, 8))
               AS BIGINT) < g.cutoff
    """,
)
def sample_temperature_domains(spark, sf_dir):
    """Temperature-scaled domain sampling (α = 0.5): per-source keep
    rate ∝ √n_source / max(√n) — the multinomial-temperature recipe
    (Conneau & Lample 2019 §3.1) that upsamples rare domains relative
    to head domains when assembling a pretraining mix.

    Engine-exact determinism: weights use sqrt (IEEE correctly-rounded
    in both engines, unlike pow), the cutoff is an integer in 2³²
    space, and membership is a pure md5-of-key gate (chars 9-16,
    independent of the sampling/split gates in this module) — so the
    sample is reproducible on any cluster layout and the gate is a
    map-side filter after one broadcast join of per-source cutoffs.
    """
    t = Tables(spark, sf_dir)
    w = t.documents.groupBy("source").agg(
        F.sqrt(F.count(F.lit(1)).cast("double")).alias("wgt")
    )
    gate = w.crossJoin(F.broadcast(w.agg(F.max("wgt").alias("mw")))).select(
        "source",
        F.floor((F.col("wgt") / F.col("mw")) * F.lit(4294967296.0))
        .cast("bigint")
        .alias("cutoff"),
    )
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10
    ).cast("long")
    return (
        t.documents.join(F.broadcast(gate), "source")
        .filter(u < F.col("cutoff"))
        .select("doc_id", "source")
    )


@query(
    "dq_expectations",
    oracle="""
    WITH checks AS (
      SELECT
        CAST(count(*) AS BIGINT) AS total,
        CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_empty_text,
        CAST(sum(CASE WHEN lang NOT IN ('en','es','de','fr','zh')
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_lang_domain,
        CAST(sum(CASE WHEN abs(n_chars - length(text)) > 5
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_nchars_drift,
        CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS v_nonpositive_len,
        CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS v_dup_key
      FROM documents
    )
    SELECT u.constraint, u.violations, checks.total
    FROM checks, LATERAL (VALUES
        ('empty_text',      v_empty_text),
        ('lang_domain',     v_lang_domain),
        ('nchars_drift',    v_nchars_drift),
        ('nonpositive_len', v_nonpositive_len),
        ('dup_key',         v_dup_key)
    ) AS u("constraint", violations)
    """,
)
def dq_expectations(spark, sf_dir):
    """Data-quality contract (Deequ/Great-Expectations role): declared
    constraints — non-empty text, closed lang domain, n_chars within
    drift tolerance of length(text), positive lengths, unique key —
    evaluated in ONE scan as conditional-count aggregates, then
    unpivoted to a (constraint, violations, total) report. Adding a
    constraint adds a column to the same single aggregate, not a new
    pass — at 100 TB the whole contract costs one map-side-combined
    aggregation regardless of how many rules it declares."""
    t = Tables(spark, sf_dir)
    viol = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    checks = t.documents.agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        viol(F.col("text").isNull() | (F.length("text") == 0)).alias(
            "v_empty_text"
        ),
        viol(~F.col("lang").isin("en", "es", "de", "fr", "zh")).alias(
            "v_lang_domain"
        ),
        viol(
            F.abs(F.col("n_chars") - F.length("text")) > 5
        ).alias("v_nchars_drift"),
        viol(F.col("n_chars") <= 0).alias("v_nonpositive_len"),
        (F.count(F.lit(1)) - F.count_distinct("doc_id"))
        .cast("long")
        .alias("v_dup_key"),
    )
    pairs = [
        ("empty_text", "v_empty_text"),
        ("lang_domain", "v_lang_domain"),
        ("nchars_drift", "v_nchars_drift"),
        ("nonpositive_len", "v_nonpositive_len"),
        ("dup_key", "v_dup_key"),
    ]
    return checks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint"),
                        F.col(col).alias("violations"),
                    )
                    for name, col in pairs
                ]
            )
        ).alias("r"),
        "total",
    ).select("r.constraint", "r.violations", "total")


@query(
    "dq_filter_cascade",
    oracle=f"""
    WITH toks AS (
        SELECT n_chars,
               list_filter(string_split(text, ' '), t -> t <> '') AS tk
        FROM documents
    ),
    g AS (
        SELECT CASE
            WHEN NOT (n_chars BETWEEN 100 AND 20000) THEN 'g1_length'
            WHEN NOT (len(tk) >= 20) THEN 'g2_tokens'
            WHEN NOT (2 * len(list_distinct(tk)) >= len(tk))
                THEN 'g3_repetition'
            ELSE 'pass' END AS stage
        FROM toks
    ),
    c AS (SELECT stage, count(*) AS n_docs FROM g GROUP BY stage),
    t AS (SELECT sum(n_docs) AS tot FROM c)
    SELECT stage, n_docs,
           {ofix('CAST(n_docs AS DOUBLE) / tot', 6)} AS share
    FROM c, t
    """,
)
def dq_filter_cascade(spark, sf_dir):
    """Quality-gate cascade audit: every document attributed to the
    FIRST gate it fails (length band → minimum tokens → duplicate-token
    ratio) or to 'pass' — the per-gate reject accounting a C4/Gopher
    style filter pipeline publishes with each corpus release.

    One pass, map-only until a 4-key aggregate: the gates are ordered
    CASE arms over JVM array ops (token list built once, reused by
    both token gates), the repetition test is the integer comparison
    2·|distinct| ≥ |tokens| (no division), and the share divides two
    exact integers. Gate ORDER matters and is part of the contract —
    attribution is to the first failure, so re-ordering gates changes
    the audit, not the surviving set."""
    t = Tables(spark, sf_dir)
    tk = F.filter(F.split("text", " "), lambda x: x != "")
    d = t.documents.select("n_chars", tk.alias("tk"))
    n_tok = F.size("tk")
    stage = (
        F.when(
            ~F.col("n_chars").between(100, 20000), F.lit("g1_length")
        )
        .when(n_tok < 20, F.lit("g2_tokens"))
        .when(
            2 * F.size(F.array_distinct("tk")) < n_tok,
            F.lit("g3_repetition"),
        )
        .otherwise(F.lit("pass"))
    )
    c = d.select(stage.alias("stage")).groupBy("stage").agg(
        F.count("*").alias("n_docs")
    )
    tot = c.agg(F.sum("n_docs").alias("tot"))
    return c.crossJoin(F.broadcast(tot)).select(
        "stage",
        "n_docs",
        ffix(F.col("n_docs").cast("double") / F.col("tot"), 6).alias("share"),
    )


@query(
    "sample_oversample_minority",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT max(n) AS mx FROM c),
    f AS (
        SELECT lang, n,
               least((mx + n - 1) // n, 4) AS factor
        FROM c, m
    ),
    e AS (
        SELECT d.doc_id, d.lang, f.factor,
               unnest(generate_series(1, f.factor)) AS copy_idx
        FROM documents d JOIN f USING (lang)
    )
    SELECT lang, CAST(factor AS BIGINT) AS factor,
           count(*) AS n_rows,
           count(DISTINCT doc_id) AS n_docs
    FROM e GROUP BY lang, factor
    """,
)
def sample_oversample_minority(spark, sf_dir):
    """Minority-language oversampling: each language is replicated
    ⌈max_lang/|lang|⌉ times (capped ×4 — unbounded repetition of a
    tiny slice overfits), the UPSAMPLING complement of the repo's
    hash-threshold downsamplers (sample_temperature_domains etc.).

    Factors come from one 5-row aggregate joined back broadcast; the
    replication is explode(sequence(1, factor)) — map-only, no
    shuffle of the corpus, and the copy index rides along so a
    downstream shuffle can't silently dedup replicas. Integer-ceil
    (mx+n−1) div n keeps the factor computation float-free."""
    t = Tables(spark, sf_dir)
    c = t.documents.groupBy("lang").agg(F.count("*").alias("n"))
    m = c.agg(F.max("n").alias("mx"))
    f = c.crossJoin(F.broadcast(m)).select(
        "lang",
        F.least(
            F.expr("(mx + n - 1) div n"), F.lit(4).cast("bigint")
        ).alias("factor"),
    )
    e = (
        t.documents.select("doc_id", "lang")
        .join(F.broadcast(f), "lang")
        .select(
            "doc_id",
            "lang",
            "factor",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("factor")))
            .alias("copy_idx"),
        )
    )
    return e.groupBy("lang", "factor").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk, count(*) AS n_child,
           count(*) FILTER (WHERE o.o_orderkey IS NOT NULL) AS n_matched,
           count(*) FILTER (WHERE o.o_orderkey IS NULL) AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders->customer', count(*),
           count(*) FILTER (WHERE c.c_custkey IS NOT NULL),
           count(*) FILTER (WHERE c.c_custkey IS NULL)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem->part', count(*),
           count(*) FILTER (WHERE p.p_partkey IS NOT NULL),
           count(*) FILTER (WHERE p.p_partkey IS NULL)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def dq_referential_integrity(spark, sf_dir):
    """Referential-integrity audit: every declared FK edge of the star
    schema (lineitem→orders, orders→customer, lineitem→part) checked
    with child/matched/orphan counts — the constraint check a lake
    without enforced FKs must run as a query (and the audit you run
    BEFORE trusting an inner join not to silently drop rows).

    Each edge is a left join counted in one pass; parent sides
    broadcast where they fit. A healthy corpus reports zero orphans —
    the non-vacuous content is the exact child/match totals, which
    shift the moment ingestion drops or duplicates a parent."""
    t = Tables(spark, sf_dir)

    def edge(name, child, ckey, parent, pkey, bcast):
        par = parent.select(pkey)
        if bcast:
            par = F.broadcast(par)
        j = child.select(ckey).join(
            par, F.col(ckey) == F.col(pkey), "left"
        )
        return j.agg(
            F.lit(name).alias("fk"),
            F.count("*").alias("n_child"),
            F.count_if(F.col(pkey).isNotNull()).alias("n_matched"),
            F.count_if(F.col(pkey).isNull()).alias("n_orphans"),
        ).select("fk", "n_child", "n_matched", "n_orphans")

    return (
        edge("lineitem->orders", t.lineitem, "l_orderkey", t.orders,
             "o_orderkey", False)
        .unionAll(
            edge("orders->customer", t.orders, "o_custkey", t.customer,
                 "c_custkey", True)
        )
        .unionAll(
            edge("lineitem->part", t.lineitem, "l_partkey", t.part,
                 "p_partkey", True)
        )
    )


@query(
    "curation_pipeline_e2e",
    oracle="""
    WITH gated AS (
        SELECT doc_id, lang, text,
               len(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS n_tok
        FROM documents
        WHERE n_chars BETWEEN 100 AND 20000
          AND len(list_filter(string_split(text, ' '), t -> t <> ''))
              >= 20
    ),
    uniq AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ),
    train AS (
        SELECT * FROM uniq
        WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 10 < 9
    ),
    chunks AS (
        SELECT lang, least(40, n_tok - s.start + 1) AS chunk_tokens
        FROM train, LATERAL (SELECT unnest(generate_series(1, n_tok, 32))
                             AS start) s
    )
    SELECT g.lang,
           (SELECT count(*) FROM gated WHERE lang = g.lang) AS n_gated,
           (SELECT count(*) FROM uniq WHERE lang = g.lang) AS n_unique,
           (SELECT count(*) FROM train WHERE lang = g.lang) AS n_train,
           CAST((SELECT coalesce(sum(n_tok), 0) FROM train
                 WHERE lang = g.lang) AS BIGINT) AS n_train_tokens,
           (SELECT count(*) FROM chunks WHERE lang = g.lang) AS n_chunks
    FROM (SELECT DISTINCT lang FROM gated) g
    """,
)
def curation_pipeline_e2e(spark, sf_dir):
    """The curation pipeline END TO END as one declarative plan:
    quality gates (length band + minimum tokens) → exact dedup (keep
    lowest doc_id per content hash) → deterministic 90 % train split
    (md5-threshold, reshuffle-proof) → 40/32 sliding-window chunking —
    reporting per-language survivors at every stage plus final token
    and chunk counts. Each stage is the registered standalone
    operator's logic (dq_filter_cascade, dedup_exact_hash,
    split_train_holdout, chunk_fixed_tokens) composed in one query,
    which is how the pipeline actually ships: Catalyst fuses the
    gates into the scan, the dedup is the only wide exchange, and
    the split is a pushable filter — so the WHOLE pipeline costs one
    shuffle plus a map-side chunk explosion, not four jobs.

    Every stage count is exact-integer; the pipeline report is what a
    training-data release publishes next to the corpus."""
    t = Tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    gated = (
        t.documents.filter(F.col("n_chars").between(100, 20000))
        .withColumn("n_tok", F.size(toks))
        .filter(F.col("n_tok") >= 20)
        .select("doc_id", "lang", "text", "n_tok")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    train = uniq.filter(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 10
        < 9
    )
    chunks = train.select(
        "lang",
        F.explode(
            F.sequence(F.lit(1), F.col("n_tok"), F.lit(32))
        ).alias("start"),
        "n_tok",
    ).select(
        "lang",
        F.least(F.lit(40), F.col("n_tok") - F.col("start") + 1).alias(
            "chunk_tokens"
        ),
    )
    g = gated.groupBy("lang").agg(F.count("*").alias("n_gated"))
    u = uniq.groupBy("lang").agg(F.count("*").alias("n_unique"))
    tr = train.groupBy("lang").agg(
        F.count("*").alias("n_train"),
        F.sum("n_tok").cast("bigint").alias("n_train_tokens"),
    )
    ch = chunks.groupBy("lang").agg(F.count("*").alias("n_chunks"))
    return (
        g.join(u, "lang", "left")
        .join(tr, "lang", "left")
        .join(ch, "lang", "left")
        .select(
            "lang",
            "n_gated",
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.coalesce("n_train", F.lit(0)).alias("n_train"),
            F.coalesce("n_train_tokens", F.lit(0)).cast("bigint").alias(
                "n_train_tokens"
            ),
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
        )
    )


@query(
    "split_kfold_assign",
    oracle="""
    WITH f AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))
                    AS BIGINT) % 5 AS fold
        FROM documents
    )
    SELECT fold, lang, count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM f GROUP BY fold, lang
    """,
)
def split_kfold_assign(spark, sf_dir):
    """Deterministic 5-fold cross-validation assignment: fold =
    hash(doc_id) mod k from a DIFFERENT md5 window than the
    train/holdout split (chars 9–16 vs 1–8), so fold membership is
    independent of that split — the evaluation-protocol complement of
    split_train_holdout. Per-(fold, lang) counts expose stratification
    quality; folds are a pure function of the key (reshuffle-proof,
    reproducible across runs and engines), which is the property
    rand()-based folding silently lacks.

    Map-only assignment + one small aggregate; joining any fold's
    train set (fold <> i) is a pushable filter, never a shuffle."""
    t = Tables(spark, sf_dir)
    fold = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10
        ).cast("bigint")
        % 5
    )
    return (
        t.documents.select("doc_id", "lang", fold.alias("fold"))
        .groupBy("fold", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
    )


@query(
    "dq_bot_detection",
    oracle="""
    WITH g AS (
        SELECT user_id,
               count(*) AS n_events,
               count(DISTINCT epoch_us(CAST(ts AS TIMESTAMP))
                     // 3600000000) AS active_hours,
               count(DISTINCT event_type) AS n_types
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(active_hours AS BIGINT) AS active_hours,
           CAST(n_types AS BIGINT) AS n_types,
           (n_events + active_hours - 1) // active_hours
               AS peak_rate_floor
    FROM g
    WHERE (n_events + active_hours - 1) // active_hours >= 2
       OR n_types = 1
    """,
)
def dq_bot_detection(spark, sf_dir):
    """Traffic-quality gate: flag users whose behavior is
    machine-shaped — sustained event rate of ≥2 per active hour
    (tuned to this corpus' uniform synthetic traffic; a real web log
    uses a far higher bar)
    (integer-ceil of events per distinct active hour: no float rate)
    or a single-event-type profile (scrapers click; humans mix) — the
    log-cleaning filter run before any engagement metric is trusted
    (a bot in the DAU series poisons every downstream rate).

    One user_id aggregate computes all three signals; thresholds
    compare exact integers. At web scale the same aggregate feeds a
    classifier — the signals here are its feature vector, and the
    rule form is the auditable baseline."""
    t = Tables(spark, sf_dir)
    g = t.events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct(
            F.expr("unix_micros(ts) div 3600000000")
        ).cast("bigint").alias("active_hours"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )
    rate_floor = F.expr(
        "(n_events + active_hours - 1) div active_hours"
    )
    return g.select(
        "user_id",
        "n_events",
        "active_hours",
        "n_types",
        rate_floor.alias("peak_rate_floor"),
    ).filter((rate_floor >= 2) | (F.col("n_types") == 1))


HOLDOUT_CUTOFF = "2000-07-01"  # train < cutoff <= test


@query(
    "split_temporal_holdout",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey, o_totalprice,
               CASE WHEN o_orderdate < TIMESTAMP '{HOLDOUT_CUTOFF}'
                    THEN 'train' ELSE 'test' END AS split
        FROM orders
    ),
    sides AS (
        SELECT o_custkey,
               count(CASE WHEN split = 'train' THEN 1 END) AS n_tr,
               count(CASE WHEN split = 'test' THEN 1 END) AS n_te
        FROM o GROUP BY o_custkey
    )
    SELECT split,
           count(*) AS n_orders,
           count(DISTINCT o.o_custkey) AS n_customers,
           {osum('o_totalprice')} AS revenue,
           count(DISTINCT CASE WHEN s.n_tr > 0 AND s.n_te > 0
                               THEN o.o_custkey END) AS n_overlap_customers,
           count(DISTINCT CASE WHEN s.n_tr = 0 OR s.n_te = 0
                               THEN o.o_custkey END) AS n_exclusive_customers
    FROM o JOIN sides s USING (o_custkey)
    GROUP BY split
    """,
)
def split_temporal_holdout(spark, sf_dir):
    """Time-based train/holdout split — the leakage-safe alternative
    to random splits for anything with temporal drift: orders strictly
    before the cutoff train, the rest evaluate. Reports per split the
    volume, distinct customers, revenue, and the entity-overlap audit
    (customers seen on BOTH sides vs one side only — the cold-start /
    leakage census a feature-store split review asks for).

    The split predicate is a pure column comparison (partition-
    prunable when the table is date-partitioned — at 100 TB the train
    scan never touches holdout partitions); the overlap audit joins
    the |customers|-row per-side count table back on the key, so the
    only wide shuffle is on o_custkey."""
    t = Tables(spark, sf_dir)
    o = t.orders.select(
        "o_custkey",
        "o_totalprice",
        F.when(
            F.col("o_orderdate") < F.lit(HOLDOUT_CUTOFF).cast("timestamp"),
            F.lit("train"),
        )
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    sides = o.groupBy("o_custkey").agg(
        F.count(F.when(F.col("split") == "train", F.lit(1))).alias("n_tr"),
        F.count(F.when(F.col("split") == "test", F.lit(1))).alias("n_te"),
    )
    both = (F.col("n_tr") > 0) & (F.col("n_te") > 0)
    return (
        o.join(sides, "o_custkey")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("revenue"),
            F.countDistinct(
                F.when(both, F.col("o_custkey"))
            ).alias("n_overlap_customers"),
            F.countDistinct(
                F.when(~both, F.col("o_custkey"))
            ).alias("n_exclusive_customers"),
        )
    )


@query(
    "dq_freshness_lag",
    oracle="""
    WITH g AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS g_us
               FROM events),
    p AS (
        SELECT event_type,
               count(*) AS n_events,
               max(epoch_us(CAST(ts AS TIMESTAMP))) AS p_us
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_events,
           (g_us - p_us) // 60000000 AS lag_minutes,
           (g_us - p_us) > CAST(86400000000 AS BIGINT) AS is_stale
    FROM p, g
    """,
)
def dq_freshness_lag(spark, sf_dir):
    """Per-stream freshness audit: how far each event type's newest
    record trails the newest record anywhere — the staleness monitor a
    data-platform SLA dashboard polls (a feed whose max(ts) lags the
    global watermark by >24 h is flagged).

    Timestamps compare as integer epoch-micros (no interval
    arithmetic, no engine date_diff divergence; the minute lag is an
    integer floor-div). One partial+final aggregate per stream plus a
    1-row global max broadcast-joined back — the scalar-join idiom, so
    the fact table is scanned once and nothing wide shuffles."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_type", F.unix_micros("ts").alias("us"))
    p = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("us").alias("p_us")
    )
    g = ev.agg(F.max("us").alias("g_us"))
    lag = F.col("g_us") - F.col("p_us")
    return p.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        F.expr("(g_us - p_us) div 60000000").alias("lag_minutes"),
        (lag > 24 * 3600 * 1000000).alias("is_stale"),
    )


PSI_BUCKET_W = 25000.0  # equi-width bins over o_totalprice


@query(
    "dq_psi_drift",
    oracle=f"""
    WITH o AS (
        SELECT CAST(floor(o_totalprice / {PSI_BUCKET_W}) AS BIGINT)
                   AS bucket,
               o_orderdate < TIMESTAMP '{HOLDOUT_CUTOFF}' AS is_train
        FROM orders
    ),
    b AS (
        SELECT bucket,
               count(CASE WHEN is_train THEN 1 END) AS n_train,
               count(CASE WHEN NOT is_train THEN 1 END) AS n_test
        FROM o GROUP BY bucket
    ),
    tot AS (
        SELECT sum(n_train) AS nt, sum(n_test) AS ne, count(*) AS nb
        FROM b
    )
    SELECT bucket, n_train, n_test,
           floor((CAST(n_train + 1 AS DOUBLE) / (nt + nb)
                  - CAST(n_test + 1 AS DOUBLE) / (ne + nb))
                 * ln((CAST(n_train + 1 AS DOUBLE) / (nt + nb))
                      / (CAST(n_test + 1 AS DOUBLE) / (ne + nb)))
                 * 1000000 + 0.5) / 1000000.0 AS psi_contrib
    FROM b, tot
    """,
)
def dq_psi_drift(spark, sf_dir):
    """Population Stability Index between the temporal train and
    holdout splits, per value bucket — the standard drift monitor a
    model-ops pipeline runs on every feature (PSI < 0.1 stable,
    0.1–0.25 shifting, > 0.25 retrain): contribution_b =
    (p_b − q_b)·ln(p_b/q_b) with Laplace-smoothed shares so empty
    bins stay finite.

    Shares are ratios of exact integers (one smoothing add, two
    divides); ln on identical doubles matches across engines (the PMI
    / BM25-idf precedent), presented on a 10^-6 fixed grid. One scan:
    the split predicate and bucketing are per-row column ops, then a
    single hash aggregate on the bucket key and a 1-row totals
    broadcast — drift over 100 TB costs the same scan the histogram
    already pays."""
    t = Tables(spark, sf_dir)
    o = t.orders.select(
        F.floor(F.col("o_totalprice") / PSI_BUCKET_W)
        .cast("bigint")
        .alias("bucket"),
        (
            F.col("o_orderdate") < F.lit(HOLDOUT_CUTOFF).cast("timestamp")
        ).alias("is_train"),
    )
    b = o.groupBy("bucket").agg(
        F.count(F.when(F.col("is_train"), F.lit(1))).alias("n_train"),
        F.count(F.when(~F.col("is_train"), F.lit(1))).alias("n_test"),
    )
    tot = b.agg(
        F.sum("n_train").alias("nt"),
        F.sum("n_test").alias("ne"),
        F.count(F.lit(1)).alias("nb"),
    )
    p = (F.col("n_train") + 1).cast("double") / (F.col("nt") + F.col("nb"))
    q = (F.col("n_test") + 1).cast("double") / (F.col("ne") + F.col("nb"))
    return b.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_train",
        "n_test",
        (F.floor((p - q) * F.log(p / q) * 1000000 + 0.5) / 1000000.0).alias(
            "psi_contrib"
        ),
    )


@query(
    "dq_uniqueness_profile",
    oracle="""
    WITH v AS (
        SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS val
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderstatus', o_orderstatus FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
        UNION ALL
        SELECT 'o_orderdate', CAST(CAST(o_orderdate AS TIMESTAMP) AS VARCHAR)
        FROM orders
    ),
    f AS (SELECT col_name, val, count(*) AS c FROM v GROUP BY 1, 2)
    SELECT col_name,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(CASE WHEN val IS NULL THEN c END), 0)
                AS BIGINT) AS n_null,
           CAST(count(val) AS BIGINT) AS n_distinct,
           CAST(max(CASE WHEN val IS NOT NULL THEN c END) AS BIGINT)
               AS max_value_freq,
           max(CASE WHEN val IS NOT NULL THEN c END) = 1 AS is_unique
    FROM f GROUP BY col_name
    """,
)
def dq_uniqueness_profile(spark, sf_dir):
    """Column-wise uniqueness/cardinality profile of the orders table
    — the key-candidate report a data-quality layer derives before
    declaring primary keys or dedup columns: per column its row count,
    null count, distinct-value count, the hottest value's frequency,
    and whether the column is a perfect key (max frequency 1).

    One fact scan: ``stack`` unpivots the five profiled columns into
    (col_name, val) pairs in-row (Spark side; the oracle's UNION ALL
    is the portable spelling of the same relation), then a two-level
    aggregate — (col, val) frequency first, column rollup second — so
    the shuffle carries one row per distinct value per column, never
    raw rows twice. At 100 TB this is the profile pattern that scales:
    distinct-value frequencies partial-aggregate map-side, and the
    final per-column rollup is |columns|·|distinct| rows."""
    t = Tables(spark, sf_dir)
    v = t.orders.select(
        F.expr(
            "stack(5, "
            "'o_orderkey', cast(o_orderkey as string), "
            "'o_custkey', cast(o_custkey as string), "
            "'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'o_orderdate', cast(o_orderdate as string)) "
            "AS (col_name, val)"
        )
    )
    f = v.groupBy("col_name", "val").agg(F.count(F.lit(1)).alias("c"))
    nn = F.when(F.col("val").isNotNull(), F.col("c"))
    return f.groupBy("col_name").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNull(), F.col("c"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_null"),
        F.count("val").cast("bigint").alias("n_distinct"),
        F.max(nn).cast("bigint").alias("max_value_freq"),
        (F.max(nn) == 1).alias("is_unique"),
    )


NEYMAN_BUDGET = 500


@query(
    "sample_stratified_neyman",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS x FROM documents
        WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    st AS (
        SELECT lang, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
        FROM d GROUP BY lang
    ),
    w AS (
        SELECT lang,
               CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n
                          * n * 1e6 + 0.5) AS BIGINT) AS wgt
        FROM st
    ),
    alloc AS (
        -- NULLIF: a degenerate corpus where every stratum has zero
        -- length-variance gives total weight 0 — allocation becomes
        -- NULL and nothing is selected (instead of a div-by-zero)
        SELECT lang,
               ({NEYMAN_BUDGET} * wgt)
                   // NULLIF((SELECT sum(wgt) FROM w), 0) AS n_take
        FROM w
    ),
    ranked AS (
        SELECT d.doc_id, d.lang, a.n_take,
               row_number() OVER (
                   PARTITION BY d.lang
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rn
        FROM d JOIN alloc a ON d.lang = a.lang
    )
    SELECT lang, doc_id FROM ranked WHERE rn <= n_take
    """,
)
def sample_stratified_neyman(spark, sf_dir):
    """Neyman-allocation stratified sampling (r12): the statistically
    optimal fixed-budget allocation n_h ∝ N_h·S_h — strata with more
    documents AND more length variance get more of the budget — the
    principled version of the proportional/temperature samplers
    already in this module. Used in practice to build eval slices and
    annotation batches from heterogeneous corpora.

    Engine-exact discipline: S_h comes from EXACT integer sums
    (ss = n·Σx² − (Σx)², then sqrt(ss)/n — two deterministic IEEE
    ops), weights are half-up fixed-point BIGINTs so the stratum sum
    is order-insensitive, the allocation is integer division, and
    selection ranks a portable md5 of doc_id — every stage replays
    bit-identically in DuckDB, so the SELECTED ID SET itself is
    hash-checked, not just its size.

    Scale shape: one aggregate over the corpus (map-side partial),
    a broadcast of |strata| allocation rows, one window per stratum
    for the rank — no shuffle carries document text."""
    t = Tables(spark, sf_dir)
    d = t.documents.filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    ).select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("x"))
    st = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    w = st.select(
        "lang",
        F.floor(
            F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                   .cast("double"))
            / F.col("n")
            * F.col("n")
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("bigint").alias("wgt"),
    )
    total = w.agg(F.sum("wgt").alias("tw"))
    alloc = w.crossJoin(F.broadcast(total)).select(
        "lang",
        F.expr(
            f"({NEYMAN_BUDGET} * wgt) div nullif(tw, 0)"
        ).alias("n_take"),
    )
    ranked = d.join(F.broadcast(alloc), "lang").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        ),
    )
    return ranked.filter(F.col("rn") <= F.col("n_take")).select(
        "lang", "doc_id"
    )


#: bottom-k sketch size; the integer estimate constant is
#: (k-1) * 2^60 folded into one in-range BIGINT literal so the
#: published estimate is a single integer division both engines
#: truncate identically (the agg_hll_portable discipline)
BOTTOMK_K = 8
BOTTOMK_NUM = (BOTTOMK_K - 1) * (1 << 60)  # 7 * 2^60 < 2^63


@query(
    "sample_bottom_k_sketch",
    oracle=f"""
    WITH h AS (
        SELECT source,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   AS h
        FROM documents
    ),
    keep AS (
        SELECT source, h FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM h
        ) WHERE rn <= {BOTTOMK_K}
    ),
    per AS (
        SELECT source, count(*) AS n_kept, max(h) AS kth,
               array_to_string(list(h ORDER BY h), '|') AS kept
        FROM keep GROUP BY source
    ),
    mkeep AS (
        SELECT h FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS rn FROM keep
        ) WHERE rn <= {BOTTOMK_K}
    ),
    mper AS (
        SELECT '__all__' AS source, count(*) AS n_kept, max(h) AS kth,
               array_to_string(list(h ORDER BY h), '|') AS kept
        FROM mkeep
    ),
    u AS (SELECT * FROM per UNION ALL SELECT * FROM mper)
    SELECT source, CAST(n_kept AS BIGINT) AS n_kept, kth,
           CASE WHEN n_kept = {BOTTOMK_K}
                THEN {BOTTOMK_NUM} // kth END AS est_distinct,
           kept
    FROM u
    """,
)
def sample_bottom_k_sketch(spark, sf_dir):
    """Bottom-k (KMV) sketch per source + a MERGED global sketch: keep
    the k smallest portable 60-bit key hashes per group — a mergeable
    uniform sample of the group's distinct keys AND a distinct-count
    estimator, est = (k-1)·2^60 / kth_smallest, published as ONE exact
    BIGINT division (Bar-Yossef et al. 2002, the KMV/bottom-k
    estimator — the same family Theta sketches build on).

    The 100 TB story is the MERGE: the union of per-partition bottom-k
    sets re-cut to its k smallest IS the bottom-k of the union (every
    global bottom-k member is in its own partition's bottom-k), so the
    '__all__' row is derived from the per-source KEPT SETS ONLY —
    k·groups rows — never a re-scan. That is the shuffle shape of
    every mergeable-sketch rollup: partials combine associatively, and
    the sketch doubles as a consistent sample for downstream eyeballs.
    The per-group cut is row_number ≤ k over (group, hash) — a single
    shuffle with per-partition TopK pushdown, no collect_list of the
    full group anywhere. Hash-checked bit-for-bit: md5-conv keys,
    integer-only estimate (no float, no ln)."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    base = t.documents.select("source", h.alias("h"))
    w = Window.partitionBy("source").orderBy("h")
    keep = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BOTTOMK_K)
        .select("source", "h")
        .localCheckpoint()  # feeds per-source AND merged cuts once
    )
    # kept serializes to a '|'-joined string: the driver
    # canonicalizer rejects list-typed cells (output-column rules)
    per = keep.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth"),
        F.array_join(F.sort_array(F.collect_list("h")), "|").alias("kept"),
    )
    wm = Window.orderBy("h")
    mper = (
        keep.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= BOTTOMK_K)
        .groupBy(F.lit("__all__").alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth"),
            F.array_join(F.sort_array(F.collect_list("h")), "|").alias(
                "kept"
            ),
        )
    )
    u = per.unionByName(mper)
    return u.select(
        "source",
        F.col("n_kept").cast("bigint").alias("n_kept"),
        "kth",
        F.when(
            F.col("n_kept") == BOTTOMK_K,
            F.expr(f"CAST({BOTTOMK_NUM} AS BIGINT) div kth"),
        ).alias("est_distinct"),
        "kept",
    )
