"""BPE tokenizer training + application over the corpus (LLM-pipeline
family: the tokenizer-fitting pass that precedes token counting,
quota sampling, and sequence packing).

Architecture (the one HF tokenizers uses, re-expressed on Spark):

- The ONLY corpus-sized operation is the word-frequency count — one
  explode + one hash aggregate, shuffle carries (word, count) pairs.
- BPE merge training then runs on the *word-frequency table*, which
  is bounded by the distinct-word vocabulary, not the corpus (a 100 TB
  web corpus has ~10⁷–10⁸ distinct words ≈ single-digit GB of driver
  state; beyond that, frequency-threshold the tail first — merges
  learned from words seen once are noise anyway, which is why every
  production BPE trainer prunes them).
- Applying the merges is embarrassingly parallel again: the merge
  list broadcasts (it is ≤ vocab_size rows) and each document
  re-tokenizes independently in an Arrow-batched pass.

Determinism: merges pick (max pair frequency, lexicographic pair) —
no RNG, no order dependence (the pair-count dict is reduced from a
sorted word list). Registered rows-only (iterative merge training is
not SQL-expressible); tests/test_quality.py asserts the trained
merges equal a from-scratch reference implementation and that apply
round-trips (detokenize == original words).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..smalldf import small_df
from ..tables import Tables

N_MERGES = 24
END = "</w>"

#: driver-state bound on the word-frequency table.  A 100 TB web
#: corpus has 10⁸–10⁹ distinct "words" (typo'd, concatenated, binary
#: junk) — far past what any driver should collect.  Production BPE
#: trainers prune the tail first (merges learned from hapaxes are
#: noise), so we keep the MAX_VOCAB most frequent words at or above
#: MIN_COUNT; the cap makes the collect provably O(MAX_VOCAB) no
#: matter the corpus.  2^20 rows × ~30 B ≈ 32 MB worst case.  At the
#: test scale factors the distinct vocabulary is far below the cap,
#: so the trained merge table is unchanged.
MAX_VOCAB = 1 << 20
MIN_COUNT = 1  # raise to >=5 for web-scale corpora


def _word_freqs(t) -> list[tuple[str, int]]:
    """Corpus → (word, count) — the one data-sized job, one shuffle.

    The collect is BOUNDED: frequency-threshold + top-MAX_VOCAB cap
    (deterministic tie-break on the word) before anything reaches the
    driver.  The sort-limit runs on the already-aggregated word table
    (vocab-sized, corpus-independent), so the only corpus-sized stage
    remains the word-count aggregate."""
    rows = (
        t.documents.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), " +"),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_COUNT)
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(MAX_VOCAB)
        .collect()
    )
    return sorted((r["w"], int(r["n"])) for r in rows)


def train_bpe(word_freqs: list[tuple[str, int]], n_merges: int = N_MERGES):
    """Classic BPE on a word-frequency table. Returns the ordered
    merge list [((a, b), rank), ...]."""
    symbolized = {
        w: (tuple(list(w) + [END]), n) for w, n in word_freqs
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in symbolized.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        # deterministic argmax: frequency desc, pair lexicographic asc
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        out = {}
        for w, (syms, n) in symbolized.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            out[w] = (tuple(new), n)
        symbolized = out
    return merges


def apply_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with the ordered merge list."""
    syms = list(word) + [END]
    for a, b in merges:
        i, new = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                new.append(a + b)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        syms = new
    return syms


def _train_oracle(n_merges: int) -> str:
    """DuckDB replay of ``train_bpe`` as an UNROLLED merge loop (the
    PageRank-unroll precedent): state_i holds each distinct word's
    bracket-encoded symbol chain; pairs_i counts frequency-weighted
    adjacent symbol pairs by splitting chains on '][' (bracket-content
    safe — see _bpe_chain_sql); best_i is the python tie-break
    ``min(counts, key=(-cnt, pair))`` as ORDER BY cnt DESC, a, b
    LIMIT 1 (UTF-8 byte order == codepoint order, so the string
    comparison matches python's); state_i rewrites via one replace()
    (left-to-right non-overlapping == the greedy merge pass). LEFT
    JOIN ON TRUE + coalesce keeps the state intact when a tiny corpus
    runs out of pairs — python's ``break`` then matches the empty
    best_i rows. MATERIALIZED on every stage: without it DuckDB
    inlines 24 nested replaces per reference and planning explodes."""
    parts = ["""
    WITH words AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest(list_filter(
                regexp_split_to_array(lower(text), ' +'), x -> x <> '')) AS w
            FROM documents)
        GROUP BY w
    ),
    s0 AS MATERIALIZED (
        SELECT w, n,
               regexp_replace(w, '(?s)(.)', '[\\1]', 'g') || '[</w>]' AS chain
        FROM words
    )"""]
    for i in range(1, n_merges + 1):
        prev = f"s{i - 1}"
        parts.append(f""",
    p{i} AS MATERIALIZED (
        SELECT syms[g.i] AS a, syms[g.i + 1] AS b, sum(n) AS cnt
        FROM (SELECT n, string_split(substr(chain, 2, length(chain) - 2),
                                     '][') AS syms
              FROM {prev}),
             LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i) g
        GROUP BY a, b
    ),
    b{i} AS MATERIALIZED (SELECT a, b FROM p{i}
                          ORDER BY cnt DESC, a, b LIMIT 1),
    s{i} AS MATERIALIZED (
        SELECT s.w, s.n,
               coalesce(replace(s.chain, '[' || b.a || '][' || b.b || ']',
                                '[' || b.a || b.b || ']'), s.chain) AS chain
        FROM {prev} s LEFT JOIN b{i} b ON TRUE
    )""")
    unions = "\n    UNION ALL ".join(
        f'SELECT CAST({i - 1} AS BIGINT) AS "rank", a AS "left", '
        f'b AS "right", a || b AS merged FROM b{i}'
        for i in range(1, n_merges + 1)
    )
    return "".join(parts) + "\n    " + unions


@query("tokenizer_train_bpe", oracle=_train_oracle(N_MERGES))
def tokenizer_train_bpe(spark, sf_dir):
    """Train {N_MERGES} BPE merges on the corpus; output the merge
    table (rank, left, right, merged). The corpus-sized work is one
    word-count aggregate; training runs on the bounded frequency
    table (see module docstring for the 100 TB argument)."""
    t = Tables(spark, sf_dir)
    merges = train_bpe(_word_freqs(t))
    return small_df(
        spark,
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string, merged string",
    )


#: Frozen pretrained merge table: the exact output of ``train_bpe``
#: over the reference corpus (sf0.01 word frequencies) — pinned so
#: apply is corpus-independent, which is how production tokenizers
#: work (you apply a FROZEN vocab; retraining per batch would change
#: token ids under the model).  Training itself stays exhibited by
#: ``tokenizer_train_bpe``.  Invariant that makes the SQL oracle
#: sound: no left element contains the END marker (word-final symbols
#: never start a pair in per-word BPE), asserted in
#: tests/test_quality.py.
PRETRAINED_MERGES = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", "</w>"), ("g", "</w>"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("t", "</w>"), ("i", "n</w>"), ("j", "o"),
    ("jo", "in</w>"), ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"),
]


def _bpe_chain_sql() -> str:
    """DuckDB expression applying PRETRAINED_MERGES to word column
    ``w`` by pure string rewriting: encode the symbol sequence as a
    prefix-separated string ('|h|e|y|</w>'), then one replace() per
    merge in rank order.  Left-to-right non-overlapping replacement
    is exactly BPE's greedy single pass.  Each symbol is FULLY
    bracketed ('[sym]', brackets outside the corpus charset): a
    prefix-only separator is not enough — pattern '|a|s' would match
    the first char of a following symbol 'st' — while full brackets
    anchor both ends, and '[a][b]' → '[ab]' consumes no shared
    delimiter, so consecutive pair occurrences all merge in one pass
    just like the BPE scan.  Token count = number of '][' separators
    + 1 (split on the two-char separator), NOT the count of '[': a
    literal bracket IN a word encodes as '[[]' / '[]]' and would
    inflate a bracket count, while it can never form the '][' pair
    except at a true token boundary (r10 stress corpus plants
    bracketed words).  Merge rewrites stay sound with bracket content
    for the same reason: '[a][t]' only ever matches a genuine (a, t)
    symbol adjacency."""
    # (?s): RE2's dot excludes \n by default — a newline char inside a
    # word (space-tokenization keeps them) must bracketize like any
    # other symbol (r10 stress corpus)
    s = "regexp_replace(w, '(?s)(.)', '[\\1]', 'g') || '[</w>]'"
    for a, b in PRETRAINED_MERGES:
        s = f"replace({s}, '[{a}][{b}]', '[{a}{b}]')"
    return s


@query(
    "tokenizer_apply_bpe",
    oracle=f"""
    WITH words AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    tok AS (
        SELECT w,
               CAST(len(string_split(chain, '][')) AS BIGINT) AS n_tok
        FROM (SELECT w, {{chain}} AS chain
              FROM (SELECT DISTINCT w FROM words))
    ),
    per AS (
        SELECT words.doc_id,
               sum(tok.n_tok) AS n_bpe_tokens,
               sum(length(words.w) + 4) AS n_symbol_chars
        FROM words JOIN tok USING (w)
        GROUP BY words.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
           CAST(coalesce(p.n_symbol_chars, 0) AS BIGINT)
               AS n_symbol_chars
    FROM documents d LEFT JOIN per p USING (doc_id)
    """.replace("{chain}", _bpe_chain_sql()),
)
def tokenizer_apply_bpe(spark, sf_dir):
    """Apply the FROZEN pretrained merges corpus-wide: per-document
    BPE token count and symbol-char count — the distributed half of
    the tokenizer. The merge list broadcasts via closure (≤ vocab-size
    entries); each Arrow batch re-tokenizes independently, so the pass
    is map-only. Hash-checked against a DuckDB oracle that applies the
    SAME merges through an independent mechanism (string-rewriting
    chain, see _bpe_chain_sql) — two implementations of BPE agreeing
    token-for-token."""
    import pandas as pd

    t = Tables(spark, sf_dir)
    merges = PRETRAINED_MERGES

    def tok(batches):
        cache: dict[str, int] = {}
        for pdf in batches:
            n_toks, total_len = [], []
            for text in pdf["text"]:
                # None == empty doc: 0 tokens, matching the oracle's
                # LEFT JOIN + coalesce(0) rows (r10 stress corpus)
                words = [w for w in (text or "").lower().split(" ") if w]
                cnt = chars = 0
                for w in words:
                    if w not in cache:
                        pieces = apply_bpe(w, merges)
                        cache[w] = len(pieces)
                    cnt += cache[w]
                    chars += len(w) + len(END)
                n_toks.append(cnt)
                total_len.append(chars)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bpe_tokens": n_toks,
                    "n_symbol_chars": total_len,
                }
            )

    return t.documents.select("doc_id", "text").mapInPandas(
        tok, "doc_id long, n_bpe_tokens long, n_symbol_chars long"
    )


VOCAB_CUTS = (100, 500, 2000)


@query(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
            AS w
        FROM documents
    ),
    freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r FROM freq
    ),
    tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM freq)
    SELECT cut.n AS vocab_size,
           CAST(sum(CASE WHEN r <= cut.n THEN c ELSE 0 END) AS BIGINT)
               AS covered_tokens,
           CAST(tot.total AS BIGINT) AS total_tokens,
           CAST(tot.vocab AS BIGINT) AS distinct_words,
           floor(CAST(sum(CASE WHEN r <= cut.n THEN c ELSE 0 END)
                      AS DOUBLE) / tot.total * 10000 + 0.5) / 10000.0
               AS coverage
    FROM ranked, tot,
         (SELECT unnest([{", ".join(str(c) for c in VOCAB_CUTS)}]) AS n) cut
    GROUP BY cut.n, tot.total, tot.vocab
    """,
)
def tokenizer_vocab_coverage(spark, sf_dir):
    """Vocabulary-size sweep: what fraction of corpus token
    occurrences a top-N frequency-ranked vocabulary covers, for N in
    {VOCAB_CUTS} — the curve a tokenizer designer reads before fixing
    vocab size (and the OOV-rate budget that follows from it).

    The rank window runs over the |vocab|-row frequency aggregate
    (post-aggregation bounded, the BPE trainer's own discipline — the
    corpus itself never sorts); ordering is unique via the word
    tiebreak. The three cuts come from one conditional-sum pass over
    the ranked vocab crossed with a 3-row literal — not three scans.
    Output is {len(VOCAB_CUTS)} rows regardless of corpus size."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    ranked = freq.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "w"))
        .alias("r"),
    )
    cuts = small_df(
        t.spark, [(int(n),) for n in VOCAB_CUTS], "n long"
    )
    covered = F.sum(F.when(F.col("r") <= F.col("n"), F.col("c")).otherwise(F.lit(0)))
    return (
        ranked.crossJoin(F.broadcast(cuts))
        .groupBy(F.col("n").alias("vocab_size"))
        .agg(
            covered.cast("bigint").alias("covered_tokens"),
            F.sum("c").cast("bigint").alias("total_tokens"),
            F.count(F.lit(1)).alias("distinct_words"),
            (
                F.floor(
                    covered.cast("double") / F.sum("c") * 10000 + 0.5
                )
                / 10000.0
            ).alias("coverage"),
        )
    )
