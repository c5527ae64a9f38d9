"""Approximate-matching joins: edit-distance fuzzy join and a
Bloom-filter-prefiltered semi join — the record-linkage and
runtime-filter primitives of a curation pipeline.

Both operators are shaped around the same scale rule: never evaluate
the expensive predicate (edit distance / the exact membership join)
against the full cross space — block first with a cheap EXACT
reduction (length bands are lossless for edit distance ≤ k; a Bloom
filter is lossless for non-membership), then verify only candidates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from ._util import dsum, osum

#: max edit distance for the fuzzy join (len-diff blocking is lossless
#: for this bound: |len(a)-len(b)| ≤ dist(a,b))
_MAX_DIST = 2


@query(
    "join_fuzzy_levenshtein",
    oracle=f"""
    WITH names AS (
        SELECT p_name, count(*) AS n_parts FROM part
        WHERE octet_length(encode(p_name)) = length(p_name)
        GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(len(a.p_name) - len(b.p_name)) <= {_MAX_DIST}
    WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
    """,
)
def join_fuzzy_levenshtein(spark, sf_dir):
    """Fuzzy self-join of the part-name vocabulary: pairs within edit
    distance ≤ 2 (dedup candidates for catalog normalization), with
    each name's part count carried along.

    Scale design: the vocabulary is FIRST collapsed to distinct names
    with counts (the fuzzy predicate runs on |vocab|, not |parts|),
    then length-band blocked — |len(a)−len(b)| ≤ k is implied by
    dist ≤ k, so the block is lossless, and it is realized as an EQUI
    join (probe names replicate to the ≤ 2k+1 length buckets they can
    match) rather than a nested-loop band predicate. Levenshtein runs
    only on candidates inside a bucket. For open vocabularies add a
    q-gram-prefix block on the same equi-key pattern (PPJoin, as in
    dedup_ngram_jaccard); the shape here is the k≤2 specialization.
    """
    t = Tables(spark, sf_dir)
    # oracle-pinned ASCII domain: Spark's levenshtein counts CHAR
    # edits, DuckDB's counts BYTE edits — they disagree exactly on
    # multi-byte names (r10 stress corpus), so the hash-checked
    # exhibit runs where the two definitions coincide
    names = (
        t.part.filter("octet_length(encode(p_name, 'UTF-8')) = length(p_name)")
        .groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        F.length("p_name").alias("len_a"),
    )
    # replicate the probe side into every length bucket it can match:
    # the pair (a, b) then meets on exactly one bucket (len_a itself)
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        F.explode(
            F.sequence(
                F.length("p_name") - _MAX_DIST,
                F.length("p_name") + _MAX_DIST,
            )
        ).alias("len_bucket"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            b,
            (F.col("len_a") == F.col("len_bucket"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .filter(dist <= _MAX_DIST)
        .select(
            "name_a",
            "name_b",
            dist.cast("bigint").alias("dist"),
            "n_parts_a",
            "n_parts_b",
        )
    )


#: Bloom geometry: m = 2^16 bits (1024 longs), k = 3 probes.  With
#: ~10^3–10^4 build keys the false-positive rate is ≤ (kn/m)^k ≈ 1e-3;
#: the EXACT verify join after the prefilter makes FPs a cost issue,
#: never a correctness one.
_BLOOM_BITS = 1 << 16
_BLOOM_K = 3
_BUILD_NATION = 7


def _bloom_positions(key_col):
    """k bit positions for a key: xxhash64(key, seed_i) mod m — the
    same JVM-side expression computes build and probe positions, so no
    Python reimplementation of the hash exists to drift."""
    return [
        F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_K)
    ]


@query(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n_orders,
           {osum('o_totalprice')} AS revenue
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_nationkey = {_BUILD_NATION})
    GROUP BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    """Semi join of orders against one nation's customers, with an
    explicit Bloom-filter runtime prefilter ahead of the exact join —
    the pattern for when the build side is too big to broadcast as a
    hash table but its Bloom fingerprint (8 KB here) is not.

    Mechanics: build-side bit positions are computed IN Spark
    (xxhash64, k=3, m=2^16), collapsed by a distinct — the collected
    list is bounded by m (≤ 65 536 ints) REGARDLESS of build-side row
    count, so the driver hop cannot grow with data scale. The bitset
    ships as an 8 KB array literal; the probe side tests k bits with
    pure JVM bitwise ops inside the scan stage (whole-stage codegen,
    no shuffle), discarding ~94 % of orders before the exact
    broadcast semi join verifies survivors. False positives cost a
    verify-join row, never correctness. Spark's AQE injects this very
    filter automatically for some plans
    (``spark.sql.optimizer.runtime.bloomFilter``); doing it explicitly
    makes the pattern available to any probe expression — including
    ones the optimizer won't cover (UDF-derived keys, multi-column
    composites).
    """
    t = Tables(spark, sf_dir)
    build = t.customer.filter(
        F.col("c_nationkey") == _BUILD_NATION
    ).select("c_custkey")

    # build: distinct bit positions (bounded by m), then a python-side
    # fold into 64-bit words — the only driver hop, ≤ 8 KB of state
    pos_rows = (
        build.select(
            F.explode(F.array(*_bloom_positions(F.col("c_custkey")))).alias(
                "p"
            )
        )
        .distinct()
        .collect()
    )
    words = [0] * (_BLOOM_BITS // 64)
    for r in pos_rows:
        words[r.p // 64] |= 1 << (r.p % 64)
    # two's-complement into signed int64 range for the long array literal
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bloom = F.lit(words)

    # k bit probes, pure JVM: word lookup + shiftright (the DSL's
    # shiftright only takes literal bit counts, so the variable-shift
    # goes through expr())
    probed = t.orders
    tests = []
    for i, p in enumerate(_bloom_positions(F.col("o_custkey"))):
        probed = probed.withColumn(
            f"_w{i}", F.element_at(bloom, (p / F.lit(64)).cast("int") + F.lit(1))
        ).withColumn(f"_b{i}", (p % F.lit(64)).cast("int"))
        tests.append(f"(shiftright(_w{i}, _b{i}) & 1) = 1")
    prefiltered = probed.filter(F.expr(" AND ".join(tests))).drop(
        *[c for i in range(_BLOOM_K) for c in (f"_w{i}", f"_b{i}")]
    )
    exact = prefiltered.join(
        F.broadcast(build),
        prefiltered.o_custkey == build.c_custkey,
        "left_semi",
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
