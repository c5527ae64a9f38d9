"""r10 invariants: the mechanisms introduced this round stay pinned.

- affine portable-minhash families: operand bounds keep every product
  exact ANSI int64, and the Spark expression equals the DuckDB oracle
  expression value-for-value on adversarial hash inputs;
- fixed-point DCG literals: the inlined coefficients ARE
  floor(1e6/log2(i+1)+0.5) and the ideal-DCG table is their prefix sum
  (neither engine may ever evaluate log2 of a rank);
- floor-division parity: the floor(x/k) idiom used by every week/bucket
  id agrees with DuckDB's trunc-based `//` only for x >= 0, and with
  CAST(floor(x/k as double)) everywhere — the r10 oracle form;
- union-find CC: agrees with large-star/small-star and label
  propagation on seeded random graphs (the multi-component fixture
  case lives in test_graph_scale.py).
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from thrive_spark.operators.dedup_extra import MHP_A, MHP_B, MHP_FAMS, MHP_P
from thrive_spark.operators.llm import _DCG_C, _IDCG_PREFIX, EVAL_K


def test_affine_family_operands_stay_exact_int64():
    assert MHP_P < 2**30
    for a, b in zip(MHP_A, MHP_B):
        assert 0 < a < MHP_P and 0 <= b < MHP_P
        # worst case product + offset
        assert a * (MHP_P - 1) + b < 2**63


def test_affine_families_are_distinct_and_nondegenerate():
    assert len(set(zip(MHP_A, MHP_B))) == MHP_FAMS
    # a == 0 would collapse a family to a constant
    assert all(a % MHP_P != 0 for a in MHP_A)


@pytest.mark.parametrize("h", [0, 1, MHP_P - 1, MHP_P, 2**59, 2**60 - 1])
def test_affine_family_matches_duckdb(h):
    con = duckdb.connect()
    for i in range(MHP_FAMS):
        want = (MHP_A[i] * (h % MHP_P) + MHP_B[i]) % MHP_P
        # CAST like the oracle does: bare literals parse as INT32 and
        # the product would overflow (the CLAUDE.md int32-constant trap)
        got = con.execute(
            f"SELECT (CAST({MHP_A[i]} AS BIGINT)"
            f" * (CAST({h} AS BIGINT) % {MHP_P})"
            f" + {MHP_B[i]}) % {MHP_P}"
        ).fetchone()[0]
        assert got == want
    con.close()


def test_dcg_literals_are_log2_fixed_point():
    for i, c in enumerate(_DCG_C, start=1):
        assert c == int(math.floor(1_000_000 / math.log2(i + 1) + 0.5))
    assert len(_DCG_C) == EVAL_K
    for n in range(EVAL_K + 1):
        assert _IDCG_PREFIX[n] == sum(_DCG_C[:n])


def test_floor_div_parity_with_duckdb():
    """The week/bucket-id discipline: DuckDB `//` TRUNCATES toward
    zero (NOT floor), so the oracles use CAST(floor(x / k AS ...));
    this pins both facts so a future edit can't silently regress to
    `//` on a signed quantity."""
    con = duckdb.connect()
    rng = random.Random(10)
    xs = [0, -1, 1, -6, 7, -7, -16, 365] + [
        rng.randint(-10**9, 10**9) for _ in range(200)
    ]
    for x in xs:
        for k in (7, 900, 86400):
            trunc = con.execute(f"SELECT {x} // {k}").fetchone()[0]
            floored = con.execute(
                f"SELECT CAST(floor(CAST({x} AS DOUBLE) / {k}) AS BIGINT)"
            ).fetchone()[0]
            assert trunc == int(x / k) if x * k >= 0 else True
            assert trunc == math.trunc(x / k)
            assert floored == math.floor(x / k)
    con.close()


def test_union_find_matches_lss_on_random_graphs(spark):
    from pyspark.sql import functions as F

    from thrive_spark.operators.dedup_extra import (
        _cc_union_find,
        cc_large_small_star,
    )

    rng = random.Random(99)
    for trial in range(3):
        n = 40
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        e = spark.createDataFrame(pairs, "src long, nbr long")
        sym = e.union(
            e.select(F.col("nbr").alias("src"), F.col("src").alias("nbr"))
        )
        lss = {
            (r["node"], r["label"])
            for r in cc_large_small_star(sym).collect()
        }
        uf = {
            (r["node"], r["label"]) for r in _cc_union_find(sym).collect()
        }
        assert lss == uf, f"trial {trial}"


def test_split_dedup_safe_no_group_straddles_splits(spark):
    """The leakage guarantee itself: every exact-dup content group maps
    to exactly ONE split (the aggregate manifest can't show this — it
    must hold at doc level). Runs on a seeded corpus with verbatim
    duplicates (sf0.001 has none) so both directions are non-vacuous."""
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    for i in range(400):
        # ~50 distinct texts over 400 docs -> plenty of multi-copy groups
        rows.append((i, f"doc text number {rng.randrange(50)}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    h = docs.select(
        "doc_id", F.coalesce(F.md5("text"), F.lit("")).alias("th")
    )
    k = h.groupBy("th").agg(F.min("doc_id").alias("keep_id"))
    hx2 = F.substring(F.md5(F.col("keep_id").cast("string")), 2, 1)
    split = F.when(hx2.isin("e", "f"), F.lit("holdout")).otherwise(
        F.lit("train")
    )
    per_group = (
        h.join(k, "th")
        .select("th", split.alias("split"))
        .groupBy("th")
        .agg(F.count_distinct("split").alias("n_splits"))
    )
    # sanity: the corpus actually contains multi-copy groups, so the
    # invariant is non-vacuous
    assert (
        h.groupBy("th").count().filter(F.col("count") > 1).count() > 0
    )
    assert per_group.filter(F.col("n_splits") > 1).count() == 0
    # and the naive per-doc split DOES straddle at least one group —
    # i.e. split_dedup_safe is not vacuously identical to
    # split_train_holdout on this corpus
    naive_hx2 = F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1)
    naive = F.when(naive_hx2.isin("e", "f"), F.lit("holdout")).otherwise(
        F.lit("train")
    )
    naive_straddle = (
        h.select("th", naive.alias("split"))
        .groupBy("th")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert naive_straddle > 0


def test_incremental_minhash_equals_portable_cross_split_pairs(
    spark, sf_dir
):
    """dedup_incremental_minhash (batch probed against corpus index)
    must emit exactly the dedup_minhash_portable pairs that cross the
    80/20 doc_id split — the incremental path may skip corpus-side
    self-join work but must not lose or invent candidates."""
    from pyspark.sql import functions as F

    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    t = Tables(spark, sf_dir)
    v = (
        t.documents.agg(F.expr("(4 * max(doc_id)) div 5").alias("v"))
        .collect()[0]["v"]
    )
    full = {
        (r["dup_id"], r["keep_id"], r["jaccard"])
        for r in QUERIES["dedup_minhash_portable"](spark, sf_dir).collect()
        if r["dup_id"] >= v and r["keep_id"] < v
    }
    inc = {
        (r["new_id"], r["dup_of"], r["jaccard"])
        for r in QUERIES["dedup_incremental_minhash"](
            spark, sf_dir
        ).collect()
    }
    assert inc == full
    assert len(inc) > 0  # non-vacuous on the test corpus


def test_incremental_embedding_equals_blocked_cross_split_pairs(
    spark, sf_dir
):
    """dedup_incremental_embedding (rectangular new x corpus probe)
    must emit exactly the dedup_embedding_cosine pairs that cross the
    80/20 vec_id split — the probe may skip corpus-side self-join
    work but must not lose or invent candidates."""
    from pyspark.sql import functions as F

    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    t = Tables(spark, sf_dir)
    v = (
        t.embeddings.agg(F.expr("(4 * max(vec_id)) div 5").alias("v"))
        .collect()[0]["v"]
    )
    # dedup_embedding_cosine emits (keep_id=min, dup_id=max); a
    # cross-split pair always has keep < v <= dup
    full = {
        (r["dup_id"], r["keep_id"], r["sim"])
        for r in QUERIES["dedup_embedding_cosine"](spark, sf_dir).collect()
        if r["dup_id"] >= v and r["keep_id"] < v
    }
    inc = {
        (r["new_id"], r["dup_of"], r["sim"])
        for r in QUERIES["dedup_incremental_embedding"](
            spark, sf_dir
        ).collect()
    }
    assert inc == full
    assert len(inc) > 0  # non-vacuous on the test corpus


def test_lsh_index_is_append_only(spark, sf_dir):
    """The 100 TB index claim's load-bearing property: a doc's band
    rows are a PURE function of that doc (no corpus-dependent state),
    so each ingest can append its bands to the persisted index and
    later probes see exactly what a from-scratch rebuild would. If the
    signature pipeline ever grows corpus-dependent normalization
    (IDF-weighted shingles, corpus-fit hashing), this catches the
    append-only contract breaking."""
    from pyspark.sql import functions as F

    from thrive_spark.operators.dedup_extra import _mhp_sig_bands
    from thrive_spark.tables import Tables

    docs = Tables(spark, sf_dir).documents.select("doc_id", "text")
    v = docs.agg(F.expr("(3 * max(doc_id)) div 5").alias("v")).collect()[
        0
    ]["v"]
    whole = {
        (r["doc_id"], r["band"], r["key"])
        for r in _mhp_sig_bands(docs)[1].collect()
    }
    part1 = _mhp_sig_bands(docs.filter(F.col("doc_id") < v))[1]
    part2 = _mhp_sig_bands(docs.filter(F.col("doc_id") >= v))[1]
    appended = {
        (r["doc_id"], r["band"], r["key"])
        for r in part1.unionAll(part2).collect()
    }
    assert appended == whole
    assert len(whole) > 0
