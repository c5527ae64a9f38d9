"""Round-8 semantic invariants: properties behind the r8 upgrades and
edge-guards that the oracle hash can't express on its own."""

from __future__ import annotations

from pyspark.sql import functions as F

from thrive_spark.registry import QUERIES
from thrive_spark.tables import Tables


def test_semantic_exact_pair_scan_is_sigma_cell_squared(spark, sf_dir, qdf):
    """dedup_semantic_exact's docstring claims the candidate scan is
    bounded by Σ|cell|·(|cell|−1)/2 (within-cell pairs only, never
    n²): recompute cell sizes from the same assignment pipeline and
    assert the bound arithmetic, plus that every emitted pair is
    within one cell (cluster column present and pairs canonical)."""
    from thrive_spark.operators.vectors import _kmx_assignments

    fin = _kmx_assignments(spark, sf_dir).select(
        "vec_id", (F.col("packed") % 100).alias("cl")
    )
    sizes = {
        r["cl"]: r["n"]
        for r in fin.groupBy("cl").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(sizes.values())
    max_pairs = sum(c * (c - 1) // 2 for c in sizes.values())
    # the clustered scan must be a real reduction vs all-pairs
    assert max_pairs < n_total * (n_total - 1) // 2

    out = qdf("dedup_semantic_exact")
    rows = out.collect()
    assert len(rows) <= max_pairs
    for r in rows:
        assert r["keep_id"] < r["dup_id"]
        assert r["cluster"] in sizes


def test_minhash_portable_short_docs_generate_no_bands(spark, sf_dir, qdf):
    """Docs with <3 tokens have empty shingle sets; after the r8 guard
    they must produce NO candidate pairs (previously they all hashed
    to band key '' and formed a quadratic clique). No output pair may
    involve a <3-token doc."""
    t = Tables(spark, sf_dir)
    short = {
        r["doc_id"]
        for r in t.documents.select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("n"),
        )
        .filter(F.col("n") < 3)
        .collect()
    }
    for r in qdf("dedup_minhash_portable").collect():
        assert r["keep_id"] not in short and r["dup_id"] not in short


def test_apply_bpe_consistent_with_vocab_coverage_totals(spark, sf_dir, qdf):
    """Σ n_bpe_tokens over docs must be ≥ the corpus word count (every
    word yields ≥1 token) and ≤ Σ(len(word)+1) (BPE only merges); and
    n_symbol_chars must equal Σ(len(word)+4) exactly."""
    t = Tables(spark, sf_dir)
    words = t.documents.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " +"), lambda x: x != "")
        ).alias("w")
    )
    stats = words.agg(
        F.count("*").alias("n_words"),
        F.sum(F.length("w") + 4).alias("sym_chars"),
        F.sum(F.length("w") + 1).alias("max_toks"),
    ).collect()[0]
    out = (
        qdf("tokenizer_apply_bpe")
        .agg(
            F.sum("n_bpe_tokens").alias("toks"),
            F.sum("n_symbol_chars").alias("chars"),
        )
        .collect()[0]
    )
    assert out["chars"] == stats["sym_chars"]
    assert stats["n_words"] <= out["toks"] <= stats["max_toks"]


def test_image_ahash_brightness_invariance_holds(spark, sf_dir, qdf):
    """The perceptual-hash property the op demonstrates: hamming
    distance to the +8-brightened twin stays small (≤8 of 64 bits)
    even though the payload bytes all changed."""
    rows = qdf("multimodal_image_ahash").collect()
    assert rows
    for r in rows:
        assert len(r["ahash"]) == 16
        assert 0 <= r["hamming_to_edit"] <= 8


def test_any_all_rewrite_empty_subquery_equivalence(spark, sf_dir):
    """> ALL over an EMPTY subquery is vacuously true: with the
    coalesce(-inf) guard, forcing an impossible predicate must return
    every supplier, matching DuckDB's native ALL semantics."""
    import duckdb

    t = Tables(spark, sf_dir)
    t.register_views()
    n_sup = t.supplier.count()
    got = spark.sql(
        """
        SELECT count(*) AS n FROM supplier
        WHERE s_acctbal > coalesce((
            SELECT max(c_acctbal) FROM customer WHERE 1 = 0
        ), CAST('-Infinity' AS DOUBLE))
        """
    ).collect()[0]["n"]
    assert got == n_sup
    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{sf_dir}/supplier.parquet')
        WHERE s_acctbal > ALL (
            SELECT c_acctbal
            FROM read_parquet('{sf_dir}/customer.parquet') WHERE 1 = 0)
        """
    ).fetchone()[0]
    assert got == ref
