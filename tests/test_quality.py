"""Quality gates for approximate operators: rows-only ops still need
their values bounded against the exact twins — the hash gate cannot
see them, so this is their only correctness net."""

from __future__ import annotations

from pyspark.sql import functions as F

from thrive_spark.registry import QUERIES
from thrive_spark.tables import Tables


def test_approx_count_distinct_close_to_exact(spark, sf_dir, qdf):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in qdf("agg_approx_count_distinct").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in Tables(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        rel = abs(approx[k] - n) / n
        assert rel < 0.1, (k, approx[k], n)


def test_percentile_approx_close_to_exact(spark, sf_dir, qdf):
    approx = {
        r["o_orderstatus"]: (r["approx_median"], r["approx_p90"])
        for r in qdf("agg_percentile_approx").collect()
    }
    exact = {
        r["o_orderstatus"]: (r["median_price"], r["p90_price"])
        for r in qdf("agg_percentile_exact").collect()
    }
    for k, (em, ep) in exact.items():
        am, ap = approx[k]
        assert abs(am - em) / em < 0.05, (k, am, em)
        assert abs(ap - ep) / ep < 0.05, (k, ap, ep)


def test_salted_agg_equals_plain(spark, sf_dir, qdf):
    """The salting rewrite must be result-identical to plain groupBy."""
    salted = qdf("agg_salted_skew").toPandas()
    ev = Tables(spark, sf_dir).events
    from thrive_spark.operators._util import dsum

    plain = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .toPandas()
    )
    s = salted.sort_values("event_type").reset_index(drop=True)
    p = plain.sort_values("event_type").reset_index(drop=True)
    assert s.equals(p), (s, p)


def test_hll_sketch_union_error_bounded(spark, sf_dir, qdf):
    """Sketch-merge estimate within 5% of exact at every rollup node."""
    rows = qdf("agg_hll_sketch_union").collect()
    assert rows, "no regions"
    for r in rows:
        assert r["exact_customers"] > 0
        assert r["rel_err"] < 0.05, (r["r_name"], r["rel_err"])


def test_bpe_train_matches_reference_and_roundtrips(spark, sf_dir, qdf):
    """Merges must equal a from-scratch reference on the same word
    freqs; applying them must preserve the underlying characters."""
    from thrive_spark.operators.tokenizer import (
        END,
        _word_freqs,
        apply_bpe,
        train_bpe,
    )
    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    t = Tables(spark, sf_dir)
    wf = _word_freqs(t)

    # independent reference: recount pair freqs naively each round
    def ref_train(wf, n):
        words = {w: ([*w, END], c) for w, c in wf}
        out = []
        for _ in range(n):
            cnt = {}
            for syms, c in words.values():
                for p in zip(syms, syms[1:]):
                    cnt[p] = cnt.get(p, 0) + c
            if not cnt:
                break
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            out.append(best)
            for w, (syms, c) in words.items():
                i, ns = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                        ns.append(best[0] + best[1])
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                words[w] = (ns, c)
        return out

    assert train_bpe(wf, 12) == ref_train(wf, 12)

    merges = train_bpe(wf, 12)
    for w, _ in wf[:50]:
        assert "".join(apply_bpe(w, merges)) == w + END

    out = qdf("tokenizer_train_bpe").toPandas()
    assert len(out) >= 1 and list(out.columns) == [
        "rank", "left", "right", "merged",
    ]
    applied = qdf("tokenizer_apply_bpe").toPandas()
    # BPE can only shorten: token count per doc <= symbol chars
    assert (applied["n_bpe_tokens"] <= applied["n_symbol_chars"]).all()
    assert (applied["n_bpe_tokens"] > 0).all()


def test_bpe_pretrained_chain_oracle_equivalence(spark, sf_dir):
    """The pinned PRETRAINED_MERGES must satisfy the invariant that
    makes the SQL-oracle rewrite sound (no left element contains the
    END marker), and the DuckDB replace-chain must produce the exact
    symbol sequence apply_bpe does — on every corpus word plus
    adversarial shapes (consecutive-pair runs, symbol-prefix clashes
    like 'fast' where '|a|s' would falsely match 'st')."""
    import duckdb

    from thrive_spark.operators.tokenizer import (
        END,
        PRETRAINED_MERGES,
        _bpe_chain_sql,
        apply_bpe,
        train_bpe,
        _word_freqs,
    )
    from thrive_spark.tables import Tables

    assert all(END not in a for a, _ in PRETRAINED_MERGES)

    con = duckdb.connect()
    chain = _bpe_chain_sql()
    words = [w for w, _ in _word_freqs(Tables(spark, sf_dir))]
    words += [
        "erer", "ererer", "stst", "aaa", "fast", "faster", "stow",
        "joinjoin", "hashhash", "parpart", "asash", "ashash",
    ]
    for w in words:
        py = "".join(f"[{s}]" for s in apply_bpe(w, PRETRAINED_MERGES))
        got = con.execute(
            f"SELECT c FROM (SELECT {chain} AS c FROM (SELECT ? AS w))",
            [w],
        ).fetchone()[0]
        assert py == got, (w, py, got)


def test_bpe_vocab_collect_is_bounded(spark, sf_dir, monkeypatch):
    """The driver-side word-frequency table must respect MAX_VOCAB —
    with the cap forced below the corpus vocabulary, the collect
    returns exactly MAX_VOCAB rows and keeps the MOST FREQUENT words
    (r5 verdict: unbounded collect was the scale flag)."""
    from thrive_spark.operators import tokenizer
    from thrive_spark.tables import Tables

    t = Tables(spark, sf_dir)
    full = tokenizer._word_freqs(t)
    assert len(full) <= tokenizer.MAX_VOCAB

    cap = min(16, len(full) - 1)  # force the cap below the corpus vocab
    monkeypatch.setattr(tokenizer, "MAX_VOCAB", cap)
    capped = tokenizer._word_freqs(t)
    assert len(capped) == cap
    # the cap keeps the head of the frequency distribution: every kept
    # count >= the max dropped count
    kept = {w for w, _ in capped}
    dropped_max = max(n for w, n in full if w not in kept)
    assert min(n for _, n in capped) >= dropped_max
