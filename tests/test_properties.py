"""Property-based cross-engine parity (SURVEY §5.2.5): hypothesis
generates literal inputs; Spark and DuckDB must agree on cast and
null-handling semantics over them — the operators' correctness rests
on these primitives agreeing, so probe them beyond the fixed corpus."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# digits, signs, spaces, separators, and a few letters — enough to hit
# parse successes, failures, and edge shapes without locale exotica
TOKEN = st.text(alphabet="0123456789-+. eE", min_size=0, max_size=12)
# integer-only shapes: decimal/exponent forms are a PINNED divergence
# (see test_try_cast_bigint_known_divergence), so keep them out of the
# bigint property
INT_TOKEN = st.text(alphabet="0123456789-+ ", min_size=0, max_size=12)


def _duck_rows(vals, expr):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    out = [r[0] for r in con.execute(f"SELECT {expr} FROM t").fetchall()]
    con.close()
    return out


def _spark_rows(spark, vals, col):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    return [r[0] for r in df.select(col).collect()]


@given(vals=st.lists(INT_TOKEN, min_size=1, max_size=6))
@SETTINGS
def test_try_cast_bigint_parity(spark, vals):
    import re

    from hypothesis import assume

    # bare sign + whitespace is a PINNED divergence (see
    # test_try_cast_bigint_known_divergence): DuckDB parses '- ' as 0
    assume(not any(re.fullmatch(r"\s*[-+]\s*", v) for v in vals))
    got = _spark_rows(
        spark, vals, __import__("pyspark.sql.functions", fromlist=["col"]).col("v").try_cast("bigint")
    )
    want = _duck_rows(vals, "TRY_CAST(v AS BIGINT)")
    assert got == want, (vals, got, want)


@given(vals=st.lists(TOKEN, min_size=1, max_size=6))
@SETTINGS
def test_try_cast_double_parity(spark, vals):
    import re

    from hypothesis import assume

    # a leading '+' followed by ANOTHER sign is a PINNED divergence
    # (see test_try_cast_double_known_divergence): DuckDB strips the
    # '+' and re-parses the remainder as a fresh signed number
    # ('+-0' -> -0.0, '+-1e2' -> -100.0) where Spark returns NULL
    assume(not any(re.match(r"\s*\+\s*[-+]", v) for v in vals))
    got = _spark_rows(
        spark, vals, __import__("pyspark.sql.functions", fromlist=["col"]).col("v").try_cast("double")
    )
    want = _duck_rows(vals, "TRY_CAST(v AS DOUBLE)")
    norm = lambda x: None if x is None else repr(float(x))  # noqa: E731
    assert [norm(x) for x in got] == [norm(x) for x in want], (vals, got, want)


def test_try_cast_double_known_divergence(spark):
    """PINNED engine divergence (found by hypothesis, r16): DuckDB's
    double parser accepts one leading '+' before a fully signed
    number — TRY_CAST('+-0') = -0.0, ('+-1e2') = -100.0 — while
    Spark's try_cast rejects the double sign (NULL). One level only:
    '++1', '+--1', '+-+1' are NULL in both. No oracle pair feeds
    sign-chained numerals through try_cast, so this stays a
    documented boundary, excluded from the parity property the same
    way the bigint '- ' quirk is."""
    vals = ["+-0", "+-1e2", "++1", "+--1", "+-+1"]
    got = _spark_rows(
        spark, vals,
        __import__(
            "pyspark.sql.functions", fromlist=["col"]
        ).col("v").try_cast("double"),
    )
    want = _duck_rows(vals, "TRY_CAST(v AS DOUBLE)")
    assert got == [None] * 5
    assert want[0] == 0.0 and str(want[0]) == "-0.0"
    assert want[1] == -100.0 and want[2:] == [None, None, None]


@given(
    vals=st.lists(
        st.one_of(st.none(), st.text(alphabet="abP", max_size=3)),
        min_size=1,
        max_size=6,
    )
)
@SETTINGS
def test_nullif_coalesce_parity(spark, vals):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [
        (r[0], r[1], r[2])
        for r in df.select(
            F.nullif("v", F.lit("P")).alias("a"),
            F.coalesce(F.nullif("v", F.lit("P")), F.lit("X")).alias("b"),
            F.col("v").eqNullSafe(F.lit(None)).alias("c"),
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(
        "SELECT nullif(v,'P'), coalesce(nullif(v,'P'),'X'), "
        "v IS NOT DISTINCT FROM NULL FROM t"
    ).fetchall()
    con.close()
    assert got == [tuple(w) for w in want], (vals, got, want)


@pytest.mark.parametrize(
    "s", ["", " ", "+7", "-0", "  12  ", ".", "E5", "9" * 25]
)
def test_try_cast_bigint_pinned_edges(spark, s):
    """Frozen edge shapes (fast single-value checks, no hypothesis)."""
    from pyspark.sql import functions as F

    got = _spark_rows(spark, [s], F.col("v").try_cast("bigint"))
    want = _duck_rows([s], "TRY_CAST(v AS BIGINT)")
    assert got == want, (s, got, want)


@pytest.mark.parametrize("s", ["1.5", "1e3", "- ", "+ "])
def test_try_cast_bigint_known_divergence(spark, s):
    """PINNED ENGINE DIVERGENCE (found by this suite): DuckDB
    TRY_CAST(VARCHAR AS BIGINT) accepts decimal/exponent forms and
    rounds ('1.5'→2, '1e3'→1000) AND parses a bare sign followed by
    whitespace as 0 ('- '→0, r5 find); Spark's ANSI try_cast rejects
    all of these (NULL). Oracle SQL for any operator casting strings
    to integers must avoid these shapes or cast via DOUBLE
    explicitly."""
    from pyspark.sql import functions as F

    assert _spark_rows(spark, [s], F.col("v").try_cast("bigint")) == [None]
    assert _duck_rows([s], "TRY_CAST(v AS BIGINT)")[0] is not None


def test_log2_fixed_point_parity(spark):
    """text_entropy_score's parity claim: floor(c*log2(c)*1e4+0.5) and
    floor(log2(c)*1e4+0.5) agree between Spark (JVM StrictMath) and
    DuckDB (libm) for every count c up to 2e5 — so the bigint entropy
    terms are engine-independent for any doc under 200k tokens."""
    from pyspark.sql import functions as F

    sp = (
        spark.range(1, 200_001)
        .select(
            F.col("id").alias("c"),
            F.floor(F.col("id") * F.log2("id") * 10000 + 0.5)
            .cast("bigint")
            .alias("a"),
            F.floor(F.log2("id") * 10000 + 0.5).cast("bigint").alias("b"),
        )
        .toPandas()
        .set_index("c")
        .sort_index()
    )
    dk = (
        duckdb.connect()
        .execute(
            "SELECT x AS c,"
            " CAST(floor(x*log2(x)*10000+0.5) AS BIGINT) a,"
            " CAST(floor(log2(x)*10000+0.5) AS BIGINT) b"
            " FROM generate_series(1,200000) t(x)"
        )
        .df()
        .set_index("c")
        .sort_index()
    )
    assert (sp["a"] == dk["a"]).all()
    assert (sp["b"] == dk["b"]).all()


def test_cms_one_sided_error(spark, sf_dir, qdf):
    """CMS estimates never undercount, and width<|keys| forces at
    least one real collision so the audit is non-vacuous."""
    from thrive_spark.registry import QUERIES

    pdf = qdf("agg_cms_frequency").toPandas()
    assert len(pdf) > 0
    assert (pdf["overcount"] >= 0).all()
    assert (pdf["est"] >= pdf["exact"]).all()


def test_sliding_median_matches_pandas(spark, sf_dir, qdf):
    """win_sliding_median == pandas rolling(15).median() on the
    fixed-point values — an independent implementation check."""
    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    got = (
        qdf("win_sliding_median")
        .toPandas()
        .set_index("event_id")["med15"]
    )
    ev = (
        Tables(spark, sf_dir)
        .events.select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    import numpy as np

    ev["v"] = np.floor(ev["value"] * 10000 + 0.5)
    want = (
        ev.groupby("user_id")["v"]
        .rolling(15, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
        / 10000.0
    )
    want.index = ev["event_id"]
    joined = got.to_frame("got").join(want.to_frame("want"))
    assert (joined["got"] - joined["want"]).abs().max() < 1e-9


def test_ewma_close_to_untruncated(spark, sf_dir, qdf):
    """The 8-tap truncated EWMA must sit within the truncation bound
    (0.5^8 of the value range) of pandas' untruncated ewm."""
    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    got = (
        qdf("ts_ewma_halflife")
        .toPandas()
        .set_index("event_id")["ewma"]
    )
    ev = (
        Tables(spark, sf_dir)
        .events.select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    want = (
        ev.groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=0.5, adjust=True).mean())
    )
    want.index = ev["event_id"]
    joined = got.to_frame("got").join(want.to_frame("want"))
    bound = ev["value"].max() * (0.5**8) + 1e-3
    assert (joined["got"] - joined["want"]).abs().max() <= bound


def test_hll_precision_error_bounds(spark, sf_dir, qdf):
    from thrive_spark.registry import QUERIES

    row = qdf("agg_hll_precision_sweep").collect()[0]
    exact = row["exact"]
    for col, rsd in (
        ("est_rsd_001", 0.01),
        ("est_rsd_005", 0.05),
        ("est_rsd_010", 0.10),
    ):
        err = abs(row[col] - exact) / exact
        assert err <= 3 * rsd, (col, row[col], exact, err)


@given(
    vals=st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789 :_-",
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    )
)
@SETTINGS
def test_portable_md5_conv_hash_parity(spark, vals):
    """The r7 portable-hash bridge (CLAUDE.md): Spark
    conv(substr(md5(v),1,15),16,10)::long must equal DuckDB
    ('0x'||substr(md5(v),1,15))::BIGINT for arbitrary strings — the
    property that lets seeded-sketch ops (CMS, SimHash, portable
    MinHash, integer PageRank) be oracle-hash-checked."""
    from pyspark.sql import functions as F

    got = _spark_rows(
        spark,
        vals,
        F.conv(F.substring(F.md5("v"), 1, 15), 16, 10).cast("long"),
    )
    want = _duck_rows(vals, "('0x' || substr(md5(v), 1, 15))::BIGINT")
    assert got == want, (vals, got, want)


def test_broker_compaction_invariants_property():
    """Hypothesis sweep over the broker log cleaner (pure log
    mechanics, no Spark): for random keyed produce batches and a
    random segment-boundary compaction point, (1) the compacted log
    holds exactly the newest record per key from the cleaned head —
    in original order — plus every tail record, (2) logical end
    offsets never shrink, (3) every idx boundary translates to a
    monotone in-bounds physical position, including after a SECOND
    compaction (remaps must compose)."""
    import json
    import os
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from thrive_spark.streaming.broker import _FIELDS, BrokerLog, _phys

    def record(rid, uid, v):
        return {"event_id": rid, "ts_us": rid, "user_id": uid,
                "event_type": "t", "value": float(v)}

    def raw_len(rec):
        return len(json.dumps(
            {k: rec[k] for k in _FIELDS}, separators=(",", ":")
        ).encode()) + 1

    def check(log, root, produced, point):
        bounds = log._boundaries(0)
        size = os.path.getsize(log._path(0, ".log"))
        phys = [_phys(root, 0, b) for b in bounds]
        assert all(0 <= p <= size for p in phys)
        assert phys == sorted(phys)
        # replay the ORIGINAL logical byte stream to split head/tail
        stream_pos, head, tail = 0, [], []
        for rec in produced:
            (head if stream_pos < point else tail).append(rec)
            stream_pos += raw_len(rec)
        last = {}
        for rec in head:
            last[rec["user_id"]] = rec["event_id"]
        retained = [
            r["event_id"] for r in head if last[r["user_id"]] == r["event_id"]
        ]
        with open(log._path(0, ".log"), "rb") as f:
            got = [json.loads(x)["event_id"] for x in f.read().splitlines()]
        assert got == retained + [r["event_id"] for r in tail], (
            got, retained, point
        )

    @settings(max_examples=25, deadline=None)
    @given(
        batches=st.lists(
            st.lists(
                st.tuples(st.integers(0, 6), st.integers(0, 99)),
                min_size=1,
                max_size=8,
            ),
            min_size=1,
            max_size=6,
        ),
        cut=st.integers(0, 6),
        cut2=st.integers(0, 6),
    )
    def run(batches, cut, cut2):
        root = tempfile.mkdtemp(prefix="thrive_prop_broker_")
        log = BrokerLog(root, n_partitions=1)
        rid = 0
        produced = []
        for batch in batches:
            rows = []
            for uid, v in batch:
                rows.append(record(rid, uid, v))
                rid += 1
            produced.extend(rows)
            log.produce(rows)
        bounds = log._boundaries(0)
        point = bounds[min(cut, len(bounds) - 1)]
        e_before = log.end_offsets()
        log.compact(key="user_id", upto={"0": point})
        assert log.end_offsets() == e_before  # logical size stable
        check(log, root, produced, point)
        # second compaction at another boundary: remaps must compose.
        # NOTE the cleaner is monotone: a point BELOW the first one is
        # a no-op for already-cleaned bytes, so expectation is the MAX
        point2 = bounds[min(cut2, len(bounds) - 1)]
        log.compact(key="user_id", upto={"0": point2})
        assert log.end_offsets() == e_before
        # after cleaning [0, p1) then [0, p2), retained-head semantics
        # equal one cleaning at max(p1, p2) ONLY when p2 >= p1 (the
        # second pass sees already-deduped head rows as fresh last-
        # per-key candidates otherwise); assert the composable case
        if point2 >= point:
            check(log, root, produced, point2)

    run()


def test_percentile_sketch_rank_error_bounded(spark, sf_dir, qdf):
    """agg_percentile_sketch_portable: the KMV-sample estimate's TRUE
    rank must sit within a few percent of the target quantile (the
    ~1/sqrt(k) sampling bound, k=256) — accuracy gate on top of the
    oracle's reproducibility gate."""
    import pyspark.sql.functions as F

    from thrive_spark.registry import QUERIES
    from thrive_spark.tables import Tables

    est = qdf("agg_percentile_sketch_portable").collect()
    li = Tables(spark, sf_dir).lineitem.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
    )
    for r in est:
        grp = li.filter(F.col("flag") == r.flag)
        n = grp.count()
        below = grp.filter(F.col("v") <= r.est).count()
        rank = below / n
        assert abs(rank - r.q_pct / 100) <= 0.12, (
            r.flag, r.q_pct, rank,
        )


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),        # group
            st.integers(0, 50),       # hash key (small domain -> TIES)
            st.integers(-5, 5),       # payload value
            st.integers(0, 2),        # shard
        ),
        min_size=0,
        max_size=120,
    ),
    st.integers(1, 8),                # k
)
def test_bottom_k_merge_identity(rows, k):
    """The KMV merge law agg_percentile_sketch_union hash-pins on real
    data, property-tested on adversarial multisets: for bottom-k by a
    TOTAL order over (key, value), re-cutting the union of per-shard
    bottom-k partials equals the single-pass bottom-k — including
    duplicate keys (the r14 lineitem tie hazard) and duplicate whole
    rows, because ties are broken by the value and fully-identical
    rows are interchangeable in a multiset."""
    from collections import Counter

    def bottom_k(items):
        return sorted(items)[:k]

    for g in {r[0] for r in rows}:
        grp = [(h, v) for gg, h, v, _s in rows if gg == g]
        direct = bottom_k(grp)
        partials = []
        for s in {r[3] for r in rows if r[0] == g}:
            partials += bottom_k(
                [(h, v) for gg, h, v, ss in rows if gg == g and ss == s]
            )
        merged = bottom_k(partials)
        assert Counter(merged) == Counter(direct), (g, merged, direct)
