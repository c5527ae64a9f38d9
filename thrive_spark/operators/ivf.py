"""IVF (inverted-file) ANN — the coarse-quantizer alternative to the
LSH index in ``ann.py`` (task brief: "an IVF or LSH-bucketed variant
as the scale path"; this ships both).

Index build (r16): the coarse quantizer is the repo's PORTABLE
exact-Lloyd recipe (vectors.lloyd_exact_assign — packed fixed-point
argmin over left-folded L2 chains), which makes the WHOLE pipeline —
quantizer, probe, candidate set, rerank — DuckDB-replayable, so
``sim_knn_ivf`` is hash-checked, not rows-only. Search: each query
probes its ``N_PROBE`` nearest cells and exact-reranks only those
candidates — candidate fraction ≈ N_PROBE/N_CELLS of the corpus,
independent of corpus size. Unlike LSH, cells adapt to the data
distribution, so clustered real embeddings get much better recall at
the same probe budget.

The composed IVF-PQ index (ivfpq.py) shares this module's quantizer
and probe; the flat-PQ scan (pq.py) shares the sample/rounds
constants — all three ANN quantizer exhibits are hash-checked since
r16.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, sq_norm, to_double
from ..registry import query
from ..tables import Tables
from ._util import r4

#: r13 tuning (verdict #3): swept (cells, probes) in numpy against
#: the exact operator — 32 cells / 4 probes measures recall@5 =
#: 0.80/0.74/0.77 at sf0.001/0.01/0.1 with a ~12.5% candidate
#: fraction, the best point on this corpus's recall/fraction frontier
#: (these are STRUCTURE-FREE random vectors, ANN's worst case; more
#: cells at the same probe budget lose recall faster than they save
#: candidates: 64/6 → 0.64-0.72 at 9%).
N_CELLS = 32
N_PROBE = 4
TOP_K = 5


#: exact-Lloyd quantizer geometry (r16 hash upgrade): 2 rounds of the
#: portable fixed-point Lloyd recipe; packing per lloyd_exact_assign.
#: Training runs on the deterministic vec_id < IVF_SAMPLE sample —
#: DRIVER-SIDE via lloyd_exact_py (bit-identical to the distributed
#: loop on the same rows), which keeps the exhibit's fixed Spark-stage
#: count at one assignment job instead of 2 rounds x 3 stages; 512 is
#: the measured knee (recall@5 0.87/0.88 at sf0.01/0.1 vs 0.74 at 256)
IVF_ROUNDS = 2
IVF_SAMPLE = 512
_IVF_DIST_SCALE = 1000000
_IVF_PACK = 100


def _ivf_cte_prefix() -> str:
    """The WITH-chain through ``cells``/``probe`` — the portable IVF
    index and probe shared by the sim_knn_ivf oracle and the composed
    sim_knn_ivfpq oracle (same CTE discipline as vectors._kmx_oracle:
    64-term left-assoc distance chains, packed-argmin assignment,
    fixed-point means)."""
    chain = " + ".join(
        f"((CAST(e.embedding[{k}] AS DOUBLE) - c.cent[{k}])"
        f" * (CAST(e.embedding[{k}] AS DOUBLE) - c.cent[{k}]))"
        for k in range(1, 65)
    )
    from ..functions.vectors import NONZERO_EMB_SQL as NZ

    parts = [f"""
    WITH dmat AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
               unnest(embedding) AS v
        FROM embeddings
    ),
    c0 AS (
        SELECT vec_id AS cl,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
        FROM embeddings WHERE vec_id < {N_CELLS}
    )"""]
    for r in range(1, IVF_ROUNDS + 1):
        # training rounds assign the SAMPLE; the final round is the
        # cell assignment over the whole corpus
        dom = (
            f"(SELECT * FROM embeddings WHERE vec_id < {IVF_SAMPLE})"
            if r < IVF_ROUNDS else "embeddings"
        )
        parts.append(f""",
    a{r} AS (
        SELECT e.vec_id,
               min(CAST(floor(({chain}) * {_IVF_DIST_SCALE} + 0.5)
                        AS BIGINT) * {_IVF_PACK} + c.cl) AS packed
        FROM {dom} e, c{r - 1} c
        GROUP BY e.vec_id
    )""")
        if r < IVF_ROUNDS:
            parts.append(f""",
    m{r} AS (
        SELECT a{r}.packed % {_IVF_PACK} AS cl, d.dim,
               sum(CAST(floor(CAST(d.v AS DOUBLE) * 10000 + 0.5)
                        AS BIGINT)) / 10000.0 / count(*) AS mv
        FROM a{r} JOIN dmat d USING (vec_id)
        GROUP BY 1, d.dim
    ),
    c{r} AS (SELECT cl, list(mv ORDER BY dim) AS cent
             FROM m{r} GROUP BY cl)""")
    parts.append(f""",
    cells AS (
        SELECT vec_id, packed % {_IVF_PACK} AS cell
        FROM a{IVF_ROUNDS}
    ),
    qp AS (
        SELECT e.vec_id AS query_id,
               CAST(e.embedding AS DOUBLE[]) AS qe,
               CAST(floor(({chain}) * {_IVF_DIST_SCALE} + 0.5)
                    AS BIGINT) * {_IVF_PACK} + c.cl AS packed
        FROM (SELECT * FROM embeddings
              WHERE vec_id < 20 AND {NZ}) e,
             c{IVF_ROUNDS - 1} c
    ),
    probe AS (
        SELECT query_id, qe, packed % {_IVF_PACK} AS cell,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY packed) AS prn
        FROM qp
    )""")
    return "".join(parts)


def _ivf_oracle() -> str:
    """Unrolled DuckDB twin of the whole IVF pipeline (r15 verdict #8
    → r16): the exact-Lloyd coarse quantizer, the probe (the 4
    nearest cells per query by the SAME packed metric), and the
    exact cosine rerank (sim_knn_cosine_topk's r4 discipline). Every
    step is fixed-order arithmetic, so the approximate operator's
    CANDIDATE SET — not just its rerank — is engine-replayable."""
    from ..functions.vectors import NONZERO_EMB_SQL as NZ

    return _ivf_cte_prefix() + f""",
    pairs AS (
        SELECT p.query_id, n.vec_id AS neighbor_id,
               round(list_cosine_similarity(
                   p.qe, CAST(n.embedding AS DOUBLE[])), 4) AS sim
        FROM probe p
        JOIN cells m ON m.cell = p.cell
        JOIN (SELECT * FROM embeddings WHERE {NZ}) n
          ON n.vec_id = m.vec_id
        WHERE p.prn <= {N_PROBE} AND n.vec_id <> p.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id
                                    ) AS rn
        FROM pairs
    )
    SELECT query_id, neighbor_id, sim, rn FROM ranked WHERE rn <= {TOP_K}
    """


def _sample_rows(t):
    """The deterministic training sample: (vec_id, [doubles]) for
    vec_id < IVF_SAMPLE, ordered by id — bounded driver metadata (the
    quantizer-training pattern every production ANN index uses)."""
    return [
        (r["vec_id"], r["x"])
        for r in t.embeddings.filter(F.col("vec_id") < IVF_SAMPLE)
        .orderBy("vec_id")
        .select("vec_id", to_double(F.col("embedding")).alias("x"))
        .collect()
    ]


def _qrows_py(sample, n_queries=20):
    """Driver-side query extraction: the queries (vec_id < 20) are a
    PREFIX of the vec_id < IVF_SAMPLE training sample, so no second
    scan+collect of embeddings is needed. The nonzero guard replicates
    sq_norm's left fold exactly (acc = 0.0; acc += v*v — squares are
    nonnegative, so the fold is 0 iff every component is 0)."""
    out = []
    for vid, x in sample:
        if vid >= n_queries:
            continue
        acc = 0.0
        for v in x:
            acc += v * v
        if acc > 0:
            out.append((vid, x))
    return sorted(out)


def _probe_py(qrows, cents):
    """Driver-side twin of _ivf_probe: each query's N_PROBE nearest
    cells under the SAME packed fixed-point metric (left-folded L2
    chain, floor(d*SCALE+0.5)*PACK+cl) — plain-float accumulation is
    the left fold, so the packed longs match the oracle's probe CTE
    bit-for-bit. 20 queries x N_CELLS cells: microseconds, replacing
    a full embeddings scan job (guide §5 — bounded driver metadata)."""
    import math

    out = []
    for qid, qx in qrows:
        packed = []
        for cl, c in cents:
            acc = 0.0
            for a, b in zip(qx, c):
                acc += (a - b) * (a - b)
            packed.append(
                int(math.floor(acc * _IVF_DIST_SCALE + 0.5)) * _IVF_PACK
                + cl
            )
        for p in sorted(packed)[:N_PROBE]:
            out.append((qid, qx, p % _IVF_PACK))
    return out


def _packed_dist(cent_col="cent", x_col="x"):
    dist = F.aggregate(
        F.zip_with(
            F.col(x_col), F.col(cent_col),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        F.floor(dist * _IVF_DIST_SCALE + 0.5).cast("long")
        * _IVF_PACK + F.col("cl")
    )


def _ivf_exact_index(t, sample=None, cents=None):
    """(cells, cent): each vector's owning cell and the FINAL
    centroid table — shared by sim_knn_ivf and the composed
    sim_knn_ivfpq. Centroids train DRIVER-SIDE on the deterministic
    sample via lloyd_exact_py (bit-identical to the distributed loop
    on the same rows); only the corpus-wide cell ASSIGNMENT runs as a
    Spark job (one broadcast + one shuffle-free scan + groupBy).
    Pass ``cents`` (the lloyd_exact_py output) to skip retraining when
    the caller also needs the centroid list driver-side (ivfpq)."""
    from .vectors import lloyd_exact_py

    spark = t.embeddings.sparkSession
    if cents is None:
        cents = lloyd_exact_py(
            sample if sample is not None else _sample_rows(t),
            N_CELLS, IVF_ROUNDS,
        )
    cent = spark.createDataFrame(cents, "cl bigint, cent array<double>")
    emb = t.embeddings.select(
        "vec_id", to_double(F.col("embedding")).alias("x")
    )
    cells = (
        emb.crossJoin(F.broadcast(cent))
        .groupBy("vec_id")
        .agg(F.min(_packed_dist()).alias("packed"))
        .select(
            "vec_id", (F.col("packed") % _IVF_PACK).alias("cell")
        )
    )
    return cells, cent


def _ivf_probe(t, cent):
    """(query_id, qe, cell): each nonzero query's N_PROBE nearest
    cells by the SAME packed metric the quantizer assigns with."""
    nz = t.embeddings.filter(sq_norm(to_double("embedding")) > 0)
    dist = F.aggregate(
        F.zip_with(
            F.col("qe"), F.col("cent"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wp = Window.partitionBy("query_id").orderBy("packed")
    return (
        nz.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("query_id"),
            to_double("embedding").alias("qe"),
        )
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id", "qe",
            (
                F.floor(dist * _IVF_DIST_SCALE + 0.5).cast("long")
                * _IVF_PACK + F.col("cl")
            ).alias("packed"),
        )
        .withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= N_PROBE)
        .select(
            "query_id", "qe",
            (F.col("packed") % _IVF_PACK).alias("cell"),
        )
    )


@query("sim_knn_ivf", oracle=_ivf_oracle())
def sim_knn_ivf(spark, sf_dir):
    """Approximate top-5 cosine neighbors (queries: vec_id < 20) via
    IVF — HASH-CHECKED end to end (r16, upgraded from rows-only):
    the coarse quantizer is the portable exact-Lloyd recipe (packed
    fixed-point argmin over left-folded L2 chains, 2 rounds, init =
    vectors with id < N_CELLS), trained driver-side on the
    deterministic vec_id < IVF_SAMPLE sample — bit-identical to the
    distributed loop on those rows (lloyd_exact_py), which is also
    the production pattern (quantizers train on bounded samples). The
    probe ranks cells by the SAME packed metric and candidates
    exact-rerank under the r4 cosine discipline — so the DuckDB
    oracle replays the quantizer, the probe, the candidate set, and
    the ranking bit-for-bit. Measured recall@5 vs the exact operator:
    0.87/0.88 at sf0.01/sf0.1 with a ~12.5% candidate fraction —
    at-or-above the old float spherical quantizer (0.74-0.80) while
    staying engine-exact.

    Scale shape: centroids broadcast, the corpus-wide cell assignment
    is one shuffle-free scan + groupBy, the probe set is tiny, and
    candidate volume is probe-bounded (N_PROBE/N_CELLS of the corpus)
    independent of corpus size."""
    t = Tables(spark, sf_dir)
    from .vectors import lloyd_exact_py

    # r16: ONE sample collect feeds quantizer training, the queries
    # (a prefix of the sample), and the driver-side probe — the old
    # _ivf_probe subtree re-scanned embeddings inside the plan for 20
    # bounded query rows (plan: 3 scans -> 2; ~0.9 s of sequential
    # scan jobs removed at sf0.1).
    sample = _sample_rows(t)
    cents = lloyd_exact_py(sample, N_CELLS, IVF_ROUNDS)
    cells, cent = _ivf_exact_index(t, sample=sample, cents=cents)
    probe = spark.createDataFrame(
        _probe_py(_qrows_py(sample), cents),
        "query_id bigint, qe array<double>, cell bigint",
    )
    nz = t.embeddings.filter(sq_norm(to_double("embedding")) > 0)
    cand = nz.select(
        F.col("vec_id").alias("neighbor_id"),
        to_double("embedding").alias("ce"),
    ).join(
        cells.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id",
    )
    # each vector lives in exactly ONE cell, so a (query, neighbor)
    # pair arrives at most once — no dedup stage needed
    pairs = (
        cand.join(F.broadcast(probe), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            r4(cosine(F.col("qe"), F.col("ce"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return pairs.withColumn(
        "rn", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rn") <= TOP_K)
