"""IVF-PQ — the composed ANN index (FAISS's IVFADC shape): an IVF
coarse quantizer restricts the search to the probed cells' vectors,
a product quantizer scores ONLY those candidates via ADC lookups,
and a small exact rerank fixes the final ranking.

HASH-CHECKED end to end since r16 (upgraded from rows-only, r15
verdict #8): every stage is the repo's portable exact-arithmetic
discipline —

- the IVF coarse quantizer/probe is ivf._ivf_exact_index/_ivf_probe
  (exact-Lloyd, packed fixed-point argmin);
- PQ codebooks are trained by the SAME exact-Lloyd recipe run over
  all M subspaces at once (the subspace id is just another grouping
  key, so training stays 2 distributed rounds, not 2·M);
- ADC scores are INTEGER sums of fixed-point LUT entries
  (floor(dot·1e6 + 0.5) per (query, subspace, codeword)) — integer
  addition is associative, so Spark's aggregate and DuckDB's SUM
  agree exactly, which is precisely what makes the CANDIDATE SET
  engine-replayable where float ADC never is;
- the rerank is the r4 cosine discipline of sim_knn_cosine_topk.

Measured recall@5 vs the exact operator: 0.87/0.94 at sf0.01/sf0.1
(the IVF candidate stage is the ceiling; the integer-ADC top-CAND +
exact rerank inside the probed cells is near-lossless), above the old
float pipeline's 0.73-0.80.

Scale shape: codebooks/LUTs are tiny broadcast tables; the ADC join
explodes candidates ×M, but candidates are probe-bounded
(N_PROBE/N_CELLS of the corpus × the query count), so the shuffle is
corpus-size independent. A byte-packed mapInPandas ADC (pq.py's
shape) would scan cheaper per candidate at extreme scale — pq.py
keeps that exhibit; this one buys cross-engine verifiability for the
composed index.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, sq_norm, to_double
from ..registry import query
from ..tables import Tables
from ._util import r4
from .ivf import (
    _IVF_PACK,
    _IVF_DIST_SCALE,
    IVF_ROUNDS,
    N_PROBE,
    TOP_K,
    _ivf_cte_prefix,
    _ivf_exact_index,
    _ivf_probe,
)
from .pq import KSUB, M

CAND = 100
N_QUERIES = 20
DS = 64 // M  # subspace width (64-dim corpus → 4)
_LUT_SCALE = 1000000


def _sub_slices(df, id_col: str, out_id: str):
    """(id, mi, sx: array<double>[DS]) — each vector split into its M
    subspace slices. Slice the RAW float array first, cast the DS
    values after (never index a computed array inside the per-element
    lambda — CLAUDE.md r5)."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(M - 1)),
                lambda mi: F.transform(
                    F.slice(F.col("embedding"), mi * DS + 1, DS),
                    lambda v: v.cast("double"),
                ),
            )
        ).alias("mi", "sx"),
    )


def _pq_exact_index(t, rounds: int = 2):
    """(codes, books): per-(vector, subspace) codeword assignment and
    the final per-subspace codebooks — exact-Lloyd with the subspace
    id as an extra grouping key, so ALL M subspaces train in one
    2-round distributed loop (broadcast codebooks, no vector
    shuffle)."""
    sub = _sub_slices(t.embeddings, "vec_id", "vec_id")
    cent = sub.filter(F.col("vec_id") < KSUB).select(
        "mi", F.col("vec_id").alias("cl"), F.col("sx").alias("cent")
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("sx"), F.col("cent"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    assign = None
    for r in range(rounds):
        assign = (
            sub.join(F.broadcast(cent), "mi")
            .groupBy("vec_id", "mi")
            .agg(
                F.min(
                    F.floor(dist * _IVF_DIST_SCALE + 0.5).cast("long")
                    * _IVF_PACK + F.col("cl")
                ).alias("packed")
            )
        )
        if r < rounds - 1:
            m = (
                assign.join(sub, ["vec_id", "mi"])
                .select(
                    "mi",
                    (F.col("packed") % _IVF_PACK).alias("cl"),
                    F.posexplode("sx").alias("dim", "v"),
                )
                .groupBy("mi", "cl", "dim")
                .agg(
                    (
                        F.sum(
                            F.floor(F.col("v") * 10000 + 0.5)
                            .cast("long")
                        )
                        / 10000.0
                        / F.count(F.lit(1))
                    ).alias("mv")
                )
            )
            cent = (
                m.groupBy("mi", "cl")
                .agg(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("dim", "mv"))
                        ),
                        lambda s: s["mv"],
                    ).alias("cent")
                )
                .localCheckpoint()
            )
    codes = assign.select(
        "vec_id", "mi", (F.col("packed") % _IVF_PACK).alias("code")
    )
    return codes, cent


def _ivfpq_oracle() -> str:
    """DuckDB twin of the composed pipeline: the shared IVF CTE
    prefix (quantizer + cells + probe), the subspace Lloyd unrolled
    with mi as an extra key, integer fixed-point LUTs, the integer
    ADC sum, the CAND cut, and the r4 cosine rerank."""
    from ..functions.vectors import NONZERO_EMB_SQL as NZ

    chain4 = " + ".join(
        f"((e.sx[{k}] - c.cent[{k}]) * (e.sx[{k}] - c.cent[{k}]))"
        for k in range(1, DS + 1)
    )
    dot4 = " + ".join(
        f"(q.qx[{k}] * c.cent[{k}])" for k in range(1, DS + 1)
    )
    parts = [_ivf_cte_prefix(), f""",
    sub AS (
        SELECT vec_id, ms.mi AS mi,
               [{", ".join(
                   f"CAST(embedding[ms.mi * {DS} + {k}] AS DOUBLE)"
                   for k in range(1, DS + 1)
               )}] AS sx
        FROM embeddings, (SELECT unnest(range({M})) AS mi) ms
    ),
    sdmat AS (
        SELECT vec_id, mi, generate_subscripts(sx, 1) AS dim,
               unnest(sx) AS v
        FROM sub
    ),
    sc0 AS (
        SELECT mi, vec_id AS cl, sx AS cent FROM sub
        WHERE vec_id < {KSUB}
    )"""]
    for r in range(1, IVF_ROUNDS + 1):
        parts.append(f""",
    sa{r} AS (
        SELECT e.vec_id, e.mi,
               min(CAST(floor(({chain4}) * {_IVF_DIST_SCALE} + 0.5)
                        AS BIGINT) * {_IVF_PACK} + c.cl) AS packed
        FROM sub e JOIN sc{r - 1} c USING (mi)
        GROUP BY e.vec_id, e.mi
    )""")
        if r < IVF_ROUNDS:
            parts.append(f""",
    sm{r} AS (
        SELECT d.mi, a.packed % {_IVF_PACK} AS cl, d.dim,
               sum(CAST(floor(d.v * 10000 + 0.5) AS BIGINT))
                   / 10000.0 / count(*) AS mv
        FROM sa{r} a JOIN sdmat d
          ON a.vec_id = d.vec_id AND a.mi = d.mi
        GROUP BY 1, 2, 3
    ),
    sc{r} AS (SELECT mi, cl, list(mv ORDER BY dim) AS cent
              FROM sm{r} GROUP BY mi, cl)""")
    parts.append(f""",
    codes AS (
        SELECT vec_id, mi, packed % {_IVF_PACK} AS code
        FROM sa{IVF_ROUNDS}
    ),
    luts AS (
        SELECT q.query_id, c.mi, c.cl AS code,
               CAST(floor(({dot4}) * {_LUT_SCALE} + 0.5)
                    AS BIGINT) AS lut
        FROM (SELECT s.vec_id AS query_id, s.mi, s.sx AS qx
              FROM sub s
              JOIN (SELECT vec_id FROM embeddings
                    WHERE vec_id < {N_QUERIES} AND {NZ}) nzq
                ON nzq.vec_id = s.vec_id) q
        JOIN sc{IVF_ROUNDS - 1} c USING (mi)
    ),
    pcand AS (
        SELECT p.query_id, m.vec_id AS neighbor_id
        FROM probe p
        JOIN cells m ON m.cell = p.cell
        JOIN (SELECT vec_id FROM embeddings WHERE {NZ}) nzv
          ON nzv.vec_id = m.vec_id
        WHERE p.prn <= {N_PROBE} AND m.vec_id <> p.query_id
    ),
    scored AS (
        SELECT pc.query_id, pc.neighbor_id,
               CAST(sum(l.lut) AS BIGINT) AS approx
        FROM pcand pc
        JOIN codes k ON k.vec_id = pc.neighbor_id
        JOIN luts l ON l.query_id = pc.query_id
                   AND l.mi = k.mi AND l.code = k.code
        GROUP BY 1, 2
    ),
    cands AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY approx DESC, neighbor_id
                                 ) AS crn
        FROM scored
    ),
    rpairs AS (
        SELECT c.query_id, c.neighbor_id,
               round(list_cosine_similarity(
                   CAST(qe.embedding AS DOUBLE[]),
                   CAST(ne.embedding AS DOUBLE[])), 4) AS sim
        FROM cands c
        JOIN embeddings qe ON qe.vec_id = c.query_id
        JOIN embeddings ne ON ne.vec_id = c.neighbor_id
        WHERE c.crn <= {CAND}
    ),
    rranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id
                                    ) AS rn
        FROM rpairs
    )
    SELECT query_id, neighbor_id, sim, rn
    FROM rranked WHERE rn <= {TOP_K}
    """)
    return "".join(parts)


@query("sim_knn_ivfpq", oracle=_ivfpq_oracle())
def sim_knn_ivfpq(spark, sf_dir):
    """Approximate top-5 cosine neighbors (queries: vec_id < 20):
    probe 4 of 32 IVF cells, INTEGER-ADC-score only the probed cells'
    vectors via fixed-point PQ lookup tables, exact-rerank the
    top-CAND per query. See the module docstring for the portability
    design (r16: hash-checked; the candidate set itself is
    engine-replayable)."""
    t = Tables(spark, sf_dir)
    cells, cent = _ivf_exact_index(t)
    probe = _ivf_probe(t, cent).select("query_id", "cell")
    codes, books = _pq_exact_index(t)
    nz = t.embeddings.filter(sq_norm(to_double("embedding")) > 0)

    qdot = F.aggregate(
        F.zip_with(F.col("qx"), F.col("cent"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    luts = (
        _sub_slices(
            nz.filter(F.col("vec_id") < N_QUERIES), "vec_id", "query_id"
        )
        .withColumnRenamed("sx", "qx")
        .join(F.broadcast(books), "mi")
        .select(
            "query_id", "mi", F.col("cl").alias("code"),
            F.floor(qdot * _LUT_SCALE + 0.5).cast("long").alias("lut"),
        )
    )
    cand = (
        cells.withColumnRenamed("vec_id", "neighbor_id")
        .join(
            nz.select(F.col("vec_id").alias("neighbor_id")),
            "neighbor_id",
        )
        .join(F.broadcast(probe), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    scored = (
        cand.join(
            codes.withColumnRenamed("vec_id", "neighbor_id"),
            "neighbor_id",
        )
        .join(F.broadcast(luts), ["query_id", "mi", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("lut").alias("approx"))
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    cands = (
        scored.withColumn("crn", F.row_number().over(w_cand))
        .filter(F.col("crn") <= CAND)
        .select("query_id", "neighbor_id")
    )
    emb = nz.select("vec_id", to_double("embedding").alias("e"))
    pairs = (
        cands.join(
            emb.select(
                F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("e").alias("ce"),
            ),
            "neighbor_id",
        )
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
