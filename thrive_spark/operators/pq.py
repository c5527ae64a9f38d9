"""Product-quantization ANN — the memory-bound scale path next to the
LSH (ann.py) and IVF (ivf.py) indexes (task brief: similarity search
family).

PQ splits each vector into M subspaces and replaces each subspace
slice with the id of its nearest codeword from a per-subspace codebook
(M bytes per vector instead of dim×4).  Query scoring is ADC
(asymmetric distance computation): the query precomputes a lookup
table of its dot product with every codeword, and each candidate's
approximate similarity is M table lookups — no per-candidate float
math.  At 100 TB this is the index you can actually hold: codes are
~M bytes/vector (16 GB per 1B vectors at M=16), scanned sequentially
at memory bandwidth, while exact vectors stay in parquet for the
final rerank of a tiny candidate set.

HASH-CHECKED end to end since r16 (upgraded from rows-only): the
codebooks train by the repo's portable exact-Lloyd recipe
(vectors.lloyd_exact_py on the deterministic vec_id < IVF_SAMPLE
sample — bit-identical to the distributed loop and the unrolled
DuckDB CTEs on the same rows), and ADC scores are INTEGER sums of
fixed-point LUT entries (floor(dot·1e6 + 0.5) per (query, subspace,
codeword)).  Integer addition is associative, so Spark's per-batch
sums and DuckDB's SUM agree exactly — which is precisely what makes
the CANDIDATE SET engine-replayable where float ADC never is.  The
exact rerank keeps sim_knn_cosine_topk's r4 cosine discipline.

Spark shape: codebooks/LUTs are tiny broadcast closure state; ONE
`mapInArrow` pass codes each batch and emits only the batch's
top-CAND candidates per query under the TOTAL order
(approx DESC, neighbor_id) — per-batch pruning under the same total
order the global cut uses is lossless, so the union provably contains
the global top-CAND regardless of batch boundaries, and the shuffle
is O(batches·Q·CAND) rows, corpus-size independent.  Unlike
ivfpq.py's probe-bounded scan this one touches every vector (that is
the classic flat-PQ trade: highest recall per byte, no cell loss) —
recall@5 vs exact measured 0.99/0.93 at sf0.01/sf0.1, gated in
tests/test_ann.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, sq_norm, to_double
from ..registry import query
from ..tables import Tables
from ._util import r4
from .ivf import (
    _IVF_DIST_SCALE,
    _IVF_PACK,
    IVF_ROUNDS,
    IVF_SAMPLE,
    _sample_rows,
)

#: r13 tuning (verdict #3), swept against the exact operator: M=16
#: 4-dim subspaces + a 100-candidate exact rerank clears 0.8 recall@5
#: under a 10% candidate budget on structure-free random vectors —
#: the only index family here that does (M=8/CAND=50 measured 0.46).
M = 16  # subspaces (dim 64 -> 4-dim slices)
KSUB = 16  # codewords per subspace (4-bit codes)
TOP_K = 5
CAND = 100
N_QUERIES = 20
DS = 64 // M  # subspace width
_LUT_SCALE = 1000000


def _pq_books_py(sample):
    """Per-subspace codebooks trained driver-side on the sample via
    lloyd_exact_py — [(mi, [(cl, cent floats), ...]), ...]. Shared
    with ivfpq.py (the composed index trains the same books)."""
    from .vectors import lloyd_exact_py

    return [
        (
            mi,
            lloyd_exact_py(
                [
                    (vid, x[mi * DS: (mi + 1) * DS])
                    for vid, x in sample
                ],
                KSUB, IVF_ROUNDS,
            ),
        )
        for mi in range(M)
    ]


def _packed_argmin(x, cls, cents, scale, pack):
    """Vectorized twin of lloyd_exact_assign's packed fixed-point
    argmin: dim-by-dim accumulation IS the left fold, so the packed
    integers match the oracle CTEs exactly. Shared with ivfpq.py."""
    import numpy as np

    acc = None
    for k in range(cents.shape[1]):
        tterm = (x[:, k, None] - cents[None, :, k]) ** 2
        acc = tterm if acc is None else acc + tterm
    packed = (
        np.floor(acc * scale + 0.5).astype(np.int64) * pack
        + cls[None, :]
    )
    return cls[packed.argmin(axis=1)]


def _int_luts(qrows, books):
    """luts[qi][mi] = {cl: int lut} — fixed-point query/codeword dot
    products whose fold order matches the oracle's left-assoc chain.
    Shared with ivfpq.py."""
    import numpy as np

    luts: list[list[dict[int, int]]] = []
    for _qid, qx in qrows:
        per_mi = []
        for mi, book in books:
            d: dict[int, int] = {}
            for cl, c in book:
                acc = None
                for k in range(DS):
                    term = qx[mi * DS + k] * c[k]
                    acc = term if acc is None else acc + term
                d[cl] = int(np.floor(acc * _LUT_SCALE + 0.5))
            per_mi.append(d)
        luts.append(per_mi)
    return luts


def _pq_cte_block() -> str:
    """The subspace CTE chain ``sub`` → ``codes``/``luts`` — the
    portable PQ training + corpus coding + integer query LUTs, shared
    by the sim_knn_pq oracle (full ADC scan) and the composed
    sim_knn_ivfpq oracle (probe-bounded ADC). No leading WITH/comma:
    callers splice it into their own chain."""
    from ..functions.vectors import NONZERO_EMB_SQL as NZ

    chain4 = " + ".join(
        f"((e.sx[{k}] - c.cent[{k}]) * (e.sx[{k}] - c.cent[{k}]))"
        for k in range(1, DS + 1)
    )
    dot4 = " + ".join(
        f"(q.qx[{k}] * c.cent[{k}])" for k in range(1, DS + 1)
    )
    parts = [f"""
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
        # training rounds assign the SAMPLE's slices; the final round
        # is the corpus-wide code assignment
        dom = (
            f"(SELECT * FROM sub WHERE vec_id < {IVF_SAMPLE})"
            if r < IVF_ROUNDS else "sub"
        )
        parts.append(f""",
    sa{r} AS (
        SELECT e.vec_id, e.mi,
               min(CAST(floor(({chain4}) * {_IVF_DIST_SCALE} + 0.5)
                        AS BIGINT) * {_IVF_PACK} + c.cl) AS packed
        FROM {dom} e JOIN sc{r - 1} c USING (mi)
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
    )""")
    return "".join(parts)


def _pq_oracle() -> str:
    """DuckDB twin of the flat-PQ pipeline: the shared subspace CTE
    block (codebook Lloyd, corpus codes, integer query LUTs), the
    full integer ADC score over every nonzero vector, the CAND cut,
    and the r4 cosine rerank. The operator's per-batch pruning is
    lossless under the (approx DESC, neighbor_id) total order, so
    the unpruned oracle scan reproduces the identical candidate
    set."""
    from ..functions.vectors import NONZERO_EMB_SQL as NZ

    return "WITH " + _pq_cte_block() + f""",
    scored AS (
        SELECT l.query_id, k.vec_id AS neighbor_id,
               CAST(sum(l.lut) AS BIGINT) AS approx
        FROM codes k
        JOIN (SELECT vec_id FROM embeddings WHERE {NZ}) nzv
          ON nzv.vec_id = k.vec_id
        JOIN luts l ON l.mi = k.mi AND l.code = k.code
        WHERE k.vec_id <> l.query_id
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
    """


@query("sim_knn_pq", oracle=_pq_oracle())
def sim_knn_pq(spark, sf_dir):
    """Approximate top-5 cosine neighbors for queries (vec_id < 20)
    via flat PQ: integer-ADC-score EVERY nonzero vector against each
    query's fixed-point LUTs, cut to the top-CAND candidates, exact
    cosine rerank. HASH-CHECKED (r16): see the module docstring.

    Scale shape: books/LUTs are bounded closure state, one Arrow map
    pass codes the corpus (the O(M) byte-scan that makes flat PQ the
    fits-in-memory index), and per-batch top-CAND pruning under the
    global total order bounds the shuffle at O(batches·Q·CAND) rows.
    The exact rerank joins back to embeddings for candidates only."""
    import numpy as np

    t = Tables(spark, sf_dir)
    # r16: one sample collect feeds the books AND the queries (a
    # prefix of the sample) — the old qrows collect re-scanned
    # embeddings for 20 bounded rows (guide §5)
    sample = _sample_rows(t)
    books = _pq_books_py(sample)
    book_arrs = [
        (
            np.array([cl for cl, _ in book], dtype=np.int64),
            np.array([c for _, c in book]),
        )
        for _mi, book in books
    ]

    nz = t.embeddings.filter(sq_norm(to_double("embedding")) > 0)
    from .ivf import _qrows_py

    qrows = [(qid, np.array(qx)) for qid, qx in _qrows_py(sample, N_QUERIES)]
    luts = _int_luts(qrows, books)
    qids = [qid for qid, _ in qrows]
    # dense (Q, M, KSUB) LUT tensor: codes are original sample
    # vec_ids < KSUB (the exact-Lloyd init), so they index directly
    lut_mat = np.zeros((len(qids), M, KSUB), dtype=np.int64)
    for qi in range(len(qids)):
        for mi in range(M):
            for cl, v in luts[qi][mi].items():
                lut_mat[qi, mi, cl] = v

    def adc(batches):
        import pyarrow as pa

        for rb in batches:
            vids = rb.column(0).to_numpy(zero_copy_only=False)
            x = np.array(rb.column(1).to_pylist(), dtype=np.float64)
            approx = np.zeros((len(x), len(qids)), dtype=np.int64)
            for mi in range(M):
                cls_a, cents_a = book_arrs[mi]
                codes = _packed_argmin(
                    x[:, mi * DS: (mi + 1) * DS], cls_a, cents_a,
                    _IVF_DIST_SCALE, _IVF_PACK,
                )
                approx += lut_mat[:, mi, codes].T  # ADC → (n, Q)
            out_q, out_n, out_a = [], [], []
            for qi, qid in enumerate(qids):
                keep = vids != qid
                nv = vids[keep]
                av = approx[keep, qi]
                take = min(CAND, len(nv))
                # total order (approx DESC, neighbor_id): lossless
                # per-batch pruning — matches the global window cut
                top = np.lexsort((nv, -av))[:take]
                out_q += [qid] * take
                out_n += nv[top].tolist()
                out_a += av[top].tolist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_q, pa.int64()),
                    pa.array(out_n, pa.int64()),
                    pa.array(out_a, pa.int64()),
                ],
                ["query_id", "neighbor_id", "approx"],
            )

    scored = nz.select(
        "vec_id", to_double("embedding").alias("x")
    ).mapInArrow(adc, "query_id long, neighbor_id long, approx long")
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
