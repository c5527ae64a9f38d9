"""IVF-PQ — the composed ANN index (FAISS's IVFADC shape): an IVF
coarse quantizer restricts the search to the probed cells' vectors,
a product quantizer scores ONLY those candidates via ADC lookups,
and a small exact rerank fixes the final ranking.

HASH-CHECKED end to end since r16 (upgraded from rows-only, r15
verdict #8): every stage is the repo's portable exact-arithmetic
discipline —

- the IVF coarse quantizer/probe is ivf._ivf_exact_index/_ivf_probe
  (exact-Lloyd, packed fixed-point argmin);
- PQ codebooks train by the SAME exact-Lloyd recipe, driver-side on
  the deterministic vec_id < IVF_SAMPLE sample (lloyd_exact_py —
  bit-identical to the distributed loop on those slices; bounded
  sample training is how production PQ trains anyway), with ONE
  distributed corpus-wide code-assignment job;
- ADC scores are INTEGER sums of fixed-point LUT entries
  (floor(dot·1e6 + 0.5) per (query, subspace, codeword)) — integer
  addition is associative, so Spark's aggregate and DuckDB's SUM
  agree exactly, which is precisely what makes the CANDIDATE SET
  engine-replayable where float ADC never is;
- the rerank is the r4 cosine discipline of sim_knn_cosine_topk.

Measured recall@5 vs the exact operator: 0.87/0.88 at sf0.01/sf0.1
(the sample-trained IVF candidate stage is the ceiling; the
integer-ADC top-CAND + exact rerank inside the probed cells is
near-lossless), at-or-above the old float pipeline's 0.73-0.80.

Scale shape: codebooks/LUTs are tiny broadcast tables; the ADC join
explodes candidates ×M, but candidates are probe-bounded
(N_PROBE/N_CELLS of the corpus × the query count), so the shuffle is
corpus-size independent. pq.py keeps the flat full-scan ADC exhibit
(highest recall per byte, no cell loss); this one composes the IVF
probe on top so the scan itself is also probe-bounded. Both are
hash-checked since r16 and share the codebook/LUT/argmin machinery
(pq._pq_books_py / _int_luts / _packed_argmin / _pq_cte_block).
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
    N_CELLS,
    N_PROBE,
    TOP_K,
    _ivf_cte_prefix,
    _probe_py,
    _qrows_py,
    _sample_rows,
)
from .pq import (
    DS,
    M,
    _int_luts,
    _packed_argmin,
    _pq_books_py,
    _pq_cte_block,
)

CAND = 100
N_QUERIES = 20


def _ivfpq_oracle() -> str:
    """DuckDB twin of the composed pipeline: the shared IVF CTE
    prefix (quantizer + cells + probe), the subspace Lloyd unrolled
    with mi as an extra key, integer fixed-point LUTs, the integer
    ADC sum, the CAND cut, and the r4 cosine rerank."""
    from ..functions.vectors import NONZERO_EMB_SQL as NZ

    parts = [_ivf_cte_prefix(), ",", _pq_cte_block()]
    parts.append(f""",
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
    top-CAND per query. HASH-CHECKED (r16): see the module docstring.

    Scale shape — the classic ADC scan: quantizer/books/LUTs/probe
    sets are bounded driver metadata (trained on the deterministic
    sample, broadcast in the task closure), and ONE Arrow-batched
    map pass computes each vector's cell inline (packed argmin over
    the broadcast centroids — numpy's dim-by-dim accumulation IS the
    left fold, so the integers match the oracle exactly), its M
    codes, and the integer ADC score for exactly the queries probing
    that cell. Emission is probe-bounded; no shuffle touches vectors.
    The exact rerank joins back to embeddings for candidates only."""
    import numpy as np

    t = Tables(spark, sf_dir)
    from .vectors import lloyd_exact_py

    # r16: ONE sample collect feeds everything driver-side — the
    # quantizer, the PQ books, the queries (a prefix of the sample),
    # and the probe sets. The old path ran three extra sequential
    # jobs (cent.collect, an _ivf_probe embeddings scan, a qrows
    # embeddings scan) for metadata already in the sample (~1.4 s of
    # the 3.1 s warm query at sf0.1; guide §5 — bounded driver
    # metadata, scans only where the corpus is read).
    sample = _sample_rows(t)
    cents = lloyd_exact_py(sample, N_CELLS, IVF_ROUNDS)
    cent_rows = [(cl, np.array(c)) for cl, c in sorted(cents)]
    cent_cls = np.array([cl for cl, _ in cent_rows], dtype=np.int64)
    cent_mat = np.array([c for _, c in cent_rows])
    books = _pq_books_py(sample)

    # probe sets + integer LUTs: bounded driver metadata
    qrows_l = _qrows_py(sample, N_QUERIES)
    probe_of: dict[int, list[int]] = {}
    for qid, _qx, cell in _probe_py(qrows_l, cents):
        probe_of.setdefault(int(cell), []).append(int(qid))
    nz = t.embeddings.filter(sq_norm(to_double("embedding")) > 0)
    qrows = [(qid, np.array(qx)) for qid, qx in qrows_l]
    qpos = {qid: i for i, (qid, _) in enumerate(qrows)}
    # luts[qi][mi] = {cl: int lut}; fold order matches the oracle dot
    luts = _int_luts(qrows, books)

    book_arrs = [
        (
            np.array([cl for cl, _ in book], dtype=np.int64),
            np.array([c for _, c in book]),
        )
        for _mi, book in books
    ]

    def adc(batches):
        import pyarrow as pa

        for rb in batches:
            vids = rb.column(0).to_numpy(zero_copy_only=False)
            x = np.array(rb.column(1).to_pylist(), dtype=np.float64)
            cells = _packed_argmin(
                x, cent_cls, cent_mat, _IVF_DIST_SCALE, _IVF_PACK
            )
            codes = np.zeros((len(x), M), dtype=np.int64)
            for mi in range(M):
                cls_a, cents_a = book_arrs[mi]
                codes[:, mi] = _packed_argmin(
                    x[:, mi * DS: (mi + 1) * DS], cls_a, cents_a,
                    _IVF_DIST_SCALE, _IVF_PACK,
                )
            out_q, out_n, out_a = [], [], []
            for cell in np.unique(cells):
                qs = probe_of.get(int(cell), [])
                if not qs:
                    continue
                sel = cells == cell
                sub_codes = codes[sel]
                sub_vids = vids[sel]
                for qid in qs:
                    lut_mi = luts[qpos[qid]]
                    approx = np.zeros(len(sub_vids), dtype=np.int64)
                    for mi in range(M):
                        d = lut_mi[mi]
                        approx += np.array(
                            [d[int(c)] for c in sub_codes[:, mi]],
                            dtype=np.int64,
                        )
                    keep = sub_vids != qid
                    out_q += [qid] * int(keep.sum())
                    out_n += sub_vids[keep].tolist()
                    out_a += approx[keep].tolist()
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
