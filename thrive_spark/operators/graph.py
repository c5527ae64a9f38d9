"""Graph analytics over the co-purchase graph (brands linked when they
share an order): degree / strength / triangle counts — the relational
re-expression of a property-graph workload.

The graph never materializes as an object: vertices and edges are
DataFrames derived from the fact table, and every metric is joins +
aggregates, so the same code runs at any scale Catalyst can shuffle.

Scale shape: the edge list is built from a within-order pair explosion
AFTER projecting line items to their (order, brand) distinct — cost is
Σ|basket|², bounded by basket width, one shuffle on l_orderkey (the
pairs are generated in-row from each order's collected brand array —
see analytics._basket_pairs — not by a self-join). The
triangle join uses the canonical a<b<c vertex ordering, which is the
small-graph specialization of compact-forward / node-iterator triangle
counting (Schank & Wagner 2005): each triangle is enumerated exactly
once, and the join fan-out is bounded by per-vertex out-degree under
the ordering. At 100 TB-scale graphs the same plan holds with the
ordering switched from vertex id to DEGREE (degeneracy order), which
provably bounds out-degree by the graph's arboricity — a one-line
change to the edge-orientation key, noted here so the upgrade path is
explicit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from . import _util
from ._util import compact_iter_state


@query(
    "graph_copurchase_stats",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    e AS (
        SELECT a.p_brand AS src, b.p_brand AS dst, count(*) AS w
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    ),
    deg AS (
        SELECT v, count(*) AS degree, sum(w) AS strength FROM (
            SELECT src AS v, w FROM e
            UNION ALL
            SELECT dst AS v, w FROM e
        ) GROUP BY v
    ),
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM e e1
        JOIN e e2 ON e2.src = e1.dst
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    tpn AS (
        SELECT v, count(*) AS n_tri FROM (
            SELECT a AS v FROM tri
            UNION ALL SELECT b AS v FROM tri
            UNION ALL SELECT c AS v FROM tri
        ) GROUP BY v
    )
    SELECT deg.v AS brand, deg.degree, CAST(deg.strength AS BIGINT)
               AS strength,
           CAST(coalesce(tpn.n_tri, 0) AS BIGINT) AS n_tri
    FROM deg LEFT JOIN tpn ON deg.v = tpn.v
    """,
)
def graph_copurchase_stats(spark, sf_dir):
    """Per-vertex degree, strength (co-order weight sum), and triangle
    participation count on the brand co-purchase graph.

    Triangles are enumerated once each via the a<b<c orientation (every
    undirected triangle has exactly one cyclic labeling with ascending
    vertices), then credited to all three corners. All three metrics
    reuse the SAME edge list — one basket explosion, then broadcast-
    size joins (|brands|² upper-bounds the edge list)."""
    t = Tables(spark, sf_dir)
    ob = (
        t.lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(t.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
    )
    from .analytics import _basket_pairs

    # no distinct pass: _basket_pairs' collect_set dedups in-group
    e = _basket_pairs(ob).groupBy("src", "dst").agg(F.count("*").alias("w"))
    deg = (
        e.select(F.col("src").alias("v"), "w")
        .unionAll(e.select(F.col("dst").alias("v"), "w"))
        .groupBy("v")
        .agg(F.count("*").alias("degree"), F.sum("w").alias("strength"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    tpn = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("n_tri"))
    )
    return deg.join(tpn, "v", "left").select(
        F.col("v").alias("brand"),
        "degree",
        F.col("strength").cast("bigint").alias("strength"),
        F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
    )




PR_SCALE = 10**12  # fixed-point rank grid (rank <= 1 -> fits long easily)
PR_ROUNDS = 6
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as exact integers


def _pagerank_rounds_sql(edge_cte: str, out_select: str) -> str:
    """Unrolled integer-PageRank oracle: ``edge_cte`` must define
    e(src, dst) (distinct undirected pairs); appends sym/deg/nodes and
    PR_ROUNDS chained CTEs replicating the Spark loop's exact integer
    arithmetic (per-edge floor-div, damped floor-div re-center), then
    ``out_select`` formats from the final round r{PR_ROUNDS}."""
    rounds_sql = []
    for k in range(1, PR_ROUNDS + 1):
        rounds_sql.append(f"""
    r{k} AS (
        SELECT nodes.node,
               base.b + ({PR_DAMP_NUM} * coalesce(s.s, 0)) // {PR_DAMP_DEN}
                   AS rf
        FROM nodes
        LEFT JOIN (
            SELECT sym.dst AS node, sum(r.rf // deg.outdeg) AS s
            FROM sym
            JOIN r{k - 1} r ON sym.src = r.node
            JOIN deg ON deg.src = sym.src
            GROUP BY sym.dst
        ) s ON s.node = nodes.node, base
    )""")
    return f"""
    {edge_cte},
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src, count(*) AS outdeg FROM sym GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    nn AS (SELECT count(*) AS n FROM nodes),
    base AS (SELECT ({PR_SCALE} * ({PR_DAMP_DEN} - {PR_DAMP_NUM}))
                        // ({PR_DAMP_DEN} * n) AS b FROM nn),
    r0 AS (SELECT node, {PR_SCALE} // n AS rf FROM nodes, nn),
    {",".join(rounds_sql)}
    {out_select}
    """


_PR_BRAND_EDGES = """
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    e AS (
        SELECT DISTINCT a.p_brand AS src, b.p_brand AS dst
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    )"""

_PR_WORD_EDGES = """
    WITH tk AS (
        SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    bg AS (
        SELECT least(toks[i], toks[i + 1]) AS src,
               greatest(toks[i], toks[i + 1]) AS dst
        FROM tk, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1))
                          AS i) s
        WHERE toks[i] <> toks[i + 1]
    ),
    e AS (SELECT DISTINCT src, dst FROM bg)"""


@query(
    "graph_pagerank",
    oracle=_pagerank_rounds_sql(
        _PR_BRAND_EDGES,
        f"""SELECT node AS brand,
           ((rf + 500000) // 1000000) / 1e6 AS pagerank
    FROM r{PR_ROUNDS}""",
    ),
)
def graph_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 6 power iterations — converged to
    <1e-4 max delta on this graph; round count is the knob) on the brand
    co-purchase graph — the iterative-propagation complement of the
    one-shot degree/triangle metrics above, and the same
    join-aggregate-per-round shape as dedup_cluster_components.

    Each round: ranks join the out-degree-normalized edge list,
    contributions aggregate per destination, damping re-centers. The
    graph here is tiny (≤25 nodes), but every round is expressed as
    edge-table joins, so the identical code runs when edges are 10^11
    rows; localCheckpoint per round cuts the lineage exactly like the
    components loop. The loop runs in EXACT fixed-point integers
    (rank·10^12 longs; per-edge floor-div, damped floor-div
    re-center), so every round is merge-order-proof and the whole
    iteration hash-matches an unrolled-CTE DuckDB oracle — upgraded
    from rows-only in r7. Convergence quality (mass ≈ 1, ordering)
    stays pytest-gated."""
    ob = _co_order_brands(spark, sf_dir)
    from .analytics import _basket_pairs

    und = _basket_pairs(ob).groupBy("src", "dst").agg(F.count("*").alias("w"))
    ranks = pagerank(
        und.select("src", "dst"),
        rounds=PR_ROUNDS,
        cache_key=f"graph_pagerank_edges:{sf_dir}",
    )
    return ranks.select(
        F.col("node").alias("brand"),
        (F.expr("(rf + 500000) div 1000000") / 1e6).alias("pagerank"),
    )


def pagerank(und_edges, rounds: int = PR_ROUNDS, cache_key=None):
    """Damped power iteration over an UNDIRECTED edge list (src, dst)
    — shared by graph_pagerank and text_textrank_keywords.

    The heavy upstream derivation runs ONCE into a checkpointed edge
    list; each round is one join + per-destination aggregate + damping
    re-center, localCheckpoint cutting lineage.  The layout is picked
    by MEASURED edge count (``_util.compact_iter_state``): the
    small-graph regime runs the whole power iteration in ONE
    mapInPandas task (k rounds of Spark joins would pay ~2k+1
    sequential fixed stage costs — measured 2.6-3x of the wall at
    bench scale), natural wide partitioning with the per-round
    join+aggregate loop on data-bound graphs — a 10^11-edge graph
    must not serialize through one core (r5 verdict flag;
    tests/test_graph_scale.py exercises the wide path)."""
    sym = und_edges.unionAll(
        und_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # out-degree is loop-invariant: fold it into the edge list ONCE so
    # each round runs one join, not two (r6). groupBy + join, NOT a
    # count-over-window: the aggregate partial-combines map-side and
    # the join gets AQE skew splitting, so a celebrity vertex's 10^8
    # edges never serialize through one window task.
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges, n_edges = compact_iter_state(
        sym.join(deg, "src"), cache_key=cache_key
    )
    if n_edges <= _util.SMALL_ITER_STATE_MAX_ROWS:
        # Small-graph regime: compact_iter_state has the whole edge list
        # in ONE materialized partition, so the k-round join loop would
        # pay ~2k+1 sequential fixed stage costs for work a single task
        # finishes in milliseconds (the dedup_cluster_components r10
        # precedent). One mapInPandas task replays the SAME integer
        # fixed-point recipe (numpy // and scatter-add are the per-edge
        # div / per-destination sum), so ranks are bit-identical to the
        # wide loop and the unrolled-CTE DuckDB oracle.
        src_type = edges.schema["src"].dataType.simpleString()
        scale, rounds_n = PR_SCALE, rounds
        damp_num, damp_den = PR_DAMP_NUM, PR_DAMP_DEN

        def _power(batches):
            import numpy as np
            import pandas as pd

            frames = [b for b in batches]
            if not frames:
                return
            df = pd.concat(frames, ignore_index=True)
            if not len(df):
                return
            src = df["src"].to_numpy()
            dst = df["dst"].to_numpy()
            outdeg = df["outdeg"].to_numpy().astype(np.int64)
            node_ids, si = np.unique(src, return_inverse=True)
            di = np.searchsorted(node_ids, dst)
            n = len(node_ids)
            base_i = (scale * (damp_den - damp_num)) // (damp_den * n)
            rf = np.full(n, scale // n, dtype=np.int64)
            for _ in range(rounds_n):
                c = rf[si] // outdeg
                s = np.zeros(n, dtype=np.int64)
                np.add.at(s, di, c)
                rf = (damp_num * s) // damp_den + base_i
            yield pd.DataFrame({"node": node_ids, "rf": rf})

        return edges.mapInPandas(_power, f"node {src_type}, rf long")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # scalar: |vertices|, bounded
    # EXACT fixed-point iteration (r7): ranks live as rank*PR_SCALE
    # longs; every step is integer floor arithmetic (per-edge div,
    # damped div re-center), so the loop is merge-order-proof and the
    # whole refinement hash-matches an unrolled-CTE DuckDB oracle —
    # floats would drift by partial-sum order and stay rows-only.
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (
        PR_DAMP_DEN * n_nodes
    )
    ranks = nodes.withColumn("rf", F.lit(PR_SCALE // n_nodes).cast("long"))
    for _ in range(rounds):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", F.expr("rf div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, CAST(0 AS BIGINT)))"
                        f" div {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("rf"),
            )
            .localCheckpoint()
        )
    return ranks


def _co_order_brands(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(t.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
    )


@query(
    "text_textrank_keywords",
    oracle=_pagerank_rounds_sql(
        _PR_WORD_EDGES,
        f"""SELECT node AS word,
           ((rf + 500000) // 1000000) / 1e6 AS textrank
    FROM r{PR_ROUNDS}
    ORDER BY rf DESC, node LIMIT 25""",
    ),
)
def text_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph (adjacent-token edges across the
    corpus), top 25 words by rank — the unsupervised keyword pass a
    corpus card runs, and a second client of the shared
    :func:`pagerank` loop (the graph machinery generalizes past the
    sales schema).

    The co-occurrence edge list comes from the SAME in-row bigram
    construction as text_pmi_bigrams (zip_with over slices — no
    quadratic lambda), deduped to distinct undirected pairs; rank
    quality is gated in tests (stopword-like high-degree words must
    rank above rare words)."""
    from ..tables import Tables as _T

    t = _T(spark, sf_dir)
    tk = F.filter(F.split("text", " "), lambda x: x != "")
    base = t.documents.select(tk.alias("tk"))
    n2 = F.greatest(F.size("tk") - 1, F.lit(0))
    bigrams = base.select(
        F.explode(
            F.zip_with(
                F.slice("tk", 1, n2),
                F.slice("tk", 2, n2),
                lambda a, b: F.struct(
                    F.least(a, b).alias("src"), F.greatest(a, b).alias("dst")
                ),
            )
        ).alias("p")
    ).select("p.src", "p.dst")
    und = bigrams.filter(F.col("src") != F.col("dst")).distinct()
    ranks = pagerank(
        und, rounds=PR_ROUNDS, cache_key=f"text_rank_edges:{sf_dir}"
    )
    return (
        ranks.orderBy(F.col("rf").desc(), "node")
        .limit(25)
        .select(
            F.col("node").alias("word"),
            (F.expr("(rf + 500000) div 1000000") / 1e6).alias("textrank"),
        )
    )


_EDGE_CTE = """
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    e AS (
        SELECT DISTINCT a.p_brand AS src, b.p_brand AS dst
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    ),
    sym AS (
        SELECT src AS v, dst AS u FROM e
        UNION ALL
        SELECT dst AS v, src AS u FROM e
    )
"""


@query(
    "graph_degree_histogram",
    oracle="""
    WITH tk AS (
        SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    bg AS (
        SELECT least(toks[i], toks[i + 1]) AS src,
               greatest(toks[i], toks[i + 1]) AS dst
        FROM tk, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1))
                          AS i) s
        WHERE toks[i] <> toks[i + 1]
    ),
    e AS (SELECT DISTINCT src, dst FROM bg),
    sym AS (
        SELECT src AS v FROM e UNION ALL SELECT dst FROM e
    ),
    deg AS (SELECT v, count(*) AS degree FROM sym GROUP BY v)
    SELECT degree, count(*) AS n_vertices
    FROM deg GROUP BY degree
    """,
)
def graph_degree_histogram(spark, sf_dir):
    """Degree distribution of the word co-occurrence graph (the
    textrank edge list): how many vertices have each degree — the
    first diagnostic run on any graph before choosing join strategies.
    A power-law tail here is the signal that triggers the degeneracy-
    ordering upgrade noted in the module docstring, and (unlike the
    tiny complete brand graph) word co-occurrence actually HAS one.

    Two aggregates over the symmetric edge list — both partial-combine
    map-side, so the shuffle carries (vertex, partial-count) then
    (degree, partial-count) rows only; no vertex set or adjacency list
    ever materializes on one node."""
    t = Tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = t.documents.select(toks.alias("tk"))
    n2 = F.greatest(F.size("tk") - 1, F.lit(0))
    e = (
        base.select(
            F.explode(
                F.zip_with(
                    F.slice("tk", 1, n2),
                    F.slice("tk", 2, n2),
                    lambda a, b: F.struct(
                        F.least(a, b).alias("src"),
                        F.greatest(a, b).alias("dst"),
                    ),
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = e.select("src").unionAll(e.select(F.col("dst").alias("src")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_vertices"))


@query(
    "graph_jaccard_neighbors",
    oracle=_EDGE_CTE
    + """
    , deg AS (SELECT v, count(*) AS degree FROM sym GROUP BY v),
    inter AS (
        SELECT e.src, e.dst, count(*) AS n_common
        FROM e
        JOIN sym sa ON sa.v = e.src
        JOIN sym sb ON sb.v = e.dst AND sb.u = sa.u
        GROUP BY e.src, e.dst
    )
    SELECT e.src, e.dst,
           CAST(coalesce(i.n_common, 0) AS BIGINT) AS n_common,
           CAST(da.degree + db.degree - coalesce(i.n_common, 0) - 2
                AS BIGINT) AS n_union,
           CASE WHEN da.degree + db.degree - coalesce(i.n_common, 0) - 2 > 0
                THEN floor(CAST(coalesce(i.n_common, 0) AS DOUBLE)
                     / (da.degree + db.degree - coalesce(i.n_common, 0) - 2)
                     * 10000 + 0.5) / 10000.0
           END AS jaccard
    FROM e
    LEFT JOIN inter i ON i.src = e.src AND i.dst = e.dst
    JOIN deg da ON da.v = e.src
    JOIN deg db ON db.v = e.dst
    """,
)
def graph_jaccard_neighbors(spark, sf_dir):
    """Neighbor-set Jaccard similarity for every edge of the brand
    co-purchase graph — the classic link-prediction / community-edge
    strength primitive (an edge whose endpoints share most neighbors is
    intra-community; a low-Jaccard edge is a bridge).

    |N(a)∩N(b)| comes from the wedge join (edges ⋈ adjacency ⋈
    adjacency on the shared neighbor), the same Σ deg² bounded shape as
    the triangle pass above — never |V|² pairs, only existing edges are
    scored. |N(a)∪N(b)| = deg(a)+deg(b)−common−2 (each endpoint sits in
    the other's neighbor set but not its own, so subtracting the two
    mutual memberships leaves the union of *other* neighbors — the
    convention that makes a pendant edge score 0, not 1/1).

    Both engines compute the final ratio as one double division of
    exact integers (IEEE-exact, identical), then fixed-point floor —
    hash-stable without fixed-point accumulation."""
    ob = _co_order_brands(spark, sf_dir)
    from .analytics import _basket_pairs

    # the distinct edge list is |brands|²-bounded and tiny, but its
    # pair-mining lineage (lineitem scan + explode) is corpus-sized
    # and feeds FOUR consumers (sym twice, inter, the final join) —
    # lazy checkpoint = one mining pass (r16)
    e = _basket_pairs(ob).distinct().localCheckpoint(eager=False)
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).select(F.col("src").alias("v"), F.col("dst").alias("u"))
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("degree"))
    sa, sb = sym.alias("sa"), sym.alias("sb")
    inter = (
        e.join(sa, F.col("sa.v") == F.col("src"))
        .join(
            sb,
            (F.col("sb.v") == F.col("dst")) & (F.col("sb.u") == F.col("sa.u")),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("v").alias("src"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("v").alias("dst"), F.col("degree").alias("deg_b"))
    common = F.coalesce("n_common", F.lit(0))
    n_union = F.col("deg_a") + F.col("deg_b") - common - F.lit(2)
    return (
        e.join(inter, ["src", "dst"], "left")
        .join(da, "src")
        .join(db, "dst")
        .select(
            "src",
            "dst",
            common.cast("bigint").alias("n_common"),
            n_union.cast("bigint").alias("n_union"),
            # n_union == 0 (isolated two-node component): Spark's 0/0
            # double is NaN while DuckDB's is NULL — emit NULL in both
            # engines (ADVICE r7; guard mirrored in the oracle SQL).
            F.when(
                n_union > 0,
                F.floor(common.cast("double") / n_union * 10000 + 0.5)
                / 10000.0,
            ).alias("jaccard"),
        )
    )
