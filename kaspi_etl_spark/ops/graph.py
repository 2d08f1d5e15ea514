"""Iterative graph algorithms over edge lists — fixed-point PageRank.

Complements the connected-components pair in llm/dedup.py (min-label
propagation + Kiveris large/small-star) with a ranked-importance
algorithm. All arithmetic is INTEGER fixed-point: scores live on a 1e12
scale and every division floors, so each iteration is bit-exact across
engines and partitionings (a float PageRank sums contributions in
nondeterministic order — a parity killer; see registry.py header).

Scale shape: each iteration is one equi-join of the edge list with the
current score vector on ``src`` plus one groupBy(``dst``) — the classic
Pregel round as two shuffles, both keyed on node ids. The node-count
scalar is carried as a broadcast 1-row frame (no driver collect). With a
fixed iteration count the whole run is ONE lazy plan; for high iteration
counts, localCheckpoint per round (as connected_components does) to cap
plan depth.

Dangling nodes (no out-edges) drop their mass instead of redistributing
it — the simplified PageRank variant; the oracle mirrors this exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12  # score fixed-point scale; 85 * SCALE < 2^63 stays exact
PR_DAMP_NUM = 85  # damping 0.85 as a rational 85/100
PR_DAMP_DEN = 100


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank on a distinct directed edge list, ``iterations`` rounds
    of integer fixed-point updates:

        score_0(v)   = SCALE // N
        contrib(u→v) = (85 * score(u)) // (100 * outdeg(u))
        score_k(v)   = (15 * SCALE) // (100 * N) + Σ contrib(u→v)

    Returns (node, score) with score on the 1e12 fixed-point scale.
    """
    # One scan+distinct for the whole run: every iteration (and the
    # nodes/outdeg frames) re-reads the checkpointed edge RDD instead of
    # re-shuffling the source. Lazy so query construction stays free.
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    n_df = nodes.agg(F.count("*").cast("long").alias("n"))  # 1 row, broadcast
    base = F.expr(f"{PR_DAMP_DEN - PR_DAMP_NUM} * {PR_SCALE}L div ({PR_DAMP_DEN} * n)")
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"{PR_SCALE}L div n").alias("score")
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(
                F.expr(
                    f"sum(({PR_DAMP_NUM} * score) div ({PR_DAMP_DEN} * deg))"
                )
                .cast("long")
                .alias("c")
            )
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_df))
            .join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (base + F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("score"),
            )
        )
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count over an undirected graph, returned as ONE row
    (n_nodes, n_edges, n_triangles).

    Algorithm: canonicalize edges (low id, high id) + distinct, then
    orient every edge from its lower-DEGREE endpoint to the higher
    (ties by id). On the oriented graph each triangle is exactly one
    wedge u->v, v->w closed by u->w, found with two equi-joins. Degree
    orientation bounds each node's out-degree by O(sqrt(E)) — the
    classic skew guard: a celebrity node with 10^6 neighbors generates
    wedges only from its (rare) higher-degree peers, not 10^12 pairs.
    The count is orientation-invariant, so the oracle may orient by id.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    # oriented feeds three join legs and Spark does not reuse the exchange
    # across them (measured: the canonicalize+degree pipeline ran 3x);
    # checkpoint it once — same pattern as the CC iteration edges.
    oriented = oriented.localCheckpoint(eager=False)
    # Count via adjacency intersection, not a wedge join: a dense graph
    # (co-purchase at sf0.1: ~800k oriented edges over 20k nodes) has tens
    # of millions of wedges, and the classic e1 JOIN e2 ON v materializes
    # every one of them through a shuffle before e3 filters. Equivalent
    # formula: n_triangles = sum over oriented edges (u,v) of
    # |N+(u) ∩ N+(v)| — two equi-joins carrying bounded neighbor arrays
    # (degree orientation caps |N+| at O(sqrt(E))) and the intersection
    # runs in-expression, nothing wedge-sized ever hits a shuffle.
    # Measured 10.4s -> 6.2s at sf0.1 (1.2M oriented edges, 1.9M
    # triangles); the wedge-join form remains the oracle's spec.
    adj = oriented.groupBy("u").agg(F.collect_list("v").alias("nb"))
    tri = (
        oriented.join(
            adj.select(F.col("u").alias("_ju"), F.col("nb").alias("nb_u")),
            F.col("u") == F.col("_ju"),
        )
        .join(
            adj.select(F.col("u").alias("_jv"), F.col("nb").alias("nb_v")),
            F.col("v") == F.col("_jv"),
        )
        .select(F.size(F.array_intersect("nb_u", "nb_v")).alias("t"))
        .agg(F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_triangles"))
    )
    n_nodes = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    n_edges = e.agg(F.count("*").cast("long").alias("n_edges"))
    return n_nodes.crossJoin(n_edges).crossJoin(tri)


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation for community detection — the
    modularity-style grouping connected components cannot see (CC fuses
    everything reachable; LP keeps densely linked neighborhoods apart
    when a single weak edge bridges them).

    Every node starts labeled by its own id; each round it adopts the
    most frequent label among its neighbors (ties -> smallest label,
    isolated rounds keep the current label). Synchronous, fixed-round,
    integer-only: the whole trajectory is deterministic and a SQL
    oracle unrolls the same rounds as MATERIALIZED CTEs. Per round:
    one join (labels onto the doubled edge list) + one (node, label)
    count groupBy + one rank-1 WindowGroupLimit — linear in edges, the
    standard large-graph shape.

    Returns (node, label) after ``rounds`` rounds.
    """
    from pyspark.sql import Window

    und = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).distinct()
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(rounds):
        nb = (
            und.join(labels, und["b"] == labels["node"])
            .select(F.col("a"), F.col("label"))
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("a").orderBy(F.col("c").desc(), F.col("label").asc())
        labels = (
            nb.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(F.col("a").alias("node"), "label")
        )
        labels = labels.localCheckpoint()  # truncate the growing lineage
    return labels


def kcore_peel(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core decomposition by synchronous peeling: each round removes
    every node whose degree WITHIN the surviving subgraph is below k —
    the density skeleton (a node in the k-core has k neighbors that
    each have k neighbors, recursively), which separates structurally
    embedded items from ones merely touched by a hub. Fixed-round
    semantics: the result is "after ``rounds`` synchronous peels",
    identical in any engine whether or not the peel has converged (the
    oracle unrolls the same rounds; peeling is monotone, so extra
    rounds past convergence are no-ops).

    Per round: one degree groupBy over the doubled edge list semi-joined
    to the survivor set — linear in edges, the LP shape. Survivor
    frames localCheckpoint per round: each round's frame feeds both the
    next round's two semi-joins, and lineage would otherwise compound
    (the unigram-DP lesson).

    Returns (node, deg) for nodes surviving ``rounds`` peels, with
    their within-subgraph degree after the LAST peel.
    """
    und = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).distinct().localCheckpoint(eager=False)
    alive = und.select(F.col("a").alias("node")).distinct()
    for _ in range(rounds):
        live_edges = und.join(
            alive.select(F.col("node").alias("a")), "a", "left_semi"
        ).join(alive.select(F.col("node").alias("b")), "b", "left_semi")
        deg = live_edges.groupBy("a").agg(F.count(F.lit(1)).alias("_deg"))
        alive = (
            deg.filter(F.col("_deg") >= k)
            .select(F.col("a").alias("node"))
            .localCheckpoint(eager=False)
        )
    final_edges = und.join(
        alive.select(F.col("node").alias("a")), "a", "left_semi"
    ).join(alive.select(F.col("node").alias("b")), "b", "left_semi")
    # node keeps the input id type — casting belongs to the caller
    # (a long cast here would NULL string node ids; label_propagation
    # leaves typing to the registry layer the same way)
    return (
        final_edges.groupBy("a")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("a").alias("node"), "deg")
    )


def ktruss_peel(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-truss decomposition by synchronous support peeling: each round
    removes every edge contained in fewer than ``k - 2`` triangles
    WITHIN the surviving edge set (Cohen 2008, "Trusses: cohesive
    subgraphs for social network analysis").  A stricter density
    skeleton than the k-core: membership requires triangle SUPPORT, not
    just degree, so a hub spoke (degree-heavy, triangle-poor) that
    survives k-core peeling is peeled here.  Fixed-round semantics like
    kcore_peel: the result is "after ``rounds`` synchronous peels"
    (peeling is monotone, extra rounds past convergence are no-ops).

    Per round: double the canonical (a < b) edge list, one wedge join
    (edge x neighbor-of-a), one closing equi-join on (b, z), one count
    groupBy — linear in wedges, with the upstream hub cap
    (ops/basket.basket_pairs) bounding per-node degree so the wedge
    count cannot go quadratic on a hub.  Edge frames localCheckpoint
    per round (the compounding-lineage discipline).  Requires
    ``k >= 3`` (k - 2 >= 1), so the per-round inner count join is
    lossless: a zero-support edge fails the threshold anyway.

    Returns every edge surviving ``rounds`` peels as (a, b, support)
    with its support RE-COMPUTED within the surviving set (LEFT join —
    a survivor whose last triangles were peeled in the final round
    reports support 0, it is not silently dropped).
    """
    if k < 3:
        raise ValueError(f"ktruss_peel needs k >= 3, got {k}")
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def support(cur: DataFrame) -> DataFrame:
        und = cur.select("a", "b").unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        n_a = und.select(F.col("a"), F.col("b").alias("z"))
        wedges = cur.join(n_a, "a")
        n_b = und.select(F.col("a").alias("b"), F.col("b").alias("z"))
        tri = wedges.join(n_b, ["b", "z"])
        return tri.groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("long").alias("_sup")
        )

    for _ in range(rounds):
        e = (
            support(e)
            .filter(F.col("_sup") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    final = e.join(
        support(e).withColumnRenamed("_sup", "_s2"), ["a", "b"], "left"
    )
    return final.select(
        "a",
        "b",
        F.coalesce(F.col("_s2"), F.lit(0)).cast("long").alias("support"),
    )
