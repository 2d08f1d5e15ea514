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
