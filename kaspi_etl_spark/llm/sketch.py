"""Count-Min Sketch — deterministic mergeable heavy-hitter counting.

Unlike the HLL distinct sketch (ops/incremental.py, opaque Datasketches
binary), a CMS is just a d x w grid of counters: cell(i, j) = Σ count of
tokens t with hash_i(t) mod w == j. Every cell is an integer SUM, so the
sketch is (a) bit-exact reproducible across engines — the registered
query oracle-checks the full grid against DuckDB — (b) mergeable by
cellwise addition (union of corpora = sum of sketches), and (c) tiny
(d*w longs) regardless of corpus size.

Point estimate for a token = min over its d cells; always >= the true
count (collisions only add), within eps*N with high probability for
w >= e/eps. At 100 TB: the grid build is one map-side explode + one
groupBy of at most d*w groups — constant-size shuffle output.

Hashes reuse dedup.md5_long with per-row salts so the d rows are
independent and the DuckDB mirror is the existing md5 expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long

CMS_DEPTH = 3
CMS_WIDTH = 64


def _row_cells(tok: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("row_idx"),
                F.pmod(md5_long(tok, f"cms{i}"), F.lit(width))
                .cast("long")
                .alias("col_idx"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch grid from a token stream: one row per non-empty
    cell, (row_idx, col_idx, cell_count)."""
    cells = tokens.select(
        F.explode(_row_cells(F.col(token_col), depth, width)).alias("c")
    )
    return (
        cells.select("c.row_idx", "c.col_idx")
        .groupBy("row_idx", "col_idx")
        .agg(F.count("*").cast("long").alias("cell_count"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch of the concatenated corpora: cellwise sum."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cell_count").cast("long").alias("cell_count"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate counts for probe tokens: min over the token's d
    cells (missing cell -> 0). The sketch side is d*w rows at most —
    always broadcastable."""
    probe_cells = probes.select(
        token_col, F.explode(_row_cells(F.col(token_col), depth, width)).alias("c")
    ).select(token_col, "c.row_idx", "c.col_idx")
    return (
        probe_cells.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left")
        .groupBy(token_col)
        .agg(
            F.min(F.coalesce(F.col("cell_count"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )
