"""Entity resolution — blocked fuzzy name matching.

Candidate generation NEVER does an all-pairs comparison: names are
blocked by first token and (second pass) last token, candidates are the
within-block pairs, and only candidates pay the Levenshtein verify.
Two-pass token blocking is the standard recall/cost trade-off for edit
distance <= 2 over short names (a typo can break one token's block but
rarely both). The oracle mirrors the SAME blocking so the semantics are
pinned, not approximated.

Scale shape (100 TB): block keys are single tokens — the self-join is an
equi-join on (pass, token) with block sizes bounded by token frequency.
Heavy tokens (stopword-like brand words) should be capped or salted the
same way ngram_jaccard caps posting lists; the cap parameter is exposed
here for that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..llm.dedup import md5_long


def blocked_name_matches(
    df: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 2,
    max_block: int | None = None,
) -> DataFrame:
    """Near-duplicate name pairs (id_a < id_b) with Levenshtein <= max_dist,
    candidates from first-token and last-token blocking.

    ``max_block`` (optional) TRUNCATES every block to its ``max_block``
    lowest-(salted-hash, id) members before pair generation. Truncation,
    not block dropping: over a low-vocabulary population (TPC-H part
    names: 16 block keys, every block the same size) a drop-the-block
    cap is all-or-nothing, while the deterministic hash-rank sample
    bounds output at n_blocks * C(cap, 2) and keeps recall proportional
    in every block. None keeps all blocks (exact two-pass-blocking
    semantics — the uncapped output itself grows near-quadratically:
    measured 5.5M pairs from 200k names at sf0.1, so any at-scale run
    should set the cap; ``part_name_matches_capped`` is the gated and
    benched form, the uncapped one a local parity check).

    Scale shape of the cap: row_number + filter <= cap compiles to
    WindowGroupLimit — a PARTIAL per-input-partition limit runs before
    the exchange (same plan family as the pinned top-k in
    ``top3_cheapest``), so a stopword block never funnels its full
    contents through one task's sort.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.lower(F.col(name_col)).alias("name"),
    ).withColumn("ws", F.split(F.col("name"), r"\s+"))
    blocks = toks.select(
        F.lit("f").alias("pass_id"), F.col("ws")[0].alias("key"), "id", "name"
    ).unionByName(
        toks.select(
            F.lit("l").alias("pass_id"),
            F.element_at("ws", -1).alias("key"),
            "id",
            "name",
        )
    )
    if max_block is not None:
        wb = Window.partitionBy("pass_id", "key").orderBy(
            md5_long(F.col("id").cast("string"), "erb").asc(), F.col("id").asc()
        )
        blocks = (
            blocks.withColumn("_rk", F.row_number().over(wb))
            .filter(F.col("_rk") <= max_block)
            .drop("_rk")
        )

    a = blocks.select(
        "pass_id", "key", F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    b = blocks.select(
        "pass_id", "key", F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    # Two semantics-free cuts before the expensive verify:
    #  - |len(a) - len(b)| <= max_dist is implied by the edit distance, and
    #    evaluating it IN the join condition prunes most of a block's pairs
    #    before they materialize (TPC-H-style low-vocabulary names produce
    #    huge blocks where almost every pair fails this).
    #  - dedupe the two passes on the id pair, so the hash agg carries
    #    16 bytes per pair, not four strings, and Levenshtein runs once
    #    per distinct pair. The max is over ONE struct, not per-column
    #    maxes, so both names always come from the same source row even
    #    if an upstream ever carried name variants per id (ADVICE r4).
    cand = (
        a.join(b, ["pass_id", "key"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= max_dist)
        )
        .groupBy("id_a", "id_b")
        .agg(F.max(F.struct("name_a", "name_b")).alias("_nm"))
        .select(
            "id_a",
            "id_b",
            F.col("_nm.name_a").alias("name_a"),
            F.col("_nm.name_b").alias("name_b"),
        )
    )
    # thresholded Levenshtein early-abandons rows past max_dist (-1)
    return cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b", max_dist).cast("long")
    ).filter(F.col("dist") >= 0)
