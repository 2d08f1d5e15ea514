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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_name_matches(
    df: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 2,
    max_block: int | None = None,
) -> DataFrame:
    """Near-duplicate name pairs (id_a < id_b) with Levenshtein <= max_dist,
    candidates from first-token and last-token blocking.

    ``max_block`` (optional) drops blocks larger than the cap — the
    posting-list guard for stopword-heavy corpora; None keeps all blocks
    (exact two-pass-blocking semantics, mirrored by the oracle).
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
        counts = blocks.groupBy("pass_id", "key").agg(
            F.count("*").alias("_bn")
        )
        blocks = blocks.join(
            F.broadcast(counts.filter(F.col("_bn") <= max_block)),
            ["pass_id", "key"],
        ).drop("_bn")

    a = blocks.select(
        "pass_id", "key", F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    b = blocks.select(
        "pass_id", "key", F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    cand = (
        a.join(b, ["pass_id", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b").cast("long")
    ).filter(F.col("dist") <= max_dist)
