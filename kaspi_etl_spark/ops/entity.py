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
from ..llm.lm import flog2_int


def _name_blocks(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_block: int | None,
    keep_name: bool = True,
    materialize: bool = True,
) -> DataFrame:
    """(pass_id, key, id[, name]) two-pass token blocks, optionally
    hash-rank-truncated to ``max_block`` members per block (see
    blocked_name_matches for why truncation beats block dropping).
    ``keep_name=False`` drops the name payload from the materialized
    blocks for callers that only pair ids (guide §2.3 — project before
    the exchange/materialization)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.lower(F.col(name_col)).alias("name"),
    ).withColumn("ws", F.split(F.col("name"), r"\s+"))
    payload = ["id", "name"] if keep_name else ["id"]
    blocks = toks.select(
        F.lit("f").alias("pass_id"), F.col("ws")[0].alias("key"), *payload
    ).unionByName(
        toks.select(
            F.lit("l").alias("pass_id"),
            F.element_at("ws", -1).alias("key"),
            *payload,
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
    # r11 (guide §1.2 / §2.4): every caller self-joins this table (a and
    # b sides), so the static plan ran the tokenize + union + truncation
    # window TWICE. Materialize once — the table is the blocked id/name
    # projection (2 rows per input row, capped per block when max_block
    # is set), the small side of everything downstream.
    # ``materialize=False`` returns the lazy plan (the plan-shape tests
    # assert the WindowGroupLimit truncation the checkpoint hides).
    return blocks.localCheckpoint() if materialize else blocks


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
    blocks = _name_blocks(df, id_col, name_col, max_block)

    a = blocks.select(
        "pass_id", "key", F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    # r11 (guide §3.1, the basket-pair precedent): the within-block pair
    # join joins the SAME materialized table to itself — sort-merge pays
    # two sorts of identical data a hash probe doesn't need. Build side
    # is one hash partition of capped blocks, bounded by AQE sizing.
    # r12 (ADVICE): ONLY when the blocks are capped — with max_block=None
    # a hot-token block lands whole on one hash partition whose build side
    # cannot spill (OOM hazard sort-merge avoids), so the uncapped parity
    # form keeps sort-merge.
    b = blocks.select(
        "pass_id", "key", F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    if max_block is not None:
        b = b.hint("shuffle_hash")
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


# --- Fellegi–Sunter probabilistic record linkage -----------------------------

# Fixed m-probability (P(field agrees | pair is a true match)) as a
# literal rational: 9/10. u-probabilities are ESTIMATED FROM THE DATA as
# exact rationals (see _fs_u_stats), so match weights need no floats.
FS_M_NUM, FS_M_DEN = 9, 10


def _fs_u_stats(df: DataFrame, fields: list[str]) -> dict[str, tuple[int, int]]:
    """u-probabilities for every field in ONE distributed pass:
    P(field agrees | random pair) as the exact rational
    sum_v c_v*(c_v-1) / (n*(n-1)) over non-null values. Rows explode to
    constant-size (field, value) pairs (string image of the value —
    1:1 for the string/int fields this is meant for), two hash aggs,
    then a bounded driver read of len(fields) rows (same class as the
    k-means centroid reads). Both terms clamp to >= 1 so the log
    weights stay defined on degenerate columns (all-distinct,
    all-null, or constant)."""
    fv = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f).alias("f"),
                            F.col(f).cast("string").alias("v"),
                        )
                        for f in fields
                    ]
                )
            ).alias("e")
        )
        .select("e.f", "e.v")
        .filter(F.col("v").isNotNull())
    )
    per = fv.groupBy("f", "v").agg(F.count("*").cast("long").alias("c"))
    rows = (
        per.groupBy("f")
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("u_num"),
            F.sum("c").cast("long").alias("n"),
        )
        .collect()
    )
    out = {f: (1, 1) for f in fields}  # all-null field: degenerate clamp
    for r in rows:
        n = int(r["n"])
        out[r["f"]] = (max(1, int(r["u_num"])), max(1, n * (n - 1)))
    return out


def fs_linkage_scores(
    df: DataFrame,
    id_col: str,
    name_col: str,
    fields: list[str],
    max_block: int | None = 50,
    m: tuple[int, int] = (FS_M_NUM, FS_M_DEN),
) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring (Fellegi &
    Sunter 1969): candidate pairs from the same two-pass token blocking
    as blocked_name_matches, scored by summing per-field log-likelihood
    weights — log2(m/u) when the field agrees, log2((1-m)/(1-u)) when it
    disagrees (NULLs count as disagreement, matching SQL equality).

    Exactness: m is a literal rational, u comes from the data as exact
    BIGINT ratios, and every log2 is the shared fixed-point flog2 kernel
    (llm/lm.py — scaled 2^20, LUT shared with the oracle), so ``score_c``
    is an exact integer both engines reproduce bit-for-bit.

    Scale shape (100 TB): u-stats are ONE distributed pass reduced to
    len(fields) scalar rows read on the driver (bounded, like the
    centroid reads), so the per-pair scoring carries the six weights as
    plain literals — no broadcast chain, no 1024-entry LUT literals in
    the pair plan (first form measured 7.7s wall / 0.27s CPU at sf0.1:
    all scheduling and Janino, zero data). Candidates are the capped
    equi-join blocking (bounded at n_blocks * C(cap, 2)); attribute
    lookup is two equi-joins on the id.
    """
    m_num, m_den = m
    blocks = _name_blocks(df, id_col, name_col, max_block, keep_name=False)
    a = blocks.select("pass_id", "key", F.col("id").alias("id_a"))
    # shuffle_hash: same self-join rationale as blocked_name_matches —
    # and the same capped-only guard (uncapped blocks must spill via SMJ).
    b = blocks.select("pass_id", "key", F.col("id").alias("id_b"))
    if max_block is not None:
        b = b.hint("shuffle_hash")
    cand = (
        a.join(b, ["pass_id", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    attrs = df.select(F.col(id_col).alias("id"), *fields)
    pa = attrs.select(
        F.col("id").alias("id_a"), *[F.col(f).alias(f"{f}_a") for f in fields]
    )
    pb = attrs.select(
        F.col("id").alias("id_b"), *[F.col(f).alias(f"{f}_b") for f in fields]
    )
    pairs = cand.join(pa, "id_a").join(pb, "id_b")

    u = _fs_u_stats(df, fields)
    wa, wd = {}, {}
    for f in fields:
        u_num, u_den = u[f]
        wa[f] = flog2_int(m_num * u_den) - flog2_int(m_den * u_num)
        wd[f] = flog2_int((m_den - m_num) * u_den) - flog2_int(
            m_den * max(1, u_den - u_num)
        )

    agree = {
        f: F.col(f"{f}_a").eqNullSafe(F.col(f"{f}_b")) & F.col(f"{f}_a").isNotNull()
        for f in fields
    }
    score = None
    for f in fields:
        term = F.when(agree[f], F.lit(wa[f])).otherwise(F.lit(wd[f]))
        score = term if score is None else score + term
    return pairs.select(
        "id_a",
        "id_b",
        *[
            F.when(agree[f], F.lit(1)).otherwise(F.lit(0)).cast("long").alias(f"agree_{f}")
            for f in fields
        ],
        score.cast("long").alias("score_c"),
    )
