"""DSIR-style importance weights for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The modern pretraining data-selection op: score every raw document by
how much more likely its hashed n-gram features are under a TARGET
distribution (a trusted high-quality slice) than under the RAW corpus
distribution — log p_target(doc) - log p_raw(doc) under unigram-bucket
product models. Docs are then selected by weight (the paper resamples
with Gumbel noise; the deterministic top-by-weight ranking is the
oracle-checkable form and what this module produces — callers wanting
the stochastic variant can add hash-derived noise downstream).

Why it oracle-checks bit-exactly: both distributions are add-one-
smoothed RATIONALS over hashed bigram buckets — p_t(j) = (c_t(j) + 1)
/ (T + D) — and every log2 is the shared fixed-point flog2 kernel
(llm/lm.py), so a doc's weight is the exact BIGINT

    sum_j c_doc(j) * (flog2(c_t(j)+1) - flog2(c_r(j)+1))
    + n_doc * (flog2(R+D) - flog2(T+D))

with no float anywhere (weights can be negative — plain integer
subtraction).

Scale shape (100 TB): feature extraction is map-side (split + 2-gram
+ hash); per-doc bucket counts are one (doc, j) groupBy; the two
distributions reduce to <= D rows each (D = 1024), broadcast back onto
the feature stream; scoring is one more groupBy doc. The target slice
rides as a flag on the same pass — the corpus is read ONCE. No
collects, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long, split_words
from .lm import sql_flog2, with_flog2

DSIR_D = 1024  # hash buckets per distribution
DSIR_SALT = "dsir"


def doc_bucket_counts(
    docs: DataFrame,
    target_expr: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = DSIR_D,
) -> DataFrame:
    """(id, is_t, j, c): per-doc hashed-bigram bucket counts with the
    doc's target-slice membership riding along — one corpus read feeds
    both distributions and the scoring pass.

    Bigrams are NON-distinct word 2-grams (counts matter for the product
    model; contrast shingles_from_words' distinct sets). Short docs
    degrade to the single-word 'bigram' (concat_ws skips the null tail
    element). r11: the bigram string is built AFTER exploding the
    position sequence — as a top-level whole-stage-codegen expression —
    not inside an interpreted transform() lambda (same per-task-work
    rewrite as the duplicate_spans span build; value-identical: the
    exploded sequence value IS the old lambda's index)."""
    cnt = F.size("_w")
    idx = F.sequence(F.lit(0), F.greatest(cnt - 2, F.lit(0)))
    toks = (
        docs.select(
            F.col(id_col),
            # NULL-safe: a NULL predicate (e.g. isin over a NULL source
            # column) means NOT in the target slice — SQL CASE WHEN
            # semantics, which the oracle mirrors. Found by the r7
            # adversarial sweep (22 NULL-source docs scored is_target
            # NULL vs the oracle's 0).
            F.coalesce(target_expr.cast("long"), F.lit(0)).alias("is_t"),
            split_words(F.col(text_col)).alias("_w"),
        )
        .select(id_col, "is_t", "_w", F.explode_outer(idx).alias("_i"))
        .filter(F.col("_i").isNotNull())
        .select(
            id_col,
            "is_t",
            F.concat_ws(
                " ",
                F.try_element_at(F.col("_w"), F.col("_i") + 1),
                F.try_element_at(F.col("_w"), F.col("_i") + 2),
            ).alias("_bg"),
        )
        .filter(F.col("_bg") != "")
    )
    return (
        toks.select(
            id_col,
            "is_t",
            (md5_long(F.col("_bg"), DSIR_SALT) % d).cast("long").alias("j"),
        )
        .groupBy(id_col, "is_t", "j")
        .agg(F.count("*").cast("long").alias("c"))
    )


def dsir_weights(
    docs: DataFrame,
    target_expr: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = DSIR_D,
) -> DataFrame:
    """(id, is_target, n_feats, dsir_scaled): exact fixed-point DSIR
    importance weight per document (module header formula; 2^20 log2
    scale). Higher = more target-like; select by ORDER BY dsir_scaled
    DESC. Raw distribution = the full corpus; target = rows where
    ``target_expr`` holds."""
    # r11: feats feeds three consumers (raw distribution, target
    # distribution, scoring join) with no shared exchange — without a
    # materialization the tokenize + bigram + md5 extraction ran three
    # times (the _shingle_pair_intersections/dup-span precedent, guide
    # §1.2 "don't compute things you throw away"); and the two
    # distributions are ONE conditional aggregation over the same rows,
    # not a groupBy + filtered groupBy + left join.
    feats = doc_bucket_counts(docs, target_expr, id_col, text_col, d).localCheckpoint()
    stats = feats.groupBy("j").agg(
        (
            F.coalesce(F.sum(F.when(F.col("is_t") == 1, F.col("c"))), F.lit(0))
            + F.lit(1)
        ).alias("_ct1"),
        (F.sum("c") + F.lit(1)).alias("_cr1"),
    )
    stats = with_flog2(stats, "_ct1", "lt")
    stats = with_flog2(stats, "_cr1", "lr")
    consts = stats.agg(
        (F.sum(F.col("_ct1") - F.lit(1)) + F.lit(d)).alias("_td"),
        (F.sum(F.col("_cr1") - F.lit(1)) + F.lit(d)).alias("_rd"),
    )
    consts = with_flog2(consts, "_td", "ltg")
    consts = with_flog2(consts, "_rd", "lrg")
    scored = (
        feats.join(F.broadcast(stats.select("j", "lt", "lr")), "j")
        .crossJoin(F.broadcast(consts.select("ltg", "lrg")))
        .groupBy(id_col)
        .agg(
            F.max("is_t").cast("long").alias("is_target"),
            F.sum("c").cast("long").alias("n_feats"),
            (
                F.sum(F.col("c") * (F.col("lt") - F.col("lr")))
                + F.sum("c") * (F.first("lrg") - F.first("ltg"))
            )
            .cast("long")
            .alias("dsir_scaled"),
        )
    )
    return scored


def sql_dsir_ctes(
    target_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    d: int = DSIR_D,
) -> str:
    """DuckDB CTE chain mirroring dsir_weights; the final CTE is
    ``dsir_scored`` (id, is_target, n_feats, dsir_scaled)."""
    md5j = f"(('0x' || substr(md5(_bg || '{DSIR_SALT}'), 1, 15))::BIGINT % {d})"
    return f"""
    ds_docs AS (
      SELECT {id_col} AS id, CAST({target_sql} AS BIGINT) AS is_t,
             string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM {table}
    ),
    ds_bg AS (
      SELECT id, is_t,
             unnest([array_to_string(w[i+1:i+2], ' ')
                     for i in range(0, greatest(len(w) - 2, 0) + 1)]) AS _bg
      FROM ds_docs
    ),
    ds_feats AS (
      SELECT id, is_t, {md5j} AS j, CAST(COUNT(*) AS BIGINT) AS c
      FROM ds_bg WHERE _bg <> '' GROUP BY 1, 2, 3
    ),
    ds_raw AS (SELECT j, CAST(SUM(c) AS BIGINT) AS cr FROM ds_feats GROUP BY j),
    ds_tgt AS (SELECT j, CAST(SUM(c) AS BIGINT) AS ct FROM ds_feats
               WHERE is_t = 1 GROUP BY j),
    ds_stats AS (
      SELECT r.j,
             {sql_flog2("(COALESCE(t.ct, 0) + 1)")} AS lt,
             {sql_flog2("(r.cr + 1)")} AS lr,
             COALESCE(t.ct, 0) AS ct0, r.cr AS cr0
      FROM ds_raw r LEFT JOIN ds_tgt t USING (j)
    ),
    ds_consts AS (
      SELECT {sql_flog2(f"(SELECT CAST(SUM(ct0) + {d} AS BIGINT) FROM ds_stats)")} AS ltg,
             {sql_flog2(f"(SELECT CAST(SUM(cr0) + {d} AS BIGINT) FROM ds_stats)")} AS lrg
    ),
    dsir_scored AS (
      SELECT f.id,
             CAST(MAX(f.is_t) AS BIGINT) AS is_target,
             CAST(SUM(f.c) AS BIGINT) AS n_feats,
             CAST(SUM(f.c * (s.lt - s.lr))
                  + SUM(f.c) * (MAX(k.lrg) - MAX(k.ltg)) AS BIGINT)
               AS dsir_scaled
      FROM ds_feats f JOIN ds_stats s USING (j) CROSS JOIN ds_consts k
      GROUP BY f.id
    )"""


def dsir_resample(
    docs: DataFrame,
    target_expr: Column,
    k: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = DSIR_D,
    salt: str = "dsirrs",
) -> DataFrame:
    """The RESAMPLING leg of DSIR (Xie et al. 2023 sample documents
    from the raw pool with probability proportional to exp of the
    importance log-weight): deterministic A-ES selection entirely in
    log space, so the exponential weight 2^(dsir_scaled/2^20) is never
    materialized — A-ES keeps the k smallest -log2(u)/w, and

        log2(-log2(u) / w) = flog2(60*2^20 - flog2(u)) - dsir_scaled
                             (+ a constant shared by every row)

    is an exact BIGINT under the shared flog2 kernel: u is the 60-bit
    md5 of the id (no RNG state), both flog2 applications stay in the
    kernel's integer domain, and the selection ORDER BY (key ASC, id
    ASC) LIMIT k compiles to TakeOrderedAndProject. Only the raw pool
    (is_target = 0) is sampled — the target slice defines the
    distribution, it is not a selection candidate.

    Returns (doc_id, n_feats, dsir_scaled, resample_key) for the k
    selected docs.
    """
    from .lm import FLOG2_ONE

    scored = dsir_weights(docs, target_expr, id_col, text_col, d)
    pool = scored.filter(F.col("is_target") == 0).select(
        id_col,
        "n_feats",
        "dsir_scaled",
        F.greatest(
            md5_long(F.col(id_col).cast("string"), salt=salt), F.lit(1)
        ).alias("_u"),
    )
    pool = with_flog2(pool, "_u", "_lu")
    pool = pool.withColumn(
        "_a", F.greatest(F.lit(60 * FLOG2_ONE) - F.col("_lu"), F.lit(1))
    )
    pool = with_flog2(pool, "_a", "_la")
    keyed = pool.select(
        id_col,
        "n_feats",
        "dsir_scaled",
        (F.col("_la") - F.col("dsir_scaled")).cast("long").alias("resample_key"),
    )
    return keyed.orderBy(
        F.col("resample_key").asc(), F.col(id_col).asc()
    ).limit(k)
