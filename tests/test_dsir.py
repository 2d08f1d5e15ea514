"""DSIR importance weights (llm/dsir.py) — selection quality + NULL
robustness (exact-value parity is the registry oracle's job)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import dsir


def test_dsir_ranks_target_like_docs_above_noise(spark):
    """The reason the op exists: held-out docs written in the target
    slice's language must outscore noise docs — and the target docs
    themselves must sit at the top."""
    tgt_text = "the quick brown fox jumps over the lazy dog again and again"
    noise_text = "zzz qqq xxx vvv kkk jjj www yyy uuu ttt rrr sss"
    rows = []
    for i in range(10):
        rows.append((i, tgt_text, 1))            # target slice
    for i in range(10, 30):
        rows.append((i, noise_text, 0))          # raw noise
    rows.append((100, tgt_text + " extra tail", 0))  # held-out target-like
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt long")
    got = {
        r.doc_id: (r.dsir_scaled, r.is_target)
        for r in dsir.dsir_weights(df, F.col("is_tgt") == 1).collect()
    }
    held_out = got[100][0]
    assert got[100][1] == 0
    assert all(held_out > got[i][0] for i in range(10, 30))
    assert all(got[i][0] > got[j][0] for i in range(10) for j in range(10, 30))


def test_dsir_null_predicate_means_not_target(spark):
    """A NULL target predicate (NULL source under isin) must score as
    is_target = 0, not NULL — the r7 adversarial-sweep finding."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "src0"), (2, "alpha beta gamma", None)],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: r.is_target
        for r in dsir.dsir_weights(
            df, F.col("source").isin("src0")
        ).collect()
    }
    assert got == {1: 1, 2: 0}


def test_dsir_weight_is_exact_integer_mirror(spark):
    """Spot-check the fixed-point formula against a hand-computed
    mirror on a tiny corpus (both distributions visible by hand)."""
    from kaspi_etl_spark.llm.lm import flog2_int

    # doc 1 (target): words a b -> bigram "a b"; doc 2: words a c
    df = spark.createDataFrame(
        [(1, "a b", 1), (2, "a c", 0)],
        "doc_id long, text string, t long",
    )
    got = {
        r.doc_id: r.dsir_scaled
        for r in dsir.dsir_weights(df, F.col("t") == 1).collect()
    }
    d = dsir.DSIR_D
    # bucket counts: "a b" ct=1 cr=1; "a c" ct=0 cr=1; T=1, R=2
    w1 = 1 * (flog2_int(2) - flog2_int(2)) + 1 * (
        flog2_int(2 + d) - flog2_int(1 + d)
    )
    w2 = 1 * (flog2_int(1) - flog2_int(2)) + 1 * (
        flog2_int(2 + d) - flog2_int(1 + d)
    )
    assert got == {1: w1, 2: w2}
