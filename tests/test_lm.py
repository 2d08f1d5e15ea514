"""Bigram language model + fixed-point log2 (llm/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from kaspi_etl_spark.llm import lm


def test_flog2_accuracy_and_monotonicity(spark):
    vals = [1, 2, 3, 7, 8, 1023, 1024, 1025, 12345, 2**30, 2**40 + 12345]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = lm.with_flog2(df, "x", "l")
    got = {r["x"]: r["l"] for r in out.collect()}
    prev = -1
    for v in sorted(vals):
        approx = got[v] / lm.FLOG2_ONE
        assert abs(approx - math.log2(v)) <= 1.5 / lm.FLOG2_TABLE, v
        assert got[v] >= prev  # monotone
        prev = got[v]
    assert got[1] == 0 and got[2] == lm.FLOG2_ONE and got[1024] == 10 * lm.FLOG2_ONE


def test_lm_score_separates_fluent_from_junk(spark):
    fluent = "the cat sat on the mat and the dog sat on the rug"
    docs = [(i, fluent) for i in range(20)] + [
        (100, "zq xv wj kp fn rb tg lm dc hs"),  # bigrams seen nowhere else
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm.lm_score(df).collect()}
    assert out[0]["bits_per_token"] == out[1]["bits_per_token"]
    assert out[100]["bits_per_token"] > out[0]["bits_per_token"] + 1.0
    # exact integer invariants
    for r in out.values():
        assert r["surprisal_scaled"] >= 0
        assert r["bits_per_token"] == pytest.approx(
            r["surprisal_scaled"] / (r["n_bigrams"] * lm.FLOG2_ONE)
        )


def test_lm_model_form_matches_self_scoring(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta"),
            (2, "beta gamma delta"),
            (3, "alpha alpha alpha"),
        ],
        "doc_id long, text string",
    )
    direct = {tuple(r) for r in lm.lm_score(docs).collect()}
    c12, c1, v = lm.lm_train(docs)
    via_model = {
        tuple(r) for r in lm.lm_score_with_model(docs, c12, c1, v).collect()
    }
    assert direct == via_model


def test_lm_unseen_bigrams_get_smoothed_mass(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id long, text string",
    )
    c12, c1, v = lm.lm_train(train)
    v_size = v.collect()[0]["v_size"]
    held_out = spark.createDataFrame(
        [(9, "omega sigma"), (10, "alpha beta")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           lm.lm_score_with_model(held_out, c12, c1, v).collect()}
    # fully-unseen bigram from unseen context: P = 1/V exactly
    lut_v = lm.with_flog2(
        v.select(F.col("v_size").alias("x")), "x", "l"
    ).collect()[0]["l"]
    assert out[9]["surprisal_scaled"] == lut_v  # flog2(V) - flog2(1)
    # seen bigram scores strictly lower than the unseen one
    assert out[10]["bits_per_token"] < out[9]["bits_per_token"]
    assert v_size == 4


def test_lm_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "   "), (4, "two words")],
        "doc_id long, text string",
    )
    out = lm.lm_score(docs).collect()
    assert {r["doc_id"] for r in out} == {4}
    assert out[0]["n_bigrams"] == 1


def test_lm_model_roundtrip_bit_exact(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "beta gamma delta beta")],
        "doc_id long, text string",
    )
    c12, c1, v = lm.lm_train(docs)
    lm.save_model(c12, c1, v, str(tmp_path / "lm"))
    c12b, c1b, vb = lm.load_model(docs.sparkSession, str(tmp_path / "lm"))
    a = sorted(map(tuple, lm.lm_score_with_model(docs, c12, c1, v).collect()))
    b = sorted(map(tuple, lm.lm_score_with_model(docs, c12b, c1b, vb).collect()))
    assert a == b


def test_sb_backoff_levels_and_exactness(spark):
    train = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (2, "the dog sat on the rug")],
        "doc_id long, text string",
    )
    tri, bi, uni, total = lm.sb_train(train)
    held = spark.createDataFrame(
        [
            (1, "the cat sat"),      # trigram seen -> level 0
            (3, "rug the cat"),      # trigram unseen, (the,cat) seen -> level 1
            (5, "cat mat rug"),      # (mat,rug) unseen, rug seen -> level 2
            (7, "cat mat zzz"),      # unseen tail word -> level 2 with f := 1
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           lm.sb_score(held, tri, bi, uni, total).collect()}
    assert (out[1]["n_backoff1"], out[1]["n_backoff2"]) == (0, 0)
    assert out[3]["n_backoff1"] == 1 and out[3]["n_backoff2"] == 0
    assert out[5]["n_backoff2"] == 1
    assert out[7]["n_backoff2"] == 1
    # level-0 'the cat sat': f(the cat sat)=1, f(the cat)=1 -> S=1,
    # surprisal exactly 0
    assert out[1]["surprisal_scaled"] == 0
    # each backoff level adds the constant penalty; level-2 unseen-word
    # surprisal = 2*PEN + flog2(N) - flog2(1)
    n_tok = total.collect()[0]["n_tokens"]
    lut_n = lm.with_flog2(
        total.select(F.col("n_tokens").alias("x")), "x", "l"
    ).collect()[0]["l"]
    assert out[7]["surprisal_scaled"] == out[7]["n_trigrams"] * 0 + (
        2 * lm.SB_PEN + lut_n
    )
    assert n_tok == 12


def test_fexp2_three_way_parity_and_roundtrip(spark):
    import random

    import duckdb

    from kaspi_etl_spark.llm import lm

    rnd = random.Random(3)
    ss = sorted(
        [0, 1, lm.FLOG2_ONE - 1, lm.FLOG2_ONE, 41 * lm.FLOG2_ONE - 1]
        + [rnd.randrange(0, 41 * lm.FLOG2_ONE) for _ in range(200)]
    )
    con = duckdb.connect()
    prev = None
    for s in ss:
        py = lm.fexp2_int(s)
        sql = con.execute(f"SELECT {lm.sql_fexp2(str(s))}").fetchone()[0]
        assert py == sql, (s, py, sql)
        true = 2.0 ** (s / lm.FLOG2_ONE) * lm.FLOG2_ONE
        assert abs(py - true) / true < 1e-3
        if prev is not None:
            assert py >= prev  # monotone
        prev = py
    df = spark.createDataFrame([(v,) for v in ss], "s LONG")
    got = {r.s: r.o for r in lm.with_fexp2(df, "s", "o").collect()}
    assert all(got[v] == lm.fexp2_int(v) for v in ss)
    # round-trip through the log kernel: fexp2(flog2(x)) ~= x * 2^20
    for x in (1, 7, 1000, 123456789, (1 << 40) + 12345):
        rt = lm.fexp2_int(lm.flog2_int(x))
        assert abs(rt - x * lm.FLOG2_ONE) / (x * lm.FLOG2_ONE) < 2e-3


def test_fexp2_domain_guards(spark):
    import pytest

    from kaspi_etl_spark.llm import lm

    with pytest.raises(ValueError):
        lm.fexp2_int(-1)
    with pytest.raises(ValueError):
        lm.fexp2_int(41 * lm.FLOG2_ONE)
