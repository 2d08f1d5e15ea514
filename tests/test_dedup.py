"""Unit tests for the LLM-pipeline dedup operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import dedup


def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog tonight"),  # near dup
        (4, "completely different text about spark and parquet files here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = {r.keep_id: r.dup_count for r in dedup.exact_dedup(docs_df(spark)).collect()}
    assert out[1] == 2  # docs 1+2 collapse, survivor is min id
    assert out[3] == 1 and out[4] == 1


def test_exact_dedup_keep(spark):
    kept = sorted(r.doc_id for r in dedup.exact_dedup_keep(docs_df(spark)).collect())
    assert kept == [1, 3, 4]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    out = df.select(dedup.word_shingles(F.col("text"), 3).alias("s")).collect()[0].s
    assert out == ["a b c", "b c d"]


def test_minhash_identical_docs_same_signature(spark):
    sigs = dedup.minhash_signature(docs_df(spark), num_hashes=8)
    rows = {r.doc_id: tuple(r[f"sig_{j}"] for j in range(8)) for r in sigs.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[4]


def test_minhash_near_dup_pipeline(spark):
    pairs = dedup.minhash_near_dup_pairs(docs_df(spark), num_hashes=8, bands=4, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always found
    assert all((4 not in p) for p in got)  # unrelated doc never pairs


def test_ngram_jaccard(spark):
    pairs = dedup.ngram_jaccard_pairs(docs_df(spark), threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    # doc3 adds one word -> 7 common / 8 union = 0.875
    assert abs(got[(1, 3)] - 7 / 8) < 1e-12
    assert (1, 4) not in got


def test_simhash_identical_and_pairs(spark):
    df = docs_df(spark)
    sigs = {
        r.doc_id: r.sig
        for r in dedup.with_simhash(df).select("doc_id", "sig").collect()
    }
    assert sigs[1] == sigs[2]
    pairs = dedup.simhash_pairs(df, max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0
