"""Regression tests for the round-7 advisory findings: NULL media
content, lift_ppm BIGINT wrap, empty phrase list, k<1 negative draws."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaspi_etl_spark.llm import multimodal, retrieval, similarity
from kaspi_etl_spark.ops.basket import association_rules


def test_media_phash_tolerates_null_content(spark):
    rows = [(1, "image", None), (2, "image", b"")]
    media = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    out = multimodal.media_phash(media).collect()
    assert len(out) == 2
    # NULL and empty content hash identically (both map to the empty frame)
    by_id = {r.media_id: r.phash for r in out}
    assert by_id[1] == by_id[2]


def test_phrase_search_rejects_empty_inputs(spark):
    docs = spark.createDataFrame([("d1", "a b c")], "doc_id string, text string")
    with pytest.raises(ValueError):
        retrieval.phrase_search(docs, [])
    with pytest.raises(ValueError):
        retrieval.phrase_search(docs, [("a",), ()])


def test_negative_samples_rejects_k_below_one(spark):
    df = spark.createDataFrame([("v1",), ("v2",)], "vec_id string")
    with pytest.raises(ValueError):
        similarity.negative_samples(df, k=0)
    with pytest.raises(ValueError):
        similarity.negative_samples(df, k=-3)


def test_lift_ppm_exact_past_bigint_wrap(spark):
    # co * n_baskets ~ 2.5e19 wraps a BIGINT numerator; the DECIMAL(38,0)
    # path must stay exact.  Simulate by driving the scored expression
    # directly with large counts (the full operator can't build 5e9
    # baskets in a test).
    from kaspi_etl_spark.ops.basket import CONF_PPM_EXPR, LIFT_PPM_EXPR

    co, nb, na, nc = 5_000_000_000, 5_000_000_001, 5_000_000_000, 5_000_000_000
    df = spark.createDataFrame(
        [(co, nb, na, nc)], "co long, n_baskets long, n_antecedent long, n_consequent long"
    )
    row = df.select(
        F.expr(CONF_PPM_EXPR).cast("long").alias("conf_ppm"),
        F.expr(LIFT_PPM_EXPR).cast("long").alias("lift_ppm"),
    ).collect()[0]
    assert row.conf_ppm == 1_000_000
    assert row.lift_ppm == (10**6 * co * nb) // (na * nc)  # exact: 1000000
