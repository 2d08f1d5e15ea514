"""int8 embedding quantization (llm/quant.py)."""

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import quant


def _emb(spark):
    rows = [
        (1, [0.0, -1.0, 5.0, 7.5]),
        (2, [1.0, 1.0, 5.0, -2.5]),
        (3, [0.5, 3.0, 5.0, 10.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codebook_is_dimension_bounded_and_exact(spark):
    cb = {r["pos"]: (r["mn"], r["mx"])
          for r in quant.embedding_codebook(_emb(spark)).collect()}
    assert len(cb) == 4
    assert cb[0] == (0.0, 1.0)
    assert cb[1] == (-1.0, 3.0)
    assert cb[2] == (5.0, 5.0)  # constant dimension
    assert cb[3] == (-2.5, 10.0)


def test_quantize_error_bounded_by_half_bucket(spark):
    emb = _emb(spark)
    out = {r["vec_id"]: r for r in quant.quantize_embeddings(emb).collect()}
    cb = sorted(quant.embedding_codebook(emb).collect(), key=lambda r: r["pos"])
    half = max(
        (r["mx"] - r["mn"]) / quant.Q_LEVELS / 2.0 for r in cb
    )
    for r in out.values():
        assert len(r["codes"]) == 4
        assert all(0 <= c <= 255 for c in r["codes"])
        assert r["max_abs_err"] <= half * (1 + 1e-12)
    # constant dim always codes 0; extremes land on 0 / 255
    assert all(r["codes"][2] == 0 for r in out.values())
    assert out[1]["codes"][0] == 0 and out[3]["codes"][3] == 255


def test_dequantize_expr_matches_midpoint_decode(spark):
    emb = _emb(spark)
    cb = sorted(quant.embedding_codebook(emb).collect(), key=lambda r: r["pos"])
    codes = quant.quantize_embeddings(emb)
    dec = codes.select(
        "vec_id",
        quant.dequantize_expr(
            "codes", [r["mn"] for r in cb], [r["mx"] for r in cb]
        ).alias("xhat"),
    )
    joined = dec.join(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("x")),
        "vec_id",
    ).select(
        "vec_id",
        F.aggregate(
            F.zip_with("x", "xhat", lambda a, b: F.abs(a - b)),
            F.lit(0.0),
            lambda acc, v: F.greatest(acc, v),
        ).alias("err"),
    )
    errs = {r["vec_id"]: r["err"] for r in joined.collect()}
    per_dim_half = [(r["mx"] - r["mn"]) / quant.Q_LEVELS / 2.0 for r in cb]
    assert all(e <= max(per_dim_half) * (1 + 1e-12) for e in errs.values())
