"""litcache.array_lit — cached array literals must be value-identical to
F.lit(list).cast(...) (which they replace: F.lit converts element-by-
element over py4j, ~2.4 s per 1024-element table, paid per query build).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.litcache import _CACHE, array_lit
from kaspi_etl_spark.layout import HILBERT_D_LUT, HILBERT_T_LUT
from kaspi_etl_spark.llm.classifier import SIGMOID_LUT
from kaspi_etl_spark.llm.lm import FEXP2_LUT, FLOG2_LUT


def _eq(spark, values, tp):
    row = (
        spark.range(1)
        .select(
            (array_lit(values, tp) == F.lit(list(values)).cast(f"array<{tp}>")).alias(
                "eq"
            )
        )
        .collect()[0]
    )
    assert row["eq"] is True, f"array_lit mismatch for {tp}"


def test_array_lit_matches_f_lit_for_every_engine_table(spark):
    _eq(spark, FLOG2_LUT, "bigint")
    _eq(spark, FEXP2_LUT, "bigint")
    _eq(spark, SIGMOID_LUT, "bigint")
    _eq(spark, HILBERT_T_LUT, "int")
    _eq(spark, HILBERT_D_LUT, "bigint")


def test_array_lit_doubles_roundtrip(spark):
    vals = [0.1, -1.5e-7, 3.141592653589793, 2.0**-52, 1e300]
    _eq(spark, vals, "double")


def test_array_lit_caches_column_object(spark):
    _CACHE.clear()
    a = array_lit(FLOG2_LUT, "bigint")
    b = array_lit(FLOG2_LUT, "bigint")
    assert a is b
    assert array_lit(FLOG2_LUT, "int") is not a  # type is part of the key
