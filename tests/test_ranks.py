"""The distributed prefix-rank primitives must be value-identical to the
single-partition global windows they replace — property-checked against
the window form on adversarial shapes (heavy ties, clustered values,
negatives, singletons)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kaspi_etl_spark.llm.dedup import md5_long
from kaspi_etl_spark.ranks import (
    binned_prefix_sum,
    hash_order_prefix,
    ntile_from_row_number,
    total_order_row_number,
)


def test_hash_order_prefix_matches_global_window(spark):
    df = spark.range(0, 500).select(
        F.concat(F.lit("id"), F.col("id")).alias("k"),
        (F.col("id") % 7 + 1).alias("w"),
    )
    got = hash_order_prefix(df, "w", "k", salt="t", bucket_bits=4)
    w = Window.orderBy(md5_long(F.col("k").cast("string"), salt="t"), "k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("w").over(w).cast("long"))
    assert sorted(got.select("k", "cum").collect()) == sorted(
        want.select("k", "cum").collect()
    )


@pytest.mark.parametrize(
    "vals",
    [
        list(range(100)),  # distinct spread
        [10_000_000_000 + i * 37 for i in range(64)],  # large magnitudes
        [-50 + i * 3 for i in range(40)],  # negatives
        [5],  # singleton (lo == hi)
        [0, 1],  # tiny
        [2**40 + i for i in range(10)],  # clustered far from zero
    ],
)
def test_binned_prefix_sum_matches_global_window(spark, vals):
    rows = [(v, (abs(v) % 5) + 1) for v in vals]
    df = spark.createDataFrame(rows, "k long, w long")
    got = binned_prefix_sum(df, "k", "w", n_bins=8)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cum", F.sum("w").over(w).cast("long"))
    assert sorted(got.select("k", "cum").collect()) == sorted(
        want.select("k", "cum").collect()
    )


@pytest.mark.parametrize(
    "values",
    [
        [1] * 200,  # one giant tie group
        [i % 3 for i in range(150)],  # few heavy ties
        list(range(120)),  # all distinct
        [0] * 50 + [10**12] * 50,  # extreme spread + ties
    ],
)
def test_total_order_row_number_matches_global_window(spark, values):
    rows = [(f"id{i:04d}", v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = total_order_row_number(df, "v", "k", out_col="rn", salt="s", hash_bits=3)
    w = Window.orderBy(
        F.col("v").asc(),
        md5_long(F.col("k").cast("string"), salt="s").asc(),
        F.col("k").asc(),
    )
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert sorted(got.select("k", "rn").collect()) == sorted(
        want.select("k", "rn").collect()
    )


@pytest.mark.parametrize("n,b", [(10, 4), (3, 5), (100, 5), (7, 7), (1, 3)])
def test_ntile_formula_matches_sql_ntile(spark, n, b):
    df = spark.range(0, n).select((F.col("id") * 13 % n).alias("v"))
    w = Window.orderBy("v")
    want = df.select("v", F.ntile(b).over(w).cast("long").alias("t"))
    total = df.count()
    got = df.select(
        "v",
        ntile_from_row_number(
            F.row_number().over(w).cast("long"), F.lit(total).cast("long"), b
        ).alias("t"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_total_order_row_number_plan_has_no_unpartitioned_data_window(spark):
    df = spark.range(0, 100).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"), (F.col("id") % 2).alias("v")
    )
    got = total_order_row_number(df, "v", "k")
    # every Window in the optimized plan over non-bucket-table input must
    # carry a partition spec; the only unpartitioned window allowed is the
    # one over the bounded bucket-sums table
    plan = got._jdf.queryExecution().optimizedPlan()
    unpartitioned = []

    def walk(node):
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().isEmpty():
                unpartitioned.append(node)
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    # exactly the one bounded cross-bucket offset window
    assert len(unpartitioned) == 1


def test_total_order_row_number_null_id_keeps_row(spark):
    df = spark.createDataFrame([(None, 5), ("a", 5), ("b", 3)], "k string, v long")
    got = total_order_row_number(df, "v", "k")
    rows = got.collect()
    assert len(rows) == 3  # the NULL id must not drop at the bucket join
    assert sorted(r.rn for r in rows) == [1, 2, 3]


def test_total_order_row_number_null_value_fails_loudly(spark):
    import pyspark.errors

    df = spark.createDataFrame([("a", None), ("b", 3)], "k string, v long")
    with pytest.raises(Exception, match="must be non-NULL"):
        total_order_row_number(df, "v", "k").collect()


@pytest.mark.parametrize(
    "skew",
    [
        False,  # uniform keys
        True,  # one dominant key (90% of rows) + a NULL key group
    ],
)
def test_keyed_hash_order_prefix_matches_keyed_window(spark, skew):
    from kaspi_etl_spark.ranks import keyed_hash_order_prefix

    n = 400
    rows = []
    for i in range(n):
        if skew:
            src = "web" if i % 10 != 0 else (None if i % 20 == 0 else "wiki")
        else:
            src = f"s{i % 5}"
        rows.append((f"d{i:04d}", src, (i % 7) + 1))
    df = spark.createDataFrame(rows, "id string, src string, w long")
    got = keyed_hash_order_prefix(
        df, ["src"], "w", "id", salt="t", bucket_bits=4, out_col="cum"
    )
    w = Window.partitionBy("src").orderBy(
        md5_long(F.coalesce(F.col("id").cast("string"), F.lit("")), salt="t"), "id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cum", F.sum("w").over(w).cast("long"))
    assert sorted(
        got.select("id", "src", "cum").collect(), key=str
    ) == sorted(want.select("id", "src", "cum").collect(), key=str)


def test_keyed_hash_order_prefix_null_id_survives(spark):
    from kaspi_etl_spark.ranks import keyed_hash_order_prefix

    df = spark.createDataFrame(
        [(None, "a", 3), ("x", "a", 2), ("y", None, 1)], "id string, src string, w long"
    )
    got = keyed_hash_order_prefix(df, ["src"], "w", "id", bucket_bits=4)
    assert got.count() == 3


@pytest.mark.parametrize(
    "case",
    ["distinct", "heavy_ties", "clustered_doubles", "null_key_group"],
)
def test_keyed_value_order_row_number_matches_keyed_window(spark, case):
    from kaspi_etl_spark.ranks import keyed_value_order_row_number

    rows = []
    for i in range(300):
        key = f"k{i % 4}" if case != "null_key_group" else (f"k{i % 3}" if i % 5 else None)
        if case == "distinct":
            v = float(i)
        elif case == "heavy_ties":
            v = float(i % 2)
        elif case == "clustered_doubles":
            v = 1e9 + (i % 7) * 1e-6
        else:
            v = float(i % 11)
        rows.append((key, f"d{i:04d}", v))
    df = spark.createDataFrame(rows, "src string, id string, v double")
    got = keyed_value_order_row_number(
        df, ["src"], ["v", "id"], out_col="rn", count_col="kn", n_bins=8
    )
    w = Window.partitionBy("src").orderBy(F.col("v").asc(), F.col("id").asc())
    want = df.withColumn("rn", F.row_number().over(w).cast("long")).withColumn(
        "kn", F.count(F.lit(1)).over(Window.partitionBy("src")).cast("long")
    )
    assert sorted(
        got.select("src", "id", "rn", "kn").collect(), key=str
    ) == sorted(want.select("src", "id", "rn", "kn").collect(), key=str)


def test_keyed_value_order_row_number_null_value_fails_loudly(spark):
    from kaspi_etl_spark.ranks import keyed_value_order_row_number

    df = spark.createDataFrame(
        [("a", "x", None), ("a", "y", 3.0)], "src string, id string, v double"
    )
    with pytest.raises(Exception, match="must be non-NULL"):
        keyed_value_order_row_number(df, ["src"], ["v", "id"]).collect()


def test_prefix_rank_output_schemas_have_no_internal_columns(spark):
    """Both hash-order prefixes return EXACTLY input columns + out_col —
    no _pri / _bucket / _offset leakage (ADVICE r10: the keyed form
    leaked _pri, breaking select-star unions against the unkeyed one)."""
    from kaspi_etl_spark.ranks import hash_order_prefix, keyed_hash_order_prefix

    df = spark.createDataFrame(
        [("a", "s1", 2), ("b", "s1", 1), ("c", "s2", 5)],
        "id string, src string, w long",
    )
    got_u = hash_order_prefix(df, "w", "id", out_col="cum")
    got_k = keyed_hash_order_prefix(df, ["src"], "w", "id", out_col="cum")
    assert got_u.columns == ["id", "src", "w", "cum"]
    assert got_k.columns == ["id", "src", "w", "cum"]
    # schema-consistent siblings: a select-star union must work
    assert got_u.unionByName(got_k).count() == 6


@pytest.mark.parametrize(
    "values",
    [
        [1] * 150,  # one giant tie group
        [i % 4 for i in range(120)],  # heavy ties
        list(range(80)),  # distinct
        [-30 + (i % 11) for i in range(90)],  # negatives + ties
    ],
)
def test_total_order_prefix_sum_matches_global_window(spark, values):
    from kaspi_etl_spark.ranks import total_order_prefix_sum

    rows = [(f"id{i:04d}", v, (i % 7) + 1) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    got = total_order_prefix_sum(
        df, "v", "k", "w", out_col="cum", salt="s", hash_bits=3, n_bins=8
    )
    w = Window.orderBy(
        F.col("v").asc(),
        md5_long(F.col("k").cast("string"), salt="s").asc(),
        F.col("k").asc(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cum", F.sum("w").over(w).cast("long"))
    assert sorted(got.select("k", "cum").collect()) == sorted(
        want.select("k", "cum").collect()
    )


def test_total_order_prefix_sum_null_value_fails_loudly(spark):
    from kaspi_etl_spark.ranks import total_order_prefix_sum

    df = spark.createDataFrame([("a", None, 1), ("b", 3, 2)], "k string, v long, w long")
    with pytest.raises(Exception, match="must be non-NULL"):
        total_order_prefix_sum(df, "v", "k", "w").collect()
