"""Tests for scale utilities: salted join correctness, TTL cache
behavior, SQL view surface, and the end-to-end watch stream job."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from kaspi_etl_spark import scale
from kaspi_etl_spark.streaming import watch


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key + a long tail
    big = spark.createDataFrame(
        [("hot", i) for i in range(5000)] + [(f"k{i}", i) for i in range(200)],
        "key string, v long",
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(100)],
        "key string, name string",
    )
    plain = big.join(dim, "key").groupBy("key").count()
    salted = scale.salted_join(big, dim, "key").groupBy("key").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "key string, v long")
    dim = spark.createDataFrame([("a", "x")], "key string, name string")
    out = scale.salted_join(big, dim, "key", how="left").collect()
    by_key = {r.key: r.name for r in out}
    assert by_key == {"a": "x", "b": None}


def test_salted_join_rejects_right_outer(spark):
    import pytest

    big = spark.createDataFrame([("a", 1)], "key string, v long")
    dim = spark.createDataFrame([("a", "x")], "key string, name string")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            scale.salted_join(big, dim, "key", how=how)


def test_ttl_cache(spark):
    clock = {"t": 0.0}
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.range(3).toDF("id")

    cache = scale.TTLCache(ttl_seconds=300, clock=lambda: clock["t"])
    a = cache.get("k", build)
    b = cache.get("k", build)
    assert builds["n"] == 1 and a is b
    clock["t"] = 301.0  # expire
    c = cache.get("k", build)
    assert builds["n"] == 2 and c.count() == 3
    cache.invalidate()


def test_register_views_sql_surface(spark, sf_dir):
    names = scale.register_views(spark, sf_dir)
    assert "lineitem" in names and "sellers" in names
    n = spark.sql("SELECT COUNT(*) AS n FROM sellers WHERE price > 0").collect()[0].n
    assert n > 0
    # a real analytical statement over the derived views
    top = spark.sql(
        """
        SELECT productId, MIN(price) AS min_price
        FROM sellers WHERE price > 0
        GROUP BY productId ORDER BY min_price ASC LIMIT 5
        """
    ).collect()
    assert len(top) == 5


def test_watch_stream_job_end_to_end(spark, sf_dir):
    """T1+T3: file stream -> stateful flags -> NDJSON sink, driven with
    availableNow (the trigger cadence itself is config, not semantics)."""
    import datetime

    src = tempfile.mkdtemp(prefix="wsj_src_")
    sink = tempfile.mkdtemp(prefix="wsj_sink_")
    ckpt = tempfile.mkdtemp(prefix="wsj_ckpt_")
    try:
        t0 = datetime.datetime(2025, 9, 1, 12, 0, 0)
        rows = [
            ("v1", "s1", t0, 1000),
            ("v1", "s2", t0, 1200),
        ]
        spark.createDataFrame(
            rows, "variantId string, seller string, ts timestamp, price long"
        ).coalesce(1).write.mode("overwrite").json(src)
        job = watch.watch_stream_job(spark, src, sink, ckpt, trigger_seconds=60)
        q = job.trigger(availableNow=True).start()
        q.awaitTermination(120)
        out = spark.read.schema(
            "variantId string, seller string, ts timestamp, price long, isPriceBot boolean"
        ).json(sink)
        got = {(r.seller): r.isPriceBot for r in out.collect()}
        assert got == {"s1": False, "s2": False}
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)
