"""Sink tests: overwrite/append/upsert/date-partitioned/bucketed writes
and the T4 due-gating stateful stream."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from kaspi_etl_spark import sinks
from kaspi_etl_spark.streaming import watch


def test_overwrite_append_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    sinks.overwrite_table(df, p)
    sinks.append_rows(spark.createDataFrame([(2, "b")], "id long, v string"), p)
    assert spark.read.parquet(p).count() == 2
    sinks.overwrite_table(df, p)
    assert spark.read.parquet(p).count() == 1


def test_upsert_parquet(spark, tmp_path):
    p = str(tmp_path / "purchases")
    first = spark.createDataFrame(
        [("po1", "A", 10), ("po1", "B", 20)], "po_id string, sku_key string, qty long"
    )
    sinks.upsert_parquet(spark, first, p, ["po_id", "sku_key"])
    # replace (po1, A), add (po2, C)
    second = spark.createDataFrame(
        [("po1", "A", 99), ("po2", "C", 5)], "po_id string, sku_key string, qty long"
    )
    sinks.upsert_parquet(spark, second, p, ["po_id", "sku_key"])
    rows = {(r.po_id, r.sku_key): r.qty for r in spark.read.parquet(p).collect()}
    assert rows == {("po1", "A"): 99, ("po1", "B"): 20, ("po2", "C"): 5}
    # idempotent: same batch again changes nothing
    sinks.upsert_parquet(spark, second, p, ["po_id", "sku_key"])
    assert spark.read.parquet(p).count() == 3


def test_date_partitioned_dynamic_overwrite(spark, tmp_path):
    p = str(tmp_path / "facts")
    d1, d2 = datetime.date(2025, 9, 1), datetime.date(2025, 9, 2)
    day1 = spark.createDataFrame([(1, d1), (2, d1), (3, d2)], "id long, order_date date")
    sinks.write_date_partitioned(day1, p)
    # rewrite ONLY day 2; day-1 partition must survive
    day2 = spark.createDataFrame([(9, d2)], "id long, order_date date")
    sinks.write_date_partitioned(day2, p)
    got = {(r.id, str(r.order_date)) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "2025-09-01"), (2, "2025-09-01"), (9, "2025-09-02")}


def test_bucketed_table_join_has_no_shuffle(spark):
    big = spark.range(0, 1000).select(
        F.col("id").alias("sku_id"), (F.col("id") % 7).alias("v")
    )
    dim = spark.range(0, 1000, 2).select(
        F.col("id").alias("sku_id"), F.lit("x").alias("name")
    )
    sinks.write_bucketed_table(big, "t_big", "sku_id", num_buckets=8)
    sinks.write_bucketed_table(dim, "t_dim", "sku_id", num_buckets=8)
    joined = (
        spark.table("t_big")
        .hint("merge")
        .join(spark.table("t_dim").hint("merge"), "sku_id")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucket co-location


def test_due_ticks_stream_gates_by_interval(spark):
    t0 = datetime.datetime(2025, 9, 1, 12, 0, 0)
    # ticks each minute for 10 minutes; interval 5 min -> emit at 0, 5, 10
    rows = [("SKU_1", t0 + datetime.timedelta(minutes=i)) for i in range(11)]
    src = tempfile.mkdtemp(prefix="due_src_")
    sink = tempfile.mkdtemp(prefix="due_sink_")
    ckpt = tempfile.mkdtemp(prefix="due_ckpt_")
    try:
        df = spark.createDataFrame(rows, "sku string, ts timestamp")
        for i in range(11):
            df.filter(F.minute("ts") == i).coalesce(1).write.mode("overwrite").json(
                f"{src}/tick_{i:02d}"
            )
        stream = (
            spark.readStream.schema("sku string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .json(f"{src}/tick_*")
        )
        q = (
            watch.due_ticks_stream(stream, interval_min=5.0)
            .writeStream.format("json")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            r.ts.minute
            for r in spark.read.schema("sku string, ts timestamp").json(sink).collect()
        )
        assert got == [0, 5, 10]
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    p = str(tmp_path / "shards")
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 13).alias("v")
    )
    # simulate micro-batch accretion: 20 tiny files
    df.repartition(20).write.parquet(p)
    files_before = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files_before) == 20
    before = {(r.id, r.v) for r in spark.read.parquet(p).collect()}
    n_after = sinks.compact_parquet(spark, p)
    assert n_after == 1  # a few KB -> one 128MB-target file
    assert {(r.id, r.v) for r in spark.read.parquet(p).collect()} == before


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from kaspi_etl_spark import sinks

    df = spark.range(1000).withColumn("grp", F.col("id") % 7)
    path = str(tmp_path / "orc_tbl")
    sinks.write_orc(df, path)
    back = sinks.read_orc(spark, path)
    assert back.count() == 1000
    assert {f.name for f in back.schema.fields} == {"id", "grp"}
    # filter reaches the ORC scan (PushedFilters) and projection prunes
    plan = (
        back.filter(F.col("id") > 990)
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,990)]" in plan
    assert back.filter(F.col("id") > 990).count() == 9


def test_delete_keys_parquet_removes_only_listed(spark, tmp_path):
    from pyspark.sql import functions as F

    from kaspi_etl_spark import sinks

    path = str(tmp_path / "users")
    spark.range(100).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("grp")
    ).write.parquet(path)
    dels = spark.createDataFrame([(3,), (50, ), (99,), (12345,)], "user_id long")
    removed = sinks.delete_keys_parquet(spark, path, dels, "user_id")
    assert removed == 3  # 12345 never existed
    back = spark.read.parquet(path)
    assert back.count() == 97
    assert back.filter(F.col("user_id").isin(3, 50, 99)).count() == 0


def test_write_token_shards_balanced_files(spark, tmp_path):
    from kaspi_etl_spark import sinks

    rows = [(i, ("tok " * (i % 13 + 1)).strip()) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "shards")
    sinks.write_token_shards(docs, path, shard_tokens=100)

    back = spark.read.parquet(path)
    assert back.count() == 120
    assert set(back.columns) == {"doc_id", "text", "shard_id"}
    # every shard directory except the last holds within-one-doc of the
    # target token count
    from pyspark.sql import functions as F

    from kaspi_etl_spark.llm.text import whitespace_token_count

    sizes = {
        r.shard_id: r.t
        for r in back.groupBy("shard_id")
        .agg(F.sum(whitespace_token_count(F.col("text"))).alias("t"))
        .collect()
    }
    last = max(sizes)
    assert set(sizes) == set(range(last + 1))
    for sid, tot in sizes.items():
        if sid != last:
            assert 100 - 13 < tot < 100 + 13


def test_upsert_crash_before_swap_leaves_old_state_intact(spark, tmp_path, monkeypatch):
    """Failure injection: if the job dies while WRITING the staging dir
    (any point before the first rename), the live table is untouched."""
    import os as _os

    from kaspi_etl_spark import sinks

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sinks.upsert_parquet(spark, base, path, ["k"])

    real_rename = _os.rename

    def explode(src, dst):
        raise OSError("injected crash at first rename")

    monkeypatch.setattr(_os, "rename", explode)
    incoming = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    try:
        sinks.upsert_parquet(spark, incoming, path, ["k"])
        raise AssertionError("expected injected crash")
    except OSError:
        pass
    finally:
        monkeypatch.setattr(_os, "rename", real_rename)
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b"}  # old state fully intact


def test_upsert_crash_between_renames_loses_nothing(spark, tmp_path, monkeypatch):
    """Failure injection at the narrow window BETWEEN the two renames:
    the live path is briefly absent, but both the old state (backup dir)
    and the new state (staging dir) exist complete on disk — nothing is
    corrupt, recovery is a rename."""
    import glob as _glob
    import os as _os

    from kaspi_etl_spark import sinks

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sinks.upsert_parquet(spark, base, path, ["k"])

    real_rename = _os.rename
    calls = {"n": 0}

    def fail_second(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("injected crash between renames")
        return real_rename(src, dst)

    monkeypatch.setattr(_os, "rename", fail_second)
    incoming = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    try:
        sinks.upsert_parquet(spark, incoming, path, ["k"])
        raise AssertionError("expected injected crash")
    except OSError:
        pass
    finally:
        monkeypatch.setattr(_os, "rename", real_rename)

    backups = _glob.glob(f"{path}__old_*")
    stagings = _glob.glob(f"{path}__stage_*")
    assert backups and stagings
    old = {r["k"]: r["v"] for r in spark.read.parquet(backups[0]).collect()}
    new = {r["k"]: r["v"] for r in spark.read.parquet(stagings[0]).collect()}
    assert old == {1: "a", 2: "b"}
    assert new == {1: "a", 2: "B", 3: "c"}


def test_write_packed_sequences_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from kaspi_etl_spark import sinks
    from kaspi_etl_spark.llm.text import whitespace_token_count

    docs = spark.createDataFrame(
        [(i, " ".join([f"w{i}"] * (37 * (i + 1) % 300 + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "seqs")
    sinks.write_packed_sequences(docs, path, seq_len=128, seqs_per_file=4)
    back = spark.read.parquet(path)
    # every token of every doc lands in exactly one sequence span
    total_tokens = docs.select(
        F.sum(whitespace_token_count(F.col("text")))
    ).collect()[0][0]
    assert back.agg(F.sum("n_in_seq")).collect()[0][0] == total_tokens
    # each row carries exactly its span's slice of the text, no more
    # (write amplification stays O(total_tokens))
    bad_len = back.filter(
        whitespace_token_count(F.col("span_text")) != F.col("n_in_seq")
    ).count()
    assert bad_len == 0
    assert back.select(
        F.sum(whitespace_token_count(F.col("span_text")))
    ).collect()[0][0] == total_tokens
    # buckets hold only their own sequences
    bad = back.filter(
        F.expr("seq_id div 4") != F.col("seq_bucket")
    ).count()
    assert bad == 0
    # interior sequences are exactly full
    per_seq = back.groupBy("seq_id").agg(F.sum("n_in_seq").alias("n")).collect()
    max_seq = max(r["seq_id"] for r in per_seq)
    assert all(r["n"] == 128 for r in per_seq if r["seq_id"] < max_seq)


def test_observed_write_metrics_ride_the_write(spark, tmp_path):
    from kaspi_etl_spark.ops import quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "k long, v string"
    )
    observed, obs = quality.observed_write_metrics(df, ["v"])
    observed.write.mode("overwrite").parquet(str(tmp_path / "t"))
    got = obs.get
    assert got["n_rows"] == 4 and got["nulls_v"] == 2
    # the write itself is complete and correct
    assert spark.read.parquet(str(tmp_path / "t")).count() == 4
