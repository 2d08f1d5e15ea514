"""Streaming tests: batch-replay window semantics and replay/stream
equivalence for the bot sliding window (SURVEY.md 5 test plan)."""

from __future__ import annotations

import datetime
import shutil
import tempfile

from kaspi_etl_spark.streaming import watch


def _events(spark):
    t0 = datetime.datetime(2025, 9, 1, 12, 0, 0)
    rows = []
    # seller "bot" undercuts (price == min) on 4 of 5 ticks; "slow" never.
    for i in range(5):
        ts = t0 + datetime.timedelta(minutes=i)
        bot_price = 10000 if i != 2 else 10100
        rows.append(("v1", "bot", ts, bot_price))
        rows.append(("v1", "slow", ts, 10500))
        rows.append(("v1", "anchor", ts, 10000))  # defines the minimum
    return spark.createDataFrame(rows, "variantId string, seller string, ts timestamp, price long")


def test_bot_flags_replay(spark):
    out = watch.bot_flags_replay(_events(spark))
    rows = {(r.seller, r.ts.minute): r.isPriceBot for r in out.collect()}
    # bot seller: undercut bits over ticks = 1,1,0,1,1 -> cumulative window
    # sums 1,2,2,3,4 -> flagged from tick 3 on (>=3 of last 5)
    assert rows[("bot", 0)] is False
    assert rows[("bot", 3)] is True
    assert rows[("bot", 4)] is True
    assert all(not rows[("slow", m)] for m in range(5))


def test_stream_matches_replay(spark):
    """Feed the same ticks through the stateful streaming path (one tick
    per micro-batch via MemoryStream-less foreachBatch simulation) and
    compare with batch replay.

    The streaming path computes the variant minimum per batch; with the
    anchor seller always at the global minimum, the per-batch and global
    minimum agree, so the two implementations must match exactly.
    """
    events = _events(spark)
    src = tempfile.mkdtemp(prefix="watch_src_")
    sink = tempfile.mkdtemp(prefix="watch_sink_")
    ckpt = tempfile.mkdtemp(prefix="watch_ckpt_")
    try:
        # one JSON file per tick -> maxFilesPerTrigger=1 gives one tick per
        # micro-batch, matching the reference's tick == batch semantics
        ticks = sorted({r.ts for r in events.select("ts").distinct().collect()})
        for i, ts in enumerate(ticks):
            events.filter(events.ts == ts).coalesce(1).write.mode("overwrite").json(
                f"{src}/tick_{i}"
            )

        stream = (
            spark.readStream.schema("variantId string, seller string, ts timestamp, price long")
            .option("maxFilesPerTrigger", "1")
            .json(f"{src}/tick_*")
        )
        q = (
            watch.bot_flags_stream(stream)
            .writeStream.format("json")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = spark.read.schema(
            "variantId string, seller string, ts timestamp, price long, isPriceBot boolean"
        ).json(sink)
        got_map = {(r.seller, r.ts): r.isPriceBot for r in got.collect()}
        want = watch.bot_flags_replay(events)
        want_map = {(r.seller, r.ts): r.isPriceBot for r in want.collect()}
        assert len(got_map) == len(want_map) == 15
        assert got_map == want_map
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_v2_matches_replay(spark):
    """transformWithStateInPandas implementation must agree with the
    batch replay exactly (same setup as test_stream_matches_replay)."""
    import pytest

    if not watch.tws_available():
        pytest.skip("google.protobuf absent: transformWithState needs it")
    events = _events(spark)
    src = tempfile.mkdtemp(prefix="watch2_src_")
    sink = tempfile.mkdtemp(prefix="watch2_sink_")
    ckpt = tempfile.mkdtemp(prefix="watch2_ckpt_")
    try:
        ticks = sorted({r.ts for r in events.select("ts").distinct().collect()})
        for i, ts in enumerate(ticks):
            events.filter(events.ts == ts).coalesce(1).write.mode("overwrite").json(
                f"{src}/tick_{i}"
            )
        stream = (
            spark.readStream.schema("variantId string, seller string, ts timestamp, price long")
            .option("maxFilesPerTrigger", "1")
            .json(f"{src}/tick_*")
        )
        q = (
            watch.bot_flags_stream_v2(stream)
            .writeStream.format("json")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.schema(
            "variantId string, seller string, ts timestamp, price long, isPriceBot boolean"
        ).json(sink)
        got_map = {(r.seller, r.ts): r.isPriceBot for r in got.collect()}
        want = watch.bot_flags_replay(events)
        want_map = {(r.seller, r.ts): r.isPriceBot for r in want.collect()}
        assert got_map == want_map and len(got_map) == 15
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_windowed_price_stats_batch(spark):
    # watermark + tumbling window sanity on a batch frame (same plan shape
    # the streaming job uses)
    out = watch.windowed_price_stats(_events(spark)).collect()
    # 5 minutes of data -> one 5-min window
    assert len(out) == 1
    assert out[0].min_price == 10000 and out[0].max_price == 10500
