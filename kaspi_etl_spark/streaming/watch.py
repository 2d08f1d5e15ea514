"""Price watch — sliding-window stateful bot detection (SURVEY.md 2.8).

Reference: apps/kaspi_offers_dashboard/scripts/price_watch.ts —
  T1 periodic tick (:75-86)        -> trigger(processingTime=...)
  T2 per-(variant, seller) ring buffer of the last 5 snapshots, flag when
     >=3 undercuts (:31-52)        -> applyInPandasWithState / batch window
  T3 NDJSON append per snapshot (:53-63) -> writeStream json sink

Two implementations with an equivalence test between them (SURVEY.md 5):

* ``bot_flags_replay`` — batch replay over historical events with a
  ``rowsBetween(-4, 0)`` window: the oracle-checkable form.
* ``bot_flags_stream`` — Structured Streaming with keyed state holding the
  ring buffer, checkpointed; the production form. State is bounded (5
  numbers per key), so at 100 TB/day the state store scales with
  #(variant, seller) pairs, not event volume.

Divergence note: the reference computes each tick's variant minimum over
that tick's snapshot only; the replay form uses the variant's minimum over
the replayed window input (deterministic under batch replay). The
streaming form mirrors the reference exactly: per-batch minimum per
variant, then the per-seller ring buffer.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

UNDERCUT_MARGIN = 50  # price <= variant_min + 50 (price_watch.ts:44)
WINDOW_TICKS = 5  # last 5 snapshots (price_watch.ts:46)
FLAG_THRESHOLD = 3  # >=3 undercuts -> bot (price_watch.ts:47)


def bot_flags_replay(events: DataFrame, order_cols: list[str] | None = None) -> DataFrame:
    """W3 batch replay: sliding count of undercuts over the last 5
    observations per (variantId, seller).

    ``events``: variantId, seller, ts, price (+ passthrough columns).
    """
    order_cols = order_cols or ["ts"]
    variant_min = F.min(F.when(F.col("price") > 0, F.col("price"))).over(
        Window.partitionBy("variantId")
    )
    undercut = F.when(
        (F.col("price") > 0) & (F.col("price") <= variant_min + UNDERCUT_MARGIN), 1
    ).otherwise(0)
    sliding = Window.partitionBy("variantId", "seller").orderBy(
        *[F.col(c).asc() for c in order_cols]
    ).rowsBetween(-(WINDOW_TICKS - 1), 0)
    return events.withColumn("undercut", undercut).withColumn(
        "isPriceBot",
        F.sum("undercut").over(sliding) >= FLAG_THRESHOLD,
    )


# State mirrors the reference's Map<variant, Map<seller, window[]>>
# (price_watch.ts:31): one state row per variant holding every seller's
# ring buffer, JSON-encoded (bounded: 5 ints per seller).
STATE_SCHEMA = T.StructType([T.StructField("buffers_json", T.StringType())])

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("variantId", T.StringType()),
        T.StructField("seller", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("price", T.LongType()),
        T.StructField("isPriceBot", T.BooleanType()),
    ]
)


def _flag_group(key: tuple, pdfs: Iterable[Any], state: Any):
    """applyInPandasWithState update function keyed by variantId: per tick
    (distinct ts within the micro-batch), compute the tick's variant
    minimum over all sellers in the group, then roll each seller's ring
    buffer of the last 5 undercut bits — price_watch.ts:31-52."""
    import json

    import pandas as pd

    bufs: dict[str, list[int]] = json.loads(state.get[0]) if state.exists else {}
    out = []
    # Materialize the whole group before grouping by tick: a group larger
    # than arrow.maxRecordsPerBatch arrives as multiple chunks, and a ts
    # tick split across chunks would get per-fragment minima and double
    # ring-buffer appends. Memory is bounded by the micro-batch group.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        for ts, tick in whole.sort_values("ts").groupby("ts", sort=True):
            pos = tick.loc[tick["price"] > 0, "price"]
            vmin = int(pos.min()) if len(pos) else None
            for _, row in tick.iterrows():
                undercut = int(
                    vmin is not None and 0 < row["price"] <= vmin + UNDERCUT_MARGIN
                )
                rec = bufs.setdefault(str(row["seller"]), [])
                rec.append(undercut)
                while len(rec) > WINDOW_TICKS:
                    rec.pop(0)
                out.append(
                    {
                        "variantId": key[0],
                        "seller": row["seller"],
                        "ts": ts,
                        "price": row["price"],
                        "isPriceBot": sum(rec) >= FLAG_THRESHOLD,
                    }
                )
    state.update((json.dumps(bufs),))
    yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])


def bot_flags_stream(events: DataFrame) -> DataFrame:
    """T2 streaming form: keyed ring-buffer state via applyInPandasWithState.

    ``events`` is a streaming DataFrame (variantId, seller, ts, price).
    Keyed by variantId so each group sees all sellers of a tick — the
    tick's minimum is computed inside the stateful operator exactly like
    the reference's per-tick pass, with no streaming aggregation or
    stream-stream join needed. State per key is #sellers x 5 ints, so the
    state store scales with distinct (variant, seller), not event volume.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("variantId").applyInPandasWithState(
        _flag_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.streaming import StatefulProcessor  # noqa: E402


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf at runtime (the
    state-server protocol); absent in some environments — callers should
    fall back to bot_flags_stream (applyInPandasWithState)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class BotFlagProcessor(StatefulProcessor):
    """transformWithStateInPandas form of the T2 ring-buffer detector —
    the Spark 4 replacement for applyInPandasWithState, with typed state
    variables and RocksDB-ready layout. Keyed by variantId; the value
    state holds every seller's last-5 undercut bits."""

    def init(self, handle) -> None:
        import json  # noqa: F401

        from pyspark.sql import types as T

        self._bufs = handle.getValueState(
            "buffers_json", T.StructType([T.StructField("j", T.StringType())])
        )

    def handleInputRows(self, key, rows, timer_values):
        import json

        import pandas as pd

        bufs: dict[str, list[int]] = (
            json.loads(self._bufs.get()[0]) if self._bufs.exists() else {}
        )
        out = []
        # Same chunk-materialization as _flag_group: never split a ts
        # tick across Arrow chunks (per-fragment minima / double appends).
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            )
            for ts, tick in whole.sort_values("ts").groupby("ts", sort=True):
                pos = tick.loc[tick["price"] > 0, "price"]
                vmin = int(pos.min()) if len(pos) else None
                for _, row in tick.iterrows():
                    undercut = int(
                        vmin is not None and 0 < row["price"] <= vmin + UNDERCUT_MARGIN
                    )
                    rec = bufs.setdefault(str(row["seller"]), [])
                    rec.append(undercut)
                    while len(rec) > WINDOW_TICKS:
                        rec.pop(0)
                    out.append(
                        {
                            "variantId": key[0],
                            "seller": row["seller"],
                            "ts": ts,
                            "price": row["price"],
                            "isPriceBot": sum(rec) >= FLAG_THRESHOLD,
                        }
                    )
        self._bufs.update((json.dumps(bufs),))
        yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])

    def close(self) -> None:
        pass


def bot_flags_stream_v2(events: DataFrame) -> DataFrame:
    """T2 on the transformWithStateInPandas API (Spark 4). Same
    semantics as bot_flags_stream; tests assert equivalence with the
    batch replay."""
    return events.groupBy("variantId").transformWithStateInPandas(
        statefulProcessor=BotFlagProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def watch_stream_job(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 60,
    schema: T.StructType | None = None,
):
    """T1+T3: file-source stream -> stateful flags -> NDJSON append sink
    with a processing-time trigger (price_watch.ts:75-86 cadence)."""
    from ..schemas import PRICE_WATCH_EVENTS

    stream = spark.readStream.schema(schema or PRICE_WATCH_EVENTS).json(source_dir)
    flagged = bot_flags_stream(stream)
    return (
        flagged.writeStream.format("json")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )


_DUE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("sku", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_DUE_STATE_SCHEMA = T.StructType([T.StructField("last_run_epoch", T.DoubleType())])


def _due_group_factory(interval_min: float):
    def _due_group(key: tuple, pdfs: Iterable[Any], state: Any):
        """T4: per-SKU schedule gating (BUNDLE/scripts/scripts/
        price_watch.ts:47-67) — emit a tick only when intervalMin has
        elapsed since the last emitted tick for this key."""
        import pandas as pd

        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            for ts in sorted(pdf["ts"]):
                epoch = ts.timestamp()
                if last is None or epoch - last >= interval_min * 60:
                    out.append({"sku": key[0], "ts": ts})
                    last = epoch
        if last is not None:
            state.update((float(last),))
        yield pd.DataFrame(out, columns=["sku", "ts"])

    return _due_group


def due_ticks_stream(requests: DataFrame, interval_min: float = 5.0) -> DataFrame:
    """T4 streaming form: keyed lastRunAt state gates how often each SKU
    actually runs. ``requests``: streaming (sku, ts). State is one float
    per SKU — bounded by the catalog size, not event volume."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return requests.groupBy("sku").applyInPandasWithState(
        _due_group_factory(interval_min),
        outputStructType=_DUE_OUT_SCHEMA,
        stateStructType=_DUE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "v",
    value_alias: str = "sum_v",
) -> DataFrame:
    """Sessionization by inactivity gap: merging session_window groupBy,
    one plan for batch replay AND streaming (session_window merges
    partial sessions across micro-batches; with a watermark upstream the
    state store evicts closed sessions). The batch registered form
    (`events_session_windows`) and the streaming job below share this
    exact function, so the oracle-verified semantics are the streaming
    semantics."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(value_col).cast("long").alias(value_alias),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            "n_events",
            value_alias,
        )
    )


def session_stream_job(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    trigger_seconds: int | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "v",
    max_files_per_trigger: int | None = 1,
):
    """Reusable streaming sessionization job (the streaming form of
    events_session_windows): file-source NDJSON stream -> watermark ->
    merging session windows -> append NDJSON sink. State is one open
    session per active key — bounded by concurrent users, not event
    volume; the watermark closes and evicts sessions whose gap has
    passed. ``trigger_seconds=None`` runs availableNow (drain-and-stop,
    the test/backfill mode); a number gives the production
    processing-time cadence. ``max_files_per_trigger`` bounds each
    micro-batch (default 1 file) — the watermark only advances BETWEEN
    micro-batches, so draining a backlog as one giant batch would hold
    every session open until the end instead of emitting as it goes."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)
    sessions = user_sessions(
        stream.withWatermark(ts_col, watermark),
        gap=gap,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
    )
    writer = (
        sessions.writeStream.format("json")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def windowed_price_stats(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked sliding-window aggregation over the event stream —
    beyond-reference generalization of T2/T3 (SURVEY.md 2.8 note): per
    variant, 5-minute tumbling windows of min/max/avg price tolerant to
    late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "variantId")
        .agg(
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
            F.avg("price").alias("avg_price"),
            F.count("*").alias("n"),
        )
    )


def dedup_stream_job(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    trigger_seconds: int | None = None,
    max_files_per_trigger: int | None = 1,
):
    """Reusable streaming exact-dedup job (the streaming form of
    events_dedup): file-source NDJSON stream -> watermark ->
    dropDuplicatesWithinWatermark(keys) -> append NDJSON sink. The first
    arrival of each key wins; replays inside the watermark window are
    dropped. State holds one entry per key seen within the watermark —
    bounded by key arrival rate * watermark, not stream length — and the
    watermark evicts expired keys, which is what keeps this runnable
    forever at 100 TB/day (an unwatermarked dropDuplicates grows state
    without bound). ``trigger_seconds=None`` runs availableNow
    (drain-and-stop); a number gives the processing-time cadence.
    """
    keys = key_cols or ["event_id"]
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)
    deduped = stream.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(keys)
    writer = (
        deduped.writeStream.format("json")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def stream_stream_join_job(
    spark,
    left_dir: str,
    right_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    left_schema: T.StructType | str,
    right_schema: T.StructType | str,
    join_key: str = "event_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within: str = "interval 15 minutes",
    trigger_seconds: int | None = None,
):
    """Watermarked stream-stream inner join: two file-source NDJSON
    streams joined on ``join_key`` with the event-time range condition
    ``right.ts BETWEEN left.ts - within AND left.ts + within``
    (the enrich-clicks-with-impressions shape). Both sides carry
    watermarks AND the join has a time-range predicate — the two
    conditions Spark needs to bound state: each side buffers only rows
    younger than watermark + range, and evicts as the watermark
    advances, which is what keeps a forever-running join from growing
    state with stream length at 100 TB/day. Output columns are the key,
    both event times, and each side's payload columns suffixed _l/_r.
    ``trigger_seconds=None`` runs availableNow (drain-and-stop).
    """
    left = (
        spark.readStream.schema(left_schema)
        .option("maxFilesPerTrigger", "1")
        .json(left_dir)
        .withWatermark(left_ts, watermark)
    )
    right = (
        spark.readStream.schema(right_schema)
        .option("maxFilesPerTrigger", "1")
        .json(right_dir)
        .withWatermark(right_ts, watermark)
    )
    lcols = [c for c in left.columns if c not in (join_key, left_ts)]
    rcols = [c for c in right.columns if c not in (join_key, right_ts)]
    l = left.select(
        F.col(join_key),
        F.col(left_ts).alias("_lts"),
        *[F.col(c).alias(f"{c}_l") for c in lcols],
    )
    r = right.select(
        F.col(join_key).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"{c}_r") for c in rcols],
    )
    joined = l.join(
        r,
        F.expr(
            f"{join_key} = _rk AND "
            f"_rts BETWEEN _lts - {within} AND _lts + {within}"
        ),
        "inner",
    ).drop("_rk")
    writer = (
        joined.writeStream.format("json")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def stream_static_enrich_job(
    spark,
    source_dir: str,
    dim_path: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    join_key: str,
    trigger_seconds: int | None = None,
):
    """Stream-static broadcast enrichment: an NDJSON fact stream joined
    per-micro-batch to a parquet dimension, appended as NDJSON.

    The third cell of the streaming-join matrix (stream-stream and
    streaming dedup are above): a stream-static join needs NO watermark
    and keeps NO join state — each micro-batch probes the (broadcast)
    dimension. NOTE on refresh semantics: for a parquet static side the
    FILE LISTING is resolved at plan time, so dimension files added (or
    rewritten — which can error) while the query runs are NOT seen;
    picking up dimension updates requires restarting the query, a
    snapshot-refreshing table format, or re-reading the dimension inside
    a foreachBatch join. Left join: facts with no dimension row survive
    with nulls (monitorable), never silently dropped."""
    from pyspark.sql import functions as F  # noqa: F811

    stream = spark.readStream.schema(schema).json(source_dir)
    dim = spark.read.parquet(dim_path)
    enriched = stream.join(F.broadcast(dim), join_key, "left")
    writer = (
        enriched.writeStream.format("json")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")
