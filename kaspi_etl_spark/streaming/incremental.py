"""Streaming incremental aggregate maintenance — foreachBatch state merge.

The production form of ops/incremental.py: a file-source stream whose
every micro-batch is folded into a persistent per-key aggregate state
table with one key-partitioned merge. Unlike a watermarked streaming
aggregation, the state here is an ordinary parquet table — readable by
any batch job mid-stream, unbounded in event-time (no watermark eviction:
count/sum/min/max state is O(keys), not O(events)), and restartable from
the checkpoint.

Stage-and-swap on the state path mirrors sinks.upsert_parquet — a job
cannot overwrite its own input. At 100 TB, partition the state table by a
key prefix and rewrite only partitions the batch touches.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ops import basket as basket_ops
from ..ops import incremental as inc
from ..ops.basket import CONF_PPM_EXPR, LIFT_PPM_EXPR


def _recover_state(state_path: str) -> None:
    """Crash recovery for the two-rename swap below: a crash BETWEEN the
    renames leaves ``state_path`` absent with a ``__old_*`` backup still
    on disk — without this, the next merge would silently rebuild from
    only new batches (fatal for the Bloom state, whose contract is
    'false negatives never'). Recovery is a rename, mirroring the sinks
    tests' documented invariant."""
    import glob

    backups = sorted(glob.glob(glob.escape(state_path) + "__old_*"))
    if not os.path.exists(state_path) and backups:
        os.rename(backups[0], state_path)
        backups = backups[1:]
    # a backup alongside a live state is post-swap debris; stale staging
    # dirs are pre-swap debris — both safe to drop
    for leftover in backups + glob.glob(glob.escape(state_path) + "__stage_*"):
        shutil.rmtree(leftover, ignore_errors=True)


def _swap_state(merged, state_path: str) -> None:
    """Atomic-enough publish: write staging, two renames, drop backup.
    Pair with ``_recover_state`` at the top of every merge."""
    staging = f"{state_path}__stage_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    backup = f"{state_path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(state_path):
        os.rename(state_path, backup)
        os.rename(staging, state_path)
        shutil.rmtree(backup, ignore_errors=True)
    else:
        os.rename(staging, state_path)


def merge_batch_into_state(
    spark: SparkSession,
    batch_df,
    state_path: str,
    keys: list[str],
    val_col: str,
) -> None:
    """Fold one batch into the parquet state table (stage-and-swap)."""
    _recover_state(state_path)
    batch_state = inc.partial_state(batch_df, keys, val_col)
    if os.path.exists(state_path):
        old = spark.read.parquet(state_path)
        merged = inc.merge_states(old, batch_state, keys)
    else:
        merged = batch_state
    _swap_state(merged, state_path)


def incremental_agg_stream_job(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    keys: list[str],
    val_col: str,
    trigger_seconds: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """File-source NDJSON stream -> per-batch partial state ->
    merge into the parquet state table.

    ``trigger_seconds=None`` runs availableNow (drain-and-stop backfill);
    a number gives the production cadence. foreachBatch gives exactly-once
    per-batch semantics via the checkpoint: a replayed batch re-merges
    only after a failure BEFORE checkpoint commit, so the merge must be
    idempotent at the job level — rerunning the whole job from scratch
    (fresh state) always converges to the batch recompute.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)

    def _merge(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_batch_into_state(spark, batch_df, state_path, keys, val_col)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def merge_bloom_batch(
    spark: SparkSession,
    batch_df,
    state_path: str,
    key_col: str,
) -> None:
    """Fold one batch's keys into a persistent Bloom filter table.

    Word-wise BIT_OR is associative/commutative/idempotent, so replayed
    batches (foreachBatch at-least-once before checkpoint commit) cannot
    corrupt the state — re-adding a key sets bits that are already set.
    Stage-and-swap for the same can't-overwrite-own-input reason as the
    aggregate state above.
    """
    from ..llm import sketch

    _recover_state(state_path)
    batch_bloom = sketch.bloom_build(batch_df, key_col)
    if os.path.exists(state_path):
        old = spark.read.parquet(state_path)
        merged = sketch.bloom_merge(old, batch_bloom)
    else:
        merged = batch_bloom
    _swap_state(merged, state_path)


def bloom_stream_job(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    key_col: str,
    trigger_seconds: int | None = None,
):
    """Streaming membership-sketch maintenance: an NDJSON key stream
    folds into a constant-size parquet Bloom filter any batch job can
    read mid-stream for pre-join pruning (`sketch.bloom_probe`).

    The state is O(BLOOM_BITS) forever — unlike a streaming distinct
    store there is nothing to evict, which is exactly the trade a
    dedup-hint sketch wants at 100 TB: no watermark, no state growth,
    false positives only.
    """
    stream = spark.readStream.schema(schema).json(source_dir)

    def _merge(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_bloom_batch(spark, batch_df, state_path, key_col)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def merge_hll_batch(
    spark: SparkSession,
    batch_df,
    state_path: str,
    group_col: str,
    key_col: str,
) -> None:
    """Fold one batch's keys into a persistent per-group HyperLogLog
    register table (the portable exact-integer form, llm/sketch.py —
    not the opaque binary of ops/incremental's hll_sketch_agg state).

    Register-wise MAX is associative/commutative/idempotent, so
    replayed batches (foreachBatch at-least-once before checkpoint
    commit) cannot corrupt the state — re-observing a key re-asserts a
    rho the register already holds. Same stage-and-swap + crash-window
    recovery as the Bloom state."""
    from ..llm import sketch

    _recover_state(state_path)
    batch_regs = sketch.hll_registers(batch_df, group_col, key_col)
    if os.path.exists(state_path):
        old = spark.read.parquet(state_path)
        merged = sketch.hll_merge(old, batch_regs, group_col)
    else:
        merged = batch_regs
    _swap_state(merged, state_path)


def hll_stream_job(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    group_col: str,
    key_col: str,
    trigger_seconds: int | None = None,
):
    """Streaming distinct-count maintenance: an NDJSON key stream folds
    into per-group HLL registers any batch job can read mid-stream
    (``sketch.hll_estimate`` for the live cardinality). State is O(m)
    per group forever — the streaming-distinct trade at 100 TB: no
    watermark, no per-key state growth, ~4.6% standard error."""
    stream = spark.readStream.schema(schema).json(source_dir)

    def _merge(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_hll_batch(spark, batch_df, state_path, group_col, key_col)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


# --- non-idempotent states: exactly-once via an in-state batch marker -------
#
# Bloom (BIT_OR) and HLL (MAX) merges are idempotent, so foreachBatch's
# at-least-once replay cannot corrupt them. A Count-Min (or any
# sum-like) state is NOT: a batch replayed after a crash between the
# state swap and the checkpoint commit would DOUBLE-COUNT. The fix must
# be atomic with the state publish, so the last-merged batch id rides
# INSIDE the staged state directory (underscore-prefixed: parquet
# readers ignore it) and becomes visible in the same rename that
# publishes the rows. On replay, a batch id <= the marker is a no-op.

_META_NAME = "_merged_meta.json"


def _last_merged_batch(state_path: str) -> int:
    import json as _json

    meta = os.path.join(state_path, _META_NAME)
    if not os.path.exists(meta):
        return -1
    with open(meta) as fh:
        return int(_json.load(fh)["batch_id"])


def _swap_state_with_marker(merged, state_path: str, batch_id: int) -> None:
    """_swap_state, but the staged dir carries the batch marker BEFORE
    the publishing rename — marker and rows are one atomic unit (a
    marker written before the swap loses data on crash; written after,
    it double-merges — both orderings are wrong, atomicity is the only
    correct shape)."""
    import json as _json

    staging = f"{state_path}__stage_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, _META_NAME), "w") as fh:
        _json.dump({"batch_id": int(batch_id)}, fh)
    backup = f"{state_path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(state_path):
        os.rename(state_path, backup)
        os.rename(staging, state_path)
        shutil.rmtree(backup, ignore_errors=True)
    else:
        os.rename(staging, state_path)


def merge_cms_batch(
    spark: SparkSession,
    batch_df,
    state_path: str,
    batch_id: int,
    token_col: str = "token",
) -> None:
    """Fold one batch's tokens into a persistent Count-Min grid with
    the exactly-once batch marker (cellwise SUM double-counts on
    replay; see the section comment)."""
    from ..llm import sketch

    _recover_state(state_path)
    if batch_id <= _last_merged_batch(state_path):
        return  # replayed batch: already folded into the published state
    batch_grid = sketch.cms_build(batch_df, token_col)
    if os.path.exists(state_path):
        old = spark.read.parquet(state_path)
        merged = sketch.cms_merge(old, batch_grid)
    else:
        merged = batch_grid
    _swap_state_with_marker(merged, state_path, batch_id)


def cms_stream_job(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    token_col: str = "token",
    trigger_seconds: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Streaming heavy-hitter sketch maintenance: an NDJSON token
    stream folds into a constant-size Count-Min grid readable by any
    batch job mid-stream (``sketch.cms_estimate``). Unlike the
    Bloom/HLL jobs the merge is a SUM, so replay safety comes from the
    in-state batch marker, not algebraic idempotency."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)

    def _merge(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_cms_batch(spark, batch_df, state_path, batch_id, token_col)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


# ---------------------------------------------------------------------------
# Streaming association-rule state (Apriori counts over an order stream)
# ---------------------------------------------------------------------------
#
# State = three parquet tables under one root: per-item basket counts,
# per-pair co-occurrence counts, and the basket total. All merges are
# SUMs, so — like the Count-Min job and unlike Bloom/HLL — replay safety
# comes from the atomic in-state batch marker, not algebraic idempotency.
#
# Correctness contract: each micro-batch must contain COMPLETE baskets
# (an order's lines never split across batches) — the natural shape when
# the upstream emits whole orders; a line-level firehose would need a
# sessionizing stage first. Pair counting within a batch is the same
# bounded self-join as ops.basket.association_rules.


def _assoc_counts(batch_df, basket_col: str, item_col: str):
    b = batch_df.select(
        F.col(basket_col).alias("_o"), F.col(item_col).alias("_i")
    ).distinct()
    items = b.groupBy(F.col("_i").alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    # Shared pair stage (ops.basket.basket_pairs). No per-batch Apriori
    # prune here: co-counts accumulate across batches, so an item below
    # support in THIS batch can still reach pair support later — pruning
    # is only sound at read time (rules_from_assoc_state filters there).
    pairs = basket_ops.basket_pairs(
        b, basket_col="_o", item_col="_i"
    ).withColumn("co", F.col("co").cast("long"))
    n = b.select(F.countDistinct("_o").cast("long").alias("n_baskets"))
    return items, pairs, n


def merge_assoc_batch(
    spark: SparkSession,
    batch_df,
    state_path: str,
    batch_id: int,
    basket_col: str = "o",
    item_col: str = "item",
) -> None:
    """Fold one order-complete batch into the persistent Apriori count
    state (item counts + pair co-counts + basket total), exactly-once
    via the atomic in-state batch marker."""
    _recover_state(state_path)
    if batch_id <= _last_merged_batch(state_path):
        return
    items, pairs, n = _assoc_counts(batch_df, basket_col, item_col)
    if os.path.exists(state_path):
        old_i = spark.read.parquet(os.path.join(state_path, "items"))
        old_p = spark.read.parquet(os.path.join(state_path, "pairs"))
        old_n = spark.read.parquet(os.path.join(state_path, "total"))
        items = (
            items.unionByName(old_i)
            .groupBy("item")
            .agg(F.sum("n_orders").cast("long").alias("n_orders"))
        )
        pairs = (
            pairs.unionByName(old_p)
            .groupBy("item_a", "item_b")
            .agg(F.sum("co").cast("long").alias("co"))
        )
        n = n.unionByName(old_n).agg(
            F.sum("n_baskets").cast("long").alias("n_baskets")
        )
    import json as _json

    staging = f"{state_path}__stage_{uuid.uuid4().hex[:8]}"
    items.write.mode("overwrite").parquet(os.path.join(staging, "items"))
    pairs.write.mode("overwrite").parquet(os.path.join(staging, "pairs"))
    n.write.mode("overwrite").parquet(os.path.join(staging, "total"))
    with open(os.path.join(staging, _META_NAME), "w") as fh:
        _json.dump({"batch_id": int(batch_id)}, fh)
    backup = f"{state_path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(state_path):
        os.rename(state_path, backup)
        os.rename(staging, state_path)
        shutil.rmtree(backup, ignore_errors=True)
    else:
        os.rename(staging, state_path)


def assoc_rules_from_state(
    spark: SparkSession,
    state_path: str,
    min_support: int = 2,
    min_conf_ppm: int = 0,
):
    """Derive the directed rule set from the maintained counts — the
    read side any batch job can run mid-stream. Same arithmetic as
    ops.basket.association_rules, so state-derived rules equal the
    one-shot batch rules on the union of all streamed baskets
    (e2e-tested)."""
    items = spark.read.parquet(os.path.join(state_path, "items"))
    pairs = spark.read.parquet(os.path.join(state_path, "pairs"))
    n = spark.read.parquet(os.path.join(state_path, "total"))
    co = pairs.filter(F.col("co") >= min_support)
    directed = co.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "co",
    ).unionByName(
        co.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "co",
        )
    )
    na = items.select(
        F.col("item").alias("antecedent"), F.col("n_orders").alias("n_antecedent")
    )
    nc = items.select(
        F.col("item").alias("consequent"), F.col("n_orders").alias("n_consequent")
    )
    out = (
        directed.join(na, "antecedent")
        .join(nc, "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("co").cast("long").alias("support_cnt"),
            F.col("n_antecedent").cast("long").alias("n_antecedent"),
            F.col("n_consequent").cast("long").alias("n_consequent"),
            F.col("n_baskets").cast("long").alias("n_baskets"),
            F.expr(CONF_PPM_EXPR).cast("long").alias("conf_ppm"),
            F.expr(LIFT_PPM_EXPR).cast("long").alias("lift_ppm"),
        )
    )
    return out.filter(F.col("conf_ppm") >= min_conf_ppm)


def assoc_stream_job(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    basket_col: str = "o",
    item_col: str = "item",
    trigger_seconds: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Streaming market-basket maintenance: an NDJSON order-lines stream
    (order-complete batches) folds into Apriori count state; rules are
    derivable mid-stream by ``assoc_rules_from_state``."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)

    def _merge(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_assoc_batch(spark, batch_df, state_path, batch_id, basket_col, item_col)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


# ---------------------------------------------------------------------------
# Streaming n-gram novelty (score-then-fold Bloom maintenance)
# ---------------------------------------------------------------------------


def merge_novelty_batch(
    spark: SparkSession,
    batch_df,
    batch_id: int,
    state_path: str,
    scores_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Score one document batch against the PRE-batch shingle Bloom
    state, then fold the batch's shingles in — the continuous-ingest
    novelty ranker (llm.dedup.novelty_against_bloom) as an incremental
    job.

    Exactly-once discipline (the CMS marker pattern, extended to a
    two-output step): scores for batch b land at scores_path/batch=b
    with mode=overwrite BEFORE the state merge commits its marker.
    Replay after a crash BEFORE the state swap re-scores against the
    unchanged pre-batch state (same values — overwrite is idempotent);
    replay AFTER the swap sees marker >= batch_id and skips both
    outputs (the scores were already written pre-merge). Either crash
    side lands in the same final state.

    Granularity note: duplicates WITHIN one micro-batch score as novel
    (the filter folds between batches, not between rows) — per-batch
    novelty granularity, documented contract.
    """
    from ..llm import dedup, sketch

    _recover_state(state_path)
    if batch_id <= _last_merged_batch(state_path):
        return  # replayed batch: scores written and state folded already
    nn = batch_df.filter(F.col(text_col).isNotNull())
    if os.path.exists(state_path):
        bloom = spark.read.parquet(state_path)
    else:
        bloom = spark.createDataFrame([], "word_idx LONG, word LONG")
    scores = dedup.novelty_against_bloom(nn, bloom, text_col, id_col)
    scores.write.mode("overwrite").parquet(
        os.path.join(scores_path, f"batch={int(batch_id)}")
    )
    batch_sh = dedup.doc_shingle_rows(nn, text_col, id_col).select("shingle")
    batch_bloom = sketch.bloom_build(batch_sh, "shingle")
    if os.path.exists(state_path):
        merged = sketch.bloom_merge(bloom, batch_bloom)
    else:
        merged = batch_bloom
    _swap_state_with_marker(merged, state_path, batch_id)


def novelty_stream_job(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    scores_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_seconds: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Streaming novelty scoring over an NDJSON document stream: each
    micro-batch is ranked against everything ingested before it, at
    constant state size (one Bloom word table, no shingle index, no
    watermark, nothing to evict)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)

    def _merge(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_novelty_batch(
            spark, batch_df, batch_id, state_path, scores_path, id_col, text_col
        )

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


# ---------------------------------------------------------------------------
# Streaming near-dup index (log-structured MinHash LSH bands + shingles)
# ---------------------------------------------------------------------------


def minhash_index_step(
    spark: SparkSession,
    batch_df,
    batch_id: int,
    index_path: str,
    matches_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of continuous-ingest near-dup detection: probe
    the batch against every PRIOR batch's index partitions, emit the
    matches, then append this batch's band + shingle rows as new
    partitions.

    Exactly-once by construction, no marker needed: all three writes
    land at batch=<id> partition dirs with mode=overwrite (idempotent),
    and the probe reads only partitions with batch < batch_id — a
    replayed batch can never see its own half-written state, and
    partition pruning keeps the read from touching anything newer.
    This is the log-structured-index shape: appends are new immutable
    partitions; compaction is an offline concern.
    """
    from ..llm import dedup

    bands_dir = os.path.join(index_path, "bands")
    sh_dir = os.path.join(index_path, "shingles")
    if os.path.exists(bands_dir):
        ib = spark.read.parquet(bands_dir).filter(
            F.col("batch") < batch_id
        ).select("index_id", "band_idx", "band_key")
        ish = spark.read.parquet(sh_dir).filter(
            F.col("batch") < batch_id
        ).select("index_id", "n_sh", "h")
        matches = dedup.probe_minhash_index(
            batch_df, ib, ish, text_col=text_col, id_col=id_col
        )
    else:
        matches = spark.createDataFrame(
            [],
            "batch_id LONG, index_id LONG, n_common LONG, n_batch LONG, "
            "n_index LONG, jaccard DOUBLE",
        )
    matches.write.mode("overwrite").parquet(
        os.path.join(matches_path, f"batch={int(batch_id)}")
    )
    dedup.minhash_banded_rows(batch_df, "index_id", text_col, id_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(bands_dir, f"batch={int(batch_id)}"))
    dedup._doc_shingle_hashes(batch_df, text_col, id_col, 3).select(
        F.col(id_col).alias("index_id"), "n_sh", "h"
    ).write.mode("overwrite").parquet(os.path.join(sh_dir, f"batch={int(batch_id)}"))


def minhash_index_stream_job(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    matches_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_seconds: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Streaming sibling of the gated minhash_index_probe: an NDJSON
    document stream maintains a persistent LSH band + shingle index and
    every micro-batch is deduplicated against everything ingested
    before it — the crawl-refresh shape where re-deduplicating the full
    corpus per arrival is a non-starter."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)

    def _step(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        minhash_index_step(
            spark, batch_df, batch_id, index_path, matches_path, id_col, text_col
        )

    writer = stream.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def compact_minhash_index(
    spark: SparkSession, index_path: str, upto_batch: int
) -> None:
    """Compact the log-structured near-dup index: fold every partition
    with batch <= upto_batch into a single batch=upto_batch partition
    (bands and shingles alike), staged-and-swapped per table so a crash
    mid-compaction leaves the granular partitions intact.

    Contract: ``upto_batch`` must be STRICTLY BELOW the stream's last
    checkpoint-committed batch — a replay of batch b re-probes
    partitions with batch < b, which after compaction only exist in
    granular form for b > upto_batch. (Streaming replays only ever
    target the last uncommitted batch, so compacting up to the previous
    trigger's batch is always safe.) Probe semantics are unchanged: the
    compacted partition keeps the HIGHEST folded batch id, so any
    future batch N > upto_batch still reads it via batch < N.
    """
    for sub in ("bands", "shingles"):
        root = os.path.join(index_path, sub)
        if not os.path.exists(root):
            continue
        old_parts = [
            d
            for d in os.listdir(root)
            if d.startswith("batch=") and int(d.split("=", 1)[1]) <= upto_batch
        ]
        if len(old_parts) <= 1:
            continue
        newer = [
            d
            for d in os.listdir(root)
            if d.startswith("batch=") and int(d.split("=", 1)[1]) > upto_batch
        ]
        merged = spark.read.parquet(
            *[os.path.join(root, d) for d in old_parts]
        )
        # whole-root stage-and-swap: a delete-then-rename of partition
        # dirs has a window where the granular partitions are gone and
        # the compacted one not yet named — a crash there loses the
        # index. Staging the FULL new root (compacted partition + file
        # copies of the newer ones) and swapping via rename keeps every
        # crash point recoverable, the sinks.py discipline.
        staging = f"{root}__compact_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(
            os.path.join(staging, f"batch={int(upto_batch)}")
        )
        for d in newer:
            shutil.copytree(os.path.join(root, d), os.path.join(staging, d))
        backup = f"{root}__old_{uuid.uuid4().hex[:8]}"
        os.rename(root, backup)
        os.rename(staging, root)
        shutil.rmtree(backup, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming quality gate (frozen classifier + repetition gate per batch)
# ---------------------------------------------------------------------------


def quality_gate_step(
    spark: SparkSession,
    batch_df,
    batch_id: int,
    weights: list[int],
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Score one document micro-batch with a FROZEN quality model: the
    trained logreg's fixed-point sigmoid (llm.classifier.predict, the
    shuffle-free plan-constant form) plus the Gopher repetition gate
    (llm.text.repetition_profile), admit = classifier-positive AND
    repetition-pass — the production deployment shape of the batch
    quality filters (model trained offline, applied to the firehose).

    Stateless, so exactly-once needs no marker: the batch's rows land
    at out_path/batch=<id> with mode=overwrite — a replayed batch
    recomputes the identical values (the model is frozen and both
    operators are deterministic) and overwrites idempotently.
    """
    from ..llm import classifier, text

    nn = batch_df.filter(F.col(text_col).isNotNull())
    scored = classifier.predict(nn, weights, None, id_col, text_col)
    rep = text.repetition_profile(nn, text_col, id_col)
    out = scored.join(rep, id_col).select(
        id_col,
        "p_scaled",
        "pred",
        "top2gram_ppm",
        "top3gram_ppm",
        "dup5gram_ppm",
        "rep_pass",
        ((F.col("pred") == 1) & F.col("rep_pass")).alias("admit"),
    )
    out.write.mode("overwrite").parquet(
        os.path.join(out_path, f"batch={int(batch_id)}")
    )


def quality_gate_stream_job(
    spark: SparkSession,
    source_dir: str,
    weights: list[int],
    out_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_seconds: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Continuous quality gating over an NDJSON document stream with a
    frozen offline-trained model (see quality_gate_step)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)

    def _step(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        quality_gate_step(
            spark, batch_df, batch_id, weights, out_path, id_col, text_col
        )

    writer = stream.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


# --- Streaming SRM monitor -----------------------------------------------------


def srm_monitor_step(
    spark: SparkSession,
    batch_df,
    batch_id: int,
    state_path: str,
    out_path: str,
) -> None:
    """Fold one micro-batch of exposure events into the cumulative
    distinct-(event_type, user_id) unit state and republish the SRM
    table over the WHOLE history so far (ops/behavior.srm_stats — the
    exact computation the batch gate query runs, so streamed values ==
    batch values by construction).

    State = the distinct unit set itself: SRM counts units, and
    exactly-once unit counting across redelivered batches needs set
    semantics, not a counter (a replayed batch re-unions the same
    pairs — idempotent). O(units) state like the Bloom/novelty jobs;
    at 100 TB partition the state by a user-hash prefix and rewrite
    only touched partitions (module header). The emitted SRM table is
    a full overwrite per batch — it is a REPORT over state, not an
    append stream, so replay is idempotent by construction.
    """
    _recover_state(state_path)
    new_units = batch_df.select("event_type", "user_id").distinct()
    if os.path.exists(state_path):
        merged = (
            spark.read.parquet(state_path)
            .unionByName(new_units)
            .distinct()
        )
    else:
        merged = new_units
    _swap_state(merged, state_path)
    from ..ops.behavior import srm_stats

    srm_stats(spark.read.parquet(state_path)).write.mode("overwrite").parquet(
        out_path
    )


def srm_monitor_stream_job(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    out_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    trigger_seconds: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Continuous sample-ratio-mismatch monitoring over an NDJSON
    exposure stream: the assignment health gate, live — an experiment
    whose split drifts mid-flight alarms at the batch it drifts in,
    not at readout time (see srm_monitor_step)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)

    def _step(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        srm_monitor_step(spark, batch_df, batch_id, state_path, out_path)

    writer = stream.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def benford_monitor_step(
    spark: SparkSession,
    batch_df,
    batch_id: int,
    state_path: str,
    out_path: str,
) -> None:
    """Fold one micro-batch of transaction amounts into the cumulative
    first-digit counts and republish the Benford audit table over the
    WHOLE history (ops/behavior.benford_stats_from_counts — the exact
    kernel the batch gate query runs, so streamed values == batch
    values by construction).

    State = per-batch digit counts in a ``batch=N`` subdirectory
    (log-structured immutable batch partitions, the dedup-index
    pattern): a REPLAYED batch overwrites ITS OWN partition with the
    same counts — exactly-once by construction without set semantics
    (digit counts are sums, so a counter state would double-count on
    redelivery). The audit table is a full overwrite per batch — a
    report over state, idempotent under replay."""
    from ..ops.behavior import benford_digit_counts, benford_stats_from_counts

    counts = benford_digit_counts(
        batch_df.select(F.col("amt").cast("long").alias("amt")), "amt"
    )
    counts.write.mode("overwrite").parquet(f"{state_path}/batch={batch_id}")
    all_counts = spark.read.option("basePath", state_path).parquet(
        f"{state_path}/batch=*"
    )
    benford_stats_from_counts(all_counts.select("digit", "n_obs")).write.mode(
        "overwrite"
    ).parquet(out_path)


def benford_monitor_stream_job(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    out_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    trigger_seconds: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Continuous Benford first-digit monitoring over an NDJSON amount
    stream — the fraud/data-quality screen, live: a feed that starts
    emitting fabricated or unit-mangled amounts shifts the digit
    distribution at the batch it happens, not at month-end audit
    (see benford_monitor_step)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)

    def _step(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        benford_monitor_step(spark, batch_df, batch_id, state_path, out_path)

    writer = stream.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")
