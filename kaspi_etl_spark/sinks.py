"""Physical sinks (SURVEY.md 2.1 S7-S9) with the 100 TB partitioning plan.

Reference semantics:
  S7 full-replace table (df.to_sql if_exists='replace', etl_sales.py:76-78)
  S8 upsert by composite key (delete-then-append, etl_purchases.py:57-64)
  S9 append rows (size_recommendation_engine.py:331-344)

Scale design (SURVEY.md 4): fact tables are date-partitioned so rewrites
touch only affected partitions (dynamic partition overwrite), and join
tables are bucketed on their join key so the J1/J2 joins co-locate
without a shuffle. The upsert stages to a sibling directory and swaps —
reading and overwriting the same parquet path in one job is not safe.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops.purchases import upsert as upsert_transform


def overwrite_table(df: DataFrame, path: str) -> None:
    """S7: full replace."""
    df.write.mode("overwrite").parquet(path)


def append_rows(df: DataFrame, path: str) -> None:
    """S9: append."""
    df.write.mode("append").parquet(path)


def write_date_partitioned(df: DataFrame, path: str, date_col: str = "order_date") -> None:
    """Date-partitioned fact write with dynamic partition overwrite: only
    partitions present in ``df`` are replaced, so an incremental day-load
    over a 100 TB table rewrites one day, not the table."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(date_col)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, num_buckets: int = 32
) -> None:
    """Bucketed managed table: both sides of a recurring equi-join
    bucketed on the key skip the shuffle entirely (SortMergeJoin reads
    co-located buckets). Drops any stale table/location first — a
    previous session's orphaned warehouse directory would otherwise
    block the managed-table create."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    stale = os.path.join(warehouse, table.lower()) if warehouse else None
    if stale and os.path.exists(stale):
        shutil.rmtree(stale, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def recover_swap(path: str) -> None:
    """Crash recovery for ``publish_swap``: a crash between its two
    renames leaves ``path`` absent with a ``__old_*`` backup on disk —
    rename the backup back (recovery-is-a-rename) and clear debris.
    Call at the top of any read-modify-swap job."""
    import glob

    backups = sorted(glob.glob(glob.escape(path) + "__old_*"))
    if not os.path.exists(path) and backups:
        os.rename(backups[0], path)
        backups = backups[1:]
    for leftover in backups + glob.glob(glob.escape(path) + "__stage_*"):
        shutil.rmtree(leftover, ignore_errors=True)


def publish_swap(df: DataFrame, path: str) -> None:
    """Stage-and-swap publish: write ``df`` to a staging sibling, then
    two renames. A job cannot overwrite its own parquet input, so every
    read-modify-write sink funnels through this."""
    staging = f"{path}__stage_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup, ignore_errors=True)


def upsert_parquet(
    spark: SparkSession, incoming: DataFrame, path: str, keys: list[str]
) -> None:
    """S8: idempotent upsert on a plain-parquet table via stage-and-swap.

    existing ⟕anti incoming ∪ incoming -> staging dir -> atomic-ish swap.
    On Delta/Iceberg this is `MERGE INTO`; plain parquet needs the swap
    because a job cannot overwrite its own input. At scale, partition
    ``path`` by date and upsert per-partition instead of whole-table.
    """
    recover_swap(path)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        merged = upsert_transform(existing, incoming, keys)
    else:
        merged = incoming
    publish_swap(merged, path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target_file_bytes) files via stage-and-swap.
    Returns the new file count.

    100 TB rationale: streaming/incremental sinks (foreachBatch appends,
    micro-batch NDJSON→parquet conversions) accrete thousands of tiny
    files; every downstream scan then pays per-file open/footer costs and
    the scheduler pays per-split overhead. Periodic compaction to
    ~128 MB files restores scan efficiency. Partitioned tables should
    compact per-partition (run this on each partition directory) so the
    rewrite cost tracks the partition, not the table.
    """
    total = sum(
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))
    staging = f"{path}__stage_{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(
        staging
    )
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
    return sum(
        1
        for dirpath, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the columnar alternative to parquet for warehouses
    standardized on ORC (Hive/Tez estates). Same pushdown/pruning story
    as parquet in Spark (vectorized reader, predicate pushdown, column
    pruning); the engine treats the format as a storage detail."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan with native filter pushdown and column pruning."""
    return spark.read.orc(path)


def delete_keys_parquet(
    spark: SparkSession, path: str, keys: DataFrame, key_col: str
) -> int:
    """Retention / right-to-be-forgotten delete: rewrite a parquet table
    WITHOUT the rows whose ``key_col`` appears in ``keys``; returns the
    number of rows removed. The delete list is broadcast (it is small by
    nature — a deletion request batch, not a table) so the anti-join is
    map-side: the full table streams through once with no shuffle, which
    is the only viable shape when the table is 100 TB and the delete
    list is thousands of keys. Stage-and-swap like upsert_parquet —
    a job cannot overwrite its own input. On Delta/Iceberg this is
    ``DELETE WHERE`` + vacuum; plain parquet needs the rewrite.
    """
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql.functions import broadcast

    existing = spark.read.parquet(path)
    before = existing.count()
    kept = existing.join(
        broadcast(keys.select(key_col).distinct()), key_col, "left_anti"
    )
    staging = f"{path}__stage_{uuid.uuid4().hex[:8]}"
    kept.write.mode("overwrite").parquet(staging)
    after = spark.read.parquet(staging).count()
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
    return before - after


def write_token_shards(
    docs: DataFrame,
    path: str,
    shard_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Training-shard writer: assign every doc a token-balanced shard id
    (``llm.text.token_shard_assignment`` — hash-ordered distributed prefix
    sum, each shard within one document of ``shard_tokens``) and write one
    output partition per shard. ``repartition(shard_id)`` makes the files
    line up 1:1 with shards, so a downstream trainer streams
    shard_id=K/part-*.parquet as one ~fixed-token unit."""
    from .llm.text import token_shard_assignment

    shards = token_shard_assignment(
        docs, shard_tokens, text_col=text_col, id_col=id_col
    ).select(id_col, "shard_id")
    out = docs.join(shards, id_col).repartition("shard_id")
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard_id")
        .parquet(path)
    )


def write_packed_sequences(
    docs: DataFrame,
    path: str,
    seq_len: int,
    seqs_per_file: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Packed-sequence writer: materialize ``llm.text.pack_sequences``
    spans with each span's OWN slice of the document text, bucketed so
    each output partition holds ``seqs_per_file`` complete training
    sequences (partitioning per individual sequence would drown the
    filesystem in tiny files). A trainer streams seq_bucket=K and sorts
    rows by (seq_id, seq_offset) — cheap: a bucket is seqs_per_file *
    seq_len tokens — concatenating span_text values verbatim.
    """
    from .llm.text import pack_sequences

    spans = pack_sequences(docs, seq_len, text_col=text_col, id_col=id_col)
    # slice each span's OWN tokens out of the doc text at write time: a
    # long doc touching many sequences must not duplicate its full text
    # into every span row (that write amplification is quadratic in doc
    # length). slice() on the split array is codegen'd, not a HOF lambda.
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    span_text = F.concat_ws(
        " ",
        F.slice(toks, (F.col("doc_offset") + 1).cast("int"), F.col("n_in_seq").cast("int")),
    )
    out = (
        spans.join(docs.select(id_col, text_col), id_col)
        .withColumn("span_text", span_text)
        .drop(text_col)
        # integer DIV, per the repo's discipline (token_shard_assignment,
        # pack_sequences): float division is exact only below 2^53
        # sequences and truncates rather than floors
        .withColumn("seq_bucket", F.expr(f"seq_id div {int(seqs_per_file)}"))
        .repartition("seq_bucket")
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("seq_bucket")
        .parquet(path)
    )


def write_lpt_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Balanced fixed-count training-shard writer: LPT striped
    assignment (``llm.text.lpt_shard_assignment`` — near-equal token
    mass per shard) and one output partition per shard, the
    one-file-tree-per-trainer-rank layout. Counterpart of
    ``write_token_shards`` (contiguous ~budget-sized shards) when the
    shard COUNT is fixed and balance is the goal."""
    from .llm.text import lpt_shard_assignment

    shards = lpt_shard_assignment(
        docs, n_shards, text_col=text_col, id_col=id_col
    ).select(id_col, "shard_id")
    out = docs.join(shards, id_col).repartition("shard_id")
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard_id")
        .parquet(path)
    )
