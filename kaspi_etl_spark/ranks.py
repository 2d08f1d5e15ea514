"""Distributed prefix ranks — the shared machinery that replaces every
single-partition global-order window in the engine.

A ``Window.orderBy(...)`` with no ``partitionBy`` funnels its whole input
through ONE task ("No Partition Defined for Window operation" — Spark's
own warning).  Fine over a bounded frame (a 41-row ladder, a 1024-bucket
grid); fatal over anything that grows with the data.  Every function
here computes the same values as the global window with a two-phase
plan that stays shuffle-parallel at any scale:

  1. bucket rows by a deterministic, order-aligned bucket key,
  2. one map-side-combined groupBy to per-bucket totals (bounded table),
  3. exclusive running offset across buckets (a window over the bounded
     bucket table — metadata-sized, single partition is fine there),
  4. broadcast the offsets back and rank WITHIN each bucket
     (``partitionBy(bucket)`` — parallel); global position =
     bucket offset + intra-bucket position.

Three bucket keys cover every ordering the engine needs:

- ``hash_order_prefix``: order IS a hash order ``(md5(id), id)`` — the
  top hash bits are the bucket, uniform by construction.  This is the
  generalization of the token-budget sampler's prefix sum
  (llm/text.py:_hash_order_running_tokens) to an arbitrary weight
  column.
- ``binned_prefix_sum``: order is a numeric key with DISTINCT values
  per row (a groupBy output) — fixed-width value bins between the
  global min/max.  Bin width only affects balance, never correctness
  (``(key - lo) div w`` is monotone for any positive ``w``).
- ``total_order_row_number``: order is a numeric key WITH heavy ties,
  broken by a hash of the row id — bucket on (value, top hash bits),
  so a million-row tie group still spreads over 2^hash_bits parallel
  sub-buckets.  This is why the engine's rank tiebreaks are hash-of-id
  rather than raw id: a hash tiebreak is just as deterministic and
  mirrorable (the shared md5 kernel), but it makes tie groups
  shardable.

Reference parity: the reference engine ranks in pandas on hundreds of
rows (e.g. dashboard.py's sort-then-cumsum patterns); these are the
100 TB-safe equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .llm.dedup import md5_long

__all__ = [
    "hash_order_prefix",
    "binned_prefix_sum",
    "total_order_row_number",
    "ntile_from_row_number",
]


def hash_order_prefix(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    salt: str = "rnk",
    bucket_bits: int = 16,
    out_col: str = "cum",
) -> DataFrame:
    """Inclusive running sum of ``weight_col`` in ``(md5(id||salt), id)``
    order, computed without a global-order window.

    Returns the input columns plus ``_pri`` (the 60-bit order hash) and
    ``out_col`` (BIGINT inclusive prefix sum).  ``out_col - weight`` is
    the exclusive offset; with ``weight = 1`` the prefix is a 1-based
    row_number over the hash order.

    The bucket is the top ``bucket_bits`` bits of the hash, so bucket
    order == hash order and buckets are uniform regardless of the id
    distribution.  Phase 2's cross-bucket window runs over at most
    2^bucket_bits rows — metadata next to the data.
    """
    d = df.withColumn("_pri", md5_long(F.col(id_col).cast("string"), salt=salt))
    d = d.withColumn("_bucket", F.shiftright(F.col("_pri"), 60 - bucket_bits))
    bucket_sums = d.groupBy("_bucket").agg(F.sum(weight_col).alias("_bsum"))
    offsets = bucket_sums.select(
        "_bucket",
        F.coalesce(
            F.sum("_bsum").over(
                Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    intra = Window.partitionBy("_bucket").orderBy("_pri", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            out_col,
            (F.col("_offset") + F.sum(weight_col).over(intra)).cast("long"),
        )
        .drop("_bucket", "_offset")
    )


def _value_bin(key: Column, lo: Column, hi: Column, n_bins: int) -> Column:
    """Monotone fixed-width bin of ``key`` in [lo, hi].  Width is computed
    through a double (precision loss only shifts bin EDGES — the mapping
    ``(key - lo) div w`` stays monotone for any positive integer ``w``,
    which is all correctness needs; balance assumes the key isn't
    pathologically clustered, the documented trade)."""
    w = F.greatest(
        F.lit(1).cast("long"),
        ((hi - lo).cast("double") / F.lit(float(n_bins))).cast("long"),
    )
    return ((key - lo).cast("long") / w).cast("long")


def binned_prefix_sum(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    out_col: str = "cum",
    n_bins: int = 1024,
) -> DataFrame:
    """Inclusive running sum of ``weight_col`` over rows ordered by the
    numeric ``key_col`` ASC, for inputs whose key values are DISTINCT
    per row (a groupBy-on-key output — the caller's contract; ties
    would make the order, and therefore the prefix, ill-defined).

    Buckets are fixed-width value bins between the global min/max (one
    scalar aggregate, broadcast back).  Exactly equivalent to
    ``sum(weight) over (order by key rows unbounded preceding)`` at any
    partitioning; the cross-bin window sees at most ``n_bins`` rows.
    """
    mm = df.agg(
        F.min(key_col).cast("long").alias("_lo"),
        F.max(key_col).cast("long").alias("_hi"),
    )
    d = df.join(F.broadcast(mm)).withColumn(
        "_bucket", _value_bin(F.col(key_col), F.col("_lo"), F.col("_hi"), n_bins)
    )
    bucket_sums = d.groupBy("_bucket").agg(F.sum(weight_col).alias("_bsum"))
    offsets = bucket_sums.select(
        "_bucket",
        F.coalesce(
            F.sum("_bsum").over(
                Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    intra = Window.partitionBy("_bucket").orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            out_col,
            (F.col("_offset") + F.sum(weight_col).over(intra)).cast("long"),
        )
        .drop("_bucket", "_offset", "_lo", "_hi")
    )


def total_order_row_number(
    df: DataFrame,
    value_col: str,
    id_col: str,
    out_col: str = "rn",
    salt: str = "rnk",
    hash_bits: int = 6,
    n_bins: int = 1024,
) -> DataFrame:
    """Exact 1-based global row_number over the total order
    ``(value ASC, md5(id||salt) ASC, id ASC)`` — the tie-safe form: a
    value shared by millions of rows (every customer with one order)
    still ranks in parallel because ties shard across 2^hash_bits
    sub-buckets by their tiebreak hash.

    Plan: groupBy (value, hash-sub-bucket) to a bounded-ish counts
    table; rank THAT table with the binned prefix (its rows are
    distinct composite keys, packed into one BIGINT — caller contract:
    ``|value| < 2^(62 - hash_bits)``, comfortably true for dates,
    counts, money and fixed-point scores); join the exclusive offsets
    back on the composite key (an equi-join whose shuffle partitioning
    the within-group window then reuses).

    Oracle mirror: ``row_number() over (order by value, md5_long(id),
    id)`` — same md5 kernel DuckDB computes with
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``.

    NULL ids hash as the empty string (mirror:
    ``md5(coalesce(id::VARCHAR, '') || salt)``): a NULL id must still
    receive a rank — md5(NULL) is NULL, which would NULL the composite
    bucket key and silently DROP the row at the offsets equi-join
    (adversarial-sweep finding: the NULL-customer group of an orders
    table with NULL keys lost its RFM row).
    """
    h = md5_long(F.coalesce(F.col(id_col).cast("string"), F.lit("")), salt=salt)
    # NULL values would NULL the composite key and silently drop rows at
    # the offsets equi-join — fail loudly instead (the caller must decide
    # what a NULL sort value means; this primitive cannot)
    checked = F.when(
        F.assert_true(
            F.col(value_col).isNotNull(),
            f"total_order_row_number: {value_col} must be non-NULL "
            "(coalesce a sentinel first)",
        ).isNull(),
        F.col(value_col),
    )
    d = df.withColumn(value_col, checked).withColumn("_h", h).withColumn(
        "_hb", F.shiftright(F.col("_h"), 60 - hash_bits)
    )
    composite = (F.col(value_col).cast("long") * (1 << hash_bits) + F.col("_hb")).alias(
        "_ck"
    )
    groups = d.select(composite).groupBy("_ck").agg(
        F.count(F.lit(1)).cast("long").alias("_gc")
    )
    ranked = binned_prefix_sum(groups, "_ck", "_gc", out_col="_gcum", n_bins=n_bins)
    offsets = ranked.select(
        "_ck", (F.col("_gcum") - F.col("_gc")).alias("_goff")
    )
    d2 = d.withColumn(
        "_ck", F.col(value_col).cast("long") * (1 << hash_bits) + F.col("_hb")
    ).join(offsets, "_ck")
    intra = Window.partitionBy("_ck").orderBy("_h", id_col)
    return (
        d2.withColumn(
            out_col, (F.col("_goff") + F.row_number().over(intra)).cast("long")
        )
        .drop("_ck", "_h", "_hb", "_goff")
    )


def ntile_from_row_number(rn: Column, n: Column, buckets: int) -> Column:
    """Standard SQL NTILE from a 1-based global row_number and the total
    row count: the first ``n % buckets`` tiles get ``n div buckets + 1``
    rows, the rest ``n div buckets`` — exactly the NTILE the oracle's
    engine computes over the same order.  Divisions run through doubles
    (Column ``/``), exact for ``n < 2^53`` — far past any row count a
    rank this cheap would ever see."""
    b = F.lit(buckets).cast("long")
    q = (n / b).cast("long")
    r = n - q * b
    cut = r * (q + 1)
    return (
        F.when(rn <= cut, ((rn - 1) / (q + 1)).cast("long") + 1)
        .otherwise(r + ((rn - cut - 1) / q).cast("long") + 1)
        .cast("long")
    )
