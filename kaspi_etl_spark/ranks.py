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
    "total_order_prefix_sum",
    "keyed_hash_order_prefix",
    "binned_prefix_sum",
    "keyed_value_order_row_number",
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

    Returns EXACTLY the input columns plus ``out_col`` (BIGINT inclusive
    prefix sum) — internal columns (the order hash, buckets, offsets)
    never leak into the schema, so select-star callers and unions are
    safe.  ``out_col - weight`` is the exclusive offset; with
    ``weight = 1`` the prefix is a 1-based row_number over the hash
    order.

    The bucket is the top ``bucket_bits`` bits of the hash, so bucket
    order == hash order and buckets are uniform regardless of the id
    distribution.  Phase 2's cross-bucket window runs over at most
    2^bucket_bits rows — metadata next to the data.

    NULL ids hash as the empty string (oracle mirror:
    ``md5(coalesce(id::VARCHAR, '') || salt)``): md5(NULL) is NULL,
    which would NULL ``_bucket`` and silently DROP the row at the
    offsets equi-join — the same trap total_order_row_number documents.
    A caller whose semantics exclude NULL ids must filter them
    explicitly (as negative_samples does), mirroring its oracle.
    """
    d = df.withColumn(
        "_pri",
        md5_long(F.coalesce(F.col(id_col).cast("string"), F.lit("")), salt=salt),
    )
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
        .drop("_bucket", "_offset", "_pri")
    )


def keyed_hash_order_prefix(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    id_col: str,
    salt: str = "rnk",
    bucket_bits: int = 16,
    out_col: str = "cum",
) -> DataFrame:
    """Per-key inclusive running sum of ``weight_col`` in
    ``(md5(id||salt), id)`` order WITHIN each ``key_cols`` group — the
    keyed form of :func:`hash_order_prefix`, for the skew profile a real
    pretraining corpus has: ``PARTITION BY source`` with ``source`` a
    low-cardinality metadata key means one dominant source (a web crawl
    at 60-90% of the data) serializes its whole cumulative sum through
    ONE task.  Here the heavy key's rows spread over 2^bucket_bits
    hash sub-buckets that rank in parallel:

      1. sub-bucket by the top hash bits of the order hash,
      2. per-(key, sub-bucket) totals — bounded at
         |keys| * 2^bucket_bits rows,
      3. exclusive offsets via a window partitioned BY KEY over that
         bounded table (<= 2^bucket_bits rows per key partition —
         literal-bounded, never data-sized),
      4. NULL-SAFE join back + intra-(key, sub-bucket) running sum.

    Value-identical to ``sum(w) over (partition by key order by
    md5(id), id rows unbounded preceding)`` at any partitioning.
    NULL ids hash as ''; NULL key values are real groups and survive
    (step 4's join is null-safe).  Returns EXACTLY the input columns
    plus ``out_col`` — schema-consistent with :func:`hash_order_prefix`.
    """
    d = df.withColumn(
        "_pri",
        md5_long(F.coalesce(F.col(id_col).cast("string"), F.lit("")), salt=salt),
    )
    d = d.withColumn("_bucket", F.shiftright(F.col("_pri"), 60 - bucket_bits))
    bucket_sums = d.groupBy(*key_cols, "_bucket").agg(
        F.sum(weight_col).alias("_bsum")
    )
    offsets = bucket_sums.select(
        *key_cols,
        "_bucket",
        F.coalesce(
            F.sum("_bsum").over(
                Window.partitionBy(*key_cols)
                .orderBy("_bucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    # rename the right side wholesale: the null-safe join keeps both
    # sides' key columns, and the intra window below must resolve the
    # LEFT side's unambiguously
    o = offsets.select(
        *[F.col(c).alias(f"_o_{i}") for i, c in enumerate(key_cols)],
        F.col("_bucket").alias("_obucket"),
        "_offset",
    )
    cond = d["_bucket"] == o["_obucket"]
    for i, c in enumerate(key_cols):
        cond = cond & d[c].eqNullSafe(o[f"_o_{i}"])
    joined = d.join(F.broadcast(o), cond)
    intra = (
        Window.partitionBy(*[d[c] for c in key_cols], d["_bucket"])
        .orderBy(d["_pri"], d[id_col])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = [d[c] for c in df.columns]
    return joined.select(
        *keep,
        (F.col("_offset") + F.sum(weight_col).over(intra)).cast("long").alias(out_col),
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


def keyed_value_order_row_number(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    out_col: str = "rn",
    count_col: str = "n_in_key",
    n_bins: int = 1024,
) -> DataFrame:
    """Exact 1-based row_number WITHIN each ``key_cols`` group over the
    order ``order_cols[0] ASC, order_cols[1] ASC, ...`` — the keyed form
    of the two-phase rank, for ``NTILE(k) OVER (PARTITION BY source
    ORDER BY score)`` where ``source`` is low-cardinality metadata and
    one dominant group would otherwise sort through ONE task (NTILE has
    no WindowGroupLimit escape: it needs the full partition).

    ``order_cols[0]`` must be numeric (double is fine) and non-NULL —
    enforced with the same loud ``assert_true`` guard
    :func:`total_order_row_number` uses (a NULL order value would NULL
    ``_bucket`` and silently DROP the row at the offsets equi-join;
    callers must coalesce a sentinel that encodes their NULL ordering,
    as customer_revenue_deciles does for DESC NULLS LAST) —
    it value-bins into ``n_bins`` fixed-width buckets between the GLOBAL
    min/max (one scalar aggregate; a shared range only affects balance,
    never correctness: the bin map is monotone per key too).  Remaining
    order columns are tiebreaks applied inside each (key, bin) window,
    so heavy ties on the binned value are exact but not shardable —
    the documented trade (a hash tiebreak column makes them shardable:
    put it in ``order_cols`` AND bin on it via total_order_row_number's
    composite trick if that profile ever appears).

    Also emits ``count_col`` = the group's total row count (free from
    the same bounded per-(key, bin) table; NTILE needs it).
    Value-identical to ``row_number() over (partition by key order by
    ...)`` + ``count(*) over (partition by key)``.  NULL keys survive
    (null-safe join back).
    """
    v = order_cols[0]
    checked = F.when(
        F.assert_true(
            F.col(v).isNotNull(),
            f"keyed_value_order_row_number: {v} must be non-NULL "
            "(coalesce a sentinel first)",
        ).isNull(),
        F.col(v),
    )
    df = df.withColumn(v, checked)
    mm = df.agg(
        F.min(F.col(v).cast("double")).alias("_lo"),
        F.max(F.col(v).cast("double")).alias("_hi"),
    )
    w = F.greatest(
        F.lit(1e-300),
        (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins)),
    )
    d = (
        df.join(F.broadcast(mm))
        .withColumn(
            "_bucket",
            F.least(
                F.lit(n_bins - 1).cast("long"),
                F.floor((F.col(v).cast("double") - F.col("_lo")) / w).cast("long"),
            ),
        )
        .drop("_lo", "_hi")
    )
    counts = d.groupBy(*key_cols, "_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_bc")
    )
    kw = Window.partitionBy(*key_cols)
    offsets = counts.select(
        *key_cols,
        "_bucket",
        F.coalesce(
            F.sum("_bc").over(
                kw.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_offset"),
        F.sum("_bc")
        .over(kw.orderBy("_bucket").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        ))
        .cast("long")
        .alias("_kn"),
    )
    o = offsets.select(
        *[F.col(c).alias(f"_o_{i}") for i, c in enumerate(key_cols)],
        F.col("_bucket").alias("_obucket"),
        "_offset",
        "_kn",
    )
    cond = d["_bucket"] == o["_obucket"]
    for i, c in enumerate(key_cols):
        cond = cond & d[c].eqNullSafe(o[f"_o_{i}"])
    joined = d.join(F.broadcast(o), cond)
    intra = Window.partitionBy(*[d[c] for c in key_cols], d["_bucket"]).orderBy(
        *[d[c] for c in order_cols]
    )
    keep = [d[c] for c in df.columns]
    return joined.select(
        *keep,
        (F.col("_offset") + F.row_number().over(intra)).cast("long").alias(out_col),
        F.col("_kn").alias(count_col),
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


def total_order_prefix_sum(
    df: DataFrame,
    value_col: str,
    id_col: str,
    weight_col: str,
    out_col: str = "cum",
    salt: str = "rnk",
    hash_bits: int = 6,
    n_bins: int = 1024,
) -> DataFrame:
    """Exact inclusive running sum of ``weight_col`` over the total
    order ``(value ASC, md5(id||salt) ASC, id ASC)`` — the prefix-SUM
    sibling of :func:`total_order_row_number` (same composite
    (value, hash-sub-bucket) sharding, so million-row tie groups still
    accumulate in parallel). The Pareto/ABC kernel: rank entities by a
    measure and read each row's cumulative share without a
    single-partition global window.

    Same contracts as total_order_row_number: ``value_col`` non-NULL
    (loud assert), ``|value| < 2^(62 - hash_bits)``, NULL ids hash as
    ''.  ``weight_col`` must be BIGINT-safe under summation.

    Oracle mirror: ``sum(w) over (order by value, md5_long(id), id
    rows unbounded preceding)``.
    """
    h = md5_long(F.coalesce(F.col(id_col).cast("string"), F.lit("")), salt=salt)
    checked = F.when(
        F.assert_true(
            F.col(value_col).isNotNull(),
            f"total_order_prefix_sum: {value_col} must be non-NULL "
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
    groups = d.select(composite, weight_col).groupBy("_ck").agg(
        F.sum(weight_col).cast("long").alias("_gw")
    )
    ranked = binned_prefix_sum(groups, "_ck", "_gw", out_col="_gcum", n_bins=n_bins)
    offsets = ranked.select("_ck", (F.col("_gcum") - F.col("_gw")).alias("_goff"))
    d2 = d.withColumn(
        "_ck", F.col(value_col).cast("long") * (1 << hash_bits) + F.col("_hb")
    ).join(offsets, "_ck")
    intra = Window.partitionBy("_ck").orderBy("_h", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d2.withColumn(
            out_col,
            (F.col("_goff") + F.sum(weight_col).over(intra)).cast("long"),
        )
        .drop("_ck", "_h", "_hb", "_goff")
    )
