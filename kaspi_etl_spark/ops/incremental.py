"""Incremental aggregate maintenance — re-aggregatable state merge.

The 100 TB incremental-ETL pattern: a nightly (or per-micro-batch) job
must NOT rescan the full history to refresh an aggregate table. Instead
the aggregate is kept as a mergeable STATE (count / sum / min / max are
all re-aggregatable: merge(state_a, state_b) = state of the union), and
each new batch contributes its partial state through a key-partitioned
merge — cost proportional to the batch, not the history.

This is exactly the map-side-partial / reduce-merge split Spark's own
HashAggregate performs within one query, lifted to cross-job persistence.
AVG is intentionally stored as (count, sum) and finalized at read time —
storing a finished average makes the state non-mergeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n_rows", "sum_val", "min_val", "max_val")


def partial_state(df: DataFrame, keys: list[str], val_col: str) -> DataFrame:
    """Per-key mergeable aggregate state of one batch. ``val_col`` must be
    integral (exact, order-independent sums — the oracle-parity rule)."""
    return df.groupBy(*keys).agg(
        F.count(val_col).cast("long").alias("n_rows"),
        F.sum(val_col).cast("long").alias("sum_val"),
        F.min(val_col).alias("min_val"),
        F.max(val_col).alias("max_val"),
    )


def merge_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two aggregate states: the state of the concatenated inputs.
    Associative + commutative, so arbitrary batch orders converge."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("sum_val").cast("long").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def finalize(state: DataFrame) -> DataFrame:
    """Read-time finishers over the mergeable state (avg here; any
    sum/count-derived statistic follows the same pattern)."""
    return state.withColumn(
        "avg_val",
        F.when(
            F.col("n_rows") > 0,
            F.col("sum_val").cast("double") / F.col("n_rows").cast("double"),
        ),
    )


# --- Sketch-extended state: approximate distinct counts that merge ----------
#
# COUNT(DISTINCT x) is NOT re-aggregatable — merging two distinct counts
# double-counts the overlap. The mergeable form is a Datasketches HLL
# sketch column (Spark: hll_sketch_agg / hll_union_agg /
# hll_sketch_estimate): ~1.5 KB of state per key at lg_k=12 for ~2%
# relative error, unionable across batches, partitions, and jobs. This is
# the 100 TB answer to "distinct users per day over a year of history"
# without ever rescanning the year.

HLL_LG_K = 12


def partial_state_sketch(
    df: DataFrame, keys: list[str], val_col: str, distinct_col: str
) -> DataFrame:
    """``partial_state`` plus an HLL sketch of ``distinct_col``."""
    return df.groupBy(*keys).agg(
        F.count(val_col).cast("long").alias("n_rows"),
        F.sum(val_col).cast("long").alias("sum_val"),
        F.min(val_col).alias("min_val"),
        F.max(val_col).alias("max_val"),
        F.hll_sketch_agg(distinct_col, HLL_LG_K).alias("distinct_sketch"),
    )


def merge_states_sketch(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge sketch-extended states: scalar state merges as in
    ``merge_states``; sketches merge by HLL union."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("sum_val").cast("long").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
            F.hll_union_agg("distinct_sketch").alias("distinct_sketch"),
        )
    )


def finalize_sketch(state: DataFrame) -> DataFrame:
    """Finalize scalar stats and resolve the sketch to an estimate."""
    return finalize(state).withColumn(
        "n_distinct_approx", F.hll_sketch_estimate("distinct_sketch")
    )
