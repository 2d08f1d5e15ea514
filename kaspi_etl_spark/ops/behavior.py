"""Behavioral analytics over event streams — funnel, cohort retention,
daily pivot.

Beyond-reference surface (the reference's analytics stop at offer/price
rollups — computeGlobalAnalytics, app/api/analyze/route.ts); these are the
standard product-analytics operators a training-data/event pipeline needs
at fleet scale.

Scale notes (100 TB design):
  - Every shuffle in the funnel and retention paths keys on ``user_id``,
    so AQE reuses co-partitioning between the step aggregations and the
    step joins; no all-pairs or driver-side work anywhere.
  - The step frames are aggregated BEFORE joining (users << events), so
    join inputs are the small per-user frames, broadcastable under AQE
    when the user dimension fits.
  - The pivot uses an explicit value list — Spark skips the extra
    distinct-values job and the output schema is static (required for
    a deterministic oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """Ordered funnel: for each user, the earliest time of step k that
    strictly follows their step-(k-1) time.

    Returns one row per user who completed step 1, with ``t_<step>``
    timestamp columns (null once the funnel breaks) and
    ``steps_completed``.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    first = steps[0]
    out = (
        events.filter(F.col("event_type") == first)
        .groupBy("user_id")
        .agg(F.min("ts").alias(f"t_{first}"))
    )
    prev = f"t_{first}"
    for step in steps[1:]:
        col = f"t_{step}"
        nxt = (
            events.filter(F.col("event_type") == step)
            .join(out.select("user_id", prev), "user_id")
            .filter(F.col("ts") > F.col(prev))
            .groupBy("user_id")
            .agg(F.min("ts").alias(col))
        )
        out = out.join(nxt, "user_id", "left")
        prev = col
    completed = F.lit(1)
    for step in steps[1:]:
        completed = completed + F.when(F.col(f"t_{step}").isNotNull(), 1).otherwise(0)
    return out.withColumn("steps_completed", completed.cast("long"))


def retention(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; for each
    (cohort_day, day_offset) the count of distinct users active that day.
    """
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    return (
        events.select("user_id", F.to_date("ts").alias("day"))
        .join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


def daily_pivot(events: DataFrame, event_types: list[str]) -> DataFrame:
    """Wide daily table: one row per day, one count column per event type
    (explicit value list — no distinct-values pre-job) plus a total."""
    wide = (
        events.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", event_types)
        .count()
        .na.fill(0, event_types)
    )
    total = None
    for t in event_types:
        wide = wide.withColumn(t, F.col(t).cast("long"))
        total = F.col(t) if total is None else total + F.col(t)
    return wide.withColumn("total", total.cast("long"))
