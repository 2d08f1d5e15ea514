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

    Shape: ONE exchange on user_id. Each step is a conditional min over
    the user window (step k's predicate reads step k-1's window result —
    a null t_{k-1} nulls the comparison, so broken funnels propagate
    automatically), and the final per-user collapse is a groupBy on the
    same key, which reuses the window's partitioning. The obvious
    per-step aggregate+join formulation shuffles 2x per step and at
    100 TB the per-user frame is too big to broadcast — this form scales
    with a single hash partitioning of the events.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    # NULL users can't be funnel subjects: the window would pool them
    # into one pseudo-user and 'complete' steps across unrelated
    # anonymous events, where any join-based formulation (and every SQL
    # engine) drops them (adversarial sweep finding)
    df = events.select("user_id", "event_type", "ts").filter(
        F.col("user_id").isNotNull()
    )
    first = steps[0]
    df = df.withColumn(
        f"t_{first}",
        F.min(F.when(F.col("event_type") == first, F.col("ts"))).over(w),
    )
    prev = f"t_{first}"
    for step in steps[1:]:
        col = f"t_{step}"
        df = df.withColumn(
            col,
            F.min(
                F.when(
                    (F.col("event_type") == step) & (F.col("ts") > F.col(prev)),
                    F.col("ts"),
                )
            ).over(w),
        )
        prev = col
    t_cols = [f"t_{s}" for s in steps]
    out = (
        df.filter(F.col(f"t_{first}").isNotNull())
        .groupBy("user_id")
        .agg(*[F.max(c).alias(c) for c in t_cols])
    )
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


def top_paths(
    events: DataFrame,
    gap: str = "30 minutes",
    max_steps: int = 5,
    top_n: int = 20,
) -> DataFrame:
    """Top session paths: the most common ordered event-type sequences
    (first ``max_steps`` events of each inactivity-gap session) — the
    'how do users actually move through the product' query.

    Shape: ONE shuffle on (session_window, user) collecting each
    session's events as a sorted struct array ((ts, event_id, type) —
    a pinned total order, so tied timestamps cannot flap the path
    between engines), then a tiny groupBy on the path strings and a
    global top-n that compiles to TakeOrderedAndProject. Session count
    bounds the second stage, path-vocabulary the third — both are
    data-sized, never event-sized, and the ordering (n desc, path asc)
    is a total order so the limit is deterministic. NULL users are
    excluded (same rationale as ``funnel``)."""
    sessions = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("_evs")
        )
    )
    path = F.concat_ws(
        ">",
        F.transform(
            F.slice("_evs", 1, max_steps), lambda e: e["event_type"]
        ),
    )
    return (
        sessions.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(top_n)
    )


def daily_pivot(events: DataFrame, event_types: list[str]) -> DataFrame:
    """Wide daily table: one row per day, one count column per event type
    (explicit value list — no distinct-values pre-job) plus a total.

    ``total`` counts ALL events that day — including types outside the
    list. The earlier form summed the pivot columns instead, which
    silently under-reported whenever the data held an unlisted type
    (adversarial sweep finding: an empty-string event_type dropped out
    of the total). Conditional counts in one aggregate keep it a single
    exchange with map-side partials, same as ``.pivot`` but without the
    column-sum coupling."""
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).cast("long").alias(t)
        for t in event_types
    ]
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        *aggs, F.count("*").cast("long").alias("total")
    )


def cuped_variant_summary(
    per_user: DataFrame,
    variant_col: str = "variant",
    x_col: str = "x_cents",
    y_col: str = "y_cents",
) -> DataFrame:
    """CUPED-adjusted experiment readout (Deng et al. 2013, "Improving
    the sensitivity of online controlled experiments"): the A/B metric
    variance-reduction every experimentation platform runs — adjust the
    post-period metric y by its pre-period covariate x,
    y' = y - theta (x - mean x) with theta = cov(x, y) / var(x), so
    between-user variance that predates the experiment cancels out.

    Determinism shape: moments (n, Sx, Sy, Sxy, Sxx) are ONE bounded
    driver read of exact BIGINT sums over per-user integer metrics;
    theta and the global x-mean are computed driver-side in exact big
    ints with a single IEEE division each (an oracle mirrors them as
    HUGEINT CTEs cast to DOUBLE). Because the adjustment is LINEAR, the
    per-variant adjusted mean needs only the variant's exact integer
    sums — mean_y_adj = mean_y - theta (mean_x - xbar) — so no float
    ever sums across rows and the readout is shuffle-order-independent.

    Returns per variant: (variant, n_users, sum_x_cents, sum_y_cents,
    mean_y, mean_y_adj) with the means in currency units (cents / 100).
    """
    mom = per_user.select(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x_col).cast("long").alias("sx"),
        F.sum(y_col).cast("long").alias("sy"),
        F.sum(F.col(x_col) * F.col(y_col)).cast("long").alias("sxy"),
        F.sum(F.col(x_col) * F.col(x_col)).cast("long").alias("sxx"),
    ).collect()[0]
    n, sx, sy = int(mom["n"]), int(mom["sx"] or 0), int(mom["sy"] or 0)
    sxy, sxx = int(mom["sxy"] or 0), int(mom["sxx"] or 0)
    num = n * sxy - sx * sy  # exact big ints (Python, unbounded)
    den = n * sxx - sx * sx
    theta = float(num) / float(den) if den != 0 else 0.0
    xbar = float(sx) / float(n) if n else 0.0
    agg = per_user.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(x_col).cast("long").alias("sum_x_cents"),
        F.sum(y_col).cast("long").alias("sum_y_cents"),
    )
    mean_x = F.col("sum_x_cents").cast("double") / F.col("n_users").cast("double")
    mean_y = F.col("sum_y_cents").cast("double") / F.col("n_users").cast("double")
    return agg.select(
        "variant",
        "n_users",
        "sum_x_cents",
        "sum_y_cents",
        (mean_y / F.lit(100.0)).alias("mean_y"),
        (
            (mean_y - F.lit(theta) * (mean_x - F.lit(xbar))) / F.lit(100.0)
        ).alias("mean_y_adj"),
    )


def markov_transition_cells(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-(src, dst) transition counts of consecutive events within a
    user's timeline, ordered by (ts, event_id) — the id tiebreak makes
    the order total, so tied timestamps (real data has them) cannot
    flip pairs between engines. Rows with NULL ts/id/type are excluded
    (engines disagree on NULL ordering; an unknown time has no place in
    a timeline). One window shuffle keyed by user."""
    from pyspark.sql import Window

    base = events.filter(
        F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    tr = base.withColumn("_nxt", F.lead(type_col).over(w)).filter(
        F.col("_nxt").isNotNull()
    )
    return tr.groupBy(
        F.col(type_col).alias("src"), F.col("_nxt").alias("dst")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_trans"))


def markov_steady_state(
    cells: list[tuple[str, str, int]],
    iters: int = 12,
    scale_bits: int = 20,
) -> dict[str, int]:
    """Fixed-point power iteration for the stationary distribution of
    the transition matrix, in exact Python integers over the bounded
    collected cells (the PCA/FS driver-math pattern; an oracle unrolls
    the same steps as MATERIALIZED CTEs). Per-term floor division
    (v_a * c_ab) // rowtotal_a keeps every step integer; mass decays
    slightly under the floors and states with no outgoing edges absorb
    nothing — both mirrored exactly, not corrected."""
    scale = 1 << scale_bits
    states = sorted({s for s, _, _ in cells} | {d for _, d, _ in cells})
    rt = {s: 0 for s in states}
    for s, _, c in cells:
        rt[s] += c
    v = {s: scale for s in states}
    for _ in range(iters):
        nv = {s: 0 for s in states}
        for s, d, c in cells:
            nv[d] += (v[s] * c) // rt[s]
        v = nv
    return v


def srm_stats(units: DataFrame) -> DataFrame:
    """Sample-ratio-mismatch chi-square per exposure segment from a
    DISTINCT (event_type, user_id) unit table: deterministic md5 hash
    split into two variants, exact-ppm chi-square against the 50/50
    design via the 1-dof identity (n_a - n_b)^2 / n through DECIMAL(38)
    (oracle mirror: HUGEINT), alarm at the p<0.05 critical value
    3.841459. NULL users hash as '' (a NULL unit must still be
    counted); NULL event_type kept by GROUP BY. Shared by the batch
    gate query (registry events_srm_check) and the streaming monitor
    (streaming/incremental.srm_monitor_step) — one computation, so
    streamed == batch by construction AND by test."""
    from ..llm.dedup import md5_long

    variant = (
        md5_long(
            F.coalesce(F.col("user_id").cast("string"), F.lit("")), salt="srm"
        )
        % 2
    )
    c = (
        units.select("event_type", variant.alias("_v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum(F.when(F.col("_v") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("_v") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
    )
    chi2 = F.expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0))"
        " * CAST(n_a - n_b AS DECIMAL(38,0))"
        " * CAST(n_a - n_b AS DECIMAL(38,0)))"
        " div CAST(n_units AS DECIMAL(38,0)) AS BIGINT)"
    )
    return c.select(
        "event_type",
        "n_units",
        "n_a",
        "n_b",
        chi2.alias("chi2_ppm"),
        (chi2 > 3_841_459).alias("srm_alarm"),
    )


# Benford first-digit expectation, ppm: round(log10(1 + 1/d) * 1e6).
# The nine literals sum to exactly 1_000_000 (asserted), so expected
# counts partition n exactly.
BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]
assert sum(BENFORD_PPM) == 1_000_000


def benford_stats_from_counts(counts: DataFrame) -> DataFrame:
    """Benford audit table from a (digit, n_obs) count frame — the
    shared kernel of the batch gate query (registry
    orders_benford_audit) and the streaming monitor
    (streaming/incremental.benford_monitor_step): one computation, so
    streamed == batch by construction. Emits all nine digit rows (a
    digit with zero observations still reports its expectation) with
    the exact-ppm observed share and the chi-square contribution
    (obs*1e6 - n*exp_ppm)^2 / (n*exp_ppm) through DECIMAL(38)."""
    spark = counts.sparkSession
    d = counts.groupBy("digit").agg(F.sum("n_obs").cast("long").alias("n_obs"))
    n = d.agg(F.sum("n_obs").cast("long").alias("n_total"))
    e = spark.createDataFrame(
        [(i, p) for i, p in enumerate(BENFORD_PPM, start=1)],
        "digit long, exp_ppm long",
    )
    return (
        e.join(d, "digit", "left")
        .join(F.broadcast(n))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.expr(
                "CAST((1000000 * coalesce(n_obs, 0)) div n_total AS BIGINT)"
            ).alias("obs_ppm"),
            "exp_ppm",
            F.expr(
                "CAST((CAST(1000000 * coalesce(n_obs, 0)"
                "           - n_total * exp_ppm AS DECIMAL(38,0))"
                "      * CAST(1000000 * coalesce(n_obs, 0)"
                "             - n_total * exp_ppm AS DECIMAL(38,0)))"
                " div (CAST(n_total AS DECIMAL(38,0)) * exp_ppm) AS BIGINT)"
            ).alias("chi2_contrib_ppm"),
        )
    )


def benford_digit_counts(amounts: DataFrame, amt_col: str = "amt") -> DataFrame:
    """(digit, n_obs) counts of first significant digits of positive
    BIGINT amounts — string-head digit extraction, no float log."""
    return (
        amounts.filter(F.col(amt_col) >= 1)
        .groupBy(
            F.substring(F.col(amt_col).cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )


def benford_stats(amounts: DataFrame, amt_col: str = "amt") -> DataFrame:
    """Benford audit over raw positive amounts (see
    benford_stats_from_counts)."""
    return benford_stats_from_counts(benford_digit_counts(amounts, amt_col))
