"""Revenue KPIs — net revenue, daily revenue, margin by SKU.

Reference semantics: scripts/dashboard.py:28-32 (KPIs), :51-56 (daily net
revenue chart), :67-73 (margin by SKU). Net revenue per order is
``gross * (1 - fee) - delivery``.

Scale notes: all aggregations are single-shuffle groupBys with map-side
partial aggregation; money sums run on DECIMAL(18,6) so results are exact
and reproducible regardless of partitioning / aggregation order (a double
sum is order-dependent and would differ run-to-run on a cluster).

Eager-materialization note (repo-wide pattern, ADVICE r11): operators
whose plan feeds a small multi-consumer rollup (here the customer-grain
RFM table; likewise t-closeness cells, curriculum stages, LM model
tables) call ``localCheckpoint()`` at BUILD time — constructing the
DataFrame executes the input scan and pins executor-local blocks whose
lineage cannot be replayed after executor loss. That is the deliberate
trade for single-pass input scans; callers needing lazy composition
should take the underlying builder functions (which expose
``materialize=False`` where composition is expected, e.g.
ops.entity._name_blocks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Exact, order-independent sum of a double expression: per-row values are
# deterministic IEEE doubles; the DECIMAL cast makes the reduction exact.
def exact_sum(col: Column, alias: str) -> Column:
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


def net_revenue_expr(gross: Column, fee_pct: Column, delivery: Column) -> Column:
    """Per-row net revenue (scripts/dashboard.py:29-32)."""
    return gross.cast("double") * (F.lit(1.0) - fee_pct) - delivery.cast("double")


def kpis(orders: DataFrame) -> DataFrame:
    """A1 + A2: global order count and net revenue (dashboard.py:28-32)."""
    net = net_revenue_expr(
        F.col("gross_price_kzt"), F.col("kaspi_fee_pct"), F.col("delivery_cost_kzt")
    )
    return orders.agg(
        F.count("*").alias("orders_cnt"),
        exact_sum(net, "net_revenue"),
    )


def daily_net_revenue(orders: DataFrame) -> DataFrame:
    """A4: net revenue grouped by order date (dashboard.py:51-56)."""
    net = net_revenue_expr(
        F.col("gross_price_kzt"), F.col("kaspi_fee_pct"), F.col("delivery_cost_kzt")
    )
    return (
        orders.withColumn("net", net)
        .groupBy("order_date")
        .agg(exact_sum(F.col("net"), "net_revenue"))
        .orderBy("order_date")
    )


def margin_by_sku(sales: DataFrame) -> DataFrame:
    """A4 + O3: net revenue per SKU, descending (dashboard.py:67-73).

    ``sales`` needs columns sku_key, gross_price_kzt, kaspi_fee_pct,
    delivery_cost_kzt.
    """
    net = net_revenue_expr(
        F.col("gross_price_kzt"), F.col("kaspi_fee_pct"), F.col("delivery_cost_kzt")
    )
    return (
        sales.withColumn("net", net)
        .groupBy("sku_key")
        .agg(exact_sum(F.col("net"), "net_revenue"), F.sum("qty").cast("long").alias("units"))
        .orderBy(F.desc("net_revenue"))
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "customer_id",
    date_col: str = "order_date",
    amount_col: str = "gross_price_kzt",
    buckets: int = 5,
) -> DataFrame:
    """RFM segmentation — the classic CRM cut (recency / frequency /
    monetary quintiles) every commerce analytics stack ships: per
    customer, last order date, order count, and exact revenue sum, each
    quintiled into ``buckets``; rfm_code = 100r + 10f + m. Ties break
    by the customer's md5 hash (then the key itself) — as deterministic
    as a raw-key tiebreak, and it makes tie groups shardable.

    Shape: one groupBy to the customer grain, then three DISTRIBUTED
    prefix-ranks (ranks.total_order_row_number — value-bin x hash-sub-
    bucket two-phase rank, never an unpartitioned NTILE window: at
    10^8-10^9 customers a global-order window is one task sorting the
    whole dimension) and the exact integer NTILE formula from
    (row_number, n). Higher score = better on every axis (most recent,
    most orders, most spend).
    """
    from ..ranks import ntile_from_row_number, total_order_row_number

    # r11 (guide §1.2 / §2.4): the customer-grain rollup feeds FOUR
    # consumers (n_row, the stacked rank input, and the final join's
    # spine) — the static plan re-ran the full orders scan + groupBy
    # once per consumer (14 parquet scans). Materialize it once: the
    # customer grain is the small side by construction (|customers| <<
    # |orders|), so this is one orders pass instead of four.
    per = (
        orders.groupBy(F.col(customer_col).alias("customer"))
        .agg(
            F.max(date_col).alias("last_order"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(amount_col).cast("long").alias("monetary"),
        )
        .localCheckpoint()
    )
    n_row = per.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    base = per.withColumn(
        "_days", F.datediff(F.col("last_order"), F.lit("1970-01-01").cast("date"))
    )
    # ONE rank pass over the three stacked axes instead of three passes:
    # axis-major composite key _ax * 2^52 + value keeps each axis a
    # contiguous rank range (axis sizes are all n, so rank-within-axis =
    # global_rn - _ax * n), a third of the shuffle barriers and — at
    # toy scale — a third of the per-stage scheduling overhead.
    # Contract: |value| < 2^51 (days-since-epoch, order counts, money).
    stacked = base.select(
        "customer",
        F.expr(
            "stack(3, 0L, CAST(_days AS BIGINT), 1L, frequency, 2L, monetary)"
            " AS (_ax, _v)"
        ),
    ).select(
        "customer",
        "_ax",
        (F.col("_ax") * F.lit(1 << 52).cast("long") + F.col("_v")).alias("_k"),
    )
    ranked = total_order_row_number(
        stacked, "_k", "customer", out_col="_rn", salt="rfm"
    )
    tiles = (
        ranked.join(F.broadcast(n_row))
        .select(
            "customer",
            "_ax",
            ntile_from_row_number(
                F.col("_rn") - F.col("_ax") * F.col("_n"), F.col("_n"), buckets
            ).alias("_t"),
        )
        .groupBy("customer")
        .agg(
            F.max(F.when(F.col("_ax") == 0, F.col("_t"))).cast("long").alias("r_score"),
            F.max(F.when(F.col("_ax") == 1, F.col("_t"))).cast("long").alias("f_score"),
            F.max(F.when(F.col("_ax") == 2, F.col("_t"))).cast("long").alias("m_score"),
        )
    )
    # NULL-SAFE join back to the customer grain: a NULL customer key (a
    # real group — GROUP BY keeps it on both engines) must keep its
    # scores; a plain equi-join would silently drop it (adversarial-
    # sweep finding, NULL-custkey orders)
    t = tiles.select(
        F.col("customer").alias("_tc"), "r_score", "f_score", "m_score"
    )
    return (
        per.join(t, F.col("customer").eqNullSafe(F.col("_tc")))
        .drop("_tc")
        .withColumn(
            "rfm_code",
            (100 * F.col("r_score") + 10 * F.col("f_score") + F.col("m_score")).cast(
                "long"
            ),
        )
    )
