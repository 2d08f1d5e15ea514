"""Market-basket association rules (Apriori-pruned pair rules).

The recommendation/affinity counterpart of ops/graph.py's co-purchase
similarity: directed rules A -> B with support, confidence, and lift,
mined from order baskets. Reference anchor: the co-purchase analytics
family (SURVEY §2 graph/behavioral ops); the algorithm is the public
Apriori pair-rule form (Agrawal & Srikant 1994).

Determinism: support/confidence/lift are exact integers — counts are
BIGINTs and the two ratios are emitted as parts-per-million via integer
floor division, so there is no float anywhere and any SQL engine
reproduces the rows bit-for-bit.

Scale shape (100 TB):
  * baskets are DISTINCT (order, item) — one dedup shuffle;
  * the Apriori prune runs BEFORE pair generation: an item whose basket
    count is below min_support can never appear in a pair with support
    >= min_support (co <= min(n_a, n_b)), so infrequent items leave the
    pipeline in a map-side-combinable groupBy + semi-join, which is what
    bounds the self-join fan-out on a 100 TB order history;
  * pair counting self-joins the pruned baskets on the order key —
    fan-out bounded by (pruned) basket size squared, the same shape as
    copurchase_item_sim; a hub basket would get the same frequency-cap
    treatment as dedup shingles;
  * rules are derived from the undirected pair counts by a cheap
    two-direction union AFTER the min-support filter, so the expensive
    join never runs twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000

# Shared rule-scoring expressions (also used by the streaming Apriori in
# streaming/incremental.py — one implementation, not two copies).
# conf = floor(1e6 * co / n_antecedent): co <= n_antecedent so the
# numerator is bounded by 1e6 * n_baskets — BIGINT-safe outright.
# lift = floor(1e6 * co * n_baskets / (n_antecedent * n_consequent)):
# the numerator runs through DECIMAL(38,0) (exact integral `div` — Spark's
# IntegralDivide accepts decimals) because co * n_baskets wraps BIGINT
# once a pair co-occurs in most baskets at n_baskets >~ 3e6; the result
# itself is bounded by 1e6 * n_baskets (co <= n_antecedent), BIGINT-safe.
CONF_PPM_EXPR = f"({PPM} * co) div n_antecedent"
LIFT_PPM_EXPR = (
    f"(CAST({PPM} AS DECIMAL(38,0)) * CAST(co AS DECIMAL(38,0))"
    " * CAST(n_baskets AS DECIMAL(38,0)))"
    " div (CAST(n_antecedent AS DECIMAL(38,0))"
    " * CAST(n_consequent AS DECIMAL(38,0)))"
)


def basket_pairs(
    baskets: DataFrame,
    basket_col: str = "o",
    item_col: str = "item",
    min_support: int = 1,
    max_basket_items: int | None = None,
    distinct_input: bool = False,
    item_counts: DataFrame | None = None,
) -> DataFrame:
    """Within-basket undirected item pairs — THE shared pair-generation
    stage for association_rules / copurchase_item_sim /
    copurchase_communities_lp (one implementation of the quadratic
    step, not three).

    Returns (item_a, item_b, co) with item_a < item_b and
    co >= min_support, where co counts distinct baskets containing both
    items.

    Scale shape (100 TB):
      * (basket, item) rows dedup first — one shuffle;
      * ``max_basket_items`` is the hub-basket cap: a basket of B items
        emits B^2/2 pair rows BEFORE any support filter can run, so one
        pathological hub basket (a crawler account, a merged guest
        cart) dominates the whole stage; baskets above the cap are
        EXCLUDED from pair generation outright (deterministic, exactly
        mirrorable in SQL as HAVING count(*) <= cap) — same treatment
        as dedup's hot-shingle cap;
      * the Apriori prune runs BEFORE the self-join when
        min_support > 1: co <= min(n_a, n_b), so an item in fewer than
        min_support baskets can never reach pair support — infrequent
        items leave in a map-side-combinable groupBy + semi-join and
        the self-join fan-out is bounded by the PRUNED basket size
        squared. Output-identical to the unpruned form (property-tested
        in tests/test_r9_ops.py);
      * pair counting shuffles once on the (a, b) key.
    """
    b = baskets.select(
        F.col(basket_col).alias("_o"), F.col(item_col).alias("_i")
    )
    # ``distinct_input=True``: the caller already deduped (and typically
    # materialized) the (basket, item) rows — r11 removed the second
    # full dedup shuffle association_rules used to pay here (guide §2.4
    # "a distinct on data that is already unique").
    if not distinct_input:
        b = b.distinct()
    if max_basket_items is not None:
        ok = (
            b.groupBy("_o")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .filter(F.col("_bs") <= max_basket_items)
            .select("_o")
        )
        b = b.join(ok, "_o", "left_semi")
    if min_support > 1:
        # ``item_counts``: a caller that already aggregated per-item
        # basket counts over the SAME (deduped, uncapped) rows can hand
        # them in as (_i, _n) so the prune doesn't recompute the
        # identical groupBy (r11, guide §1.2 — association_rules needs
        # n_antecedent/n_consequent anyway). With a hub cap the shared
        # counts are pre-cap, which stays a VALID Apriori prune (capping
        # only removes baskets, so counts only shrink) — just possibly
        # weaker than post-cap counts.
        freq = (
            b.groupBy("_i").agg(F.count(F.lit(1)).alias("_n"))
            if item_counts is None
            else item_counts
        )
        b = b.join(
            freq.filter(F.col("_n") >= min_support).select("_i"),
            "_i",
            "left_semi",
        )
    a = b.select("_o", F.col("_i").alias("item_a"))
    # r11 (guide §3.1): force the self-join to shuffled-hash — both
    # sides are the same pruned basket table, and sort-merge pays two
    # sorts of it for nothing a hash probe doesn't give (A/B on the
    # assoc-rules input, checksum-equal: 0.86 -> 0.50 s warm). Build
    # side is one hash partition of (basket, item) rows: bounded by
    # AQE's partition sizing, with the hub cap bounding any single
    # basket's contribution.
    c = b.select(F.col("_o").alias("_o2"), F.col("_i").alias("item_b")).hint(
        "shuffle_hash"
    )
    co = (
        a.join(c, (F.col("_o") == F.col("_o2")) & (F.col("item_a") < F.col("item_b")))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    if min_support > 1:
        co = co.filter(F.col("co") >= min_support)
    return co


def association_rules(
    baskets: DataFrame,
    basket_col: str = "o",
    item_col: str = "item",
    min_support: int = 3,
    min_conf_ppm: int = 0,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Directed pair association rules over (basket, item) rows.

    Returns one row per rule (antecedent -> consequent) with
    support_cnt >= min_support and conf_ppm >= min_conf_ppm:
    (antecedent, consequent, support_cnt, n_antecedent, n_consequent,
    n_baskets, conf_ppm, lift_ppm) — all exact BIGINTs;
    conf_ppm = floor(1e6 * support / n_antecedent),
    lift_ppm = floor(1e6 * support * n_baskets /
                     (n_antecedent * n_consequent)).

    Overflow: lift's numerator runs through DECIMAL(38,0)
    (LIFT_PPM_EXPR) so a pair co-occurring in most baskets stays exact
    past n_baskets ~ 3e6 where the all-BIGINT form would wrap; good to
    co * n_baskets < 10^32.
    """
    # r11: the deduped (basket, item) table feeds FIVE consumers
    # (n_baskets, item_n, the pair stage's hub-cap/Apriori aggregates
    # and both self-join sides) — materialize the dedup output once
    # instead of re-running the distinct shuffle per consumer (the
    # static plan scanned lineitem 22x; guide §1.2 step 1 / §2.4), and
    # tell the pair stage the input is already distinct so it skips its
    # own second dedup.
    b = (
        baskets.select(
            F.col(basket_col).alias("_o"), F.col(item_col).alias("_i")
        )
        .distinct()
        .localCheckpoint()
    )
    n_baskets = b.select(F.countDistinct("_o").alias("n_baskets"))
    item_n = b.groupBy("_i").agg(F.count(F.lit(1)).alias("n_orders"))
    # Shared pair stage: Apriori prune + optional hub cap live there.
    # n_antecedent/n_consequent stay the UNpruned per-item counts.
    co = basket_pairs(
        b,
        basket_col="_o",
        item_col="_i",
        min_support=min_support,
        max_basket_items=max_basket_items,
        distinct_input=True,
        # item_n is the same groupBy the Apriori prune would run —
        # share it (one fewer full aggregation pass over the baskets).
        item_counts=item_n.select(F.col("_i"), F.col("n_orders").alias("_n")),
    )
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
    na = item_n.select(
        F.col("_i").alias("antecedent"), F.col("n_orders").alias("n_antecedent")
    )
    nc = item_n.select(
        F.col("_i").alias("consequent"), F.col("n_orders").alias("n_consequent")
    )
    scored = (
        directed.join(na, "antecedent")
        .join(nc, "consequent")
        .crossJoin(F.broadcast(n_baskets))
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
    return scored.filter(F.col("conf_ppm") >= min_conf_ppm)
