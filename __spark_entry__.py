"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
one callable per implemented operator from SURVEY.md section 2 (plus the
LLM-pipeline operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible query. Implementations live in
``kaspi_etl_spark`` — this module is just the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kaspi_etl_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: daily net revenue over sf0.001 (dashboard.py:51-56
    semantics on the synthetic orders table)."""
    return registry.q_daily_net_revenue(spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 entries of ``queries()``.
# Registration order in registry.py groups by module; this curated prefix
# instead spends the 50 slots on one gate per distinct operator family and
# leaves redundant near-duplicate gates to the local
# ``tools/check_oracle.py`` run, which still checks all entries.
#
# Round-5 rotation (VERDICT r4 top-next): 16 slots whose families stayed
# covered by a sibling gate (e.g. revenue_kpis by daily_net_revenue,
# daily_demand by inventory_reorder which composes it, minhash_signatures
# by minhash_lsh_pairs, media_metadata_summary by media_features) were
# swapped for queries that had never been driver-verified: the winnowing /
# duplicate-span / token-budget / shard samplers, the full k-means
# training loop, CUBE, TPC-H Q5, the quantile sketch, session windows,
# as-of cost join, the DQ report, Gopher quality gates, corpus mixing,
# capped entity resolution, IVF ANN (full-oracle since r5), and the
# capped-Jaccard bench headline. Every rotated-out query remains
# value-verified against its DuckDB oracle by tests/test_entry.py and the
# local check_oracle run (ORACLE_FULL_r05.json records the full 112-query
# sf0.01 sweep: all green). simhash_pairs later ceded its slot to the new
# ann_pq_topk (IVF-PQ) gate; its family stays covered by minhash_lsh_pairs
# and ngram_jaccard_capped.
#
# Late-r5 swap: five slots whose families stay covered ceded to the new
# operator families added after the first rotation — margin_by_sku ->
# url_domain_rollup (agg family: daily_net_revenue, global_analytics),
# price_deltas -> orders_zorder_curve (window family: top3_cheapest,
# bot_sliding_window), ann_cosine_topk -> customer_bloom_probe (ANN
# family: ann_ivf_topk, ann_pq_topk), text_features -> docs_pii_profile
# (text family: docs_quality_gopher, tfidf_top_terms, token_countmin),
# events_tumbling_stats -> tpch_q1_pricing_summary (event-window family:
# events_session_windows, events_asof_join, events_funnel). All five
# newcomers were parity-checked on a vanilla driver-style session first.
_GATE_PRIORITY = [
    "daily_net_revenue",
    "url_domain_rollup",
    "inventory_reorder",
    "seller_dedupe",
    "variant_stats",
    "orders_zorder_curve",
    "global_analytics",
    "reprice_proposals",
    "sizing_adult",
    "sales_etl_enrich",
    "purchases_upsert",
    "top3_cheapest",
    "master_attrs_union",
    "bot_sliding_window",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_capped",
    "customer_bloom_probe",
    "ann_ivf_topk",
    "ann_pq_topk",
    "docs_pii_profile",
    "media_features",
    "tpch_q1_pricing_summary",
    "export_flat",
    "import_coerce",
    "catalog_validation",
    "events_json_probe",
    "html_sellers_parse",
    "dedup_clusters",
    "semantic_dedup_keep",
    "tfidf_top_terms",
    "events_funnel",
    "purchases_scd2",
    "events_asof_join",
    "token_countmin",
    "supplier_pagerank",
    # first-time driver verification (r5 rotation)
    "winnowing_fingerprints",
    "duplicate_spans",
    "token_budget_sample",
    "token_shards",
    "kmeans_iterations",
    "orders_cube",
    "tpch_q5_local_supplier",
    "price_quantile_sketch",
    "events_session_windows",
    "purchases_cost_asof",
    "dq_orders_report",
    "docs_quality_gopher",
    "corpus_mix_allocation",
    "part_name_matches_capped",
]


def _ordered(src: dict) -> dict:
    out = {k: src[k] for k in _GATE_PRIORITY if k in src}
    out.update({k: v for k, v in src.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(registry.ORACLES))
