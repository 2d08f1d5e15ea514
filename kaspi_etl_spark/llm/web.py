"""URL extraction, domain analytics, and blocklist filtering.

The C4/RefinedWeb-style web-corpus stage: pull URLs out of document
text, roll them up by domain, and drop documents that cite blocklisted
domains. Pure JVM-side regex + joins — no Python UDFs, no per-row
lambdas over arrays (HOFs never enter whole-stage codegen, so the
blocklist test is an explode → broadcast-join, not an ``exists()``).

Scale notes: the explode multiplies rows only by URLs-per-doc (small
constant); the domain rollup is a map-side-combinable hash aggregate;
the blocklist filter is a broadcast LEFT ANTI join against the distinct
set of offending doc ids, so the full corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Same Java/RE2-identical discipline as llm.pii: ASCII classes only.
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._%/-]*)?"
DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(text: Column) -> Column:
    """All URLs in ``text`` as an array (group 0)."""
    return F.regexp_extract_all(text, F.lit(URL_PATTERN), F.lit(0))


def url_domain(url: Column) -> Column:
    """The host part of a URL."""
    return F.regexp_extract(url, DOMAIN_PATTERN, 1)


def doc_urls(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per (document, URL) with the URL's domain.

    Explode AFTER projecting to (id, urls) so the generator input is the
    narrow two-column frame, not the full document row (keeps the
    InferFiltersFromGenerate double-execution hazard irrelevant: the
    generator input is cheap by construction).
    """
    return (
        docs.select(F.col(id_col), extract_urls(F.col(text_col)).alias("urls"))
        .select(F.col(id_col), F.explode("urls").alias("url"))
        .withColumn("domain", url_domain(F.col("url")))
    )


def domain_rollup(
    docs: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain URL count, citing-document count, and blocked flag."""
    urls = doc_urls(docs, text_col, id_col)
    return urls.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.count_distinct(F.col(id_col)).cast("long").alias("n_docs"),
        F.max(F.col("domain").isin(blocklist)).alias("blocked"),
    )


def filter_blocked_domains(
    docs: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every document that contains a URL on a blocklisted domain.

    The offending-id set is tiny relative to the corpus, so it builds
    the broadcast side of a LEFT ANTI join — the corpus side never
    shuffles and documents with no URLs at all survive for free.
    """
    offending = (
        doc_urls(docs, text_col, id_col)
        .filter(F.col("domain").isin(blocklist))
        .select(id_col)
        .distinct()
    )
    return docs.join(
        F.broadcast(offending), on=id_col, how="left_anti"
    )
