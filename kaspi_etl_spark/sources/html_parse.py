"""Heuristic HTML/JSON-LD parsers (X5/S13, F21).

Reference: apps/kaspi_offers_dashboard/server/parse.ts:5-53
(parseSellersFromHtml — regex row scan, name/delivery candidate fallbacks,
dedupe-by-name keep-lowest-price) and server/scrape.ts:663-701 (JSON-LD
script-tag extraction).

Spark design: the seller parser is a Pandas UDF (str -> array<struct>)
acting as a UDTF via explode — regex-heavy multi-candidate logic is the
one place Python wins over expression trees. JSON-LD extraction stays
expression-only (regexp_extract + from_json).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

SELLER_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("price", T.LongType()),
            T.StructField("deliveryDate", T.StringType()),
        ]
    )
)

_ROW_SPLIT = re.compile(r"<(?:li|tr|div|article)[^>]*>", re.I)
_PRICE = re.compile(r"(\d[\d\s]{3,})")
_NAME_PATTERNS = [
    re.compile(r"sellers-table__merchant-name[^>]*>([^<]{2,100})<", re.I),
    re.compile(r"data-merchant-name[^>]*>([^<]{2,100})<", re.I),
    re.compile(r"<a[^>]*href=[\"']?[^\"']*/shop/seller[^>]*>([^<]{2,100})<", re.I),
    re.compile(r"merchant[^>]*name[^>]*>([^<]{2,100})<", re.I),
]
_DELIVERY_PATTERNS = [
    re.compile(r"sellers-table__delivery[^>]*>([^<]{2,120})<", re.I),
    re.compile(r"sellers-table__delivery-text[^>]*>([^<]{2,120})<", re.I),
    re.compile(r"delivery[^>]*>([^<]{2,120})<", re.I),
]


def _parse_one(html: str | None) -> list[dict]:
    """parse.ts:5-53 semantics, including the keep-lowest-price /
    fill-missing-delivery dedupe and final price-asc sort."""
    if not html:
        return []
    # r12 perf (same output): \r and \n are \s, so the two pre-replace
    # copies bought nothing; and after this normalization every \s in
    # the text IS a single ' ', so the per-price cleanup below can be a
    # plain str.replace instead of 1 re.sub per candidate row (the
    # module-level re.sub lookup was ~30% of the parse profile).
    # r12 second pass: ' '.join(split()) is the C-level form of
    # re.sub(r'\s+', ' ') — CPython's str.split() whitespace table and
    # re's Unicode \s are the same set, and the only other difference
    # (ends are trimmed instead of collapsed) is invisible here because
    # every chunk below is strip()ed before use. Measured 6.4 s -> ~1 s
    # of the 18.6 s fixture-corpus profile; byte-identical on all 29
    # real captured pages and the oracle corpus.
    text = " ".join(html.split())
    sellers: list[dict] = []
    for chunk in filter(None, (c.strip() for c in _ROW_SPLIT.split(text))):
        pm = _PRICE.search(chunk)
        price = int(pm.group(1).replace(" ", "")) if pm else None
        if not price or price <= 0:
            continue
        name = ""
        for pat in _NAME_PATTERNS:
            m = pat.search(chunk)
            if m:
                name = m.group(1).strip()
                break
        if not name:
            continue
        delivery = ""
        for pat in _DELIVERY_PATTERNS:
            m = pat.search(chunk)
            if m:
                delivery = m.group(1).strip()
                break
        sellers.append({"name": name, "price": price, "deliveryDate": delivery})
    dedup: dict[str, dict] = {}
    for s in sellers:
        key = s["name"].lower()
        cur = dedup.get(key)
        if cur is None or s["price"] < cur["price"] or (
            not cur["deliveryDate"] and s["deliveryDate"]
        ):
            dedup[key] = s
    return sorted(dedup.values(), key=lambda s: s["price"])


@pandas_udf(SELLER_SCHEMA)
def parse_sellers_html(html: pd.Series) -> pd.Series:
    """X5/S13: html -> array<struct<name, price, deliveryDate>>.
    Arrow-batched; use with explode() for the UDTF shape.

    Callers pair this with explode_outer + isNotNull (the
    InferFiltersFromGenerate guard), which would silently DROP a null
    array element — so a null element is a hard error here, where it is
    a parser bug, not downstream, where it would vanish (ADVICE r4)."""
    out = html.map(_parse_one)
    for sellers in out:
        if any(s is None for s in sellers):
            raise ValueError("parse_sellers_html: parser emitted a null seller")
    return out


JSONLD_SCHEMA = T.StructType(
    [
        T.StructField(
            "aggregateRating",
            T.StructType(
                [
                    T.StructField("ratingValue", T.DoubleType()),
                    T.StructField("reviewCount", T.LongType()),
                ]
            ),
        ),
    ]
)


def extract_jsonld_rating(html: Column) -> Column:
    """F21: first application/ld+json script tag -> parsed
    aggregateRating struct (server/scrape.ts:663-701). Expression-only:
    regexp_extract + from_json, no UDF."""
    raw = F.regexp_extract(
        html, r'<script type="application/ld\+json">\s*(\{.*?\})\s*</script>', 1
    )
    return F.from_json(raw, JSONLD_SCHEMA)["aggregateRating"]


PRODUCT_LD_SCHEMA = T.StructType(
    [
        T.StructField("productID", T.StringType()),
        T.StructField(
            "offers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("@type", T.StringType()),
                        T.StructField("price", T.StringType()),
                        T.StructField("priceCurrency", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def extract_jsonld_product_price(html: Column) -> Column:
    """Product offer price from the page's JSON-LD blocks, as a nullable
    long. Expression-only: regexp_extract_all the ld+json scripts, pick
    the Product block, from_json, take the first @type='Offer' entry's
    price (the reference's captured pages carry 'undefined' for some —
    try_cast nulls those). Verified against the reference's 29 captured
    variant_*.html pages in tests/test_html_fixtures.py."""
    blocks = F.regexp_extract_all(
        html, F.lit(r'(?s)<script type="application/ld\+json">\s*(\{.*?\})\s*</script>'), 1
    )
    product = F.try_element_at(
        F.filter(blocks, lambda b: b.contains('"Product"')), F.lit(1)
    )
    offers = F.from_json(product, PRODUCT_LD_SCHEMA)["offers"]
    offer = F.try_element_at(
        F.filter(offers, lambda o: o["@type"] == F.lit("Offer")), F.lit(1)
    )
    return offer["price"].try_cast("long")


def extract_review_count(html: Column) -> Column:
    """The reference's last-resort rating fallback (scrape.ts:695-700):
    first '(N отзыв…)' occurrence -> N as a nullable long. Regex over the
    raw page instead of a DOM walk, so 'first' is first-in-document."""
    n = F.regexp_extract(html, r"\((\d{1,4})\s*отзыв", 1)
    return F.nullif(n, F.lit("")).try_cast("long")
