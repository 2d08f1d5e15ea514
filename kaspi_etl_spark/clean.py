"""Column-expression cleaning library (SURVEY.md 2.9, F1-F24).

Every function is a pure ``Column`` transformation — JVM-side, codegen'd,
no Python UDFs — so they stay inside whole-stage codegen at any scale.
Reference citations point into /root/reference/.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# String / numeric coercion (F1-F5)
# ---------------------------------------------------------------------------


def norm_key(col: Column | str) -> Column:
    """F1: trim + upper — sku_key normalization (scripts/etl_stock.py:17)."""
    return F.upper(F.trim(F.col(col) if isinstance(col, str) else col))


def decimal_comma_to_double(col: Column | str) -> Column:
    """F2: '0,95' -> 0.95, garbage -> null (scripts/etl_sales.py:19-21,
    scripts/enhanced_catalog_parser.py:27-40)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), ",", ".").try_cast("double")


def strip_non_numeric_int(col: Column | str, default: int | None = None) -> Column:
    """F3: keep [0-9.], cast to long; '' -> default
    (scripts/enhanced_catalog_parser.py:43-67)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, r"[^0-9.]", "")
    out = cleaned.try_cast("double").try_cast("long")
    if default is not None:
        out = F.coalesce(out, F.lit(default))
    return out


def price_from_text(col: Column | str) -> Column:
    """F4: '12 990 ₸' -> 12990 — digit-group extraction
    (apps/kaspi_offers_dashboard/server/parse.ts:17-18)."""
    c = F.col(col) if isinstance(col, str) else col
    grp = F.regexp_extract(c, r"(\d[\d\s]{0,}\d|\d)", 1)
    return F.regexp_replace(grp, r"\s", "").try_cast("long")


def id_from_url(col: Column | str) -> Column:
    """F5: trailing '-12345/' id from href (server/scrape.ts:39-42)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"-(\d+)/?$", 1)


# ---------------------------------------------------------------------------
# Date parsing (F6, F8)
# ---------------------------------------------------------------------------

RU_MONTHS = {
    "января": 1, "февраля": 2, "марта": 3, "апреля": 4, "мая": 5,
    "июня": 6, "июля": 7, "августа": 8, "сентября": 9, "октября": 10,
    "ноября": 11, "декабря": 12,
}


def ru_date_to_dmy(col: Column | str) -> Column:
    """F6: '12 сентября' -> '12.9' (server/scrape.ts:399-412).

    Month-name dictionary as a chained CASE — no locale dependence.
    """
    c = F.col(col) if isinstance(col, str) else col
    day = F.regexp_extract(c, r"(\d{1,2})", 1)
    expr = F.lit(None).cast("int")
    for name, num in reversed(list(RU_MONTHS.items())):
        expr = F.when(F.lower(c).contains(name), F.lit(num)).otherwise(expr)
    return F.when(
        (day != "") & expr.isNotNull(), F.concat_ws(".", day, expr.cast("string"))
    )


def dayfirst_date(col: Column | str) -> Column:
    """F8: day-first parse with coercion to null
    (scripts/etl_sales.py:59-60 — pd.to_datetime(dayfirst=True,
    errors='coerce')). Tries dd.MM.yyyy, dd/MM/yyyy, dd-MM-yyyy, ISO."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("dd.MM.yyyy")),
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy")),
        F.try_to_timestamp(c, F.lit("dd-MM-yyyy")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    ).cast("date")


def _ru_date_dotted(line: Column, year: int, two_digit_year: bool) -> Column:
    """normalizeRuDateToDotted (server/scrape.ts:399-412): '12 сентября'
    -> '12.9.<year>'. The reference uses the wall-clock year; here it is
    an explicit parameter so results are deterministic."""
    day = F.regexp_extract(line, r"(\d{1,2})\s+(?:января|февраля|марта|апреля|мая|июня|июля|августа|сентября|октября|ноября|декабря)", 1)
    month = F.lit(None).cast("int")
    for name, num in reversed(list(RU_MONTHS.items())):
        month = F.when(F.lower(line).contains(name), F.lit(num)).otherwise(month)
    yy = str(year)[-2:] if two_digit_year else str(year)
    return F.when(
        (day != "") & month.isNotNull(),
        F.concat_ws(".", day, month.cast("string"), F.lit(yy)),
    ).otherwise(F.lit(""))


def normalize_delivery(text: Column | str, year: int = 2025) -> Column:
    """F7: delivery-text normalization (server/scrape.ts:414-432).

    Split into lines on [\\n\\r.;], classify the first postamat line and
    the first 'доставка' line (falling back to the whole text), rewrite
    their RU dates as 'postamat - d.m.yyyy, delivery - d.m.yy'; if
    neither line carries a date, return the whitespace-collapsed text.
    Expression-only (array filter + element_at), no UDF.
    """
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(F.regexp_replace(c, r"\s+", " "))
    lines = F.filter(
        F.transform(F.split(c, r"[\n\r.;  ]"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    first = lambda pat: F.try_element_at(F.filter(lines, lambda s: s.rlike(pat)), F.lit(1))  # noqa: E731
    postamat = F.coalesce(
        first("(?iu)(postomat|постомат)"),
        F.when(t.rlike("(?iu)(postomat|постомат)"), t),
        F.lit(""),
    )
    delivery = F.coalesce(
        first("(?iu)доставка"), F.when(t.rlike("(?iu)доставка"), t), F.lit("")
    )
    p_date = _ru_date_dotted(postamat, year, two_digit_year=False)
    d_date = _ru_date_dotted(delivery, year, two_digit_year=True)
    composed = F.concat_ws(
        ", ",
        F.when(p_date != "", F.concat(F.lit("postamat - "), p_date)),
        F.when(d_date != "", F.concat(F.lit("delivery - "), d_date)),
    )
    return F.when((p_date != "") | (d_date != ""), composed).otherwise(t)


# ---------------------------------------------------------------------------
# Business formulas (F9-F17)
# ---------------------------------------------------------------------------


def delivery_fee_kzt(price: Column, weight_g: Column | None = None) -> Column:
    """F9: tiered delivery fee + per-kg surcharge over 3 kg
    (scripts/etl_sales.py:28-33).

    0 if price >= 15000; 699 if >= 10000; 799 if >= 5000; else 999 —
    plus max(0, ceil(weight_kg) - 3) * 399.
    """
    base = (
        F.when(price >= 15000, 0)
        .when(price >= 10000, 699)
        .when(price >= 5000, 799)
        .otherwise(999)
    )
    if weight_g is not None:
        surcharge = (
            F.greatest(F.lit(0), F.ceil(weight_g / F.lit(1000.0)) - F.lit(3)) * F.lit(399)
        )
        base = base + F.coalesce(surcharge, F.lit(0))
    return base.cast("long")


def reorder_point(daily_demand: Column, lead_days: Column | float, z: float = 1.65) -> Column:
    """F10: ceil(d*L + z * (d*0.2) * sqrt(L)) (scripts/dashboard.py:8-10)."""
    lead = F.lit(lead_days) if not isinstance(lead_days, Column) else lead_days
    return F.ceil(
        daily_demand * lead + F.lit(z) * (daily_demand * F.lit(0.2)) * F.sqrt(lead)
    ).cast("long")


def price_step(price: Column) -> Column:
    """F11: tiered repricing step (CURSOR_TASK.md:172-178)."""
    return (
        F.when(price < 5000, 20)
        .when(price < 20000, 50)
        .when(price < 100000, 100)
        .otherwise(200)
        .cast("long")
    )


def clamp01(col: Column) -> Column:
    """F12: clamp to [0, 1] (CURSOR_TASK.md:179-181)."""
    return F.least(F.greatest(col, F.lit(0.0)), F.lit(1.0))


def round_to_tens(col: Column) -> Column:
    """F12: round to nearest 10 KZT (CURSOR_TASK.md:162)."""
    return (F.round(col / 10.0, 0) * 10).cast("long")


def log10_demand_score(rating_count: Column) -> Column:
    """F13: log10(ratingCount + 1) / 3 (CURSOR_TASK.md:145)."""
    return F.log10(rating_count.cast("double") + 1.0) / F.lit(3.0)


def is_price_bot(price: Column, grp_min: Column, grp_median: Column) -> Column:
    """F14: bot heuristic — near-min AND compressed median
    (server/scrape.ts:719-732): (price <= min+15 OR price <= min*1.0025)
    AND (median - min <= 30)."""
    near_min = (price <= grp_min + 15) | (price.cast("double") <= grp_min * F.lit(1.0025))
    compressed = (grp_median - grp_min) <= 30
    return near_min & compressed


def predicted_min(grp_min: Column, bot_count: Column, horizon_drop: int) -> Column:
    """F15: >=2 bots -> min - drop, else min (server/scrape.ts:735-747)."""
    return F.when(bot_count >= 2, grp_min - horizon_drop).otherwise(grp_min).cast("long")


def stability_score(stddev: Column, grp_min: Column) -> Column:
    """F16: round((1 - min(1, stddev/min)) * 100) (server/scrape.ts:750-754)."""
    ratio = F.when(grp_min > 0, stddev / grp_min.cast("double")).otherwise(F.lit(1.0))
    return F.round((F.lit(1.0) - F.least(F.lit(1.0), ratio)) * 100, 0).cast("long")


def reprice_target(
    best_opponent: Column,
    step: Column,
    min_price: Column,
    max_price: Column,
    current_price: Column,
) -> Column:
    """F17: competitor-aware target with clamping + hysteresis
    (PRICEBOT_SPEC_V2.md:92-99; rjQF run-route diff).

    target = clamp(best - step, [min, max]); no competitors ->
    clamp(current); keep current when |target - current| <= step.
    """
    raw = F.when(best_opponent.isNotNull(), best_opponent - step).otherwise(current_price)
    clamped = F.least(F.greatest(raw, min_price), max_price)
    return F.when(F.abs(clamped - current_price) <= step, current_price).otherwise(clamped).cast("long")


# ---------------------------------------------------------------------------
# Misc coercions (F22-F23)
# ---------------------------------------------------------------------------


def coalesce_stock(*cols: Column) -> Column:
    """F22: first non-null stock candidate, default 0
    (BUNDLE/.../stats/route.ts:48-67)."""
    return F.coalesce(*cols, F.lit(0)).cast("long")


def bool_from_text(col: Column | str) -> Column:
    """F23: /on|true|1/i -> true (BUNDLE/.../import/route.ts:41,60)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c)).rlike("^(on|true|1)$")


def normalize_header(name: str) -> str:
    """P2: header normalization (scripts/etl_sales.py:45)."""
    import re

    return re.sub(r"\s+", "_", name.strip()).lower()
