"""PII detection and redaction over document corpora.

Training-data pipelines must strip personally identifiable information
before corpus release (the C4/Dolma-style cleaning stage). This module
profiles and redacts four high-recall PII categories — email addresses,
international-format phone numbers, IPv4 addresses, and 16-digit payment
card numbers — with pure ``pyspark.sql.functions`` regex expressions:
everything stays JVM-side inside whole-stage codegen, no Python UDFs.

Pattern discipline: every regex uses only constructs whose semantics are
identical between Java's regex engine (Spark) and RE2 (DuckDB) — ASCII
character classes, bounded repetition, non-capturing groups, ``\\b`` word
boundaries — so the DuckDB oracles in the registry can mirror detection
and redaction op-for-op.

Scale: per-row regex scans parallelize embarrassingly (no shuffle); the
profile aggregation is map-side combinable. At 100 TB the regex pass is
IO-bound on the text column scan, which parquet column pruning keeps
narrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Category -> (pattern, redaction token). Order matters for redaction:
# payment cards redact before phone-like digit runs would ever see them
# (the patterns are disjoint today — phones require a leading '+' — but
# the fixed order keeps redaction deterministic if patterns evolve).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    "card": (
        r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
        "[CARD]",
    ),
    "phone": (
        r"\+\d{1,3}[ -]?\(?\d{2,4}\)?[ -]?\d{3}[ -]?\d{2}[ -]?\d{2}",
        "[PHONE]",
    ),
    "ipv4": (
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "[IP]",
    ),
}


def count_matches(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` in ``text``
    (group 0 — PySpark's regexp_extract_all defaults to group 1)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def redact_text(text: Column, token: bool = True) -> Column:
    """Apply all PII redactions in the fixed PII_PATTERNS order.

    ``token=True`` replaces each match with its category token
    ("[EMAIL]" etc.); ``token=False`` deletes matches outright (the form
    the length-delta profile uses, mirrored exactly by the SQL oracle).
    """
    out = text
    for _, (pattern, tok) in PII_PATTERNS.items():
        out = F.regexp_replace(out, pattern, tok if token else "")
    return out


def pii_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII profile: one count column per category, the
    total, and how many characters redaction would delete.

    Zero-shuffle: every column is a scalar regex expression over the
    document row; the output keeps one row per input document so
    downstream filters (e.g. drop docs with any card number) stay
    narrow.
    """
    text = F.col(text_col)
    counts = {
        name: count_matches(text, pattern)
        for name, (pattern, _) in PII_PATTERNS.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        F.col(id_col),
        *[counts[name].cast("long").alias(f"n_{name}") for name in PII_PATTERNS],
        total.cast("long").alias("pii_total"),
        (F.length(text) - F.length(redact_text(text, token=False)))
        .cast("long")
        .alias("redacted_chars"),
    )


def redact_documents(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Replace every PII match in ``text_col`` with its category token,
    keeping all other columns — the corpus-release cleaning stage."""
    return docs.withColumn(text_col, redact_text(F.col(text_col), token=True))
