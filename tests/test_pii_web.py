"""PII redaction and URL blocklist unit tests (hand-computed expectations;
the registry oracles cover the profile/rollup queries end-to-end)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import pii, web


def test_redact_documents_tokens(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@sub.example.com now"),
            (2, "pay 4400 1234 5678 9012 or +7 (701) 555-12-34"),
            (3, "host 192.168.0.1 clean tail"),
            (4, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in pii.redact_documents(docs).collect()
    }
    assert out[1] == "mail [EMAIL] now"
    assert out[2] == "pay [CARD] or [PHONE]"
    assert out[3] == "host [IP] clean tail"
    assert out[4] == "no pii here at all"


def test_pii_profile_counts_and_redacted_chars(spark):
    docs = spark.createDataFrame(
        [(1, "x a@b.io y c@d.org z 10.0.0.1")], ["doc_id", "text"]
    )
    row = pii.pii_profile(docs).collect()[0]
    assert (row["n_email"], row["n_ipv4"], row["n_card"], row["n_phone"]) == (
        2,
        1,
        0,
        0,
    )
    assert row["pii_total"] == 3
    # "a@b.io" (6) + "c@d.org" (7) + "10.0.0.1" (8) characters deleted
    assert row["redacted_chars"] == 21


def test_filter_blocked_domains_keeps_urlfree_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "see https://ok.example.com/a"),
            (2, "see https://spam.example.com/x and https://ok.example.com/b"),
            (3, "no urls"),
        ],
        ["doc_id", "text"],
    )
    kept = web.filter_blocked_domains(docs, ["spam.example.com"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_domain_rollup_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "a https://x.example.com/1 b https://x.example.com/2"),
            (2, "c https://x.example.com/3 d https://y.example.net/"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["domain"]: r for r in web.domain_rollup(docs, ["y.example.net"]).collect()
    }
    assert rows["x.example.com"]["n_urls"] == 3
    assert rows["x.example.com"]["n_docs"] == 2
    assert not rows["x.example.com"]["blocked"]
    assert rows["y.example.net"]["blocked"]


def test_pii_profile_is_shuffle_free(spark, sf_dir):
    from kaspi_etl_spark.registry import QUERIES

    plan = (
        QUERIES["docs_pii_profile"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # scalar regex pass: zero shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_blocklist_is_broadcast_anti_join(spark, sf_dir):
    from kaspi_etl_spark.registry import QUERIES

    plan = (
        QUERIES["docs_url_blocklist"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
