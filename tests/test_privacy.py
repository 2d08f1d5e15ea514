"""k-anonymity transforms (ops/privacy.py)."""

import pytest
from pyspark.sql import functions as F

from kaspi_etl_spark.ops import privacy


def _people(spark):
    rows = (
        [(i, "A", 10) for i in range(5)]       # big group: released
        + [(100, "B", 20), (101, "B", 20)]     # size 2: suppressed at k=3
        + [(200, None, 30)]                    # NULL quasi, size 1: suppressed
        + [(300 + i, None, 40) for i in range(4)]  # NULL quasi, size 4: released
    )
    return spark.createDataFrame(rows, "pid long, seg string, region long")


def test_k_anonymize_suppresses_small_and_null_groups(spark):
    out = {r["pid"]: r for r in
           privacy.k_anonymize(_people(spark), ["seg", "region"], k=3).collect()}
    assert len(out) == 12  # row count preserved
    for i in range(5):
        assert (out[i]["seg"], out[i]["region"], out[i]["grp_n"]) == ("A", 10, 5)
    for pid in (100, 101):
        assert out[pid]["seg"] is None and out[pid]["region"] is None
        assert out[pid]["grp_n"] == 2  # count still reported for audit
    # NULL quasi values are real combinations: counted, and released
    # when the group is large enough
    assert out[200]["grp_n"] == 1 and out[200]["region"] is None
    assert out[300]["grp_n"] == 4 and out[300]["region"] == 40


def test_released_table_is_k_anonymous(spark):
    k = 3
    out = privacy.k_anonymize(_people(spark), ["seg", "region"], k=k)
    released = out.filter(F.col("grp_n") >= k).groupBy("seg", "region").count()
    assert all(r["count"] >= k for r in released.collect())


def test_suppression_report_and_validation(spark):
    rep = {(r["seg"], r["region"]): (r["grp_n"], r["suppressed"])
           for r in privacy.suppression_report(
               _people(spark), ["seg", "region"], k=3).collect()}
    assert rep[("A", 10)] == (5, 0)
    assert rep[("B", 20)] == (2, 1)
    assert rep[(None, 30)] == (1, 1)
    assert rep[(None, 40)] == (4, 0)
    with pytest.raises(ValueError):
        privacy.k_anonymize(_people(spark), ["seg"], k=0)
