"""Connected-components unit tests on hand-built graphs."""

from __future__ import annotations

from kaspi_etl_spark.llm import dedup


def test_connected_components_basic(spark):
    # components: {1,2,3,4} (chain), {10,11}, singleton edges only appear
    # via pairs so isolated docs are absent by design
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {r.doc_id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_bridges(spark):
    # two cliques joined by one bridge edge -> single component
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (7, 8), (7, 9), (8, 9), (3, 7)],
        "id_a long, id_b long",
    )
    out = {r.doc_id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert set(out.values()) == {1}
    assert len(out) == 6


def test_asof_join_semantics(spark):
    import datetime

    from kaspi_etl_spark.ops.asof import asof_join

    t = lambda m: datetime.datetime(2025, 9, 1, 12, m, 0)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u1", t(5)), (2, "u1", t(10)), (3, "u2", t(3)), (4, "u3", t(1))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", t(4), 100.0), ("u1", t(10), 200.0), ("u2", t(9), 300.0)],
        "user_id string, r_ts timestamp, value double",
    )
    out = {
        r.event_id: (r.value_asof, r.r_ts_asof)
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="r_ts",
            value_cols=["value", "r_ts"],
        ).collect()
    }
    assert out[1] == (100.0, t(4))     # latest at-or-before 12:05
    assert out[2] == (200.0, t(10))    # exact-time match included
    assert out[3] == (None, None)      # right row is in the future
    assert out[4] == (None, None)      # no right rows for key
