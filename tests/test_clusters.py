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
