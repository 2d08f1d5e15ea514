"""Fellegi–Sunter record-linkage scoring (ops/entity.fs_linkage_scores).

Value parity vs the DuckDB oracle rides tests/test_entry.py; these pin
the SEMANTICS on hand-made rows: agreement weights are positive when
m > u, disagreement weights negative, NULL fields score as
disagreement, and the blocking cap bounds candidates.
"""

from __future__ import annotations

from kaspi_etl_spark.ops.entity import fs_linkage_scores


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "id LONG, name STRING, brand STRING, typ STRING, size LONG"
    )


def test_fs_agreeing_pair_scores_above_disagreeing(spark):
    df = _frame(
        spark,
        [
            (1, "acme widget", "X", "A", 5),
            (2, "acme gadget", "X", "A", 5),
            (3, "acme other", "Y", "B", 9),
        ],
    )
    out = fs_linkage_scores(
        df, id_col="id", name_col="name", fields=["brand", "typ", "size"]
    )
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    # all three share the first-token block "acme"
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}
    full_agree = rows[(1, 2)]
    full_disagree = rows[(1, 3)]
    assert full_agree["agree_brand"] == 1
    assert full_agree["score_c"] > 0  # every field agrees, m > u everywhere
    assert full_disagree["agree_brand"] == 0
    assert full_disagree["score_c"] < 0  # every field disagrees
    assert full_agree["score_c"] > full_disagree["score_c"]


def test_fs_null_field_counts_as_disagreement(spark):
    df = _frame(
        spark,
        [
            (1, "zeta pump", "X", "A", 5),
            (2, "zeta pump", None, "A", 5),
            (3, "zeta pump", None, "A", 5),
        ],
    )
    out = fs_linkage_scores(
        df, id_col="id", name_col="name", fields=["brand", "typ", "size"]
    )
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    # NULL vs value AND NULL vs NULL both disagree (SQL equality semantics)
    assert rows[(1, 2)]["agree_brand"] == 0
    assert rows[(2, 3)]["agree_brand"] == 0
    # the non-null fields still agree
    assert rows[(2, 3)]["agree_typ"] == 1 and rows[(2, 3)]["agree_size"] == 1


def test_fs_block_cap_bounds_candidates(spark):
    # 30 rows all sharing both block tokens: uncapped would give C(30,2)
    # = 435 pairs; cap 5 bounds it at C(5,2) per pass, deduped.
    rows = [(i, "same name", f"b{i}", "t", i) for i in range(30)]
    df = _frame(spark, rows)
    out = fs_linkage_scores(
        df, id_col="id", name_col="name", fields=["brand", "typ", "size"],
        max_block=5,
    )
    assert out.count() <= 20  # two passes x C(5,2), before pair dedup
