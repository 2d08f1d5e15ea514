"""BM25 top-k + reciprocal-rank fusion (llm/retrieval.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kaspi_etl_spark.llm import retrieval
from kaspi_etl_spark.llm.lm import FLOG2_ONE, flog2_int


def _bm25_reference(docs: dict[int, str], terms: list[str], k=10):
    """Pure-Python mirror of the fixed-point BM25 (module header
    algebra) for handmade corpora."""
    toks = {i: [w for w in t.lower().split() if w] for i, t in docs.items()}
    n = len(docs)
    tt = sum(len(ws) for ws in toks.values())
    df = {}
    for ws in toks.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    scores = {}
    hits = {}
    for i, ws in toks.items():
        dl = len(ws)
        s = 0
        h = 0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            h += 1
            idf = max(
                0, flog2_int(2 * n - 2 * df[t] + 1) - flog2_int(2 * df[t] + 1)
            )
            s += (idf * 20 * tt * tf) // (8 * tt * tf + 3 * tt + 9 * dl * n)
        if h:
            scores[i] = s
            hits[i] = h
    ranked = sorted(scores, key=lambda i: (-scores[i], i))[:k]
    return [(i, scores[i], hits[i], r + 1) for r, i in enumerate(ranked)]


def test_bm25_topk_matches_reference(spark):
    docs = {
        1: "apple banana apple cherry",
        2: "banana banana banana",
        3: "cherry date elderberry",
        4: "apple apple apple apple apple",
        5: "fig grape",
        6: "",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = [
        (r.doc_id, r.score_scaled, r.n_terms_hit, r.rank)
        for r in retrieval.bm25_topk(
            df, query_terms=["apple", "cherry"], k=10
        ).collect()
    ]
    assert got == _bm25_reference(docs, ["apple", "cherry"])


def test_bm25_topk_rare_term_outscores_common(spark):
    """A doc matching the rare query term must outrank a doc matching
    only the ubiquitous one — the idf property that separates BM25 from
    raw tf counting."""
    rows = [(i, "common filler words here") for i in range(20)]
    rows.append((100, "common rareterm"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = retrieval.bm25_topk(df, query_terms=["common", "rareterm"], k=3).collect()
    assert top[0].doc_id == 100 and top[0].n_terms_hit == 2


def test_bm25_default_query_is_top_terms(spark):
    """query_terms=None derives the corpus' most frequent terms —
    deterministic, so two runs rank identically."""
    rows = [(i, "alpha beta gamma alpha") for i in range(5)]
    rows += [(10 + i, "beta beta delta") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = [(r.doc_id, r.score_scaled) for r in retrieval.bm25_topk(df).collect()]
    b = [(r.doc_id, r.score_scaled) for r in retrieval.bm25_topk(df).collect()]
    assert a == b and len(a) > 0


def test_bm25_topk_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta") for i in range(50)], "doc_id long, text string"
    )
    out = retrieval.bm25_topk(df, query_terms=["alpha"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_rrf_scale_divisibility():
    s = retrieval.rrf_scale(60, 10)
    assert all(s % (60 + r) == 0 for r in range(1, 11))
    assert s == math.lcm(*range(61, 71))


def test_rrf_fuse_handmade(spark):
    """Two systems, overlapping lists: fused score = sum of exact
    integer contributions; an item ranked by both systems beats an
    item ranked #1 by only one when the math says so."""
    s = retrieval.rrf_scale(60, 10)
    sys1 = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (1, 102, 3)],
        "query_id long, vec_id long, rank long",
    )
    sys2 = spark.createDataFrame(
        [(1, 101, 1), (1, 103, 2)],
        "query_id long, vec_id long, rank long",
    )
    got = {
        r.vec_id: (r.rrf_scaled, r.n_systems, r.rank)
        for r in retrieval.rrf_fuse([sys1, sys2]).collect()
    }
    exp_101 = s // 62 + s // 61  # rank 2 in sys1, rank 1 in sys2
    exp_100 = s // 61
    exp_102 = s // 63
    exp_103 = s // 62
    assert got[101] == (exp_101, 2, 1)
    assert got[100] == (exp_100, 1, 2)
    # 103 (s//62) beats 102 (s//63); both single-system
    assert got[103] == (exp_103, 1, 3)
    assert got[102] == (exp_102, 1, 4)


def test_rrf_fuse_ignores_ranks_past_max(spark):
    sys1 = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 11)], "query_id long, vec_id long, rank long"
    )
    got = retrieval.rrf_fuse([sys1], max_rank=10).collect()
    assert [r.vec_id for r in got] == [100]


def test_rrf_fuse_tie_breaks_on_id(spark):
    sys1 = spark.createDataFrame(
        [(1, 200, 1), (1, 100, 1)], "query_id long, vec_id long, rank long"
    )
    sys2 = spark.createDataFrame(
        [(2, 5, 1)], "query_id long, vec_id long, rank long"
    )
    got = retrieval.rrf_fuse([sys1, sys2]).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.rank))
    # same score -> lower id first; per-query windows are independent
    assert by_q[1] == [(100, 1), (200, 2)]
    assert by_q[2] == [(5, 1)]
