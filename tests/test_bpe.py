"""Unit tests for distributed BPE training (llm/bpe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import bpe as bpe_ops


def _py_double_replace(seq: str, lft: str, rgt: str) -> str:
    """Python model of apply_merge: pad, two leftmost-non-overlapping
    replace passes, trim — Python str.replace has the same scan
    semantics as Spark/DuckDB replace."""
    pat = f" {lft} {rgt} "
    rep = f" {lft}{rgt} "
    return f" {seq} ".replace(pat, rep).replace(pat, rep).strip()


def test_apply_merge_matches_python_model(spark):
    cases = [
        ("t h e", "t", "h"),
        ("a b a b a b a b", "a", "b"),   # boundary-sharing chain
        ("a a a a a", "a", "a"),          # repeated-symbol run
        ("a a a a", "a", "a"),
        ("a a a", "a", "a"),
        ("x", "a", "b"),                  # no occurrence
        ("ab c ab c", "ab", "c"),         # multi-char symbols
        ("b a b", "a", "b"),              # occurrence not at start
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(cases)], "i long, seq string"
    )
    for i, (s, lft, rgt) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(bpe_ops.apply_merge(F.col("seq"), lft, rgt).alias("r"))
            .collect()[0]["r"]
        )
        assert got == _py_double_replace(s, lft, rgt), (s, lft, rgt, got)
    # the documented deviation: leftmost-then-skip per pass on runs
    assert _py_double_replace("a a a a a", "a", "a") == "aa a aa"
    # and two passes reach the fixpoint: a third pass changes nothing
    out2 = _py_double_replace("a b a b a b a b", "a", "b")
    assert out2 == "ab ab ab ab"
    assert " a b " not in f" {out2} "


def test_pair_counts_weighted_and_overlapping(spark):
    seqs = spark.createDataFrame(
        [("aaa", 2, "a a a"), ("ab", 3, "a b"), ("c", 5, "c")],
        "word string, cnt long, seq string",
    )
    pc = {
        (r["lft"], r["rgt"]): r["pair_cnt"]
        for r in bpe_ops.pair_counts(seqs).collect()
    }
    # 'a a a' has TWO overlapping (a,a) occurrences, weighted by cnt=2
    assert pc == {("a", "a"): 4, ("a", "b"): 3}


def test_bpe_train_hand_computed(spark):
    # corpus: 'low' x3, 'lower' x1 -> dict {low:3, lower:1}
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low")], "doc_id long, text string"
    )
    merges, seg = bpe_ops.bpe_train(docs, n_merges=3)
    got = [(m["lft"], m["rgt"], m["pair_cnt"]) for m in merges]
    # step1: pairs l-o:4, o-w:4, w-e:1, e-r:1 -> tie (l,o) vs (o,w),
    #        lexical tie-break picks (l,o)
    # step2: lo-w:4, w-e:1, e-r:1 -> (lo,w)
    # step3: low-e:1, e-r:1 -> tie, (e,r) < (low,e)? 'e' < 'low' -> (e,r)
    assert got == [("l", "o", 4), ("lo", "w", 4), ("e", "r", 1)]
    segd = {r["word"]: r["seq"] for r in seg.collect()}
    assert segd == {"low": "low", "lower": "low er"}


def test_bpe_train_stops_when_no_pairs(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    merges, seg = bpe_ops.bpe_train(docs, n_merges=10)
    # single-char words have no adjacent pairs: zero merges, no crash
    assert merges == []
    assert {r["seq"] for r in seg.collect()} == {"a", "b", "c"}


def test_bpe_encode_stats_zero_word_and_oov(spark):
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    _, seg = bpe_ops.bpe_train(docs, n_merges=2)
    stats = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_ops.bpe_encode_stats(docs, seg).collect()
    }
    assert stats[2] == (0, 0) and stats[3] == (0, 0)
    assert stats[1][0] == 2
    # OOV fallback: encode a doc with a word absent from the dictionary
    other = spark.createDataFrame([(9, "low zzz")], "doc_id long, text string")
    st = bpe_ops.bpe_encode_stats(other, seg).collect()[0]
    # 'zzz' falls back to its character count (3)
    assert st["n_words"] == 2 and st["n_tokens"] >= 1 + 3


def test_top_pair_is_bounded_read(spark):
    """The argmax compiles to TakeOrderedAndProject — a bounded one-row
    driver read, never a global sort."""
    seqs = spark.createDataFrame(
        [("ab", 1, "a b")], "word string, cnt long, seq string"
    )
    plan = (
        bpe_ops.pair_counts(seqs)
        .orderBy(F.desc("pair_cnt"), F.asc("lft"), F.asc("rgt"))
        .limit(1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
