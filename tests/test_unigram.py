"""Unit tests for the unigram-LM tokenizer (llm/unigram.py): a pure-
Python brute-force mirror (enumerate ALL segmentations with the same
fixed-point costs) pins Viterbi optimality; edge tests pin the
char-segmentation fallback and the EM re-estimation counts."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import unigram
from kaspi_etl_spark.llm.lm import flog2_int


def _py_seed(words: dict[str, int], max_len: int, min_count: int) -> dict[str, int]:
    counts: dict[str, int] = {}
    for w, c in words.items():
        for j in range(len(w)):
            for l in range(1, min(max_len, len(w) - j) + 1):
                p = w[j : j + l]
                counts[p] = counts.get(p, 0) + c
    return {
        p: c for p, c in counts.items() if c >= min_count or len(p) == 1
    }


def _py_costs(pieces: dict[str, int]) -> dict[str, int]:
    t = flog2_int(sum(pieces.values()))
    return {p: t - flog2_int(c) for p, c in pieces.items()}


def _py_best_cost(word: str, costs: dict[str, int], max_len: int) -> int:
    """Brute-force minimum over every segmentation into vocab pieces."""
    n = len(word)
    best = None
    # compositions of n into parts of size 1..max_len
    for cuts in itertools.product(range(1, max_len + 1), repeat=n):
        parts, i = [], 0
        for d in cuts:
            if i >= n:
                break
            parts.append(word[i : i + d])
            i += d
        if i != n:
            continue
        if any(p not in costs for p in parts):
            continue
        c = sum(costs[p] for p in parts)
        if best is None or c < best:
            best = c
    assert best is not None
    return best


def test_viterbi_matches_bruteforce_min_cost(spark):
    # corpus with repeated structure so multi-char pieces earn low cost
    words = ["abab", "ab", "ba", "abc", "cab", "aabb", "b"]
    text = " ".join(w for w in words for _ in range(5))
    docs = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    pc, seg = unigram.unigram_train(docs, min_count=3)
    costs = {r.piece: r.cost for r in pc.collect()}
    got = {r.word: r for r in seg.collect()}
    assert set(got) == set(words)
    for w in words:
        expect = _py_best_cost(w, costs, unigram.PIECE_MAX_LEN)
        assert got[w].cost_scaled == expect, w
        # the reported seg reassembles the word and prices to the cost
        parts = got[w].seg.split(" ")
        assert "".join(parts) == w
        assert sum(costs[p] for p in parts) == got[w].cost_scaled
        assert got[w].n_pieces == len(parts)


def test_seed_pieces_match_python_mirror(spark):
    words = {"abab": 5, "ab": 5, "ba": 5, "abc": 5, "cab": 5, "aabb": 5, "b": 5}
    text = " ".join(w for w, c in words.items() for _ in range(c))
    docs = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    from kaspi_etl_spark.llm.bpe import word_counts

    got = {
        r.piece: r.cnt
        for r in unigram.seed_pieces(word_counts(docs), min_count=3).collect()
    }
    assert got == _py_seed(words, unigram.PIECE_MAX_LEN, 3)


def test_long_words_fall_back_to_char_segmentation(spark):
    long_word = "abcdefghijabcdefghij"  # 20 chars > WORD_MAX_LEN
    text = ("xy " * 5) + (long_word + " ") * 4
    docs = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    pc, seg = unigram.unigram_train(docs, min_count=1)
    row = [r for r in seg.collect() if r.word == long_word][0]
    assert row.n_pieces == 20
    assert row.seg == " ".join(long_word)
    costs = {r.piece: r.cost for r in pc.collect()}
    assert row.cost_scaled == sum(costs[ch] for ch in long_word)


def test_em_reestimate_counts_weighted_occurrences(spark):
    # force a known segmentation by constructing seg directly
    seg = spark.createDataFrame(
        [("abab", 10, "ab ab"), ("abc", 5, "ab c")],
        "word STRING, cnt LONG, seg STRING",
    )
    got = {r.piece: r.em_cnt for r in unigram.em_reestimate(seg).collect()}
    assert got == {"ab": 25, "c": 5}
    # costs renormalize against the new total (30)
    em = {r.piece: r.em_cost_scaled for r in unigram.em_reestimate(seg).collect()}
    assert em["ab"] == flog2_int(30) - flog2_int(25)
    assert em["c"] == flog2_int(30) - flog2_int(5)


def test_empty_corpus_raises_cleanly(spark):
    import pytest

    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="empty vocabulary"):
        unigram.unigram_train(empty)


def test_lpt_invalid_shard_count_raises(spark):
    import pytest

    from kaspi_etl_spark.llm.text import lpt_token_shards

    docs = spark.createDataFrame([(1, "a b")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="n_shards"):
        lpt_token_shards(docs, n_shards=0)


def test_model_persistence_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "abab ab ba abc cab " * 5)], "doc_id LONG, text STRING"
    )
    pc, seg = unigram.unigram_train(docs, min_count=2)
    path = str(tmp_path / "uni_model")
    unigram.save_model(pc, seg, path)
    pc2, seg2 = unigram.load_model(spark, path)
    assert sorted(map(tuple, pc.collect())) == sorted(map(tuple, pc2.collect()))
    assert sorted(map(tuple, seg.collect())) == sorted(map(tuple, seg2.collect()))
    # encoding from the reloaded model is bit-identical
    a = unigram.unigram_encode_stats(docs, seg).collect()
    b = unigram.unigram_encode_stats(docs, seg2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_encode_oov_falls_back_to_char_count(spark):
    seg = spark.createDataFrame(
        [("ab", 5, 1, 100, "ab")],
        "word STRING, cnt LONG, n_pieces LONG, cost_scaled LONG, seg STRING",
    )
    docs = spark.createDataFrame(
        [(1, "ab zzzz"), (2, ""), (3, None)], "doc_id LONG, text STRING"
    )
    got = {r.doc_id: r for r in unigram.unigram_encode_stats(docs, seg).collect()}
    assert (got[1].n_words, got[1].n_tokens) == (2, 1 + 4)  # ab=1, zzzz=4 chars
    assert (got[2].n_words, got[2].n_tokens) == (0, 0)
    assert (got[3].n_words, got[3].n_tokens) == (0, 0)
