"""Unit tests for text retrieval scoring (BM25)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import text as text_ops


def test_bm25_semantics(spark):
    rows = [
        (1, "spark spark spark filler words here"),  # high tf for 'spark'
        (2, "spark filler words here again now"),    # low tf for 'spark'
        (3, "hash spark mixed content words here"),  # two query terms
        (4, "nothing relevant in this document at"),  # no match -> absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_terms, r.bm25)
        for r in text_ops.bm25_scores(docs, ["spark", "hash"]).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1][0] == 1 and out[2][0] == 1 and out[3][0] == 2
    # tf saturation: more occurrences score higher, same doc length
    assert out[1][1] > out[2][1]
    # reimplement the scoring for doc 2 ('spark': tf=1, df=3, N=4, dl=6)
    n_docs, df, tf, dl, sum_dl = 4, 3, 1, 6, 24
    k1, b = 1.2, 0.75
    idf = (2 * (n_docs - df) + 1) / (2 * df + 1)
    ratio = (dl * n_docs) / sum_dl
    expected = (idf * (tf * (k1 + 1.0))) / (tf + k1 * ((1.0 - b) + b * ratio))
    assert math.isclose(out[2][1], expected, rel_tol=0, abs_tol=0)


def test_bm25_k1_b_parameterization(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark words here"), (2, "spark words here filler extra more")],
        "doc_id long, text string",
    )
    # b=0: no length normalization -> score independent of dl
    flat = {
        r.doc_id: r.bm25
        for r in text_ops.bm25_scores(docs, ["spark"], k1=1.2, b=0.0).collect()
    }
    # k1=0: tf saturates completely -> equal scores despite tf 2 vs 1
    sat = {
        r.doc_id: r.bm25
        for r in text_ops.bm25_scores(docs, ["spark"], k1=0.0, b=0.75).collect()
    }
    assert flat[1] > flat[2]  # only tf differs
    assert sat[1] == sat[2]


def test_strip_boilerplate_lines_removes_high_df_chunks(spark):
    # 'nav bar home' appears in 3 docs -> boilerplate at min_doc_freq=2;
    # every other 2-word-chunk line is unique.
    rows = [
        (1, "nav bar home alpha beta gamma"),
        (2, "nav bar home delta epsilon zeta"),
        (3, "eta theta iota nav bar home"),
        (4, "kappa lambda mu nu xi omicron"),
        (5, "nav bar home"),  # all lines removed -> empty clean_text
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in text_ops.strip_boilerplate_lines(
            docs, words_per_line=3, min_doc_freq=2
        ).collect()
    }
    assert len(out) == 5
    assert out[1].clean_text == "alpha beta gamma"
    assert out[2].clean_text == "delta epsilon zeta"
    # order preserved: kept line precedes nothing, boilerplate was the tail
    assert out[3].clean_text == "eta theta iota"
    # untouched doc keeps full text and all lines
    assert out[4].clean_text == "kappa lambda mu nu xi omicron"
    assert (out[4].n_lines, out[4].n_kept) == (2, 2)
    # fully-boilerplate doc still present with empty text
    assert out[5].clean_text == "" and out[5].n_kept == 0


def test_c4_quality_flags_line_and_page_rules(spark):
    good = (
        "This is a perfectly fine sentence with many words.\n"
        "Short line.\n"
        "Another long enough line that ends with a question mark?\n"
        "this line mentions javascript and has enough words here.\n"
        "no terminal punctuation on this long line at all"
    )
    rows = [
        (1, good + "\nAnd a third sentence to pass the minimum!"),
        (2, "Contains lorem ipsum filler. More words here. Third one."),
        (3, "function() { return 1; } Yes. Indeed. Truly."),
        (4, "One sentence only, with plenty of words in it."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.c4_quality_flags(docs).collect()}
    # doc 1: keeps the 3 valid lines, drops short/javascript/no-punct ones
    assert out[1].n_lines == 6 and out[1].n_kept_lines == 3
    assert out[1].kept_text.count("\n") == 2
    assert "javascript" not in out[1].kept_text
    assert out[1].c4_pass
    # page-level drops
    assert out[2].has_lorem and not out[2].c4_pass
    assert out[3].has_brace and not out[3].c4_pass
    # sentence minimum
    assert out[4].n_sentences == 1 and not out[4].c4_pass


def test_corpus_mix_allocation_sums_to_budget(spark):
    """Largest-remainder apportionment: allocations sum EXACTLY to the
    budget, every source gets at least its floor quota, and extras go to
    the largest remainders."""
    from kaspi_etl_spark.registry import QUERIES

    rows = QUERIES["corpus_mix_allocation"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r["alloc"] for r in rows) == 100_000
    assert all(r["alloc"] in (r["base_alloc"], r["base_alloc"] + 1) for r in rows)
    assert all(0.0 < r["sample_rate"] for r in rows)


def test_token_budget_sample_matches_global_window(spark):
    """The bucketed two-phase prefix sum must equal the naive single
    global-order window at any bucket_bits."""
    from pyspark.sql import Window

    from kaspi_etl_spark.llm.dedup import md5_long
    from kaspi_etl_spark.llm.text import token_budget_sample, whitespace_token_count

    rows = [(i, ("tok " * (i % 17 + 1)).strip()) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    naive = (
        df.select(
            "doc_id",
            whitespace_token_count(F.col("text")).alias("n_tokens"),
            md5_long(F.col("doc_id").cast("string"), salt="tbs").alias("_pri"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.sum("n_tokens")
            .over(
                Window.orderBy("_pri", "doc_id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .cast("long")
            .alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= 700)
    )
    expected = sorted(tuple(r) for r in naive.collect())
    for bits in (4, 16):
        got = sorted(
            tuple(r)
            for r in token_budget_sample(df, budget=700, bucket_bits=bits).collect()
        )
        assert got == expected
    # greedy prefix semantics: total within budget, and adding the next
    # hash-ordered doc would exceed it
    total = sum(r[1] for r in expected)
    assert total <= 700


def test_token_shard_assignment_balanced(spark):
    rows = [(i, ("tok " * (i % 23 + 1)).strip()) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    S = 250
    out = text_ops.token_shard_assignment(df, shard_tokens=S, bucket_bits=4).collect()
    max_doc = max(r.n_tokens for r in out)
    sizes: dict[int, int] = {}
    for r in out:
        sizes[r.shard_id] = sizes.get(r.shard_id, 0) + r.n_tokens
        # a doc starts in the shard its span begins in
        assert r.shard_id == (r.cum_tokens - r.n_tokens) // S
    last = max(sizes)
    # shard ids are contiguous from 0; every full shard is within one
    # document of the target (a doc overrunning the boundary shifts the
    # next shard's start, so the bound is +/- the largest doc)
    assert set(sizes) == set(range(last + 1))
    for sid, tot in sizes.items():
        if sid != last:
            assert S - max_doc < tot < S + max_doc


def test_term_rarity_hand_computed(spark):
    from kaspi_etl_spark.llm.text import term_rarity

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),          # the:2, cat:2, sat:1
            (2, "the cat ran ran"),      # the:2, cat:2, ran:1 (distinct terms)
            (3, "zz9!"),                 # zz -> hapax (digits/punct stripped)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in term_rarity(docs).collect()}
    assert out[1].n_terms == 3 and out[1].sum_df == 5 and out[1].n_hapax == 1
    assert out[2].n_terms == 3 and out[2].sum_df == 5 and out[2].n_hapax == 1
    assert out[3].n_terms == 1 and out[3].sum_df == 1 and out[3].n_hapax == 1
    assert out[1].mean_df == 5 / 3


def test_pack_sequences_invariants(spark):
    from pyspark.sql import functions as F

    from kaspi_etl_spark.llm import text

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([100, 700, 1, 511, 513, 0])],
        "doc_id long, text string",
    )
    out = text.pack_sequences(docs, seq_len=512).collect()
    total = sum(r["n_in_seq"] for r in out)
    assert total == 100 + 700 + 1 + 511 + 513  # empty doc contributes nothing
    # per-doc segments reassemble the doc exactly, in order
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, segs in by_doc.items():
        segs.sort(key=lambda r: r["doc_offset"])
        assert segs[0]["doc_offset"] == 0
        for a, b in zip(segs, segs[1:]):
            assert a["doc_offset"] + a["n_in_seq"] == b["doc_offset"]
    # per-sequence segments tile [0, 512) without overlap, full except last
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for seq_id, segs in sorted(by_seq.items()):
        segs.sort(key=lambda r: r["seq_offset"])
        pos = 0
        for sg in segs:
            assert sg["seq_offset"] == pos
            pos += sg["n_in_seq"]
        if seq_id < max(by_seq):
            assert pos == 512  # interior sequences are exactly full

