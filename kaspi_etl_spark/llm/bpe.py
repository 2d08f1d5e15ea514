"""Distributed BPE tokenizer training and application.

Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") re-expressed for
Spark's execution model. No reference-repo counterpart — this is part
of the LLM training-data surface the brief layers on top of the
reference inventory (nearest reference anchor: the token-count quality
gates mirrored by llm/text.py).

Scale shape. ONE corpus-wide shuffle builds the word-frequency
dictionary (explode -> groupBy word, map-side combined); every training
iteration after that touches ONLY the dictionary — vocabulary-sized
(tens of millions of rows at 100 TB), never the corpus. Per merge step:
one partial-agg shuffle over the dictionary's adjacent-pair explosion
plus a bounded ONE-ROW driver read (the argmax pair — the same bounded
convergence-read discipline as the k-means loop, similarity.py).
Applying the trained tokenizer back to the corpus is a dictionary
equi-join (broadcast while the dict fits, hash join otherwise), never a
per-document Python loop.

Determinism — what makes the unrolled DuckDB oracle possible:

  - pair counts are exact integers; the argmax tie-break is
    (count DESC, left ASC, right ASC) over BMP-only symbols, where
    Spark's UTF-16 and DuckDB's UTF-8 binary string orders agree;
  - merge application is a literal double-replace over space-delimited
    symbol strings. ``replace`` scans leftmost-non-overlapping and
    never rescans its own output in both engines; the second pass
    catches exactly the occurrences whose LEADING space the first pass
    consumed. Two passes always suffice: an occurrence is only skipped
    immediately after a match, so skipped occurrences are never
    adjacent to each other.

Deliberate deviation from the classic rescanning implementation: on
runs of a repeated symbol, 'a a a a a' with merge (a,a) becomes
'aa a aa' here (leftmost-then-skip per pass) where Sennrich's rescan
yields 'aa aa a' — same merge count, shifted boundaries. Chosen because
it is a fixed-depth expression tree in BOTH engines instead of an
unbounded per-word loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import extract_words


def word_counts(
    docs: DataFrame, text_col: str = "text", word_col: str = "word"
) -> DataFrame:
    """Corpus word-frequency dictionary: (word, cnt BIGINT).

    The single corpus-wide pass of BPE training. explode_outer + filter
    (not plain explode) — see the InferFiltersFromGenerate note on
    bm25_scores: an inferred generator filter would re-run the word
    regex in the scan."""
    words = docs.select(
        F.explode_outer(extract_words(F.col(text_col))).alias(word_col)
    )
    return (
        words.filter(F.col(word_col).isNotNull() & (F.col(word_col) != ""))
        .groupBy(word_col)
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def char_spaced(word: Column) -> Column:
    """Initial symbol sequence: one space between adjacent characters
    ('the' -> 't h e'). Mirrors DuckDB
    ``trim(regexp_replace(word, '(.)', '\\1 ', 'g'))``."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def apply_merge(seq: Column, lft: str, rgt: str) -> Column:
    """Merge every (lft, rgt) adjacent symbol pair in a space-delimited
    sequence — the double-replace documented in the module docstring."""
    pat = F.lit(f" {lft} {rgt} ")
    rep = F.lit(f" {lft}{rgt} ")
    padded = F.concat(F.lit(" "), seq, F.lit(" "))
    return F.trim(F.replace(F.replace(padded, pat, rep), pat, rep))


def pair_counts(seqs: DataFrame, seq_col: str = "seq") -> DataFrame:
    """Weighted adjacent-pair counts over the dictionary:
    (lft, rgt, pair_cnt BIGINT). Overlapping occurrences count (the
    classic counting rule): a word 'aaa' contributes 2 to (a,a).

    One narrow explode over the dictionary plus one partial-agg shuffle
    keyed by the pair — the only exchange per training step."""
    base = seqs.select(
        "cnt", F.split(F.col(seq_col), " ").alias("syms")
    ).filter(F.size("syms") >= 2)
    ex = base.select(
        "cnt",
        "syms",
        F.explode(F.sequence(F.lit(0), F.size("syms") - 2)).alias("i"),
    )
    return (
        ex.select(
            F.element_at("syms", F.col("i") + 1).alias("lft"),
            F.element_at("syms", F.col("i") + 2).alias("rgt"),
            "cnt",
        )
        .groupBy("lft", "rgt")
        .agg(F.sum("cnt").cast("long").alias("pair_cnt"))
    )


def top_pair(seqs: DataFrame, seq_col: str = "seq"):
    """Argmax pair with the deterministic (cnt DESC, lft, rgt)
    tie-break; None when no adjacent pair remains. orderBy+limit(1)
    compiles to TakeOrderedAndProject — a bounded one-row driver read,
    never a global sort."""
    rows = (
        pair_counts(seqs, seq_col)
        .orderBy(F.desc("pair_cnt"), F.asc("lft"), F.asc("rgt"))
        .limit(1)
        .collect()
    )
    return rows[0] if rows else None


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    persist_every: int = 8,
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns (merges, segmented_dict): ``merges`` is the ordered model
    — [{step, lft, rgt, pair_cnt}] — and ``segmented_dict`` is
    (word, cnt, seq) with every dictionary word segmented by the full
    merge chain (the tokenizer's application table).

    The dictionary is persisted once; the merge chain is a lazy column
    expression on top of it, re-persisted every ``persist_every`` steps
    so lineage depth (and per-step recompute) stays bounded for large
    merge counts."""
    wc = word_counts(docs, text_col).persist()
    seqs = wc.select("word", "cnt", char_spaced(F.col("word")).alias("seq"))
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        best = top_pair(seqs)
        if best is None:
            break
        merges.append(
            {
                "step": step,
                "lft": best["lft"],
                "rgt": best["rgt"],
                "pair_cnt": best["pair_cnt"],
            }
        )
        seqs = seqs.withColumn(
            "seq", apply_merge(F.col("seq"), best["lft"], best["rgt"])
        )
        if step % persist_every == 0:
            seqs = seqs.persist()
    return merges, seqs


def bpe_vocab(seg: DataFrame) -> DataFrame:
    """Vocabulary induced by a segmented dictionary: per final token,
    how many dictionary words use it and its total corpus occurrences.
    (token, n_dict_words BIGINT, n_occurrences BIGINT)."""
    tok = seg.select(
        "cnt", F.explode(F.split("seq", " ")).alias("token")
    )
    return tok.groupBy("token").agg(
        F.count("*").cast("long").alias("n_dict_words"),
        F.sum("cnt").cast("long").alias("n_occurrences"),
    )


def bpe_encode_stats(
    docs: DataFrame,
    seg: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document tokenization stats under a trained segmentation:
    (id_col, n_words BIGINT, n_tokens BIGINT). Docs with no words get
    zeros; out-of-dictionary words (possible when encoding a corpus the
    tokenizer was not trained on) fall back to character count — the
    no-merges-apply segmentation.

    Shape: corpus explode -> dictionary left equi-join (broadcastable)
    -> per-doc agg -> left join back onto the doc spine. The corpus
    never carries the segmentation strings, only their token counts."""
    toks = docs.select(
        id_col, F.explode_outer(extract_words(F.col(text_col))).alias("word")
    ).filter(F.col("word").isNotNull() & (F.col("word") != ""))
    seg_n = seg.select(
        "word", F.size(F.split("seq", " ")).cast("long").alias("n_toks")
    )
    per_doc = (
        toks.join(seg_n, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.coalesce(F.col("n_toks"), F.length("word").cast("long")))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )


def bpe_vocab_curve(
    docs: DataFrame,
    depths: tuple[int, ...] = (2, 4, 8),
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-size trade-off curve: train ONE merge chain to
    max(depths) and report, at each requested depth, the vocabulary
    size and corpus fertility the PREFIX of the merge list yields —
    BPE's merge list is ordered, so every prefix IS a smaller tokenizer
    and the whole curve costs one training run (the
    'pick your vocab size' datacard: fertility falls as merges grow,
    vocabulary grows; the knee is the budget answer).

    Per depth: (n_merges, vocab_size, n_word_occurrences, n_tokens,
    fertility_ppm) — fertility in exact ppm tokens-per-word-occurrence
    over the weighted dictionary (never a corpus re-encode: the
    dictionary carries occurrence counts). If the pair supply runs out
    before a requested depth, deeper points repeat the converged
    segmentation (mirrors the trainer's early stop).
    """
    wc = word_counts(docs, text_col).persist()
    seqs = wc.select("word", "cnt", char_spaced(F.col("word")).alias("seq"))
    snaps: list[tuple[int, DataFrame]] = []
    for step in range(1, max(depths) + 1):
        best = top_pair(seqs)
        if best is not None:
            seqs = seqs.withColumn(
                "seq", apply_merge(F.col("seq"), best["lft"], best["rgt"])
            )
        if step in depths:
            snaps.append((step, seqs))
    out = None
    for step, snap in snaps:
        base = snap.select(
            "cnt", F.size(F.split("seq", " ")).cast("long").alias("_nt"), "seq"
        )
        fert = base.agg(
            F.sum("cnt").cast("long").alias("n_word_occurrences"),
            F.sum(F.col("cnt") * F.col("_nt")).cast("long").alias("n_tokens"),
        )
        vocab = base.select(
            F.explode(F.split("seq", " ")).alias("_tok")
        ).agg(F.countDistinct("_tok").cast("long").alias("vocab_size"))
        row = (
            vocab.crossJoin(F.broadcast(fert))
            .select(
                F.lit(step).cast("long").alias("n_merges"),
                "vocab_size",
                "n_word_occurrences",
                "n_tokens",
                F.expr(
                    "CAST((CAST(1000000 AS DECIMAL(38,0))"
                    " * CAST(n_tokens AS DECIMAL(38,0)))"
                    " div CAST(n_word_occurrences AS DECIMAL(38,0)) AS BIGINT)"
                ).alias("fertility_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    # materialize the <= |depths| result rows, then release the cached
    # word-count table (persist() without this leaked one cached frame
    # per call for the session lifetime); the result is returned as a
    # local frame — bounded at |depths| rows by construction
    try:
        rows = out.collect()
        return docs.sparkSession.createDataFrame(rows, out.schema)
    finally:
        wc.unpersist()
