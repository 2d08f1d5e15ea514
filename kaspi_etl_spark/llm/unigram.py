"""Unigram-LM tokenizer (Kudo 2018, "Subword Regularization") —
substring-seeded vocabulary, distributed Viterbi segmentation, and a
hard-EM re-estimation step. The second trained-tokenizer family next to
BPE (llm/bpe.py): where BPE greedily merges, the unigram model scores
every piece independently and segments each word by minimum total
surprisal, which is what makes per-word segmentation embarrassingly
parallel.

No reference-repo counterpart — this is part of the LLM training-data
surface the brief layers on top of the reference inventory (nearest
anchor: the token-count quality gates mirrored by llm/text.py).

Scale shape. ONE corpus-wide shuffle builds the word-frequency
dictionary (explode -> groupBy, map-side combined — shared with BPE);
everything after touches only the dictionary:

  - vocabulary seeding explodes each dictionary word into its <=
    len x PIECE_MAX_LEN substrings — dictionary-sized, one groupBy;
  - Viterbi runs as WORD_MAX_LEN rounds of (edge equi-join + per-word
    argmin agg) over the dictionary; round i only carries words of
    length >= i, so total work is sum(len(word)) rows, linear;
  - each round's best-prefix frame is persisted: it feeds up to
    PIECE_MAX_LEN later rounds, and an unpersisted multi-consumer
    frame recomputes its whole lineage per consumer (the r7
    dup-span-extents lesson);
  - words longer than WORD_MAX_LEN (URLs, concatenations) fall back to
    character segmentation — deterministic, mirrorable, and the form
    an unbounded-unroll oracle cannot reach;
  - round count is the observed max word length (<= WORD_MAX_LEN), one
    bounded driver read. A min-plus matrix-squaring formulation would
    need only log2(rounds) joins but materializes O(len^2) span states
    per word versus this DP's O(len x PIECE_MAX_LEN) edges — at a
    100 TB dictionary, total work dominates round count, so the
    work-efficient linear-round form wins (the measured per-round cost
    here is driver-side plan compilation, a fixed toy-scale overhead).

Determinism — what makes the unrolled DuckDB oracle possible:

  - piece surprisal is the shared fixed-point flog2 kernel (llm/lm.py):
    cost(p) = flog2(T) - flog2(cnt_p), an exact BIGINT, so path costs
    sum shuffle-order-independently;
  - the per-word argmin tie-break is (total cost ASC, split point j
    ASC) — j ASC prefers the LONGER final piece; for a fixed word and
    end position the (cost, j) pair is unique, so min(struct(...))
    in Spark equals ROW_NUMBER() OVER (ORDER BY cost, j) = 1 in SQL;
  - the corpus-total T reaches the plan as a literal computed with
    flog2_int (the bit-parity Python mirror; one bounded 1-row driver
    read — the FS-weights pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import char_spaced, word_counts
from .lm import flog2_int, with_flog2

PIECE_MAX_LEN = 4  # max piece length considered by the seed vocabulary
WORD_MAX_LEN = 16  # words longer than this fall back to char segmentation
MIN_COUNT = 3  # seed pieces rarer than this are dropped (chars always kept)


def seed_pieces(
    wc: DataFrame,
    piece_max_len: int = PIECE_MAX_LEN,
    min_count: int = MIN_COUNT,
) -> DataFrame:
    """Seed vocabulary: every substring of length 1..piece_max_len of
    every dictionary word, occurrence-counted (each occurrence inside a
    word contributes that word's corpus count). Pieces below
    ``min_count`` are pruned UNLESS they are single characters — the
    char alphabet is force-kept so every word stays segmentable.

    Returns (piece, cnt BIGINT)."""
    ex = wc.select(
        "word",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.length("word") - 1)).alias("j"),
    ).select(
        "word",
        "cnt",
        "j",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.lit(piece_max_len), F.length("word") - F.col("j")),
            )
        ).alias("l"),
    )
    pieces = (
        ex.select(
            F.substring(F.col("word"), F.col("j") + 1, F.col("l")).alias("piece"),
            "cnt",
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return pieces.filter(
        (F.col("cnt") >= min_count) | (F.length("piece") == 1)
    )


def piece_costs(pieces: DataFrame) -> DataFrame:
    """Fixed-point surprisal per piece: cost = flog2(T) - flog2(cnt),
    T = total count mass of the kept vocabulary (one bounded 1-row
    driver read, embedded as a flog2_int literal — bit-parity with the
    oracle's sql_flog2 over the same total). Returns (piece, cnt,
    cost BIGINT >= 0)."""
    total = pieces.agg(F.sum("cnt").cast("long")).collect()[0][0]
    if total is None:
        raise ValueError("piece_costs: empty vocabulary (no corpus words)")
    d = with_flog2(pieces, "cnt", "_l2")
    return d.select(
        "piece",
        "cnt",
        (F.lit(int(flog2_int(int(total)))) - F.col("_l2")).cast("long").alias("cost"),
    )


def viterbi_segment(
    wc: DataFrame,
    pc: DataFrame,
    piece_max_len: int = PIECE_MAX_LEN,
    word_max_len: int = WORD_MAX_LEN,
) -> DataFrame:
    """Minimum-cost segmentation of every dictionary word under the
    piece-cost table ``pc`` — the Viterbi pass of unigram-LM training,
    as ``word_max_len`` rounds of edge-join + per-word argmin over the
    dictionary. Words longer than ``word_max_len`` fall back to
    character segmentation (cost = sum of char costs) — deterministic
    and mirrorable rather than unboundedly unrolled.

    Returns (word, cnt, n_pieces BIGINT, cost_scaled BIGINT, seg)."""
    short = wc.filter(F.length("word") <= word_max_len).select(
        "word", "cnt", F.length("word").cast("int").alias("_n")
    )
    # rounds beyond the longest word present do no work but still cost a
    # join + agg of scheduling each — clamp to the observed max length
    # (one bounded 1-row driver read; values unchanged, the oracle's
    # fixed unroll just has empty tail CTEs)
    max_seen = short.agg(F.max("_n")).collect()[0][0]
    if max_seen is not None:
        word_max_len = min(word_max_len, int(max_seen))
    # all vocab edges (j -> i covers word[j+1 .. i], 1-based substring):
    # d=1 edges always exist (chars are force-kept), so the DP is total
    ex = short.select(
        "word",
        "_n",
        F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("i"),
    ).select(
        "word",
        "_n",
        "i",
        F.explode(
            F.sequence(F.lit(1), F.least(F.lit(piece_max_len), F.col("i")))
        ).alias("d"),
    )
    # repartition("word") BEFORE persist: the cached partitioning then
    # satisfies every round's join and groupBy clustering on word, so a
    # round's only exchange is the (dictionary-sized) best-frame side
    edges = (
        ex.select(
            "word",
            "_n",
            "i",
            (F.col("i") - F.col("d")).alias("j"),
            F.substring(F.col("word"), F.col("i") - F.col("d") + 1, F.col("d")).alias(
                "piece"
            ),
        )
        .join(pc.select("piece", "cost"), "piece")
        .repartition("word")
        .persist()
    )
    best = [
        short.select("word", "_n", F.lit(0).cast("long").alias("bcost"), F.lit("").alias("seg"))
    ]
    for i in range(1, word_max_len + 1):
        edges_i = edges.filter(F.col("i") == i)
        cands = None
        for j in range(max(0, i - piece_max_len), i):
            prev = best[j].select(
                "word",
                F.col("bcost").alias("_pcost"),
                F.col("seg").alias("_pseg"),
            )
            c = (
                edges_i.filter(F.col("j") == j)
                .join(prev, "word")
                .select(
                    "word",
                    "_n",
                    (F.col("_pcost") + F.col("cost")).alias("_tcost"),
                    F.lit(j).cast("long").alias("_j"),
                    F.when(F.col("_pseg") == "", F.col("piece"))
                    .otherwise(F.concat(F.col("_pseg"), F.lit(" "), F.col("piece")))
                    .alias("_seg"),
                )
            )
            cands = c if cands is None else cands.unionByName(c)
        # localCheckpoint, NOT persist: b[i] feeds up to piece_max_len
        # later rounds, and a persisted-but-not-truncated multi-consumer
        # lineage compounds the LOGICAL plan ~4x per round (cache
        # substitution happens after canonicalization, which still walks
        # the full tree — the r8 chained-rank lesson; the un-truncated
        # form stack-overflows Catalyst at round ~12). eager=False:
        # the returned frame is already a truncated LogicalRDD scan, so
        # all rounds materialize inside the caller's single job instead
        # of word_max_len blocking driver round-trips.
        b = (
            cands.groupBy("word", "_n")
            .agg(F.min(F.struct("_tcost", "_j", "_seg")).alias("_m"))
            .select(
                "word",
                "_n",
                F.col("_m._tcost").cast("long").alias("bcost"),
                F.col("_m._seg").alias("seg"),
            )
            .localCheckpoint(eager=False)
        )
        best.append(b)
    done = None
    for i in range(1, word_max_len + 1):
        fin = best[i].filter(F.col("_n") == i).select("word", "bcost", "seg")
        done = fin if done is None else done.unionByName(fin)
    seg_short = short.select("word", "cnt").join(done, "word").select(
        "word",
        "cnt",
        F.size(F.split("seg", " ")).cast("long").alias("n_pieces"),
        F.col("bcost").alias("cost_scaled"),
        "seg",
    )
    # fallback: char segmentation for words past the unroll bound
    long_w = wc.filter(F.length("word") > word_max_len)
    lex = long_w.select(
        "word",
        "cnt",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
    ).select(
        "word",
        "cnt",
        F.substring(F.col("word"), F.col("i"), 1).alias("piece"),
    )
    seg_long = (
        lex.join(pc.select("piece", "cost"), "piece")
        .groupBy("word", "cnt")
        .agg(F.sum("cost").cast("long").alias("cost_scaled"))
        .select(
            "word",
            "cnt",
            F.length("word").cast("long").alias("n_pieces"),
            "cost_scaled",
            char_spaced(F.col("word")).alias("seg"),
        )
    )
    return seg_short.unionByName(seg_long)


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    piece_max_len: int = PIECE_MAX_LEN,
    word_max_len: int = WORD_MAX_LEN,
    min_count: int = MIN_COUNT,
) -> tuple[DataFrame, DataFrame]:
    """Seed + segment: returns (piece_costs, segmented_dictionary)."""
    from .dedup import spread_corpus

    # 64 KB spread threshold (the dup-span-extents precedent): the
    # word-regex explode is CPU-heavy per document, so even a sub-MB
    # single-file corpus wins from fanning the scan across cores
    wc = word_counts(
        spread_corpus(docs, min_bytes=1 << 16), text_col
    ).persist()
    pc = piece_costs(seed_pieces(wc, piece_max_len, min_count)).persist()
    return pc, viterbi_segment(wc, pc, piece_max_len, word_max_len)


def em_reestimate(seg: DataFrame) -> DataFrame:
    """Hard-EM (Viterbi-count) re-estimation: count each piece's
    occurrences across the segmented dictionary (weighted by word
    corpus counts), renormalize to new fixed-point surprisals. The
    prune-and-iterate step of unigram-LM training — pieces the Viterbi
    pass never uses drop out of the vocabulary here, exactly the
    self-pruning Kudo's algorithm relies on.

    Returns (piece, em_cnt BIGINT, em_cost_scaled BIGINT)."""
    occ = (
        seg.select("cnt", F.explode(F.split("seg", " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("em_cnt"))
    )
    occ = occ.persist()
    total = occ.agg(F.sum("em_cnt").cast("long")).collect()[0][0]
    if total is None:
        raise ValueError("em_reestimate: empty segmentation table")
    d = with_flog2(occ, "em_cnt", "_l2")
    return d.select(
        "piece",
        "em_cnt",
        (F.lit(int(flog2_int(int(total)))) - F.col("_l2"))
        .cast("long")
        .alias("em_cost_scaled"),
    )


def unigram_encode_stats(
    docs: DataFrame,
    seg: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Trained-tokenizer APPLICATION (the bpe_encode_stats shape): per
    document, word count and unigram-token count under a segmented
    dictionary. OOV words (encoding a corpus the model was not trained
    on) fall back to character count — the no-vocab-pieces
    segmentation. Docs with no words get zeros. Corpus explode ->
    dictionary equi-join (broadcastable) -> per-doc agg; the corpus
    never carries segmentation strings."""
    from .text import extract_words

    toks = docs.select(
        id_col, F.explode_outer(extract_words(F.col(text_col))).alias("word")
    ).filter(F.col("word").isNotNull() & (F.col("word") != ""))
    seg_n = seg.select("word", F.col("n_pieces").alias("n_toks"))
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


def save_model(pc: DataFrame, seg: DataFrame, path: str) -> None:
    """Persist the trained tokenizer as two parquet tables under one
    root — exact integer costs/counts, so a reloaded model segments and
    scores bit-identically (the lm/k-means artifact pattern)."""
    pc.write.mode("overwrite").parquet(f"{path}/pieces")
    seg.write.mode("overwrite").parquet(f"{path}/segments")


def load_model(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Inverse of save_model: (piece_costs, segmented_dictionary) —
    hand ``segments`` to unigram_encode_stats / em_reestimate, or
    ``pieces`` to viterbi_segment for a NEW dictionary."""
    return (
        spark.read.parquet(f"{path}/pieces"),
        spark.read.parquet(f"{path}/segments"),
    )
