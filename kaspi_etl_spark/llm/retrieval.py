"""Distributed lexical + hybrid retrieval scoring: BM25 and
reciprocal-rank fusion.

The retrieval side of a training-data pipeline: BM25 ranks documents
against query terms (mining positives for retrieval-tuned models,
building eval sets, keyword-driven corpus slicing), and RRF fuses
rankings from independent systems (lexical + vector) into one hybrid
list — the standard composition production search stacks use.
Reference anchor: extends the SURVEY §2 text-analytics family
(offers_text_search P12, tfidf_top_terms) from boolean/tf-idf matching
to probabilistic ranking, and the ANN family (ann_*_topk) to hybrid
retrieval.

Relationship to ``text.bm25_scores`` (the r5 sibling): that form
scores EVERY doc against a FIXED literal query with double arithmetic
kept deterministic by a per-term unrolled pivot chain — fine for a
handful of terms, but the chain grows with the query and the output is
unranked scores. This module's ``bm25_topk`` is the retrieval form:
data-derived or arbitrary-size queries, exact BIGINT scores (no float
order-dependence to work around, so a plain SUM aggregates any query
size), and a distributed top-k ranking output.

Why it oracle-checks bit-exactly:

* BM25's idf = log((N - df + 0.5) / (df + 0.5)) is IEEE-libm. Here the
  halves are cleared by doubling — idf_fixed = max(0, flog2(2N - 2df +
  1) - flog2(2df + 1)) — and flog2 is the shared fixed-point log2
  kernel (llm/lm.py: bitlen + 1024-entry LUT, scaled 2^20), identical
  literal in both engines. The max(0, .) clamp is the standard
  negative-idf guard (Lucene does the same via idf flooring).
* The tf normalization with k1 = 3/2, b = 3/4 and avgdl = TT/N (TT =
  total corpus tokens) is RATIONAL. Clearing denominators by 8*TT:

      tf * (k1+1)                         20 * TT * tf
  ------------------------------  =  ------------------------------
  tf + k1*(1-b) + k1*b*dl/avgdl     8*TT*tf + 3*TT + 9*dl*N

  so each per-term contribution is ONE integer floor division
  (idf_fixed * 20*TT*tf) // (8*TT*tf + 3*TT + 9*dl*N) — non-negative
  operands, so DuckDB's truncating `//` equals Spark's `div` equals
  floor — and per-document scores are exact BIGINT sums.
* RRF's 1/(k0 + rank) terms are fractions with denominators k0+1 ..
  k0+max_rank; scaling by their LCM makes every contribution an exact
  integer, so fused scores sum and compare exactly (no float ties).

Overflow bound: idf_fixed <= flog2(2N+1) ~ 21 * 2^20 at N = 1e6 docs,
so the BM25 numerator stays under 2^63 while TT * tf < ~2e11 — fine to
~1e9-token corpora. Past that (the 100 TB regime), run the SAME plan
with idf as a double and the norm as one double division: the ranking
is identical in practice; the scaled-integer form exists so the oracle
can check the distributed plumbing bit-for-bit at test scale.

Scale shape (100 TB): tokenize map-side; tf = one (doc, term) groupBy;
df via a window over the term partition (no vocabulary self-join);
N/TT as a 1-row broadcast; query terms as a tiny broadcast side. Only
documents containing a query term survive the semi-join — the scoring
stream is |postings(query)|, not the corpus. Top-k compiles to a
WindowGroupLimit partial before the exchange.
"""

from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .lm import sql_flog2, with_flog2
from .text import extract_words

# k1 = K1_NUM/K1_DEN = 3/2, b = B_NUM/B_DEN = 3/4 (the classic defaults
# rounded to dyadic rationals so denominators clear exactly)
BM25_TOPK = 10


def doc_term_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf, df, dl): per-(doc, term) frequency, global doc
    frequency, and the doc's token count — the postings layout every
    lexical scorer reads. One explode, one (doc, term) groupBy, a
    window per term, a window per doc."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(extract_words(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("id", "term").agg(F.count("*").cast("long").alias("tf"))
    w_term = Window.partitionBy("term")
    w_doc = Window.partitionBy("id")
    return tf.select(
        "id",
        "term",
        "tf",
        F.count("*").over(w_term).cast("long").alias("df"),
        F.sum("tf").over(w_doc).cast("long").alias("dl"),
    )


def top_query_terms(stats: DataFrame, n: int = 3) -> DataFrame:
    """The n globally most frequent terms (total tf desc, term asc) —
    a deterministic, data-derived query for self-contained demo/oracle
    runs. Real callers pass their own term list to bm25_topk."""
    return (
        stats.groupBy("term")
        .agg(F.sum("tf").cast("long").alias("total_tf"))
        .orderBy(F.col("total_tf").desc(), F.col("term").asc())
        .limit(n)
        .select("term")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame | list[str] | None = None,
    k: int = BM25_TOPK,
    n_query_terms: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score_scaled, n_terms_hit, rank): BM25 top-k documents for
    ``query_terms`` (a list, a 1-column DataFrame, or None to use the
    corpus' top-``n_query_terms`` terms). score_scaled is the exact
    2^20-fixed-point BM25 score (module header); ties break on id asc.
    """
    stats = doc_term_stats(docs, id_col, text_col)
    if query_terms is None:
        q = top_query_terms(stats, n_query_terms)
    elif isinstance(query_terms, DataFrame):
        q = query_terms.select("term")
    else:
        q = docs.sparkSession.createDataFrame(
            [(t,) for t in query_terms], "term string"
        )
    # corpus constants: one 1-row aggregate, broadcast everywhere.
    # N counts ALL documents (empty ones too — they shape avgdl's
    # denominator exactly like Lucene's docCount).
    consts = docs.select(F.count("*").cast("long").alias("n_docs")).crossJoin(
        stats.select(F.sum("tf").cast("long").alias("tt"))
    )
    hits = (
        stats.join(F.broadcast(q), "term")
        .crossJoin(F.broadcast(consts))
        .withColumn("_idf_num", F.lit(2) * F.col("n_docs") - F.lit(2) * F.col("df") + F.lit(1))
        .withColumn("_idf_den", F.lit(2) * F.col("df") + F.lit(1))
    )
    hits = with_flog2(hits, "_idf_num", "_l_num")
    hits = with_flog2(hits, "_idf_den", "_l_den")
    contrib = hits.select(
        "id",
        F.expr(
            "GREATEST(CAST(0 AS BIGINT), _l_num - _l_den)"
            " * (20 * tt * tf)"
            " div (8 * tt * tf + 3 * tt + 9 * dl * n_docs)"
        ).alias("_c"),
    )
    scored = contrib.groupBy("id").agg(
        F.sum("_c").cast("long").alias("score_scaled"),
        F.count("*").cast("long").alias("n_terms_hit"),
    )
    # global top-k via orderBy+limit — compiles to TakeOrderedAndProject
    # (per-partition partial top-k, single tiny merge), NOT a global
    # single-task window sort; the rank window then runs over k rows
    topk = scored.orderBy(
        F.col("score_scaled").desc(), F.col("id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("score_scaled").desc(), F.col("id").asc())
    return topk.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("id").alias(id_col), "score_scaled", "n_terms_hit", "rank"
    )


def sql_bm25_ctes(
    words_expr: str,
    n_query_terms: int = 3,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB CTE chain mirroring bm25_topk with data-derived query
    terms; the final CTE is ``bm25_scored`` (id, score_scaled,
    n_terms_hit). Interpolate into a WITH clause."""
    return f"""
    bm_toks AS (
      SELECT {id_col} AS id, unnest({words_expr}) AS term FROM {table}
    ),
    bm_tf AS (
      SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM bm_toks WHERE term <> '' GROUP BY id, term
    ),
    bm_stats AS (
      SELECT id, term, tf,
             CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
             CAST(SUM(tf) OVER (PARTITION BY id) AS BIGINT) AS dl
      FROM bm_tf
    ),
    bm_q AS (
      SELECT term FROM bm_stats GROUP BY term
      ORDER BY SUM(tf) DESC, term ASC LIMIT {n_query_terms}
    ),
    bm_consts AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM {table}) AS n_docs,
             (SELECT CAST(SUM(tf) AS BIGINT) FROM bm_tf) AS tt
    ),
    bm_hits AS (
      SELECT s.id, s.tf, s.dl, c.n_docs, c.tt,
             GREATEST(CAST(0 AS BIGINT),
                      {sql_flog2("(2 * c.n_docs - 2 * s.df + 1)")}
                      - {sql_flog2("(2 * s.df + 1)")}) AS idf_fixed
      FROM bm_stats s JOIN bm_q USING (term) CROSS JOIN bm_consts c
    ),
    bm25_scored AS (
      SELECT id,
             CAST(SUM(idf_fixed * (20 * tt * tf)
                      // (8 * tt * tf + 3 * tt + 9 * dl * n_docs))
                  AS BIGINT) AS score_scaled,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      FROM bm_hits GROUP BY id
    )"""


def rrf_scale(k0: int, max_rank: int) -> int:
    """LCM of k0+1 .. k0+max_rank — the scale that turns every RRF
    contribution 1/(k0+rank) into an exact integer."""
    return _math.lcm(*range(k0 + 1, k0 + max_rank + 1))


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    max_rank: int = 10,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    ranked lists: fused(d) = sum over systems of 1/(k0 + rank_s(d)),
    computed as exact integers scaled by lcm(k0+1..k0+max_rank) so
    scores sum and tie-break identically in both engines. Items ranked
    past ``max_rank`` in a system contribute nothing from it (the
    standard top-bounded form). Returns (query_id, id, rrf_scaled,
    n_systems, rank<=k), ties on id asc.

    Shape: union-all of the (already narrow) ranked lists, one
    (query, id) groupBy, one per-query window — fusion adds no join
    against the corpus and never touches the vectors again."""
    scale = rrf_scale(k0, max_rank)
    parts = []
    for r in rankings:
        parts.append(
            r.filter(F.col(rank_col) <= max_rank).select(
                F.col(query_id_col).alias("query_id"),
                F.col(id_col).alias("id"),
                # integer div: the LCM is divisible by every k0+rank in
                # range, so this is exact by construction
                F.expr(f"CAST({scale} AS BIGINT) div ({k0} + {rank_col})")
                .cast("long")
                .alias("_c"),
            )
        )
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy("query_id", "id").agg(
        F.sum("_c").cast("long").alias("rrf_scaled"),
        F.count("*").cast("long").alias("n_systems"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_scaled").desc(), F.col("id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").alias(query_id_col),
            F.col("id").alias(id_col),
            "rrf_scaled",
            "n_systems",
            "rank",
        )
    )


def phrase_search(
    docs: DataFrame,
    phrases: list[tuple[str, ...]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact positional phrase search — the IR surface BM25's bag of
    words cannot express ("data slow" must match those words ADJACENT,
    in order). One corpus pass builds (doc, pos, word) postings
    filtered to the union vocabulary of all queried phrases (the
    filter is what keeps the posting set tiny at 100 TB — only
    phrase-word occurrences survive the scan); each phrase then matches
    by adjacency equi-joins on (doc, pos + k), fan-out bounded by the
    rarest term's posting list, and all phrases share the single scan.

    Returns (phrase, id, n_matches, first_pos) for docs with >= 1
    occurrence; first_pos is the 1-based word position of the earliest
    match.
    """
    if not phrases or any(not p for p in phrases):
        raise ValueError("phrases must be a non-empty list of non-empty tuples")
    vocab = sorted({w for p in phrases for w in p})
    postings = (
        docs.select(
            F.col(id_col),
            F.posexplode_outer(extract_words(F.col(text_col))).alias("_p", "_w"),
        )
        .filter(F.col("_w").isin(vocab))
        .select(F.col(id_col), (F.col("_p") + 1).alias("_pos"), F.col("_w"))
    )
    # r11: every per-word filter branch below is a separate consumer of
    # this subtree, and the static plan re-ran the corpus scan + tokenize
    # + posexplode once PER branch (sum of phrase lengths: 18 parquet
    # scans for 4 phrases at the registry's _PHRASES). Materialize the
    # postings ONCE — they are tiny by construction (only occurrences of
    # the union phrase vocabulary survive the filter), so this is the
    # guide-§1.2 "don't compute things you throw away" checkpoint, same
    # as docs_skipgram_pmi's words table. Value-identical trivially.
    postings = postings.localCheckpoint()
    outs = []
    for phrase in phrases:
        cur = postings.filter(F.col("_w") == phrase[0]).select(
            F.col(id_col), F.col("_pos").alias("_p0")
        )
        for k, w in enumerate(phrase[1:], start=1):
            nxt = postings.filter(F.col("_w") == w).select(
                F.col(id_col).alias("_id2"), F.col("_pos").alias(f"_p{k}")
            )
            cur = cur.join(
                nxt,
                (F.col(id_col) == F.col("_id2"))
                & (F.col(f"_p{k}") == F.col("_p0") + k),
            ).drop("_id2", f"_p{k}")
        outs.append(
            cur.groupBy(id_col).agg(
                F.count(F.lit(1)).cast("long").alias("n_matches"),
                F.min("_p0").cast("long").alias("first_pos"),
            )
            .select(
                F.lit(" ".join(phrase)).alias("phrase"),
                F.col(id_col),
                "n_matches",
                "first_pos",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
