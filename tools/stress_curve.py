"""Scaling curve for the riskiest operators (VERDICT r5 #4, r6 #6).

Runs dedup_clusters, token_budget_sample, lm_score, logreg_train,
logreg_predict (score-from-model), bpe_encode (train+apply),
ngram_jaccard_prefix (lossless AllPairs), fs_linkage (Fellegi–Sunter),
part_name_matches_capped, ann_ivf_topk (train+search), and
semantic_dedup_keep at K x sf0.1 for
K in {10, 50, 100} (~sf1 at K=10 on documents; 60M lineitem-equivalents
at K=100) and records wall seconds, executor-CPU seconds, output rows,
and iterative convergence rounds, so SCALE.md's curve is measured, not
extrapolated.

Scaled corpora are DISTINCT-content copies, not verbatim duplicates:
 - documents: per-copy vowel permutation via translate() — shingles/
   minhash signatures differ across copies, so pair discovery scales in
   docs instead of exploding quadratically on exact copies (which is a
   property of that DATA, already documented in SCALE.md, not of the
   operator).
 - part names: same vowel permutation — ER blocks stay constant-size
   per copy and disjoint across copies.
 - embeddings: per-copy constant offset — cosine near-dup pairs stay
   within-copy at the 0.99 threshold.

Usage: python tools/stress_curve.py [K ...] [--ops a,b]  (default: 10 50 100)
"""

from __future__ import annotations

import itertools
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kaspi_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

VOWEL_PERMS = ["".join(p) for p in itertools.permutations("aeiou")]


def cpu_sec(spark) -> float:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url, timeout=10))
    return sum(s.get("executorCpuTime", 0) for s in stages) / 1e9


def scaled_union(base, k: int, shift_col: str, shift: int, mutate=None):
    parts = []
    for i in range(k):
        p = base.withColumn(shift_col, F.col(shift_col) + F.lit(i * shift))
        if mutate is not None:
            p = mutate(p, i)
        parts.append(p)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def vowel_mut(col: str):
    def mut(df, i):
        perm = VOWEL_PERMS[i % len(VOWEL_PERMS)]
        return df.withColumn(col, F.translate(F.col(col), "aeiou", perm))

    return mut


def main() -> None:
    argv, only = sys.argv[1:], None
    if "--ops" in argv:
        i = argv.index("--ops")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    ks = [int(a) for a in argv] or [10, 50, 100]
    spark = get_spark(
        "stress-curve",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4061",
            # same eviction bug bench.py hit: at the default
            # retainedStages=1000 the stage store evicts mid-run and the
            # cumulative executorCpuTime sum UNDERCOUNTS later ops (a
            # K=100 logreg run read 202 CPU s against a true ~550)
            "spark.ui.retainedStages": "200000",
        },
    )
    from kaspi_etl_spark.llm import classifier, dedup, lm, similarity, text  # noqa: E402
    from kaspi_etl_spark.ops import entity  # noqa: E402

    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    part0 = spark.read.parquet(f"{SF_DIR}/part.parquet").select("p_partkey", "p_name")
    emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    results = []

    def run(k, name, fn):
        if only is not None and name not in only:
            return
        c0, t0 = cpu_sec(spark), time.time()
        out = fn()
        wall, cpu = time.time() - t0, cpu_sec(spark) - c0
        row = {"k": k, "op": name, "wall_s": round(wall, 2), "cpu_s": round(cpu, 2)}
        row.update(out)
        results.append(row)
        print(json.dumps(row), flush=True)

    def want(*names):
        return only is None or bool(only & set(names))

    for k in ks:
        docs = n_docs = parts = n_parts = None
        if want(
            "dedup_clusters",
            "token_budget_sample",
            "lm_score",
            "logreg_train",
            "logreg_predict",
            "bpe_encode",
            "ngram_jaccard_prefix",
        ):
            docs = scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_docs = docs.count()
        if want("part_name_matches_capped"):
            parts = scaled_union(
                part0, k, "p_partkey", 10_000_000, vowel_mut("p_name")
            ).localCheckpoint()
            n_parts = parts.count()
        # per-copy orthogonal transform (cyclic rotation x optional
        # reversal = 126 distinct maps): every copy's INTERNAL cosine
        # structure (and thus pair count) is identical to the base
        # corpus, and no two copies share a transform below K=126 — so
        # growth is linear in K by construction. (A colliding transform
        # means exact-duplicate vectors across copies, whose pair count
        # is quadratic BY DATA — the property SCALE.md already documents
        # — and would measure the data, not the operator.)
        def rot(df, i):
            if i >= 126:
                raise ValueError("only 126 distinct transforms available")
            s, flip = i % 63, i >= 63
            v = F.col("v")
            if flip:
                v = F.reverse(v)
            if s:
                v = F.concat(F.slice(v, s + 1, 64 - s), F.slice(v, 1, s))
            return df.withColumn("v", v)

        emb = n_emb = None
        if want("ann_ivf_topk", "semantic_dedup_keep"):
            emb = scaled_union(emb0, k, "vec_id", 10_000_000, rot).localCheckpoint()
            n_emb = emb.count()
        print(f"# K={k}: {n_docs} docs, {n_parts} parts, {n_emb} vectors", flush=True)

        run(
            k,
            "dedup_clusters",
            lambda: {
                "rows": dedup.connected_components(
                    dedup.minhash_near_dup_pairs(
                        docs, num_hashes=8, bands=4, threshold=0.5
                    )
                ).count(),
                "in_rows": n_docs,
            },
        )
        run(
            k,
            "token_budget_sample",
            lambda: {
                "rows": text.token_budget_sample(docs, budget=50_000 * k).count(),
                "in_rows": n_docs,
            },
        )
        run(
            k,
            "lm_score",
            lambda: {
                "rows": lm.lm_score(docs).count(),
                "in_rows": n_docs,
            },
        )

        def _logreg():
            w = classifier.train(docs, F.length("text") > 300)
            return {"rows": len(w), "in_rows": n_docs,
                    "nonzero_w": sum(1 for x in w if x)}

        run(k, "logreg_train", _logreg)

        # r7 additions (VERDICT r6 #6): the newest families on the same
        # per-K protocol. logreg_predict measures the score-from-model
        # path (weights trained ONCE on the base corpus — training cost
        # has its own row above); bpe_encode trains a fixed-size merge
        # table on the scaled corpus then applies it (dictionary-sized
        # iterations, corpus-sized encode); ngram_jaccard_prefix is the
        # lossless AllPairs path whose candidate volume depends on df
        # skew; fs_linkage scores blocked candidates with data-estimated
        # u-probabilities (bounded driver reads).
        if want("logreg_predict"):
            w_base = classifier.train(docs0, F.length("text") > 300)

            def _logreg_predict():
                out = classifier.predict(docs, w_base)
                return {"rows": out.count(), "in_rows": n_docs}

            run(k, "logreg_predict", _logreg_predict)

        def _bpe_encode():
            from kaspi_etl_spark.llm import bpe

            merges, seg = bpe.bpe_train(docs, n_merges=8)
            out = bpe.bpe_encode_stats(docs, seg)
            return {"rows": out.count(), "in_rows": n_docs,
                    "n_merges": len(merges)}

        run(k, "bpe_encode", _bpe_encode)

        def _prefix_jaccard():
            out = dedup.ngram_jaccard_prefix_pairs(docs)
            return {"rows": out.count(), "in_rows": n_docs}

        run(k, "ngram_jaccard_prefix", _prefix_jaccard)

        run(
            k,
            "part_name_matches_capped",
            lambda: {
                "rows": entity.blocked_name_matches(
                    parts, id_col="p_partkey", name_col="p_name", max_block=32
                ).count(),
                "in_rows": n_parts,
            },
        )

        if want("fs_linkage"):
            parts_fs = scaled_union(
                spark.read.parquet(f"{SF_DIR}/part.parquet").select(
                    "p_partkey", "p_name", "p_brand", "p_type", "p_size"
                ),
                k,
                "p_partkey",
                10_000_000,
                vowel_mut("p_name"),
            ).localCheckpoint()
            n_parts_fs = parts_fs.count()

            def _fs():
                out = entity.fs_linkage_scores(
                    parts_fs,
                    id_col="p_partkey",
                    name_col="p_name",
                    fields=["p_brand", "p_type", "p_size"],
                )
                return {"rows": out.count(), "in_rows": n_parts_fs}

            run(k, "fs_linkage", _fs)

        def _ivf():
            queries = (
                emb.orderBy("vec_id")
                .limit(8)
                .select(F.col("vec_id").alias("query_id"), "v")
                .localCheckpoint()
            )
            topk = similarity.ivf_topk(
                emb,
                queries,
                k=5,
                n_lists=16,
                id_col="vec_id",
                vec_col="v",
                dim=64,
            )
            return {"rows": topk.count(), "in_rows": n_emb}

        run(k, "ann_ivf_topk", _ivf)

        def _semantic():
            pairs = similarity.cosine_near_dup_pairs_bucketed(
                emb, threshold=0.99, id_col="vec_id", vec_col="v", dim=64
            ).localCheckpoint()
            n_pairs = pairs.count()
            cc = dedup.connected_components(pairs.select("id_a", "id_b"))
            return {"rows": cc.count(), "pairs": n_pairs, "in_rows": n_emb}

        run(k, "semantic_dedup_keep", _semantic)

        # r7 second-wave additions: the Apriori pair join is the one new
        # op whose fan-out COULD go quadratic (on item frequency) — copies
        # shift l_orderkey only, so every item's basket count grows x K
        # and the measured curve shows how the min-support prune holds;
        # dup_span_extents adds a doc-bounded window to the span hash
        # pipeline (expect the duplicate_spans slope); pca_project is one
        # moment pass + literal scoring (expect linear).
        if want("assoc_rules"):
            li0 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("item")
            )
            li = scaled_union(li0, k, "o", 100_000_000).localCheckpoint()
            n_li = li.count()

            def _assoc():
                from kaspi_etl_spark.ops import basket

                out = basket.association_rules(li, min_support=2)
                return {"rows": out.count(), "in_rows": n_li}

            run(k, "assoc_rules", _assoc)

        if want("dup_span_extents"):
            docs_sp = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_sp = n_docs if n_docs is not None else docs_sp.count()

            def _extents():
                out = dedup.duplicate_span_extents(docs_sp)
                return {"rows": out.count(), "in_rows": n_sp}

            run(k, "dup_span_extents", _extents)

        # r8 additions (VERDICT r7 #6): the de-globalized RFM rank, the
        # phrase-search adjacency joins, label-propagation communities,
        # the Markov transition counting (its power iterations are
        # driver-side over <= |types|^2 cells — constant), assoc rules
        # at HALVED support relative to basket growth (the prune-stress
        # form), and the capped-then-residual exact Jaccard whose point
        # is a bounded curve where the pure prefix form measured 5.2x.
        if want("rfm_segments"):
            ord0 = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
                F.col("o_custkey").alias("customer_id"),
                F.col("o_orderdate").cast("date").alias("order_date"),
                F.round(F.col("o_totalprice")).cast("long").alias("gross_price_kzt"),
            )
            ords = scaled_union(ord0, k, "customer_id", 10_000_000).localCheckpoint()
            n_ord = ords.count()

            def _rfm():
                from kaspi_etl_spark.ops import revenue

                out = revenue.rfm_segments(ords)
                return {"rows": out.count(), "in_rows": n_ord}

            run(k, "rfm_segments", _rfm)

        if want("phrase_search"):
            docs_ph = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_ph = docs_ph.count()

            def _phrase():
                from kaspi_etl_spark.llm import retrieval

                out = retrieval.phrase_search(
                    docs_ph,
                    [("data", "processing"), ("machine", "learning"),
                     ("the", "quick", "brown")],
                )
                return {"rows": out.count(), "in_rows": n_ph}

            run(k, "phrase_search", _phrase)

        if want("markov_cells"):
            ev0 = spark.read.parquet(f"{SF_DIR}/events.parquet")
            ev = scaled_union(ev0, k, "user_id", 10_000_000).localCheckpoint()
            n_ev = ev.count()

            def _markov():
                from kaspi_etl_spark.ops import behavior

                out = behavior.markov_transition_cells(ev)
                return {"rows": out.count(), "in_rows": n_ev}

            run(k, "markov_cells", _markov)

        if want("communities_lp"):
            li0c = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("item")
            )
            lic = scaled_union(li0c, k, "o", 100_000_000).localCheckpoint()
            n_lic = lic.count()

            def _lp():
                from kaspi_etl_spark.ops import basket, graph

                # the r9 edge build: Apriori prune + hub cap BEFORE the
                # within-basket self-join (registry copurchase_communities_lp)
                co = basket.basket_pairs(
                    lic, min_support=2, max_basket_items=64
                ).select("item_a", "item_b")
                out = graph.label_propagation(
                    co, rounds=4, src_col="item_a", dst_col="item_b"
                )
                return {"rows": out.count(), "in_rows": n_lic}

            run(k, "communities_lp", _lp)

        if want("kcore"):
            li0k = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("item")
            )
            lik = scaled_union(li0k, k, "o", 100_000_000).localCheckpoint()
            n_lik = lik.count()

            def _kcore():
                from kaspi_etl_spark.ops import basket, graph

                co = basket.basket_pairs(
                    lik, min_support=2, max_basket_items=64
                ).select("item_a", "item_b")
                out = graph.kcore_peel(
                    co, k=2, rounds=6, src_col="item_a", dst_col="item_b"
                )
                return {"rows": out.count(), "in_rows": n_lik}

            run(k, "kcore", _kcore)

        if want("keyed_prefix_skew", "keyed_ntile_skew", "window_prefix_skew_control"):
            # 90%-one-source corpus: the adversarial mix for per-source
            # windows (a real pretraining corpus is dominated by one web
            # crawl) — the hazard the r10 keyed machinery removes
            docs_sk = scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).withColumn(
                "source",
                F.when(F.col("doc_id") % 10 != 0, F.lit("web")).otherwise(
                    F.concat(F.lit("s"), (F.col("doc_id") % 7).cast("string"))
                ),
            ).localCheckpoint()
            n_sk = docs_sk.count()

        if want("keyed_prefix_skew"):

            def _kps():
                from kaspi_etl_spark import ranks
                from kaspi_etl_spark.llm.dedup import split_words

                d = docs_sk.select(
                    "doc_id",
                    "source",
                    F.size(split_words(F.col("text"))).cast("long").alias("n_tokens"),
                )
                out = ranks.keyed_hash_order_prefix(
                    d, ["source"], "n_tokens", "doc_id", salt="cba", out_col="cum"
                )
                # aggregate OVER the prefix column: a bare count() lets
                # Catalyst prune the window away and times nothing
                row = out.agg(
                    F.count(F.lit(1)).alias("n"), F.sum("cum").alias("s")
                ).collect()[0]
                return {"rows": row.n, "chk": row.s, "in_rows": n_sk}

            run(k, "keyed_prefix_skew", _kps)

        if want("keyed_ntile_skew"):

            def _kns():
                from kaspi_etl_spark import ranks
                from kaspi_etl_spark.llm.dedup import md5_long

                d = docs_sk.select(
                    "doc_id",
                    "source",
                    (
                        (md5_long(F.col("doc_id").cast("string"), salt="sc") % 1000000)
                        .cast("double")
                        / F.lit(7.0)
                    ).alias("score"),
                )
                ranked = ranks.keyed_value_order_row_number(
                    d, ["source"], ["score", "doc_id"], out_col="rn", count_col="kn"
                )
                out = ranked.select(
                    "doc_id",
                    ranks.ntile_from_row_number(F.col("rn"), F.col("kn"), 3).alias("b"),
                )
                row = out.agg(
                    F.count(F.lit(1)).alias("n"), F.sum("b").alias("s")
                ).collect()[0]
                return {"rows": row.n, "chk": row.s, "in_rows": n_sk}

            run(k, "keyed_ntile_skew", _kns)

        if want("window_prefix_skew_control"):
            # the shape the keyed prefix REPLACED: Window.partitionBy(
            # source) running sum — 90% of rows through one task
            def _ctl():
                from pyspark.sql import Window

                from kaspi_etl_spark.llm.dedup import md5_long, split_words

                d = docs_sk.select(
                    "doc_id",
                    "source",
                    F.size(split_words(F.col("text"))).cast("long").alias("n_tokens"),
                    md5_long(F.col("doc_id").cast("string"), salt="cba").alias("_pri"),
                )
                w = (
                    Window.partitionBy("source")
                    .orderBy("_pri", "doc_id")
                    .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                out = d.withColumn("cum", F.sum("n_tokens").over(w))
                row = out.agg(
                    F.count(F.lit(1)).alias("n"), F.sum("cum").alias("s")
                ).collect()[0]
                return {"rows": row.n, "chk": row.s, "in_rows": n_sk}

            run(k, "window_prefix_skew_control", _ctl)

        if want("ktruss"):
            li0t = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("item")
            )
            lit_ = scaled_union(li0t, k, "o", 100_000_000).localCheckpoint()
            n_lit = lit_.count()

            def _ktruss():
                from kaspi_etl_spark.ops import basket, graph

                co = basket.basket_pairs(
                    lit_, min_support=2, max_basket_items=64
                ).select("item_a", "item_b")
                out = graph.ktruss_peel(
                    co, k=4, rounds=3, src_col="item_a", dst_col="item_b"
                )
                return {"rows": out.count(), "in_rows": n_lit}

            run(k, "ktruss", _ktruss)

        if want("assoc_rules_lowsup"):
            li0s = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("item")
            )
            lis = scaled_union(li0s, k, "o", 100_000_000).localCheckpoint()
            n_lis = lis.count()

            def _assoc_low():
                from kaspi_etl_spark.ops import basket

                # support stays 2 while baskets grow x K: the prune gets
                # WEAKER relative to the data every doubling — the
                # worst-case stress for the pair self-join
                out = basket.association_rules(lis, min_support=2)
                return {"rows": out.count(), "in_rows": n_lis}

            run(k, "assoc_rules_lowsup", _assoc_low)

        if want("kn_bigram"):
            docs_kn = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_kn = docs_kn.count()

            def _kn():
                out = lm.kn_bigram_model(docs_kn)
                return {"rows": out.count(), "in_rows": n_kn}

            run(k, "kn_bigram", _kn)

        if want("jaccard_capped"):
            docs_jc = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_jc = docs_jc.count()

            def _capped():
                # the control for jaccard_residual: the composition's
                # marginal cost = residual minus this row
                out = dedup.ngram_jaccard_pairs(docs_jc, threshold=0.5)
                return {"rows": out.count(), "in_rows": n_jc}

            run(k, "jaccard_capped", _capped)

        if want("jaccard_residual"):
            docs_jr = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_jr = docs_jr.count()

            def _resid():
                out = dedup.ngram_jaccard_capped_residual_pairs(docs_jr)
                return {"rows": out.count(), "in_rows": n_jr}

            run(k, "jaccard_residual", _resid)

        if want("pca_project"):
            emb_p = emb if emb is not None else scaled_union(
                emb0, k, "vec_id", 10_000_000, rot
            ).localCheckpoint()
            n_p = n_emb if n_emb is not None else emb_p.count()

            def _pca():
                n, sx, sxy = similarity.pca_moments(
                    emb_p, id_col="vec_id", vec_col="v", dims=16
                )
                v = similarity.pca_power_component(n, sx, sxy, dims=16)
                out = similarity.pca_project(emb_p, v, id_col="vec_id", vec_col="v")
                return {"rows": out.count(), "in_rows": n_p}

            run(k, "pca_project", _pca)

        if want("unigram_segment"):
            from kaspi_etl_spark.llm import unigram

            docs_u = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_u = docs_u.count()

            def _uni():
                # vowel permutation makes each copy's WORDS distinct, so
                # the dictionary (the unit of unigram work) scales ~K
                _, seg = unigram.unigram_train(docs_u)
                return {"rows": seg.count(), "in_rows": n_u}

            run(k, "unigram_segment", _uni)

        if want("novelty_bloom"):
            docs_nb = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_nb = docs_nb.count()

            def _nb():
                nn = docs_nb.filter(F.col("text").isNotNull())
                out = dedup.ngram_novelty_bloom(
                    nn.filter(F.col("doc_id") % 2 == 0),
                    nn.filter(F.col("doc_id") % 2 == 1),
                )
                return {"rows": out.count(), "in_rows": n_nb}

            run(k, "novelty_bloom", _nb)

        if want("rouge2_overlap"):
            docs_r = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_r = docs_r.count()

            def _rouge():
                pairs = dedup.minhash_near_dup_pairs(
                    docs_r, num_hashes=8, bands=4, threshold=0.5
                ).select("id_a", "id_b")
                out = text.rouge2_overlap(docs_r, pairs)
                return {"rows": out.count(), "in_rows": n_r}

            run(k, "rouge2_overlap", _rouge)

        if want("lpt_shards"):
            docs_l = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_l = docs_l.count()

            def _lpt():
                out = text.lpt_token_shards(docs_l, n_shards=8)
                return {"rows": out.count(), "in_rows": n_l}

            run(k, "lpt_shards", _lpt)

        if want("bitext_mine"):
            emb_b = emb if emb is not None else scaled_union(
                emb0, k, "vec_id", 10_000_000, rot
            ).localCheckpoint()
            n_b = emb_b.count()

            def _bitext():
                a = emb_b.filter(F.col("vec_id") % 2 == 0).selectExpr(
                    "vec_id AS id_a", "v AS embedding"
                )
                bb = emb_b.filter(F.col("vec_id") % 2 == 1).selectExpr(
                    "vec_id AS id_b", "v AS embedding"
                )
                planes = similarity.auto_sign_planes(n_b, dim=64)
                out = similarity.bitext_mine(a, bb, planes)
                return {"rows": out.count(), "in_rows": n_b}

            run(k, "bitext_mine", _bitext)

        if want("curriculum"):
            docs_cur = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_cur = docs_cur.count()

            def _cur():
                # aggregate OVER the computed position: a bare count()
                # would let Catalyst prune the rank machinery away
                out = text.curriculum_schedule(docs_cur)
                row = out.agg(
                    F.count(F.lit(1)).alias("n"), F.sum("position").alias("s")
                ).collect()[0]
                return {"rows": row.n, "chk": row.s, "in_rows": n_cur}

            run(k, "curriculum", _cur)

        if want("cluster_sample"):
            docs_cs = docs if docs is not None else scaled_union(
                docs0, k, "doc_id", 10_000_000, vowel_mut("text")
            ).localCheckpoint()
            n_cs = docs_cs.count()

            def _csamp():
                pairs = dedup.minhash_near_dup_pairs(
                    docs_cs, num_hashes=8, bands=4, threshold=0.5
                )
                cc = dedup.connected_components(pairs)
                out = dedup.cluster_weighted_sample(
                    docs_cs, cc.select("doc_id", "cluster_id"), k=1000
                )
                return {"rows": out.count(), "in_rows": n_cs}

            run(k, "cluster_sample", _csamp)

    print("\n# summary")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
