"""Unit tests for the LLM-pipeline dedup operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import dedup


def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog tonight"),  # near dup
        (4, "completely different text about spark and parquet files here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = {r.keep_id: r.dup_count for r in dedup.exact_dedup(docs_df(spark)).collect()}
    assert out[1] == 2  # docs 1+2 collapse, survivor is min id
    assert out[3] == 1 and out[4] == 1


def test_exact_dedup_keep(spark):
    kept = sorted(r.doc_id for r in dedup.exact_dedup_keep(docs_df(spark)).collect())
    assert kept == [1, 3, 4]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    out = df.select(dedup.word_shingles(F.col("text"), 3).alias("s")).collect()[0].s
    assert out == ["a b c", "b c d"]


def test_minhash_identical_docs_same_signature(spark):
    sigs = dedup.minhash_signature(docs_df(spark), num_hashes=8)
    rows = {r.doc_id: tuple(r[f"sig_{j}"] for j in range(8)) for r in sigs.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[4]


def test_minhash_near_dup_pipeline(spark):
    pairs = dedup.minhash_near_dup_pairs(docs_df(spark), num_hashes=8, bands=4, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always found
    assert all((4 not in p) for p in got)  # unrelated doc never pairs


def test_ngram_jaccard(spark):
    pairs = dedup.ngram_jaccard_pairs(docs_df(spark), threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    # doc3 adds one word -> 7 common / 8 union = 0.875
    assert abs(got[(1, 3)] - 7 / 8) < 1e-12
    assert (1, 4) not in got


def test_simhash_identical_and_pairs(spark):
    df = docs_df(spark)
    sigs = {
        r.doc_id: r.sig
        for r in dedup.with_simhash(df).select("doc_id", "sig").collect()
    }
    assert sigs[1] == sigs[2]
    pairs = dedup.simhash_pairs(df, max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0

def test_winnowing_fingerprint_locality_and_parity(spark):
    """Winnowing guarantee: any shared substring of length >= gram + window - 1
    (13 chars here) contributes at least one common fingerprint hash. Plus a
    pinned value computed independently (pure-Python ord/poly arithmetic) so
    the Spark/oracle hash can never drift silently."""
    from kaspi_etl_spark.llm import text as text_ops

    shared = "identical shared clause inside"
    rows = [
        (1, f"lead-in words {shared} and a tail"),
        (2, f"other preamble {shared} different ending"),
        (3, "no overlap with anything else in this corpus at all"),
        (4, ""),  # empty text -> fingerprint [0]
        (5, None),  # NULL text -> NULL fingerprint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.fingerprint
        for r in text_ops.with_winnowing_fingerprint(df).collect()
    }
    assert set(out[1]) & set(out[2]), "shared 13+ char substring must share a hash"
    assert not (set(out[1]) & set(out[3]))
    assert out[4] == [0]
    assert out[5] is None
    # sorted + distinct
    assert out[1] == sorted(set(out[1]))

    # independent reimplementation of the gram hash for one short text
    text = "hello spark"
    norm = text.lower()
    C = text_ops.winnow_coeffs(8)
    M = text_ops.WINNOW_MOD
    grams = []
    for i in range(max(len(norm) - 8 + 1, 1)):
        s = norm[i : i + 8]
        grams.append(sum(ord(ch) * C[k] for k, ch in enumerate(s)) % M)
    mins = [min(grams[j : j + 6]) for j in range(max(len(grams) - 6 + 1, 1))]
    expected = sorted(set(mins))
    got = (
        text_ops.with_winnowing_fingerprint(
            spark.createDataFrame([(1, text)], "doc_id long, text string")
        )
        .collect()[0]
        .fingerprint
    )
    assert got == expected


def test_cms_estimate_never_undercounts_and_merges(spark):
    from pyspark.sql import functions as F

    from kaspi_etl_spark.llm import sketch

    words_a = ["spark"] * 40 + ["duck"] * 25 + ["row"] * 3 + ["col"]
    words_b = ["spark"] * 10 + ["plan"] * 7
    mk = lambda ws: spark.createDataFrame([(w,) for w in ws], "token string")  # noqa: E731
    sk_a, sk_b = sketch.cms_build(mk(words_a)), sketch.cms_build(mk(words_b))
    probes = mk(["spark", "duck", "plan", "absent"]).distinct()

    est_a = {r["token"]: r["est_count"]
             for r in sketch.cms_estimate(sk_a, probes).collect()}
    # CMS can only overcount (collisions add) — never undercount
    assert est_a["spark"] >= 40 and est_a["duck"] >= 25
    # merged sketch == sketch of concatenated corpus, cell for cell
    merged = sketch.cms_merge(sk_a, sk_b)
    full = sketch.cms_build(mk(words_a + words_b))
    as_map = lambda df: {  # noqa: E731
        (r["row_idx"], r["col_idx"]): r["cell_count"] for r in df.collect()
    }
    assert as_map(merged) == as_map(full)
    est_m = {r["token"]: r["est_count"]
             for r in sketch.cms_estimate(merged, probes).collect()}
    assert est_m["spark"] >= 50 and est_m["plan"] >= 7
    # grid never exceeds depth*width cells regardless of vocabulary
    assert merged.count() <= sketch.CMS_DEPTH * sketch.CMS_WIDTH


def test_hdr_sketch_quantiles_merge_and_error_bound(spark):
    import random

    from kaspi_etl_spark.llm import sketch

    rng = random.Random(7)
    vals_a = [rng.randint(1, 500_000) for _ in range(800)] + list(range(16))
    vals_b = [rng.randint(1, 2_000) for _ in range(400)]
    mk = lambda vs: spark.createDataFrame([(v,) for v in vs], "v long")  # noqa: E731

    # merged sketch == sketch of the concatenated data, bucket for bucket
    merged = sketch.hdr_merge(sketch.hdr_build(mk(vals_a)), sketch.hdr_build(mk(vals_b)))
    full = sketch.hdr_build(mk(vals_a + vals_b))
    as_map = lambda df: {r["bucket_id"]: r["bucket_count"] for r in df.collect()}  # noqa: E731
    assert as_map(merged) == as_map(full)

    # estimate is the bucket lower bound: est <= exact < est * (1 + 2^-4)
    # (exact for v < 16 where buckets are singletons)
    both = sorted(vals_a + vals_b)
    n = len(both)
    for row in sketch.hdr_quantiles(mk(vals_a + vals_b)).collect():
        exact = both[row["target_rank"] - 1]
        assert row["est_value"] <= exact
        if exact >= 16:
            assert exact < row["est_value"] * (1 + 2 ** -sketch.HDR_SUB_BITS)
        else:
            assert row["est_value"] == exact

    # grid size is bounded by sub-buckets * octaves, not by data size
    assert full.count() <= sketch.HDR_BASE * 64


def test_duplicate_spans_cross_doc(spark):
    # docs 1/2 are identical 9-word docs -> two positional 8-gram spans
    # each, all shared; doc 3 shares its first 8 words with them; doc 4
    # has no full span in common; short docs produce no rows.
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy cat"),
        (4, "completely different text about spark and parquet files here"),
        (5, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.duplicate_spans(df).collect()}
    assert set(out) == {1, 2, 3, 4}  # doc 5 has < 8 words
    assert out[1].n_spans == 2 and out[1].n_dup_spans == 2
    assert out[2].n_dup_spans == 2
    # doc 3: spans are words[0:8] (shared with 1/2) and words[1:9] (unique)
    assert out[3].n_spans == 2 and out[3].n_dup_spans == 1
    assert out[3].n_shared_hashes == 1
    assert out[4].n_dup_spans == 0 and out[4].n_shared_hashes == 0


def test_duplicate_spans_within_doc_repeat_not_cross(spark):
    # a span repeated inside ONE doc is not cross-doc shared
    text = "a b c d e f g h x a b c d e f g h"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = dedup.duplicate_spans(df).collect()[0]
    assert row.n_dup_spans == 0 and row.n_shared_hashes == 0
    assert row.n_spans == 10


def test_bloom_no_false_negatives_and_merge(spark):
    from kaspi_etl_spark.llm import sketch

    a = spark.range(0, 200).select(F.col("id").alias("k"))
    b = spark.range(200, 400).select(F.col("id").alias("k"))
    bloom_a = sketch.bloom_build(a, "k")
    bloom_b = sketch.bloom_build(b, "k")
    merged = sketch.bloom_merge(bloom_a, bloom_b)
    both = sketch.bloom_build(a.unionByName(b), "k")
    # merge == build-on-union, word for word
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, both.collect()))

    probes = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = {r["k"]: r["might_contain"] for r in
           sketch.bloom_probe(probes, merged, "k").collect()}
    # every member answers True (no false negatives, ever)
    assert all(out[k] for k in range(400))
    # non-members mostly answer False at this fill factor
    fp = sum(1 for k in range(400, 1000) if out[k])
    assert fp / 600 < 0.05


def test_bloom_sketch_is_constant_size(spark):
    from kaspi_etl_spark.llm import sketch

    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    words = sketch.bloom_build(big, "k").count()
    assert words <= sketch.BLOOM_BITS // sketch.BLOOM_WORD_BITS + 1


def test_bloom_probe_literal_equals_join_form(spark):
    from kaspi_etl_spark.llm import sketch

    members = spark.range(0, 300).select((F.col("id") * 7).alias("k"))
    bloom = sketch.bloom_build(members, "k")
    # duplicate probe rows included: the aggregate form must stay
    # per-row correct when a key occurs many times
    probes = spark.range(0, 4000).select((F.col("id") % 2000).alias("k"))
    a = {r["k"]: r["might_contain"]
         for r in sketch.bloom_probe(probes, bloom, "k").collect()}
    b = {r["k"]: r["might_contain"]
         for r in sketch.bloom_probe_literal(probes, bloom, "k").collect()}
    assert a == b
    # no false negatives even with duplicates
    mset = {r["k"] for r in members.collect()}
    assert all(a[k] for k in a if k in mset)
    # and the literal form is join-free
    plan = (
        sketch.bloom_probe_literal(probes, bloom, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_kmv_sketch_exact_below_k_and_sane_above(spark):
    from kaspi_etl_spark.llm import sketch

    # group "small": 30 distinct keys -> exact; "big": 5000 -> estimated
    rows = [("small", i) for i in range(30)] + [("big", i) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r["g"]: r for r in sketch.kmv_sketch(df, "g", "k").collect()}
    assert out["small"]["dv_estimate"] == 30  # exact under k
    est = out["big"]["dv_estimate"]
    assert 0.6 * 5000 < est < 1.6 * 5000  # KMV error band at k=64
    # duplicates never change the sketch
    dup = spark.createDataFrame(rows + rows, "g string, k long")
    out2 = {r["g"]: r for r in sketch.kmv_sketch(dup, "g", "k").collect()}
    assert {g: (r["kth_min"], r["dv_estimate"]) for g, r in out.items()} == {
        g: (r["kth_min"], r["dv_estimate"]) for g, r in out2.items()
    }


def test_bloom_null_keys_build_and_probe(spark):
    """NULL member keys are not members (no (NULL, NULL) word row); NULL
    probe keys answer False in both probe forms; an m_bits mismatch
    between sketch and probe raises a clear error, not IndexError."""
    import pytest

    from kaspi_etl_spark.llm import sketch

    members = spark.createDataFrame(
        [(1,), (2,), (None,), (3,)], "k long"
    )
    bloom = sketch.bloom_build(members, "k")
    rows = bloom.collect()
    assert all(r["word_idx"] is not None and r["word"] is not None for r in rows)
    probes = spark.createDataFrame([(1,), (None,), (999,)], "k long")
    got_join = {r["k"]: r["might_contain"]
                for r in sketch.bloom_probe(probes, bloom, "k").collect()}
    got_lit = {r["k"]: r["might_contain"]
               for r in sketch.bloom_probe_literal(probes, bloom, "k").collect()}
    assert got_join == got_lit
    assert got_join[1] is True and got_join[None] is False
    with pytest.raises(ValueError, match="m_bits"):
        sketch.bloom_probe_literal(probes, bloom, "k", m_bits=64).collect()


def test_kmv_ignores_null_keys(spark):
    """NULL keys don't count as a distinct value (count-distinct
    semantics) and never enter the bottom-k — Spark sorts NULLs first
    ascending, SQL oracles last, so keeping them would silently diverge
    cross-engine (ADVICE r5)."""
    from kaspi_etl_spark.llm import sketch

    with_nulls = spark.createDataFrame(
        [("g", str(i)) for i in range(30)] + [("g", None)] * 5,
        "g string, k string",
    )
    without = spark.createDataFrame(
        [("g", str(i)) for i in range(30)], "g string, k string"
    )
    a = sketch.kmv_sketch(with_nulls, "g", "k").collect()[0]
    b = sketch.kmv_sketch(without, "g", "k").collect()[0]
    assert (a["n_kept"], a["kth_min"], a["dv_estimate"]) == (
        b["n_kept"], b["kth_min"], b["dv_estimate"])
    assert a["dv_estimate"] == 30
    merged = sketch.kmv_merge(
        sketch.kmv_bottom(with_nulls, "g", "k"),
        sketch.kmv_bottom(without, "g", "k"),
        "g",
    )
    assert merged.filter(F.col("_h").isNull()).count() == 0


def test_kmv_merge_equals_sketch_of_union(spark):
    from kaspi_etl_spark.llm import sketch

    a = spark.createDataFrame([("g", i) for i in range(0, 400)], "g string, k long")
    b = spark.createDataFrame([("g", i) for i in range(300, 800)], "g string, k long")
    merged = sketch.kmv_merge(
        sketch.kmv_bottom(a, "g", "k"), sketch.kmv_bottom(b, "g", "k"), "g"
    )
    direct = sketch.kmv_bottom(a.unionByName(b), "g", "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    est_m = sketch.kmv_estimate(merged).collect()[0]["dv_estimate"]
    est_d = sketch.kmv_estimate(direct).collect()[0]["dv_estimate"]
    assert est_m == est_d


def test_spread_corpus_is_size_aware(spark, tmp_path):
    """spread_corpus only fans out corpora big enough to amortize the
    32-way fan-out: a sub-threshold single-file corpus keeps its scan
    partitioning (the repartition cost ~2x warm / ~10x cold CPU for no
    wall win at small sizes — VERDICT r5 'what's wrong' #1), while a
    single-file corpus above the byte threshold spreads to
    defaultParallelism partitions."""
    from kaspi_etl_spark.llm import dedup

    small_p = str(tmp_path / "small")
    spark.createDataFrame(
        [(i, "some words here") for i in range(50)], "doc_id long, text string"
    ).coalesce(1).write.parquet(small_p)
    small = spark.read.parquet(small_p)
    assert dedup.spread_corpus(small) is small  # untouched passthrough

    # force the fan-out with a tiny threshold instead of writing MBs
    spread = dedup.spread_corpus(small, min_bytes=1)
    assert spread is not small
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # non-file-backed frames always pass through
    mem = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    assert dedup.spread_corpus(mem, min_bytes=1) is mem


def test_hll_linear_counting_small_and_raw_large(spark):
    from kaspi_etl_spark.llm import sketch

    # "small" (200 distinct) rides linear counting, "big" (20000) the
    # raw harmonic estimator; both inside the ~3 sigma HLL error band
    # at p=9 (se = 4.6%)
    rows = [("small", i) for i in range(200)] + [("big", i) for i in range(20000)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r["g"]: r for r in sketch.hll_sketch(df, "g", "k").collect()}
    assert abs(out["small"]["dv_estimate"] - 200) <= 0.15 * 200
    assert abs(out["big"]["dv_estimate"] - 20000) <= 0.15 * 20000
    assert out["small"]["v_zero"] > 0
    # duplicates never change register state or estimate
    dup = spark.createDataFrame(rows + rows, "g string, k long")
    out2 = {r["g"]: r for r in sketch.hll_sketch(dup, "g", "k").collect()}
    assert {g: tuple(r) for g, r in out.items()} == {
        g: tuple(r) for g, r in out2.items()
    }


def test_hll_merge_equals_sketch_of_union(spark):
    from kaspi_etl_spark.llm import sketch

    a = spark.createDataFrame([("g", i) for i in range(0, 3000)], "g string, k long")
    b = spark.createDataFrame([("g", i) for i in range(2000, 6000)], "g string, k long")
    merged = sketch.hll_merge(
        sketch.hll_registers(a, "g", "k"), sketch.hll_registers(b, "g", "k"), "g"
    )
    direct = sketch.hll_registers(a.unionByName(b), "g", "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    est_m = sketch.hll_estimate(merged, "g").collect()[0]["dv_estimate"]
    est_d = sketch.hll_estimate(direct, "g").collect()[0]["dv_estimate"]
    assert est_m == est_d


def test_hll_ignores_null_keys_and_register_bounds(spark):
    from kaspi_etl_spark.llm import sketch

    with_nulls = spark.createDataFrame(
        [("g", str(i)) for i in range(100)] + [("g", None)] * 7,
        "g string, k string",
    )
    without = spark.createDataFrame(
        [("g", str(i)) for i in range(100)], "g string, k string"
    )
    a = sketch.hll_registers(with_nulls, "g", "k")
    b = sketch.hll_registers(without, "g", "k")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    rows = a.collect()
    # register indices in [0, m); rho in [1, Q]
    assert all(0 <= r["reg_idx"] < sketch.HLL_M for r in rows)
    assert all(1 <= r["reg_max"] <= sketch.HLL_Q for r in rows)
    est = sketch.hll_estimate(a, "g").collect()[0]
    assert abs(est["dv_estimate"] - 100) <= 15


def test_prefix_jaccard_equals_exact_uncapped(spark, sf_dir):
    """The AllPairs prefix filter is LOSSLESS: over the same corpus it
    must reproduce the uncapped exact form's pairs and scores exactly
    (same doubles, same rows)."""
    from kaspi_etl_spark import registry
    from kaspi_etl_spark.llm import dedup

    docs = registry.llm_docs(spark, sf_dir)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, max_doc_freq=None
        ).collect()
    }
    pfx = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_prefix_pairs(docs).collect()
    }
    assert pfx == exact
    assert len(exact) > 0  # the planted near-dups must show up


def test_prefix_jaccard_can_find_pairs_the_df_cap_misses(spark):
    """The cap form drops shingles with df > cap from candidate
    generation AND n_common; the prefix form keeps exactness. Construct
    a corpus where every shared shingle is 'boilerplate' under a tiny
    cap: the capped form misses the pair, the prefix form finds it."""
    from kaspi_etl_spark.llm import dedup

    text = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id LONG, text STRING"
    )
    capped = dedup.ngram_jaccard_pairs(
        docs, threshold=0.5, max_doc_freq=2
    ).count()
    exact = dedup.ngram_jaccard_prefix_pairs(docs).count()
    assert capped == 0  # every shingle's posting list exceeds the cap
    assert exact == 10  # all C(5,2) identical-doc pairs, J = 1.0


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short excerpt embedded verbatim in a long doc: max-containment
    ~1.0 while Jaccard sits near |A|/|B| — the asymmetric detector's
    reason to exist."""
    from kaspi_etl_spark.llm import dedup

    long_words = " ".join(f"w{i:03d}" for i in range(60))
    excerpt = " ".join(f"w{i:03d}" for i in range(10))  # a verbatim prefix
    docs = spark.createDataFrame(
        [(1, long_words), (2, excerpt), (3, "totally different content here")],
        "doc_id LONG, text STRING",
    )
    cont = {
        (r.id_a, r.id_b): (r.n_common, r.n_a, r.n_b, r.containment)
        for r in dedup.ngram_containment_pairs(docs, t_num=4, t_den=5).collect()
    }
    # 10-word excerpt -> 8 distinct 3-gram shingles, all inside doc 1
    assert cont == {(1, 2): (8, 58, 8, 1.0)}
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.5).count()
    assert jac == 0  # J = 8/58 — far below any dedup threshold


def test_containment_threshold_is_exact_rational(spark):
    """Cross-multiplied threshold: n_common=4 of min=5 shingles is 0.8
    and must PASS at t=4/5 (a float-rounded 0.8 comparison can flip
    either way on the division)."""
    from kaspi_etl_spark.llm import dedup

    a = "a b c d e f g"   # 5 shingles: abc bcd cde def efg
    b = "a b c d e f x"   # 5 shingles: abc bcd cde def efx -> 4 shared
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id LONG, text STRING"
    )
    rows = dedup.ngram_containment_pairs(docs, t_num=4, t_den=5).collect()
    assert len(rows) == 1 and rows[0].n_common == 4 and rows[0].containment == 0.8
    # one notch tighter and the same pair is excluded
    assert dedup.ngram_containment_pairs(docs, t_num=5, t_den=6).count() == 0

def test_capped_residual_composition_is_exact(spark):
    """The capped-then-residual composition must equal the uncapped exact
    form on a corpus engineered so the capped stage MISSES pairs: docs
    whose every shared shingle is boilerplate under the cap (the
    residual-slice rule t_den*n_hot >= t_num*n must route them through
    the prefix stage), mixed with ordinary near-dup pairs the capped
    stage catches."""
    from kaspi_etl_spark.llm import dedup

    boiler = "alpha beta gamma delta epsilon"
    rows = [(i, boiler) for i in range(6)]  # every shingle df=6 > cap=3
    # ordinary near-dup pair: shares rare shingles, found by capped
    rows += [
        (100, "one two three four five six seven"),
        (101, "one two three four five six eight"),
        (102, "совершенно другое содержание без повторов"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_capped_residual_pairs(
            docs, t_num=1, t_den=2, max_doc_freq=3
        ).collect()
    }
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, max_doc_freq=None
        ).collect()
    }
    assert got == want
    assert (100, 101) in got  # the capped-stage catch
    assert (0, 1) in got and got[(0, 1)] == 1.0  # the residual-stage catch
    # sanity: the capped form alone would have missed the boilerplate pairs
    capped_only = dedup.ngram_jaccard_pairs(
        docs, threshold=0.5, max_doc_freq=3
    ).count()
    assert capped_only < len(got)
