"""Similarity-search tests: IVF recall vs brute force, quantization
round-trip accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import similarity


def _vectors(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = corpus.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return corpus, queries


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    corpus, queries = _vectors(spark, sf_dir)
    exact = similarity.brute_force_topk(corpus, queries, k=10)
    approx = similarity.ivf_topk(corpus, queries, k=10, n_lists=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # coarse 4-list IVF on random embeddings: expect meaningful overlap
    assert recall >= 0.3, f"recall {recall}"
    # every query answered
    assert len({q for q, _ in a}) == len({q for q, _ in e})


def test_ivf_deterministic(spark, sf_dir):
    corpus, queries = _vectors(spark, sf_dir)
    a1 = sorted(map(tuple, similarity.ivf_topk(corpus, queries, k=5, n_lists=4).collect()))
    a2 = sorted(map(tuple, similarity.ivf_topk(corpus, queries, k=5, n_lists=4).collect()))
    assert a1 == a2


def test_quantize_roundtrip_error(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = similarity.with_quantized(emb, "v")
    # dequantized values must be within scale/254 of the original
    err = q.select(
        F.aggregate(
            F.zip_with(
                "v",
                F.col("q"),
                lambda x, qi: F.abs(x - qi.cast("double") * F.col("scale") / 127),
            ),
            F.lit(0.0),
            lambda acc, e: F.greatest(acc, e),
        ).alias("max_err"),
        (F.col("scale") / 254 + F.lit(1e-12)).alias("bound"),
    )
    assert err.filter(F.col("max_err") > F.col("bound")).count() == 0


def test_bucketed_pairs_dim_mismatch_raises(spark):
    """A vector whose length differs from `dim` must raise, not silently
    collapse every bucket to 0 and degenerate to all-pairs (ADVICE r2)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [(1, [1.0] * 8), (2, [1.0] * 8), (3, [1.0] * 4)]  # ragged
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    with pytest.raises((SparkRuntimeException, Py4JJavaError, Exception)):
        similarity.cosine_near_dup_pairs_bucketed(
            df, threshold=0.5, id_col="vec_id", vec_col="v", dim=8
        ).collect()


def test_bucketed_pairs_dim_derived(spark):
    """dim=None derives the dimension from the data and still matches the
    all-pairs form."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.001, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_near_dup_pairs_bucketed(
            df, threshold=0.99, id_col="vec_id", vec_col="v"
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_near_dup_pairs(
            df, threshold=0.99, id_col="vec_id", vec_col="v"
        ).collect()
    }
    assert got == exact == {(1, 2)}


def test_kmeans_train_converges_to_true_clusters(spark):
    from kaspi_etl_spark.llm.similarity import kmeans_assign_trained, kmeans_train

    # both seeds (ids 1, 2) start inside the left cluster; training must
    # migrate centroid 1 to the right cluster and converge exactly on the
    # quantized grid: round(1024/3) = 341, round(31744/3) = 10581.
    rows = [
        (1, [0.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.0, 1.0]),
        (4, [10.0, 10.0]),
        (5, [11.0, 10.0]),
        (6, [10.0, 11.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_train(df, k=2, iters=10)
    assert cents == [(0, [341, 341]), (1, [10581, 10581])]
    out = {r.vec_id: r.cluster for r in kmeans_assign_trained(df, cents).collect()}
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1}
    # convergence is exact: training longer changes nothing
    assert kmeans_train(df, k=2, iters=20) == cents


def test_kmeans_assign_exact_and_composes(spark):
    from kaspi_etl_spark.llm.similarity import embedding_centroids, kmeans_assign

    # seeds are ids 1 and 2 (k=2): vectors near (0,0) join cluster 0,
    # near (10,10) join cluster 1; equidistant ties break to the lower
    # seed rank.
    rows = [
        (1, [0.0, 0.0]),
        (2, [10.0, 10.0]),
        (3, [1.0, 0.0]),
        (4, [9.0, 10.0]),
        (5, [5.0, 5.0]),  # equidistant -> cluster 0 by tie-break
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in kmeans_assign(df, k=2).collect()}
    assert [out[i].cluster for i in (1, 2, 3, 4, 5)] == [0, 1, 0, 1, 0]
    assert out[1].dist == 0 and out[2].dist == 0
    # quantized squared units: (1.0 * 1024)^2
    assert out[3].dist == 1024 * 1024

    # one full Lloyd iteration: assignment feeds the fixed-point centroid
    assigned = kmeans_assign(df, k=2).withColumnRenamed("cluster", "label")
    joined = df.join(assigned, "vec_id")
    cents = {
        r.label: r.centroid
        for r in embedding_centroids(joined, "label", "embedding").collect()
    }
    assert cents[0] == [2.0, (0.0 + 0.0 + 5.0) / 3]
    assert cents[1] == [9.5, 10.0]


def test_pq_recall_vs_exact_l2(spark, sf_dir):
    """ADC on 8 codes must recover a meaningful fraction of the exact
    integer-L2 top-k over the same candidate lists — this isolates the
    product-quantization distortion from coarse-list routing (and from
    the cosine-vs-L2 metric difference vs brute_force_topk)."""
    corpus, queries = _vectors(spark, sf_dir)
    approx = similarity.pq_topk(corpus, queries, dim=64, k=10, m=8, k_sub=16, n_lists=4)
    a = {(r.query_id, r.vec_id) for r in approx.collect()}

    coarse = similarity.kmeans_train(corpus, k=4, iters=2)
    qvs = {
        r["vec_id"]: [round(x * 1024) for x in r["embedding"]]
        for r in corpus.collect()
    }

    def nearest(qv, cents):
        return min(
            (sum((x - c) ** 2 for x, c in zip(qv, qc)), cid) for cid, qc in cents
        )[1]

    lists: dict[int, list[int]] = {}
    for vid, qv in qvs.items():
        lists.setdefault(nearest(qv, coarse), []).append(vid)
    e = set()
    for qid in {q for q, _ in a}:
        cands = [v for v in lists[nearest(qvs[qid], coarse)] if v != qid]
        cands.sort(key=lambda v: (
            sum((x - y) ** 2 for x, y in zip(qvs[qid], qvs[v])), v))
        e.update((qid, v) for v in cands[:10])
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"recall {recall}"


def test_pq_deterministic(spark, sf_dir):
    corpus, queries = _vectors(spark, sf_dir)
    a1 = sorted(map(tuple, similarity.pq_topk(corpus, queries, dim=64, k=5).collect()))
    a2 = sorted(map(tuple, similarity.pq_topk(corpus, queries, dim=64, k=5).collect()))
    assert a1 == a2
    assert a1, "non-empty result"


def test_pq_codebooks_shape(spark, sf_dir):
    corpus, _ = _vectors(spark, sf_dir)
    books = similarity.pq_train_codebooks(corpus, dim=64, m=4, k_sub=8)
    assert len(books) == 4
    for book in books:
        assert 1 <= len(book) <= 8
        assert [j for j, _ in book] == list(range(len(book)))
        for _, qc in book:
            assert len(qc) == 16


def test_pq_adc_matches_direct_distance(spark, sf_dir):
    """The LUT lookup path must equal recomputing the subspace distances
    directly: ADC(q, doc) == sum_m L2(q_sub_m, codebook_m[code_m])."""
    corpus, queries = _vectors(spark, sf_dir)
    books = similarity.pq_train_codebooks(corpus, dim=64, m=4, k_sub=8)
    res = similarity.pq_topk(corpus, queries, dim=64, k=5, m=4).collect()
    qvs = {
        r["vec_id"]: [round(x * 1024) for x in r["embedding"]]
        for r in corpus.collect()
    }
    coarse = similarity.kmeans_train(corpus, k=8, iters=2)

    def nearest(qv, cents):
        return min((sum((a - b) ** 2 for a, b in zip(qv, qc)), cid) for cid, qc in cents)[1]

    for r in res:
        qv = qvs[r["vec_id"]]
        expect = 0
        for s, book in enumerate(books):
            sub = qvs[r["query_id"]][s * 16 : (s + 1) * 16]
            code = nearest(qv[s * 16 : (s + 1) * 16], book)
            cent = dict(book)[code]
            expect += sum((a - b) ** 2 for a, b in zip(sub, cent))
        assert r["adc_dist"] == expect, (r, expect)
        # candidate really came from the query's coarse list
        assert nearest(qv, coarse) == nearest(qvs[r["query_id"]], coarse)


def test_ivf_nprobe_monotone_recall_and_full_probe_is_exact(spark, sf_dir):
    """Multi-probe IVF: recall vs brute force is monotone in nprobe, and
    probing ALL lists must reproduce the exact brute-force top-k (lists
    partition the corpus; scoring and tie-breaks are identical)."""
    corpus, queries = _vectors(spark, sf_dir)
    e = {(r.query_id, r.vec_id) for r in
         similarity.brute_force_topk(corpus, queries, k=10).collect()}

    def recall(nprobe):
        a = {(r.query_id, r.vec_id) for r in
             similarity.ivf_topk(corpus, queries, k=10, n_lists=4,
                                 nprobe=nprobe).collect()}
        return len(e & a) / len(e)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4, (r1, r2, r4)
    assert r4 == 1.0, r4


def test_pq_nprobe_expands_candidates(spark, sf_dir):
    """nprobe=2 PQ results are a superset-quality ranking: every query
    still answers, and the nprobe=2 top-k ADC distances are <= the
    nprobe=1 ones rank-for-rank (more candidates can only improve)."""
    corpus, queries = _vectors(spark, sf_dir)
    one = similarity.pq_topk(corpus, queries, dim=64, k=5, m=8, k_sub=16,
                             n_lists=4, nprobe=1).collect()
    two = similarity.pq_topk(corpus, queries, dim=64, k=5, m=8, k_sub=16,
                             n_lists=4, nprobe=2).collect()
    d1 = {}
    for r in one:
        d1.setdefault(r.query_id, []).append((r["rank"], r.adc_dist))
    d2 = {}
    for r in two:
        d2.setdefault(r.query_id, []).append((r["rank"], r.adc_dist))
    assert set(d1) == set(d2)
    for q in d1:
        for (rk1, a1), (rk2, a2) in zip(sorted(d1[q]), sorted(d2[q])):
            assert rk1 == rk2 and a2 <= a1


def test_model_persistence_roundtrip(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from kaspi_etl_spark.llm import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = sim.kmeans_train(emb, k=4, iters=2)
    path = str(tmp_path / "model")
    sim.save_centroids(spark, cents, path)
    assert sim.load_centroids(spark, path) == cents
    # a reloaded model reproduces assignments bit-for-bit
    a = sorted(map(tuple, sim.assign_nearest_join(emb, cents).collect()))
    b = sorted(
        map(tuple, sim.assign_nearest_join(emb, sim.load_centroids(spark, path)).collect())
    )
    assert a == b

    books = sim.pq_train_codebooks(emb, dim=len(cents[0][1]), m=4, k_sub=4, iters=1)
    bpath = str(tmp_path / "books")
    sim.save_pq_codebooks(spark, books, bpath)
    assert sim.load_pq_codebooks(spark, bpath) == books


def test_auto_lsh_params_floors_and_growth():
    import math

    from kaspi_etl_spark.llm.similarity import auto_lsh_params

    # gate-scale corpora keep the historical 12x12 (bit-unchanged gates)
    assert auto_lsh_params(0, 0.99) == (12, 12)
    assert auto_lsh_params(533, 0.99) == (12, 12)
    assert auto_lsh_params(16_384, 0.99) == (12, 12)
    # planes grow with log2(n/target_bucket): expected bucket size (and
    # so per-vector candidate count) stays constant as n grows
    for n in (200_000, 2_000_000, 20_000_000):
        bands, r = auto_lsh_params(n, 0.99)
        assert r == max(12, math.ceil(math.log2(n / 4)))
        # at-threshold per-pair miss stays within the target
        p = 1.0 - math.acos(0.99) / math.pi
        assert (1.0 - p**r) ** bands <= 1e-4 + 1e-12
        assert bands <= 64
    # monotone: more data never means fewer planes
    rs = [auto_lsh_params(n, 0.99)[1] for n in (1_000, 100_000, 10_000_000)]
    assert rs == sorted(rs)
    # r is capped so bucket ids stay inside a long
    assert auto_lsh_params(10**18, 0.99)[1] <= 40


def test_bucketed_pairs_auto_params_match_allpairs(spark):
    """Auto-sized LSH (bands/planes omitted) still finds every all-pairs
    near-dup on a clustered corpus — the subset property plus full
    recall at small n, where auto resolves to the 12x12 floor."""
    import random

    from kaspi_etl_spark.llm import similarity as sim

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(6)]
    rows = []
    vid = 0
    for b in base:
        for _ in range(4):  # tight cluster around each base vector
            rows.append((vid, [x + rng.uniform(-0.01, 0.01) for x in b]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    exact = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_pairs(
            df, threshold=0.99, id_col="vec_id", vec_col="v"
        ).collect()
    }
    auto = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_pairs_bucketed(
            df, threshold=0.99, id_col="vec_id", vec_col="v"
        ).collect()
    }
    assert auto == exact and len(exact) > 0


def test_bucketed_pairs_arrow_and_jvm_paths_agree(spark):
    """The numpy banding path and the pure-JVM join fallback must find
    the same verified pairs (bucket sign bits can differ only on
    exact-zero-dot ulp corners, which verification then resolves
    identically), and both raise on wrong-length vectors."""
    import random

    import pytest
    from pyspark.sql.utils import PythonException

    from kaspi_etl_spark.llm import similarity as sim

    rng = random.Random(21)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(5)]
    rows = []
    vid = 0
    for bvec in base:
        for _ in range(3):
            rows.append((vid, [x + rng.uniform(-0.005, 0.005) for x in bvec]))
            vid += 1
    rows.append((vid, None))  # NULL vector: contributes nothing, no crash
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    kw = dict(threshold=0.99, id_col="vec_id", vec_col="v", dim=16)
    got_a = {
        (r.id_a, r.id_b, round(r.cosine_sim, 12))
        for r in sim.cosine_near_dup_pairs_bucketed(df, arrow=True, **kw).collect()
    }
    got_j = {
        (r.id_a, r.id_b, round(r.cosine_sim, 12))
        for r in sim.cosine_near_dup_pairs_bucketed(df, arrow=False, **kw).collect()
    }
    assert got_a == got_j and len(got_a) > 0

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0] * 16)], "vec_id long, v array<double>"
    )
    with pytest.raises(PythonException, match="embedding length"):
        sim.cosine_near_dup_pairs_bucketed(bad, arrow=True, **kw).collect()
    with pytest.raises(Exception, match="embedding length"):
        sim.cosine_near_dup_pairs_bucketed(bad, arrow=False, **kw).collect()


def test_bucketed_pairs_nan_vector_paths_agree(spark):
    """A NaN-poisoned embedding must not produce pairs on EITHER path,
    and the two paths must stay identical (r6 advisory: Spark SQL
    orders NaN above every double, so the bare `>= 0` band bit and the
    `>= threshold` verify filter on the JVM path passed NaN where the
    numpy path's False-on-NaN comparisons dropped it)."""
    import math
    import random

    from kaspi_etl_spark.llm import similarity as sim

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    rows = [
        (0, base),
        (1, [x + 0.001 for x in base]),  # genuine near-dup pair
        (2, [math.nan] * 16),            # fully poisoned
        (3, base[:8] + [math.nan] + base[9:]),  # one NaN component
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    kw = dict(threshold=0.99, id_col="vec_id", vec_col="v", dim=16)
    got_a = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_pairs_bucketed(df, arrow=True, **kw).collect()
    }
    got_j = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_pairs_bucketed(df, arrow=False, **kw).collect()
    }
    assert got_a == got_j == {(0, 1)}


# --- Johnson–Lindenstrauss projection + recall@k ----------------------------


def test_jl_signs_deterministic_and_sparse():
    s1 = similarity.jl_signs(64, 16)
    s2 = similarity.jl_signs(64, 16)
    assert s1 == s2
    # density 1/3 of 1024 cells, binomial tolerance
    assert 250 <= len(s1) <= 430
    assert {e[2] for e in s1} <= {1, -1}


def test_jl_project_matches_integer_mirror(spark):
    signs = similarity.jl_signs(8, 4)
    rows = [
        (1, [0.3, -1.7, 0.2, 2.4, -0.6, 0.9, 1.1, -2.2]),
        (2, [1.3, 0.7, -0.2, 0.4, 0.6, -0.9, -1.1, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        (r["vec_id"], r["out_dim"]): r["comp"]
        for r in similarity.jl_project(df, signs).collect()
    }
    scale = 1 << 20
    for vid, vec in rows:
        xq = [round(x * scale) for x in vec]  # no .5 ties in the fixtures
        for j in range(4):
            want = sum(s * xq[i] for i, jj, s in signs if jj == j)
            assert got.get((vid, j), 0) == want or (
                # dims with no nonzero sign entries emit no row
                (vid, j) not in got and want == 0
            )


def test_jl_project_preserves_near_duplicate_ordering(spark, sf_dir):
    # A vector, a tiny perturbation of it, and an unrelated vector: the
    # projected L2 gap to the near-dup must be smaller than to the
    # unrelated one (the property ANN-over-JL relies on).
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(2).collect()
    base = [float(x) for x in emb[0]["embedding"]]
    near = list(base)
    near[0] += 0.01
    far = [float(x) for x in emb[1]["embedding"]]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    signs = similarity.jl_signs(64, 16)
    comps = {}
    for r in similarity.jl_project(df, signs).collect():
        comps.setdefault(r["vec_id"], {})[r["out_dim"]] = r["comp"]
    dims = sorted(set(comps[0]) | set(comps[1]) | set(comps[2]))

    def dist2(a, b):
        return sum(
            (comps[a].get(d, 0) - comps[b].get(d, 0)) ** 2 for d in dims
        )

    assert dist2(0, 1) < dist2(0, 2)


def test_recall_at_k_handmade(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id LONG, vec_id LONG"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)], "query_id LONG, vec_id LONG"
    )
    out = {
        r["query_id"]: r
        for r in similarity.recall_at_k(approx, exact, k=2).collect()
    }
    assert out[1]["n_hits"] == 1 and out[1]["recall_at_2"] == 0.5
    assert out[2]["n_hits"] == 2 and out[2]["recall_at_2"] == 1.0


def test_multiprobe_recall_dominates_single_table(spark, sf_dir):
    """Plane set 0 of the multiprobe index IS the single-table planes,
    so its candidates are a strict superset: per-query recall@10 must
    be monotonically >= (and strictly better for at least one query on
    this corpus)."""
    from kaspi_etl_spark import registry

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = corpus.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert registry.ANN_PLANE_SETS[0] == registry.ANN_PLANES
    brute = similarity.brute_force_topk(corpus, queries, k=10)
    single = similarity.lsh_topk(corpus, queries, registry.ANN_PLANES, k=10)
    multi = similarity.lsh_topk_multiprobe(
        corpus, queries, registry.ANN_PLANE_SETS, k=10
    )
    rs = {
        r["query_id"]: r["n_hits"]
        for r in similarity.recall_at_k(single, brute, k=10).collect()
    }
    rm = {
        r["query_id"]: r["n_hits"]
        for r in similarity.recall_at_k(multi, brute, k=10).collect()
    }
    assert set(rs) == set(rm)
    assert all(rm[q] >= rs[q] for q in rs)
    assert sum(rm.values()) > sum(rs.values())
