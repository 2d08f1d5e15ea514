"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against the corpus, dot products computed JVM-side with zip_with/aggregate
(no Python in the hot path), top-k via window rank.

Scale path: LSH bucketing via random hyperplanes (sign bits) — corpus and
queries hash to bucket keys; candidate generation is an equi-join on
buckets, turning O(N*Q) into O(collisions). The IVF variant buckets by
nearest centroid instead, trained by the in-repo deterministic
fixed-point k-means (``kmeans_train``) so results are bit-reproducible
and oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def with_normalized(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Unit-normalize a vector column (zero vectors -> zero vectors).

    Pre-normalizing makes pairwise cosine a single dot product instead of
    dot + two norms per pair — a 3x flop cut in the O(N*Q) stage. The
    norm is materialized as a real column first so the transform lambda
    binds an attribute, not a re-evaluated expression.
    """
    nrm = df.withColumn("_nrm", l2_norm(F.col(vec_col)))
    return nrm.withColumn(
        out_col,
        F.when(
            F.col("_nrm") > 0,
            F.transform(F.col(vec_col), lambda x: x / F.col("_nrm")),
        ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0.0))),
    ).drop("_nrm")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query via broadcast nested-loop + window.

    ``queries`` is expected to be small (broadcastable); the corpus scan
    stays distributed and narrow. Both sides are unit-normalized up
    front, so the pairwise stage is one dot product. Ties broken by
    corpus id asc.
    """
    q = with_normalized(queries, vec_col, "_qvec").select(query_id_col, "_qvec")
    c = with_normalized(corpus, vec_col, "_cvec").select(id_col, "_cvec")
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        dot(F.col("_qvec"), F.col("_cvec")).alias("cosine_sim"),
    ).filter(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def deterministic_planes(num_planes: int, dim: int) -> list[list[float]]:
    """Fixed +/-1 hyperplanes from an LCG — integer-valued components so
    dot-product signs (and therefore bucket ids) are bit-exact in any
    engine that mirrors the same fold order."""
    state = 123456789
    planes: list[list[float]] = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(1.0 if (state >> 16) & 1 else -1.0)
        planes.append(row)
    return planes


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of dot products with fixed hyperplanes."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_iters: int = 2,
    scale_bits: int = 10,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: a deterministic k-means coarse quantizer
    (``kmeans_train`` — fixed-point Lloyd, lowest-id seeds) assigns every
    vector to its nearest centroid's list; search compares a query only
    against its ``nprobe`` nearest lists (1 = own list only). Same
    shuffle shape as LSH bucketing — an equi-join on list ids — but with
    data-adaptive partitions; nprobe > 1 explodes each query to nprobe
    (query, list) probes before the same join, trading nprobe x
    candidate volume for recall exactly as production IVF does.

    Training is bit-reproducible (exact integer distances, centroid
    updates on the quantized grid), so the whole search result is
    deterministic and SQL-oracle-expressible by unrolling the training
    iterations — the registered ``ann_ivf_topk`` gate does exactly that
    at nprobe=1. Lists partition the corpus, so multi-probe candidates
    are disjoint and need no dedup.
    """
    cents = kmeans_train(
        corpus, k=n_lists, iters=train_iters, id_col=id_col, vec_col=vec_col,
        scale_bits=scale_bits,
    )
    qv = _quantized(vec_col, scale_bits)
    # corpus-side list assignment via the codegen'd join form (the
    # literal fold is interpreted per element — measured ~2s vs ~0.3s at
    # 5k x 8 x 64); attaching it back is an id-keyed equi-join
    lists = assign_nearest_join(
        corpus, cents, id_col=id_col, vec_col=vec_col, scale_bits=scale_bits
    ).select(F.col(id_col), F.col("cluster").alias("_list"))
    cb = (
        with_normalized(corpus, vec_col, "_cvec")
        .join(lists, id_col)
        .select(F.col(id_col), "_cvec", "_list")
    )
    probe = (
        _nearest_centroid(F.col("_qv"), cents)["c"]
        if nprobe == 1
        else F.explode(_nearest_lists(F.col("_qv"), cents, nprobe))
    )
    qb = (
        with_normalized(queries, vec_col, "_qvec")
        .withColumn("_qv", qv)
        .withColumn("_list", probe)
        .select(F.col(query_id_col), "_qvec", "_list")
    )
    scored = cb.join(F.broadcast(qb), "_list").select(
        query_id_col,
        id_col,
        dot(F.col("_qvec"), F.col("_cvec")).alias("cosine_sim"),
    ).filter(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def with_quantized(df: DataFrame, vec_col: str) -> DataFrame:
    """Symmetric int8 quantization: scale = max(abs(x)); q_i = round(x_i
    / scale * 127). Adds `scale` (double) and `q` (array<int>) — the
    storage format that cuts embedding bytes 4x for ANN at scale. The
    scale is materialized as a real column before the transform so it is
    not re-evaluated per element; round half-away-from-zero matches
    between Spark and DuckDB."""
    scaled = df.withColumn(
        "scale",
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))),
    )
    return scaled.withColumn(
        "q",
        F.when(
            F.col("scale") > 0,
            F.transform(
                F.col(vec_col), lambda x: F.round(x / F.col("scale") * 127).cast("int")
            ),
        ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0))),
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold). All-pairs form — verification-grade at small N; the scale
    path buckets first (hyperplane_bucket equi-join, see lsh_topk) so the
    quadratic comparison only happens inside buckets."""
    vn = with_normalized(vectors, vec_col, "_vn")
    a = vn.select(F.col(id_col).alias("id_a"), F.col("_vn").alias("_va"))
    b = vn.select(F.col(id_col).alias("id_b"), F.col("_vn").alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot(F.col("_va"), F.col("_vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_near_dup_pairs_bucketed(
    vectors: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 12,
    planes_per_band: int = 12,
    dim: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup pairs: banded hyperplane-LSH
    candidate generation + exact cosine verification. Never all-pairs.

    Shape: each vector hashes to `bands` (band_idx, bucket) keys; per
    bucket a sorted posting list generates (id_a < id_b) candidates
    JVM-side (join-free, same pattern as ngram_jaccard_pairs); distinct
    candidates equi-join the normalized vectors twice for the exact dot.
    Shuffles: groupBy bucket, groupBy pair, two id equi-joins — all on
    narrow fixed-width keys; no BroadcastNestedLoopJoin / cartesian.

    Bucket selectivity is what bounds the candidate stream on CLUSTERED
    embeddings (real corpora cluster; sign patterns collide): measured
    on 8k vectors, 4-plane bands produced 16.7M candidates
    (near-quadratic) while 12-plane bands produced ~0.3M. planes_per_band
    is the knob that trades candidate volume against recall.

    Recall: a pair agrees on one band with p^r (p = 1 - angle/pi). At
    threshold 0.99 (angle <= 8.1 deg, p >= 0.955) the default 12 bands x
    12 planes gives per-pair miss ~3e-5; exact duplicates (cosine 1.0)
    can never be missed (identical sign bits), and verification is exact,
    so precision is deterministic — bucketed output is always a subset
    of the all-pairs form (property-tested). Tests pin equality with the
    all-pairs oracle on the test corpora.

    ``dim`` defaults to the actual vector length (one LIMIT-1 probe at
    plan build). A wrong ``dim`` would be catastrophic-but-silent:
    zip_with pads the shorter side with nulls, every hyperplane dot goes
    NULL, every vector lands in bucket 0 of every band, and the
    "never all-pairs" contract degrades to the full quadratic candidate
    set. So the normalized vector is guarded per row — any vector whose
    length differs from ``dim`` raises instead of degrading.
    """
    if dim is None:
        probe = vectors.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(probe["d"]) if probe is not None else 1
    planes = deterministic_planes(bands * planes_per_band, dim)
    vn = with_normalized(vectors, vec_col, "_vn").select(
        F.col(id_col).alias("id"), "_vn"
    )
    # Guard wraps _vn itself (not a droppable side column Catalyst could
    # prune): every downstream consumer evaluates it.
    vn = vn.withColumn(
        "_vn",
        F.when(F.size(F.col("_vn")) == dim, F.col("_vn")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("cosine_near_dup_pairs_bucketed: embedding length "),
                    F.size(F.col("_vn")).cast("string"),
                    F.lit(
                        f" != dim {dim} — LSH bucketing would silently "
                        "degenerate to all-pairs"
                    ),
                )
            )
        ),
    )
    band_keys = [
        F.struct(
            F.lit(b).alias("band_idx"),
            hyperplane_bucket(
                F.col("_vn"), planes[b * planes_per_band : (b + 1) * planes_per_band]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = vn.select(
        "id", F.explode(F.array(*band_keys)).alias("bk")
    ).select("id", "bk.band_idx", "bk.bucket")
    buckets = (
        banded.groupBy("band_idx", "bucket")
        .agg(F.array_sort(F.collect_list("id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pair_gen = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pair_gen).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    a = vn.select(F.col("id").alias("id_a"), F.col("_vn").alias("_va"))
    b = vn.select(F.col("id").alias("id_b"), F.col("_vn").alias("_vb"))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", dot(F.col("_va"), F.col("_vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: compare only vectors in the query's hyperplane
    bucket. Recall improves with multiple plane sets (union of buckets);
    this single-table variant demonstrates the shuffle shape — an
    equi-join on bucket ids instead of a cross join."""
    cb = with_normalized(corpus, vec_col, "_cvec").select(
        F.col(id_col),
        "_cvec",
        hyperplane_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    qb = with_normalized(queries, vec_col, "_qvec").select(
        F.col(query_id_col),
        "_qvec",
        hyperplane_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    scored = cb.join(F.broadcast(qb), "_bucket").select(
        query_id_col,
        id_col,
        dot(F.col("_qvec"), F.col("_cvec")).alias("cosine_sim"),
    ).filter(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


FIXED_POINT_SCALE = 1 << 20  # ~6 decimal digits of fraction


def embedding_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid of embedding vectors via FIXED-POINT sums.

    A double SUM over a group is order-dependent (IEEE addition doesn't
    associate), so a float centroid can't be reproduced bit-exactly by
    another engine — or even by the same engine under a different
    partitioning. Quantizing each component to round(x * 2^20) first
    makes the per-dimension sum an exact integer (order-independent,
    overflow-safe: 2^20-scaled unit floats sum exactly in int64 up to
    ~2^43 rows/group), with ONE IEEE division at the end. That is what
    makes the result both deterministic at 100 TB and oracle-checkable.

    Shape: posexplode (narrow) -> groupBy(group, pos) integer sums with
    map-side partial agg -> groupBy(group) sorted re-assembly. The wide
    shuffle carries (group, pos) keyed integer pairs — dim * groups rows
    after partial agg, independent of input row count.

    Output: (group_col, n_vecs BIGINT, centroid ARRAY<DOUBLE>).
    """
    ex = df.select(
        group_col, F.posexplode(vec_col).alias("pos", "x")
    ).withColumn(
        "qx",
        F.round(F.col("x").cast("double") * FIXED_POINT_SCALE).cast("long"),
    )
    sums = ex.groupBy(group_col, "pos").agg(
        F.sum("qx").cast("long").alias("s"),
        F.count("*").cast("long").alias("c"),
    )
    dims = sums.withColumn(
        "cv",
        F.col("s").cast("double")
        / (F.col("c") * FIXED_POINT_SCALE).cast("double"),
    )
    return dims.groupBy(group_col).agg(
        F.max("c").cast("long").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s["cv"],
        ).alias("centroid"),
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 10,
) -> DataFrame:
    """One deterministic Lloyd assignment step: each vector goes to the
    nearest of k seed centroids (the k lowest-``id_col`` vectors), with
    squared L2 computed in EXACT integer arithmetic.

    Floating-point distance sums are fold-order-dependent, so an argmin
    over them is not reproducible across engines or partitionings. Instead
    components quantize to round(x * 2^scale_bits) and the squared
    distance is an int64 sum (exact, order-independent), so the argmin —
    tie-broken by seed rank — is bit-stable anywhere. This is the
    assignment half of k-means; composing it with
    ``embedding_centroids(group_col='cluster')`` gives a full Lloyd
    iteration, reproducible end to end.

    Shape: seeds are k rows (broadcast); assignment is a narrow map over
    a k-element array fold per vector — no shuffle at all. The iterative
    driver loop is the same localCheckpoint pattern as connected
    components.

    Output: (id_col, cluster BIGINT, dist BIGINT) — dist in quantized
    squared units.
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * (1 << scale_bits)).cast("long"),
    )
    vecs = df.select(F.col(id_col), q.alias("qv"))
    # k lowest ids via TakeOrderedAndProject (no global sort); the rank
    # window then runs over k rows only — bounded, not data-sized
    w = Window.orderBy(id_col)
    seeds = (
        vecs.orderBy(F.col(id_col).asc())
        .limit(k)
        .withColumn("cluster", (F.row_number().over(w) - 1).cast("long"))
        .select("cluster", F.col("qv").alias("qc"))
    )
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("qc"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = vecs.join(F.broadcast(seeds)).select(
        F.col(id_col), F.struct(dist.alias("d"), F.col("cluster").alias("c")).alias("sc")
    )
    best = scored.groupBy(id_col).agg(F.min("sc").alias("b"))
    return best.select(
        id_col,
        F.col("b.c").alias("cluster"),
        F.col("b.d").alias("dist"),
    )


def _quantized(vec_col: str, scale_bits: int) -> Column:
    """Fixed-point quantization of a vector column: round(x * 2^bits)."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * (1 << scale_bits)).cast("long"),
    )


def _nearest_centroid(qv: Column, centroids: list[tuple[int, list[int]]]) -> Column:
    """struct(d, c) of the nearest centroid LITERAL by exact integer
    squared L2, ties to the lowest cluster id. Centroids are k small
    literal arrays baked into the plan — assignment is a narrow map with
    zero shuffles and zero joins (cheaper than even a broadcast join:
    nothing to build, nothing to probe)."""
    opts = []
    for cid, qc in centroids:
        lit_c = F.array(*[F.lit(int(v)).cast("long") for v in qc])
        d = F.aggregate(
            F.zip_with(qv, lit_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        opts.append(F.struct(d.alias("d"), F.lit(int(cid)).cast("long").alias("c")))
    return F.array_min(F.array(*opts))


def _nearest_lists(qv: Column, centroids: list[tuple[int, list[int]]], nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest centroid ids by exact integer
    squared L2, ordered nearest-first (ties to the lowest id) — the
    multi-probe generalization of ``_nearest_centroid``. Same k literal
    folds; the sort is over the k-element in-row array, not data."""
    opts = []
    for cid, qc in centroids:
        lit_c = F.array(*[F.lit(int(v)).cast("long") for v in qc])
        d = F.aggregate(
            F.zip_with(qv, lit_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        opts.append(F.struct(d.alias("d"), F.lit(int(cid)).cast("long").alias("c")))
    ranked = F.slice(F.array_sort(F.array(*opts)), 1, nprobe)
    return F.transform(ranked, lambda s: s["c"])


def kmeans_train(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 10,
) -> list[tuple[int, list[int]]]:
    """Full deterministic Lloyd training loop; returns the trained
    centroids as ``[(cluster_id, quantized_components)]``.

    Every step is bit-reproducible across engines and partitionings:
    seeds are the k lowest-``id_col`` vectors; assignment is the exact
    integer-L2 argmin of ``kmeans_assign``; the centroid update keeps
    centroids ON the quantized grid — per-dimension integer sums (order
    independent), one IEEE division, and the rounding done IN Spark
    (``F.round``), never in driver Python, so a SQL oracle can replay
    the identical op sequence. An unrolled-CTE DuckDB mirror gates this
    end to end (registry: ``kmeans_iterations``, ``ann_ivf_topk``).

    Scale shape per iteration: the whole round runs as exploded
    (id, pos, x) element rows through codegen'd hash aggregates — the
    argmin is a broadcast equi-join on pos against the k*dim centroid
    element rows, never an interpreted per-row array fold (higher-order
    functions don't whole-stage-codegen; an aggregate(zip_with(...))
    literal fold measured ~3s per iteration at 5k x 64 x 8 where this
    shape is ~0.3s). The centroid update is one (cluster, pos) shuffle of
    k * dim rows after map-side partial agg, independent of input size;
    rounding happens IN Spark (``F.round``), never in driver Python. The
    driver reads back k * dim ints per round (bounded scalar read, same
    class as the connected-components convergence check); lineage does
    not grow with iterations because each round plans from the base
    frame plus a fresh tiny centroid frame. Converges early (and
    exactly) when the quantized centroids stop moving; a cluster that
    loses all members is dropped (both engines derive centroids only
    from present groups).
    """
    spark = df.sparkSession
    vecs = df.select(F.col(id_col).alias("_id"), _quantized(vec_col, scale_bits).alias("_qv"))
    seed_rows = vecs.orderBy(F.col("_id").asc()).limit(k).collect()
    cents = [(j, [int(v) for v in r["_qv"]]) for j, r in enumerate(seed_rows)]
    # persist the element rows across iterations: every round re-reads
    # them, and recomputing scan+quantize+explode per round costs more
    # than the (3-int-per-element) cache footprint at any scale
    ex = vecs.select("_id", F.posexplode("_qv").alias("_pos", "_x")).persist()
    try:
        cents = _kmeans_loop(spark, ex, cents, iters)
    finally:
        ex.unpersist()
    return cents


def _kmeans_loop(spark, ex, cents, iters):
    for _ in range(iters):
        cent_rows = spark.createDataFrame(
            [(int(cid), p, int(c)) for cid, qc in cents for p, c in enumerate(qc)],
            "_cl BIGINT, _pos INT, _c BIGINT",
        )
        diff = F.col("_x") - F.col("_c")
        scored = (
            ex.join(F.broadcast(cent_rows), "_pos")
            .groupBy("_id", "_cl")
            .agg(F.sum(diff * diff).alias("_d"))
        )
        best = scored.groupBy("_id").agg(
            F.min(F.struct(F.col("_d").alias("d"), F.col("_cl").alias("c")))["c"]
            .alias("_bc")
        )
        upd = (
            ex.join(best, "_id")
            .groupBy(F.col("_bc").alias("_cl"), F.col("_pos"))
            .agg(
                F.round(
                    F.sum("_x").cast("double") / F.count(F.lit(1)).cast("double")
                )
                .cast("long")
                .alias("_c")
            )
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in upd.collect():  # bounded: at most k * dim rows
            by_cluster.setdefault(int(r["_cl"]), {})[int(r["_pos"])] = int(r["_c"])
        new_cents = [
            (cid, [dims[p] for p in sorted(dims)])
            for cid, dims in sorted(by_cluster.items())
        ]
        if new_cents == cents:
            break
        cents = new_cents
    return cents


def assign_nearest_join(
    df: DataFrame,
    centroids: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 10,
) -> DataFrame:
    """Assignment against trained centroids as an exploded broadcast
    equi-join + codegen'd hash aggregates: (id, cluster BIGINT, dist
    BIGINT), dist in exact quantized squared units, ties to the lowest
    cluster id — bit-identical to the literal-fold form but JVM-compiled.
    Higher-order-function folds run interpreted (no whole-stage codegen),
    so the fold form pays ~µs per array element; this shape streams
    (id, pos, x) element rows through a broadcast join on pos against
    k * dim centroid element rows and two hash aggregations instead.
    Shuffle: one (id, cluster) partial-agg'd exchange — rows bounded by
    n * k after map-side combine, elements never shuffle."""
    spark = df.sparkSession
    cent_rows = spark.createDataFrame(
        [(int(cid), p, int(c)) for cid, qc in centroids for p, c in enumerate(qc)],
        "_cl BIGINT, _pos INT, _c BIGINT",
    )
    ex = df.select(
        F.col(id_col), F.posexplode(_quantized(vec_col, scale_bits)).alias("_pos", "_x")
    )
    diff = F.col("_x") - F.col("_c")
    best = (
        ex.join(F.broadcast(cent_rows), "_pos")
        .groupBy(id_col, "_cl")
        .agg(F.sum(diff * diff).alias("_d"))
        .groupBy(id_col)
        .agg(F.min(F.struct(F.col("_d").alias("d"), F.col("_cl").alias("c"))).alias("_b"))
    )
    return best.select(
        id_col, F.col("_b.c").alias("cluster"), F.col("_b.d").alias("dist")
    )


def kmeans_assign_trained(
    df: DataFrame,
    centroids: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 10,
) -> DataFrame:
    """Assignment against trained centroid literals: (id, cluster BIGINT,
    dist BIGINT). Zero shuffles — the argmin folds k literal arrays per
    row; dist is in quantized squared units like ``kmeans_assign``.
    Prefer ``assign_nearest_join`` when n * k * dim is large: the fold
    here is interpreted per element, the join form is codegen'd."""
    vecs = df.select(F.col(id_col), _quantized(vec_col, scale_bits).alias("_qv"))
    best = vecs.select(
        F.col(id_col), _nearest_centroid(F.col("_qv"), centroids).alias("_b")
    )
    return best.select(
        id_col, F.col("_b.c").alias("cluster"), F.col("_b.d").alias("dist")
    )


def _sub_l2(qv_slice: Column, qc: list[int]) -> Column:
    """Exact integer squared L2 between a quantized subvector column and a
    codebook centroid literal."""
    lit_c = F.array(*[F.lit(int(v)).cast("long") for v in qc])
    return F.aggregate(
        F.zip_with(qv_slice, lit_c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_train_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 10,
) -> list[list[tuple[int, list[int]]]]:
    """Train the M product-quantization codebooks: split the dim-D vector
    into M contiguous subvectors and run the deterministic fixed-point
    Lloyd loop in every subspace. Centroids come back renumbered
    0..len-1 in ascending trained-cluster order so codes can index a
    positional lookup table even when a cluster emptied out during
    training (Lloyd drops memberless clusters).

    All M subspaces train JOINTLY in one distributed loop over exploded
    (id, subspace, pos, x) element rows: assignment is a broadcast
    equi-join on (subspace, pos) against the m * k_sub * (dim/m)
    centroid element rows feeding codegen'd hash aggregates (exact
    integer L2 per (id, subspace, candidate), then a min-struct argmin),
    and the centroid update is one (subspace, cluster, pos) shuffle with
    ONE bounded driver read per iteration — versus m separate training
    jobs with interpreted literal-array folds, which dominated wall
    clock. Per-row work never crosses subspaces, so the math is
    identical to training each subspace independently and the unrolled
    SQL oracle is unchanged. Early-exits exactly when no codebook moved
    (Lloyd fixed point, same result as per-book convergence).
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    spark = corpus.sparkSession
    sub_len = dim // m
    qv = _quantized(vec_col, scale_bits)
    full = corpus.select(F.col(id_col).alias("_id"), qv.alias("_qv"))
    # (id, subspace, pos-in-subspace, element): one explode of the full
    # vector, subspace derived from the global position
    ex = full.select("_id", F.posexplode("_qv").alias("_gp", "_x")).select(
        "_id",
        (F.col("_gp") / sub_len).cast("int").alias("_s"),
        (F.col("_gp") % sub_len).cast("int").alias("_pos"),
        "_x",
    ).persist()  # every iteration re-reads the element rows
    seed_rows = full.orderBy(F.col("_id").asc()).limit(k_sub).collect()
    # original seed-rank cluster ids through training (tie-breaks and
    # dropped-cluster gaps must match per-subspace training / the SQL
    # oracle); renumber to positional codes only on return
    cents = [
        [
            (cid, [int(v) for v in r["_qv"][s * sub_len : (s + 1) * sub_len]])
            for cid, r in enumerate(seed_rows)
        ]
        for s in range(m)
    ]
    try:
        for _ in range(iters):
            cent_rows = spark.createDataFrame(
                [
                    (s, int(cid), p, int(c))
                    for s, book in enumerate(cents)
                    for cid, qc in book
                    for p, c in enumerate(qc)
                ],
                "_s INT, _cl BIGINT, _pos INT, _c BIGINT",
            )
            diff = F.col("_x") - F.col("_c")
            scored = (
                ex.join(F.broadcast(cent_rows), ["_s", "_pos"])
                .groupBy("_id", "_s", "_cl")
                .agg(F.sum(diff * diff).alias("_d"))
            )
            best = scored.groupBy("_id", "_s").agg(
                F.min(F.struct(F.col("_d").alias("d"), F.col("_cl").alias("c")))["c"]
                .alias("_bc")
            )
            upd = (
                ex.join(best, ["_id", "_s"])
                .groupBy("_s", F.col("_bc").alias("_cl"), F.col("_pos"))
                .agg(
                    F.round(
                        F.sum("_x").cast("double") / F.count(F.lit(1)).cast("double")
                    )
                    .cast("long")
                    .alias("_c")
                )
            )
            nested: dict[int, dict[int, dict[int, int]]] = {}
            for r in upd.collect():  # bounded: at most m * k_sub * sub_len rows
                nested.setdefault(int(r["_s"]), {}).setdefault(int(r["_cl"]), {})[
                    int(r["_pos"])
                ] = int(r["_c"])
            new_cents = [
                [
                    (cid, [dims[p] for p in sorted(dims)])
                    for cid, dims in sorted(nested.get(s, {}).items())
                ]
                for s in range(m)
            ]
            if new_cents == cents:
                break
            cents = new_cents
    finally:
        ex.unpersist()
    return [
        [(j, qc) for j, (_, qc) in enumerate(book)] for book in cents
    ]


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 4,
    k_sub: int = 8,
    n_lists: int = 8,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale_bits: int = 10,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-PQ approximate nearest neighbour — the classic billion-scale
    ANN layout (coarse quantizer + product codes), built entirely from
    deterministic fixed-point arithmetic so the whole pipeline is
    bit-reproducible and SQL-oracle-checkable.

    Index side: a k-means coarse quantizer (``kmeans_train``) routes each
    vector to one of ``n_lists`` inverted lists; M per-subspace codebooks
    (``pq_train_codebooks``) compress the vector to M small codes. At 100
    TB this is the point: the search structure stores M small codes + a list id
    per vector instead of the raw floats (64 floats -> M codes), and
    candidate generation is an equi-join on list ids, never all-pairs.

    Query side: each query computes, per subspace, a lookup table of
    exact integer squared-L2 distances to all k_sub centroids (an M x
    k_sub literal fold — narrow, no shuffle, no join). Scoring a
    candidate is then asymmetric distance computation (ADC): sum of M
    table lookups by code — O(M) per pair instead of O(dim). The only
    shuffle is the broadcast list-equi-join; encode and LUT stages are
    zero-shuffle narrow maps over centroid literals.

    Output: (query_id, vec_id, adc_dist BIGINT, rank) — ascending ADC,
    ties to the lower vec_id, candidates from the query's ``nprobe``
    nearest lists (default 1 = own list, the oracle-gated form; lists
    partition the corpus so multi-probe candidates are disjoint),
    self-matches excluded.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_len = dim // m
    # The two training loops are independent given the corpus and each
    # is driver-paced (bounded collect per iteration), so run them as
    # concurrent Spark jobs from two threads — the scheduler interleaves
    # their small stages instead of serializing the driver round-trips.
    # Determinism is unaffected: the loops share nothing but the
    # read-only corpus frame.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_coarse = pool.submit(
            kmeans_train, corpus, k=n_lists, iters=train_iters, id_col=id_col,
            vec_col=vec_col, scale_bits=scale_bits,
        )
        f_books = pool.submit(
            pq_train_codebooks, corpus, dim, m=m, k_sub=k_sub,
            iters=train_iters, id_col=id_col, vec_col=vec_col,
            scale_bits=scale_bits,
        )
        coarse, books = f_coarse.result(), f_books.result()
    qv = _quantized(vec_col, scale_bits)

    # Corpus encode as ONE exploded broadcast-join + hash-agg pass
    # (codegen'd), not per-row interpreted literal folds: every centroid
    # element — the coarse quantizer tagged subspace -1 over global
    # positions, each PQ codebook over its in-subspace positions — joins
    # the element rows on (subspace, pos); exact integer L2 per
    # (id, subspace, candidate); min-struct argmin per (id, subspace);
    # one pivot agg emits (id, list, code_0..code_{m-1}). No id-to-id
    # join anywhere, so nothing can sort-merge.
    spark = corpus.sparkSession
    cent_elems = [
        (-1, int(cid), p, int(c))
        for cid, qc in coarse
        for p, c in enumerate(qc)
    ] + [
        (s, int(j), p, int(c))
        for s, book in enumerate(books)
        for j, qc in book
        for p, c in enumerate(qc)
    ]
    cent_rows = spark.createDataFrame(
        cent_elems, "_s INT, _cl BIGINT, _pos INT, _c BIGINT"
    )
    full = corpus.select(F.col(id_col), qv.alias("_qv"))
    elems = full.select(id_col, F.posexplode("_qv").alias("_gp", "_x"))
    ex = elems.select(
        id_col, F.lit(-1).alias("_s"), F.col("_gp").alias("_pos"), "_x"
    ).unionAll(
        elems.select(
            id_col,
            (F.col("_gp") / sub_len).cast("int").alias("_s"),
            (F.col("_gp") % sub_len).cast("int").alias("_pos"),
            "_x",
        )
    )
    diff = F.col("_x") - F.col("_c")
    best = (
        ex.join(F.broadcast(cent_rows), ["_s", "_pos"])
        .groupBy(id_col, "_s", "_cl")
        .agg(F.sum(diff * diff).alias("_d"))
        .groupBy(id_col, "_s")
        .agg(
            F.min(F.struct(F.col("_d").alias("d"), F.col("_cl").alias("c")))["c"]
            .alias("_bc")
        )
    )
    enc = best.groupBy(id_col).agg(
        F.max(F.when(F.col("_s") == -1, F.col("_bc"))).alias("_list"),
        *[
            F.max(F.when(F.col("_s") == s, F.col("_bc"))).alias(f"_c{s}")
            for s in range(m)
        ],
    )

    probe = (
        _nearest_centroid(F.col("_qv"), coarse)["c"]
        if nprobe == 1
        else F.explode(_nearest_lists(F.col("_qv"), coarse, nprobe))
    )
    qb = queries.withColumn("_qv", qv).withColumn("_list", probe)
    for s, book in enumerate(books):
        sub = F.slice(F.col("_qv"), s * sub_len + 1, sub_len)
        qb = qb.withColumn(
            f"_lut{s}", F.array(*[_sub_l2(sub, qc) for _, qc in book])
        )
    qb = qb.select(
        F.col(query_id_col), "_list", *[F.col(f"_lut{s}") for s in range(m)]
    )

    adc = None
    for s in range(m):
        term = F.element_at(F.col(f"_lut{s}"), (F.col(f"_c{s}") + 1).cast("int"))
        adc = term if adc is None else adc + term
    scored = (
        enc.join(F.broadcast(qb), "_list")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, adc.cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def save_centroids(
    spark, centroids: list[tuple[int, list[int]]], path: str
) -> None:
    """Persist trained centroids as a tiny parquet table
    (cluster BIGINT, qc ARRAY<BIGINT>) — the model artifact an offline
    training job hands to online assignment/search jobs. Quantized
    components round-trip exactly (they are integers), so a reloaded
    model reproduces assignments bit-for-bit."""
    spark.createDataFrame(
        [(int(cid), [int(v) for v in qc]) for cid, qc in centroids],
        "cluster BIGINT, qc ARRAY<BIGINT>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> list[tuple[int, list[int]]]:
    """Inverse of save_centroids, ordered by cluster id (driver-side read
    of k rows — bounded, same class as the training convergence read)."""
    rows = spark.read.parquet(path).orderBy("cluster").collect()
    return [(int(r["cluster"]), [int(v) for v in r["qc"]]) for r in rows]


def save_pq_codebooks(
    spark, codebooks: list[list[tuple[int, list[int]]]], path: str
) -> None:
    """Persist PQ codebooks as (subspace, code, qc) rows."""
    spark.createDataFrame(
        [
            (s, int(code), [int(v) for v in qc])
            for s, book in enumerate(codebooks)
            for code, qc in book
        ],
        "subspace INT, code BIGINT, qc ARRAY<BIGINT>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_pq_codebooks(spark, path: str) -> list[list[tuple[int, list[int]]]]:
    rows = spark.read.parquet(path).orderBy("subspace", "code").collect()
    books: dict[int, list[tuple[int, list[int]]]] = {}
    for r in rows:
        books.setdefault(int(r["subspace"]), []).append(
            (int(r["code"]), [int(v) for v in r["qc"]])
        )
    return [books[s] for s in sorted(books)]
