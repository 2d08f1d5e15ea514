"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against the corpus, dot products computed JVM-side with zip_with/aggregate
(no Python in the hot path), top-k via window rank.

Scale path: LSH bucketing via random hyperplanes (sign bits) — corpus and
queries hash to bucket keys; candidate generation is an equi-join on
buckets, turning O(N*Q) into O(collisions). An IVF-style variant can use
k-means centroids from MLlib the same way (bucket = nearest centroid).
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
