"""Embedding similarity search over array<float> columns.

Two tiers, both pure DataFrame plans:

- **brute-force cosine top-k** — the correctness baseline. Query set joins
  the candidate set (broadcast when the query side is small, the usual
  case), cosine computed JVM-side with higher-order array functions
  (zip_with + aggregate → whole-stage codegen, no Python), ranked with a
  window. Cost O(|Q| × N) — fine for |Q| small even at huge N because the
  candidate side streams.

- **LSH-bucketed (random hyperplane)** — the scale path. A deterministic
  hyperplane matrix (md5-derived, engine-portable) maps each vector to a
  sign-bit bucket; candidates are compared only within the query's bucket.
  At 10^10 vectors the bucket join replaces the full scan; recall is tuned
  by the number of planes (fewer planes → bigger buckets → higher recall).

All arithmetic is double-precision and reproducible in ANSI SQL so the
DuckDB oracle verifies values, not just shapes. Cosines are floor-scaled
to integer milli-units before output/compare (floor is hash-stable across
engines; round() impls disagree at representability edges).

The reference crawler has no embedding operators; this is the engine's
training-data-pipeline extension (near-dup filtering / retrieval over
Common-Crawl-scale corpora).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 8  # LSH hyperplanes → 256 buckets


def as_double(vec: Column) -> Column:
    """Cast array<float> → array<double> so all math is f64 (matches the
    oracle; float32 partial sums would diverge)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate — JVM codegen, sequential
    left-to-right summation (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     scale: int = 1000) -> DataFrame:
    """Exact cosine top-k per query vector.

    `queries` has (query_id, embedding). Broadcast the query side — the
    candidate scan then pipelines with no shuffle; the only shuffle is the
    window over query_id (|Q|×N rows pre-top-k; AQE coalesces).
    Ties break on candidate id ascending (deterministic).
    Returns (query_id, vec_id, rank, cos).
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = vectors.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.floor(F.col("cos") * scale).cast("long").alias("cos_m"))
    )


def plane_component(j: int, d: int) -> int:
    """Deterministic pseudo-random hyperplane component in [-1000, 1000]:
    md5-prefix int of 'j_d'. Portable: the DuckDB oracle computes the
    identical value as ``CAST('0x'||substr(md5(j||'_'||d),1,8) AS BIGINT)
    % 2001 - 1000``."""
    import hashlib

    h = int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:8], 16)
    return h % 2001 - 1000


def plane_matrix(n_planes: int, dim: int) -> list[list[int]]:
    return [[plane_component(j, d) for d in range(dim)] for j in range(n_planes)]


def lsh_bucket(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane bucket id: bit j = sign(v · plane_j).

    The plane matrix is baked in as literal arrays (it's tiny and
    deterministic), so the bucket is a closed-form zip_with/aggregate over
    the row — no join, no shuffle, embarrassingly parallel, codegen'd.
    """
    planes = plane_matrix(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[j]])
        proj = dot(vec, plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = N_PLANES, scale: int = 1000,
             dim: int = 64) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    hyperplane bucket. The bucket equi-join is the scale move — candidate
    work per query drops from N to N/2^planes on average.
    Returns (query_id, vec_id, rank, cos).
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("bucket", lsh_bucket(F.col("qv"), dim, n_planes))
    c = vectors.select(
        F.col(id_col).alias("vec_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", lsh_bucket(F.col("cv"), dim, n_planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.floor(F.col("cos") * scale).cast("long").alias("cos_m"))
    )


def embedding_near_dup_pairs(vectors: DataFrame, threshold: float = 0.4,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             scale: int = 1000) -> DataFrame:
    """All pairs with cosine ≥ threshold (id_a < id_b).

    Correctness-tier all-pairs join; at scale, route through lsh_bucket
    first (same pattern as lsh_topk) — kept exact here because the oracle
    checks exact pair sets. Returns (id_a, id_b, cos).
    """
    a = vectors.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.floor(F.col("cos") * scale).cast("long").alias("cos_m"))
    )
