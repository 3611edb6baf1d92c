"""Similarity search over embedding columns (``array<float>``).

Two paths:

* :func:`brute_force_topk` — exact cosine top-k.  The query set is
  broadcast (small side), so the plan is a map-side broadcast
  nested-loop over the big corpus + a top-k window — no corpus shuffle
  except the final per-query k-row reduction.  This is the baseline and
  the verifier for the approximate path.
* :func:`lsh_topk` — sign-random-projection LSH: each vector maps to a
  ``n_planes``-bit bucket; candidates = same-bucket (or near-bucket)
  pairs, cosine only inside buckets.  Hyperplanes are derived
  deterministically from md5, so results are reproducible across runs
  and engines.  At 100 TB this turns O(N·Q) into O(N + Q·bucket_size).

Dot products / norms are JVM ``aggregate``/``zip_with`` lambdas — no
Python in the scoring loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank).

    Scores are rounded before ranking (ties broken by neighbor id) so the
    ordering is stable across float summation orders."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) from
    md5(p:d) mapped to [-1, 1]."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append(h / float(0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def srp_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id (int in [0, 2^n_planes))."""
    planes = _hyperplanes(dim, n_planes)
    bucket = F.lit(0)
    for p, row in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(x) for x in row]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: cosine only within SRP buckets.

    Recall/cost dial = ``n_planes`` (fewer planes → bigger buckets →
    higher recall).  Bucket assignment is a narrow map; the candidate
    join shuffles on the bucket id only."""
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        srp_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        srp_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 3).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
