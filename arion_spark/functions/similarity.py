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


def _hyperplanes(dim: int, n_planes: int, seed: str = "") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) from
    md5(seed ‖ p:d) mapped to [-1, 1].  ``seed`` derives independent
    plane sets per LSH band."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append(h / float(0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def srp_bucket(vec: Column, dim: int, n_planes: int = 8, seed: str = "") -> Column:
    """Sign-random-projection bucket id (int in [0, 2^n_planes))."""
    planes = _hyperplanes(dim, n_planes, seed)
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


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic distributed Lloyd k-means → (cell_id, cent).

    * init: first ``k`` corpus vectors by id (deterministic seed);
    * each iteration: cosine-assign every vector to its best centroid
      (broadcast join + one row_number window), then recompute centroids
      as the per-cell per-dimension mean via posexplode → groupBy(cell,
      dim).avg → re-collect (two shuffles per iter; at 10^10 vectors the
      update is a treeAggregate of running (sum, count) pairs — same
      math, fewer shuffles).
    * determinism across engines/runs: float summation order varies, so
      centroids are rounded to ``round_digits`` each iteration — enough
      to absorb last-ulp reorder noise, tight enough to keep real
      assignment geometry;
    * an emptied cell keeps its previous centroid (coalesce), mirroring
      the SQL oracle.
    """
    cents = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .cast("long")
            .alias("cell_id"),
            F.col(vec_col).alias("cent"),
        )
    )
    for _ in range(iters):
        assigned = _assign_cells(corpus, cents, id_col, vec_col)
        new = (
            assigned.select("cell_id", F.posexplode(vec_col).alias("dim", "val"))
            .groupBy("cell_id", "dim")
            .agg(F.round(F.avg("val"), round_digits).alias("m"))
            .groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s.getField("m"),
                ).alias("new_cent")
            )
        )
        cents = cents.join(new, "cell_id", "left").select(
            "cell_id", F.coalesce("new_cent", "cent").alias("cent")
        )
    return cents


def _assign_cells(
    df: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid (max cosine, ties → lowest cell_id) assignment:
    map-only against a broadcast centroid table + one per-id top-1."""
    scored = df.join(F.broadcast(cents)).select(
        df[id_col],
        df[vec_col],
        F.col("cell_id"),
        cosine(df[vec_col], F.col("cent")).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize every vector to its
    nearest "centroid", then search only the query's cell.

    Training a real k-means is out of scope for a deterministic oracle;
    the coarse quantizer uses the first ``n_cells`` corpus vectors (by
    id) as centroids — the IVF *structure* (cell assignment as a narrow
    broadcast map, candidate search shuffled only on cell id) is exactly
    the production shape; swap the centroid source for trained ones at
    scale.  At 100 TB: corpus cell assignment is map-only against a
    broadcast centroid table; the search join shuffles on (cell) and the
    per-query top-k is one window over k·|cell| candidates.
    """
    cents = (
        centroids
        if centroids is not None
        else corpus.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cent"))
    )

    cb = _assign_cells(corpus, cents, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell_id"
    )
    qb = _assign_cells(queries, cents, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell_id"
    )
    scored = (
        cb.join(F.broadcast(qb), "cell_id")
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
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("int").alias("rank"))
    )


def banded_srp_buckets(
    vec: Column, dim: int, n_bands: int, n_planes: int
) -> Column:
    """Array of per-band SRP bucket ids; band *b* uses an independent
    md5-seeded plane set (``seed='band{b}:'``)."""
    return F.array(
        *[
            srp_bucket(vec, dim, n_planes, seed=f"band{b}:")
            for b in range(n_bands)
        ]
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 16,
    n_planes: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b), a < b, cosine ≥
    threshold, candidates routed through banded SRP-LSH buckets.

    Plan shape (scale path, NOT all-pairs): narrow map computes
    ``n_bands`` bucket ids per vector → ``posexplode`` to (band, bucket)
    keys → shuffled **equi-join on (band, bucket)** with ``id_a < id_b``
    → pair dedup → exact cosine verification of candidates only.  No
    BroadcastNestedLoopJoin anywhere; the only shuffles are the bucket
    join (key cardinality ``n_bands · 2^n_planes``) and the pair dedup.

    Recall: a true pair is missed only if it splits in *every* band —
    P(miss) = (1 - (1 - θ/π)^n_planes)^n_bands; at cos ≥ 0.9
    (θ ≤ 25.8°) with 16 bands × 4 planes that is < 1e-6.  At larger
    corpus sizes raise ``n_planes`` (smaller buckets) and ``n_bands``
    (recall) together.
    """
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(
            banded_srp_buckets(F.col(vec_col), dim, n_bands, n_planes)
        ).alias("band", "bucket"),
    )
    left = b.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), "band", "bucket"
    )
    right = b.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), "band", "bucket"
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = F.round(cosine(F.col("va"), F.col("vb")), 4)
    return cand.select("id_a", "id_b", sim.alias("cos_sim")).where(
        F.col("cos_sim") >= threshold
    )


def cosine_near_dup_pairs_exact(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs O(N²) variant — tiny-scale recall verifier for
    :func:`cosine_near_dup_pairs`, never the production path."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 4)
    return (
        pairs.select("id_a", "id_b", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )
