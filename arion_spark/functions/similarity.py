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


def srp_probe_buckets(
    vec: Column, dim: int, n_planes: int = 6, seed: str = ""
) -> Column:
    """Two-probe SRP bucket set: ``[own bucket, own bucket with the
    lowest-|margin| plane flipped]`` (classic multi-probe LSH — the
    plane whose projection is nearest zero is the likeliest sign error,
    so probing its flip recovers most of the recall a wider bucket
    would).  Ties broken by lowest plane index — deterministic and
    SQL-mirrorable.  Query-side only: the corpus keeps exactly one
    bucket per vector, so probe join outputs are duplicate-free by
    construction.  The projection expressions are interpreted
    higher-order folds evaluated a handful of times each — fine for the
    (small) query side; never put this on the corpus side."""
    planes = _hyperplanes(dim, n_planes, seed)
    projs = [_dot(vec, F.array(*[F.lit(x) for x in row])) for row in planes]
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket + F.when(projs[p] > 0, F.lit(1 << p)).otherwise(F.lit(0))
    bucket = bucket.cast("int")
    absmin = F.least(*[F.abs(pr) for pr in projs])
    alt = F.when(F.abs(projs[0]) == absmin, bucket.bitwiseXOR(F.lit(1)))
    for p in range(1, n_planes):
        alt = alt.when(
            F.abs(projs[p]) == absmin, bucket.bitwiseXOR(F.lit(1 << p))
        )
    return F.array(bucket, alt.cast("int"))


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """lsh_topk with two-probe queries: candidates = corpus vectors in
    either probed bucket.  Strictly higher recall than single-probe at
    ~2× candidate cost; the corpus side is untouched (one bucket per
    vector, no index change) — the serving deployment reads the same
    partitioned index (streaming/ann.py)."""
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        srp_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            srp_probe_buckets(F.col(vec_col), dim, n_planes)
        ).alias("bucket"),
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
    df: DataFrame, cents: DataFrame, id_col: str, vec_col: str,
    n_probes: int = 1,
) -> DataFrame:
    """``n_probes`` nearest-centroid assignment (max cosine, ties →
    lowest cell_id): map-only against a broadcast centroid table + one
    per-id top-``n_probes`` window.  Probing >1 cells is the standard
    IVF recall dial — the corpus stays single-cell, only the (small)
    query side fans out."""
    scored = df.join(F.broadcast(cents)).select(
        df[id_col],
        df[vec_col],
        F.col("cell_id"),
        cosine(df[vec_col], F.col("cent")).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_probes)
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
    n_probes: int = 1,
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
    qb = _assign_cells(queries, cents, id_col, vec_col, n_probes=n_probes).select(
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


def banded_srp_buckets_udf(dim: int, n_bands: int, n_planes: int):
    """Arrow-vectorized twin of :func:`banded_srp_buckets`.

    The expression form builds ``n_bands × n_planes`` higher-order
    ``aggregate(zip_with(...))`` trees over literal arrays — Catalyst
    interprets HOFs per element, so at 16 bands × 8 planes the bucket
    assignment alone measured ~19 s for 4k vectors.  This UDF computes
    the same projections as one numpy pass per Arrow batch (~ms), with
    the d-loop accumulated **sequentially in dimension order** so every
    projection is bit-identical to the expression fold (and to the
    oracle's left-to-right dot product) — sign decisions cannot drift.

    The plane matrix (md5-derived, same ``_hyperplanes``) is a tiny
    closure constant shipped to every executor; the op stays a narrow
    map, so the scale shape is unchanged.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.stack(
        [
            np.array(_hyperplanes(dim, n_planes, seed=f"band{b}:"))
            for b in range(n_bands)
        ]
    )  # (bands, planes, dim)
    W = planes.reshape(n_bands * n_planes, dim).T.copy()  # (dim, bands·planes)
    bits = (1 << np.arange(n_planes)).astype(np.int64)

    # explicit __annotations__: `from __future__ import annotations`
    # stringifies inline hints and pandas_udf can't resolve them here
    def buckets(vs):
        if len(vs) == 0:  # empty Arrow batch: tolist() → 1-D (0,) array
            return pd.Series([], dtype=object)
        V = np.asarray(vs.tolist(), dtype=np.float64)
        proj = np.zeros((V.shape[0], W.shape[1]))
        for d in range(dim):  # sequential over d == the fold's order
            proj += np.multiply.outer(V[:, d], W[d])
        signs = (proj > 0.0).reshape(-1, n_bands, n_planes)
        out = (signs * bits).sum(axis=2).astype(np.int32)
        return pd.Series(list(out))

    buckets.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(buckets, "array<int>")


def cosine_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 32,
    n_planes: int = 12,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b), a < b, cosine ≥
    threshold, candidates routed through banded SRP-LSH buckets.

    Plan shape (scale path, NOT all-pairs): narrow map computes
    ``n_bands`` bucket ids per vector → ``posexplode`` to (band, bucket)
    keys → shuffled **equi-join on (band, bucket)** over ID-ONLY rows
    with ``id_a < id_b`` → pair dedup → vectors joined back → exact
    cosine verification of candidates only.  No BroadcastNestedLoopJoin
    anywhere.  Two deliberate choices, both measured at sf0.1 (4k × 64-d
    vectors, local[32]):

    * the bucket join and the pair dedup see only (band, bucket, id) —
      carrying the two 64-double payloads through the candidate shuffle
      instead was 66 s vs 3 s for this shape (vectors are fetched by two
      id equi-joins after dedup, which AQE broadcasts when small);
    * ``n_planes`` sizes the per-band bucket space (2^n_planes).  4
      planes = 16 buckets/band collapses every band into a handful of
      mega-buckets whose pair count grows quadratically with corpus
      size — the silent return of all-pairs (measured: 560k candidates
      for a 4k corpus).  12 planes (4096/band) keeps buckets
      near-singleton at this scale; at larger corpora raise
      ``n_planes`` with log2(corpus) and ``n_bands`` for recall.

    Bucket assignment runs through :func:`banded_srp_buckets_udf` (one
    numpy pass per Arrow batch, projections bit-identical to the
    expression fold) — the HOF-expression form measured ~19 s for the
    assignment alone at 16×8 planes.

    Recall target: ≥ 0.995 for any pair at or above the 0.9 default
    threshold.  A true pair is missed only if it splits in *every*
    band — P(miss) = (1 - (1 - θ/π)^n_planes)^n_bands.  At exactly
    cos = 0.9 (θ ≈ 25.8°, the worst in-threshold case) with the default
    32 bands × 12 planes that is ≈ 0.844^32 ≈ 4e-3; at the planted-dup
    similarity (cos ≈ 0.93) ≈ 4e-4.  The earlier 16-band default put
    the worst case at ~6-7% miss — a silent recall cliff; doubling the
    bands doubles only the narrow bucket-assign map and the candidate
    explode, not the verify cost (duplicate candidates collapse in the
    pair dedup).
    """
    bucketer = banded_srp_buckets_udf(dim, n_bands, n_planes)
    b = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bucketer(F.col(vec_col))).alias("band", "bucket"),
    )
    cand = (
        b.select(F.col("id").alias("id_a"), "band", "bucket")
        .join(b.select(F.col("id").alias("id_b"), "band", "bucket"),
              ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    pairs = cand.join(
        vecs.withColumnsRenamed({"id": "id_a", "v": "va"}), "id_a"
    ).join(vecs.withColumnsRenamed({"id": "id_b", "v": "vb"}), "id_b")
    sim = F.round(cosine(F.col("va"), F.col("vb")), 4)
    return pairs.select("id_a", "id_b", sim.alias("cos_sim")).where(
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


# ---------------------------------------------------------------------------
# product quantization (PQ) — the compressed-vector layout ANN runs at
# 100 TB: a D-dim float vector becomes M uint8 codes (here 64 dims →
# 8 codes, 32× smaller), and query scoring reads ONLY codes + a
# per-query lookup table (asymmetric distance computation, ADC).  At
# cluster scale PQ codes ride in the IVF cells (IVF-PQ); here PQ is its
# own oracle-checked operator and composes with ivf_topk.
#
# Determinism contract (everything the DuckDB oracle mirrors):
# * sub-codebooks trained by Lloyd steps per subspace — init = the
#   first k corpus subvectors by id, L2² assignment with the EXACT
#   left-to-right per-dim op sequence both engines write out, ties →
#   lowest code, per-dim means rounded to 6 (absorbs summation-order
#   ulps, same argument as kmeans_centroids), emptied codes keep their
#   previous centroid;
# * encoding = same argmin expression;
# * ADC score = Σ_m round(q_m · cent[m][code_m], 6), summed in subspace
#   order, rounded to 3 — per-m rounding pins the add order.


def _half_up(x, digits):
    """numpy HALF_UP (away-from-zero) rounding — the rounding Spark's
    F.round and DuckDB's round() share; np.round is banker's and would
    diverge at .5 boundaries."""
    import numpy as np

    p = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def pq_encode_udf(cents):
    """Arrow-vectorized PQ encoder: full vector → M sub-codebook codes.

    One numpy pass per batch; the d-loop accumulates SEQUENTIALLY in
    dimension order so every L2² is bit-identical to the SQL oracle's
    spelled-out left-to-right terms (the banded_srp_buckets_udf
    discipline); ties → lowest code (np.argmin first-minimum == the
    oracle's ORDER BY d2, cid).  A literal-expression form was built
    first and measured 87 s at sf0.1 with a 28.6 MiB task binary — the
    M·K·subdim CASE tree breaks whole-stage codegen; this UDF is the
    same math in milliseconds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cent_arr = np.asarray(cents, dtype=np.float64)  # (M, K, sd)
    M, K, sd = cent_arr.shape

    def encode(vs):
        if len(vs) == 0:  # empty Arrow batch guard
            return pd.Series([], dtype=object)
        X = np.asarray(vs.tolist(), dtype=np.float64)
        out = np.empty((len(X), M), dtype=np.int32)
        for m in range(M):
            sub = X[:, m * sd : (m + 1) * sd]
            d2 = np.zeros((len(X), K))
            for d in range(sd):  # sequential over d == the SQL term order
                t = sub[:, d : d + 1] - cent_arr[m, :, d][None, :]
                d2 = d2 + t * t
            out[:, m] = np.argmin(d2, axis=1)  # first min == lowest code
        return pd.Series(list(out))

    encode.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(encode, "array<int>")


def pq_train(
    corpus: DataFrame,
    dim: int = 64,
    n_sub: int = 8,
    k: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks → ``cents[m][code] = [subdim floats]``.

    Distributed shape: assignment is one Arrow-UDF map pass (codebooks
    are kilobytes — they live on the driver between iterations, exactly
    like production PQ training); the update is one groupBy(m, code,
    dim) mean.  Only k×n_sub×subdim rounded floats are ever collected.
    Init = the first ``k`` corpus vectors by id (deterministic seed);
    an emptied code keeps its previous centroid — both mirrored by the
    SQL oracle."""
    sd = dim // n_sub
    seed = [
        r["s"]
        for r in corpus.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).cast("array<double>").alias("s"))
        .collect()
    ]
    cents = [[list(vec[m * sd : (m + 1) * sd]) for vec in seed] for m in range(n_sub)]
    for _ in range(iters):
        enc = corpus.select(
            F.col(vec_col).cast("array<double>").alias("v")
        ).select(
            "v", F.posexplode(pq_encode_udf(cents)(F.col("v"))).alias("m", "code")
        )
        means = (
            enc.select(
                "m",
                "code",
                F.posexplode(F.expr(f"slice(v, m * {sd} + 1, {sd})")).alias(
                    "d", "val"
                ),
            )
            .groupBy("m", "code", "d")
            .agg(F.round(F.avg("val"), round_digits).alias("mu"))
            .collect()
        )
        by_mc: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_mc.setdefault((r["m"], r["code"]), {})[r["d"]] = r["mu"]
        cents = [
            [
                [by_mc[(m, c)][d] for d in range(sd)]
                if (m, c) in by_mc
                else cents[m][c]  # emptied code keeps its centroid
                for c in range(k)
            ]
            for m in range(n_sub)
        ]
    return cents


def pq_encode(
    corpus: DataFrame,
    cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): the 32×-compressed corpus — one narrow
    Arrow-UDF map, no shuffle."""
    return corpus.select(
        F.col(id_col),
        pq_encode_udf(cents)(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def _adc_lut(queries: DataFrame, cent_arr, id_col: str, vec_col: str):
    """Per-query ADC lookup tables: ``lut[q][m][code] = round(q_m·cent,
    6)`` with sequential-d dots (== the SQL oracle's list_dot_product
    term order).  Queries are a small collected batch — LUTs are
    kilobytes and ride to executors inside the scoring closure."""
    import numpy as np

    M, K, sd = cent_arr.shape
    q_rows = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).collect()
    qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Q = np.asarray([r["qv"] for r in q_rows], dtype=np.float64)  # (nq, dim)
    lut = np.zeros((len(qids), M, K))
    for m in range(M):
        qsub = Q[:, m * sd : (m + 1) * sd]
        acc = np.zeros((len(qids), K))
        for d in range(sd):  # sequential over d == list_dot_product order
            acc = acc + np.multiply.outer(qsub[:, d], cent_arr[m, :, d])
        lut[:, m, :] = _half_up(acc, 6)
    return qids, lut


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cents: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: the corpus side touches ONLY its codes (the scan a
    100 TB deployment pays is the compressed one); each query becomes a
    per-subspace lookup table (LUT[m][code] = round(q_m·cent, 6),
    sequential-d dots) computed once on the driver, and scoring is M
    numpy gathers per candidate — production ADC exactly.  Exhaustive
    over codes; compose with IVF cells (ivf_topk) to prune."""
    import numpy as np
    import pandas as pd

    cent_arr = np.asarray(cents, dtype=np.float64)  # (M, K, sd)
    M, K, sd = cent_arr.shape
    qids, lut = _adc_lut(queries, cent_arr, id_col, vec_col)

    codes = pq_encode(corpus, cents, id_col, vec_col)

    def score_batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            cc = np.asarray(pdf["codes"].tolist(), dtype=np.int64)  # (n, M)
            nid = pdf[id_col].to_numpy()
            for qi in range(len(qids)):
                acc = np.zeros(len(cc))
                for m in range(M):  # sequential over m == the oracle's + order
                    acc = acc + lut[qi, m, cc[:, m]]
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "neighbor_id": nid,
                        "score": _half_up(acc, 3),
                    }
                )

    scored = codes.mapInPandas(
        score_batches, "query_id long, neighbor_id long, score double"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse_cents: DataFrame,
    pq_cents: list[list[list[float]]],
    k: int = 5,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF×PQ — the production 100 TB ANN shape: the coarse quantizer
    prunes cells, ADC scores within the probed cells only.

    The index is built in one map pass (broadcast centroids, Arrow-UDF
    PQ encode) and is the ONLY thing the corpus side ever re-reads:
    ``(neighbor_id, cell_id, M uint8 codes)`` — ~33 bytes/vector at
    dim=64, a 16×-smaller scan than raw float64 even before cell
    pruning.  Queries assign to their ``n_probes`` best cells (the
    standard IVF recall dial), the candidate set is the equi-join of
    the compressed index against the broadcast query-cell table —
    shuffle-free on the corpus side — and scoring is M numpy LUT
    gathers per candidate (see pq_topk).  Per-query top-k is one
    window over the probed candidates.

    At cluster scale the index is written partitioned by cell_id, so
    the probe join becomes directory-pruned reads of just the probed
    cells: scan cost = corpus × n_probes/n_cells × 1/16 of raw.
    """
    # compressed index: (neighbor_id, cell_id, codes) — one map pass
    index = pq_cell_index(corpus, coarse_cents, pq_cents, id_col, vec_col)
    probes = _assign_cells(
        queries, coarse_cents, id_col, vec_col, n_probes=n_probes
    ).select(F.col(id_col).alias("query_id"), "cell_id")
    return pq_adc_topk(index, probes, queries, pq_cents, k, id_col, vec_col)


def pq_cell_index(
    corpus: DataFrame,
    coarse_cents: DataFrame,
    pq_cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF×PQ index rows: ``(neighbor_id, cell_id, codes)`` — one
    broadcast-centroid + Arrow-UDF map pass, no shuffle.  This is the
    ONLY representation of the corpus a serving deployment keeps."""
    return _assign_cells(corpus, coarse_cents, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        "cell_id",
        pq_encode_udf(pq_cents)(F.col(vec_col).cast("array<double>")).alias(
            "codes"
        ),
    )


def pq_adc_topk(
    index: DataFrame,
    probes: DataFrame,
    queries: DataFrame,
    pq_cents: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over a prebuilt (neighbor_id, cell_id, codes) index and
    a (query_id, cell_id) probe table — the scoring core shared by the
    batch composition (ivf_pq_topk) and the streaming serving index
    (streaming/pqann.py), so their answers are equal by construction."""
    import numpy as np
    import pandas as pd

    cent_arr = np.asarray(pq_cents, dtype=np.float64)  # (M, K, sd)
    M, K, sd = cent_arr.shape
    qids, lut = _adc_lut(queries, cent_arr, id_col, vec_col)
    qpos = {int(q): i for i, q in enumerate(qids)}

    cand = (
        index.join(F.broadcast(probes), "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "codes")
    )

    def score_batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            cc = np.asarray(pdf["codes"].tolist(), dtype=np.int64)  # (n, M)
            qi = np.array([qpos[q] for q in pdf["query_id"]], dtype=np.int64)
            acc = np.zeros(len(cc))
            for m in range(M):  # sequential over m == the oracle's + order
                acc = acc + lut[qi, m, cc[:, m]]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "score": _half_up(acc, 3),
                }
            )

    scored = cand.mapInPandas(
        score_batches, "query_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )
