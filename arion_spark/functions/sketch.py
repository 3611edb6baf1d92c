"""KMV (k-minimum-values) distinct-count sketch — deterministic and
oracle-checkable, unlike approx_count_distinct's HLL.

COUNT DISTINCT is the one aggregate the rollup cascade (operators/
rollup.py) must exclude: it is not re-aggregatable.  The mergeable fix
at 100 TB is a sketch.  Spark ships HLL via ``approx_count_distinct``,
but its register layout is implementation-defined — no external oracle
can reproduce it, so a correctness gate can't see it.  KMV [Bar-Yossef
et al. 2002, "Counting distinct elements in a data stream"] is the
sketch whose entire content is *portable*: the k smallest values of a
uniform hash of the keys.  Estimator: with u_k = k-th smallest hash
mapped into (0,1),  D̂ = (k-1)/u_k  (unbiased for D > k; exact count
when fewer than k distinct hashes exist).

Determinism: the "uniform hash" is the first 13 hex digits of
md5(key) — 52 bits, exact in both int64 and float64 — divided by 16^13.
Spark and DuckDB compute bit-identical doubles, so the estimate itself
hash-matches the oracle.

Mergeability (the scale property): the sketch of A ∪ B is the k
smallest of the union of the two sketches — an associative,
commutative, bounded-size merge, which is exactly what a 1000-executor
partial-aggregate tree or a streaming rollup needs.  The plan below is
the two-shuffle relational form (dedup → per-group k-smallest via
window rank); on a cluster both stages partial-aggregate map-side
first, so the full key set never converges on one node.

Reference analog: arion's md5 result hashing as the compact, portable
digest of a record stream (reference: src/models/fingerprint.cpp) —
KMV keeps k such digests to summarize a *set*.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 16^13 = 2^52 — hash domain size; 52-bit values are exact in float64,
#: and dividing by a power of two is exact scaling, so Spark and DuckDB
#: produce bit-identical doubles.
_DOMAIN = float(16**13)


def uniform_hash(key: Column) -> Column:
    """Deterministic uniform (0,1] double from a string key."""
    return F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double") / F.lit(
        _DOMAIN
    )


def _k_smallest(sk: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """k smallest distinct ``_u`` per group — the sketch normal form.
    Works identically on raw hashes and on unions of sketches (the KMV
    merge), and is idempotent: re-merging replayed rows is a no-op."""
    w = Window.partitionBy(*group_cols).orderBy("_u")
    return (
        sk.distinct()
        .select(*group_cols, "_u", F.row_number().over(w).alias("_rn"))
        .where(F.col("_rn") <= k)
        .select(*group_cols, "_u")
    )


def kmv_partial(
    df: DataFrame, group_cols: list[str], key: Column, k: int = 64
) -> DataFrame:
    """The sketch itself: ``group_cols + _u`` (≤ k rows per group).
    This is what a partial aggregate / streaming micro-batch produces."""
    return _k_smallest(
        df.select(*group_cols, uniform_hash(key).alias("_u")), group_cols, k
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Sketch of the union: k smallest of both sketches — associative,
    commutative, idempotent, bounded (the streaming-rollup merge)."""
    return _k_smallest(a.unionByName(b), group_cols, k)


def kmv_estimate(
    sk: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Finalize a sketch into ``group_cols + (n_kept, est)``."""
    return sk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")).otherwise(
                F.lit(float(k - 1)) / F.max("_u")
            ),
            4,
        ).alias("est"),
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate: ``group_cols + (n_kept, est)``.

    ``n_kept`` = min(k, exact distinct count); ``est`` = exact when the
    group holds fewer than k distinct keys, else (k-1)/u_k.
    Composition of the mergeable stages: partial → estimate.
    """
    return kmv_estimate(kmv_partial(df, group_cols, key, k), group_cols, k)


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    lo: float = 0.0,
    hi: float = 3600.0,
    n_bins: int = 64,
) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles — the scale path for
    percentiles.

    Exact ``percentile()`` needs every value of a group on one node
    (sort or full collect); at 100 TB that is the job.  A fixed-bin
    histogram is an associative aggregate (bin counts add), so it
    partial-aggregates map-side, merges in a tree, and — like the KMV
    sketch above — its entire content is portable: the DuckDB oracle
    reproduces the same bins, cumulative walk and linear interpolation
    bit-for-bit (bin width chosen exactly representable when
    ``(hi-lo)/n_bins`` is a dyadic rational, e.g. 3600/64 = 56.25).

    Estimator: within the bin where the cumulative count crosses
    ``q·total``, interpolate ``bin_lo + width·(target - cum_before)/
    bin_count``.  Error ≤ one bin width; tighten with ``n_bins``.

    Output: ``group_cols + (q, n, est)``; one row per (group, q).
    Composition of the mergeable stages: counts → quantiles-from-counts.
    """
    counts = histogram_counts(df, group_cols, value, lo, hi, n_bins)
    return histogram_quantiles_from_counts(
        counts, group_cols, quantiles, lo, hi, n_bins
    )


def histogram_counts(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    lo: float = 0.0,
    hi: float = 3600.0,
    n_bins: int = 64,
) -> DataFrame:
    """The sketch itself: ``group_cols + (_bin, _n)`` bin counts — what a
    partial aggregate / streaming micro-batch produces.  Values clamp to
    the edge bins."""
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(F.floor((value - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.select(*group_cols, b.alias("_bin"))
        .groupBy(*group_cols, "_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )


def histogram_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Bin counts add — associative/commutative bounded merge.  NOT
    idempotent (unlike KMV), so replay protection must come from the
    caller's commit log (streaming/rollup.SketchSink)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "_bin")
        .agg(F.sum("_n").cast("long").alias("_n"))
    )


def histogram_quantiles_from_counts(
    counts: DataFrame,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95),
    lo: float = 0.0,
    hi: float = 3600.0,
    n_bins: int = 64,
) -> DataFrame:
    """Finalize bin counts into ``group_cols + (q, n, est)``."""
    width = (hi - lo) / n_bins
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = Window.partitionBy(*group_cols)
    cum = counts.select(
        *group_cols,
        "_bin",
        "_n",
        F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_cum"),
        F.sum("_n").over(wt).alias("_total"),
    )
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    hit = cum.select(*group_cols, "_bin", "_n", "_cum", "_total", qs).where(
        (F.col("q") * F.col("_total") > F.col("_cum"))
        & (F.col("q") * F.col("_total") <= F.col("_cum") + F.col("_n"))
    )
    est = F.lit(lo) + F.col("_bin") * F.lit(width) + F.lit(width) * (
        F.col("q") * F.col("_total") - F.col("_cum")
    ) / F.col("_n")
    return hit.select(
        *group_cols,
        "q",
        F.col("_total").alias("n"),
        F.round(est, 4).alias("est"),
    )


# ---------------------------------------------------------------------------
# heavy hitters (top-k terms) — the third classical mergeable summary,
# after distinct count (KMV) and quantiles (fixed-bin histogram)


def topk_terms_counts(
    df: DataFrame, group_cols: list[str], term: Column
) -> DataFrame:
    """Exact per-group term counts: ``group_cols + (_term, _n)``.  The
    groupBy partial-aggregates map-side, so the shuffle carries one row
    per (group, term) per map task — not raw rows."""
    return (
        df.select(*group_cols, term.alias("_term"))
        .groupBy(*group_cols, "_term")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )


def _truncate_topk(counts: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Keep each group's k heaviest terms (ties broken by term asc —
    fully deterministic, so cross-engine/oracle comparable)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("_n"), F.asc("_term")
    )
    return (
        counts.select(*group_cols, "_term", "_n",
                      F.row_number().over(w).alias("_rn"))
        .where(F.col("_rn") <= k)
        .select(*group_cols, "_term", "_n")
    )


def topk_terms_partial(
    df: DataFrame, group_cols: list[str], term: Column, k: int = 64
) -> DataFrame:
    """The bounded summary a micro-batch / partial-aggregate produces:
    exact counts truncated to the k heaviest terms per group
    (SpaceSaving-flavored; we drop the tail instead of folding it into
    counters, which keeps every kept count EXACT for that partial)."""
    return _truncate_topk(topk_terms_counts(df, group_cols, term), group_cols, k)


def topk_terms_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge two summaries: add counts of shared terms, re-truncate.
    Associative and bounded (≤ k rows/group).  Approximation contract:
    a term absent from one side's top-k loses that side's count, so a
    merged count is a LOWER bound with error ≤ the sum of the dropped
    sides' k-th counts; it is EXACT whenever every input partial kept
    all its distinct terms (≤ k per group per partial) — the regime the
    streaming twin test pins, and the regime to size k for (vocab-level
    k ≫ per-batch distinct terms of any hot group)."""
    merged = (
        a.unionByName(b)
        .groupBy(*group_cols, "_term")
        .agg(F.sum("_n").cast("long").alias("_n"))
    )
    return _truncate_topk(merged, group_cols, k)


def topk_terms(
    df: DataFrame, group_cols: list[str], term: Column, k: int = 10
) -> DataFrame:
    """One-shot EXACT top-k heavy hitters per group (rank included):
    ``group_cols + (term, n, rank)``.  This is the batch form — exact
    because nothing was truncated before the final ranking; the
    streaming form merges ``topk_terms_partial`` summaries instead
    (streaming/rollup.run_topk_stream)."""
    counts = topk_terms_counts(df, group_cols, term)
    w = Window.partitionBy(*group_cols).orderBy(F.desc("_n"), F.asc("_term"))
    return (
        counts.select(
            *group_cols, "_term", "_n", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= k)
        .select(
            *group_cols,
            F.col("_term").alias("term"),
            F.col("_n").cast("int").alias("n"),
            "rank",
        )
    )
