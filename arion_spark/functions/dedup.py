"""Deduplication suite for training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup —
each designed shuffle-minimal for the 100 TB case:

* exact:   one shuffle on the content hash (map-side partial agg).
* minhash: signatures are a narrow map stage — ONE md5 per shingle
  mapped to a 32-bit integer, then ``perms`` universal-hash permutations
  ``(a_j·h + b_j) mod P`` in pure integer arithmetic (the classic
  Broder scheme; ~8× cheaper than hashing per permutation and still
  bit-for-bit reproducible in the DuckDB oracle).  LSH banding turns
  the quadratic candidate problem into a bucket-equi-join (shuffle on
  bucket id, skew bounded by band width).
* jaccard: exact verification ONLY over LSH candidate pairs, never
  all-pairs.
* simhash: narrow map to a 16-bit sketch; near-dup = equal sketch or
  hamming ≤ d by multi-probe over banded halves.
* embedding: cosine over LSH-sign buckets (see similarity.py).

All hashing is md5 (lowercase hex) so the DuckDB oracle can reproduce
signatures bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arion_spark.functions.text import tokens_col

MINHASH_PERMS = 8
LSH_BAND_SIZE = 2  # → MINHASH_PERMS / LSH_BAND_SIZE bands

#: prime just above 2^32 — the universal-hash modulus
MINHASH_P = 4_294_967_311


def _minhash_ab(perms: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) coefficients from md5(j).  a_j < 2^31 so
    a_j·h + b_j < 2^63 for 32-bit h — no BIGINT overflow in any engine."""
    out = []
    for j in range(perms):
        a = int(hashlib.md5(f"a{j}".encode()).hexdigest()[:8], 16) % (2**31 - 1) + 1
        b = int(hashlib.md5(f"b{j}".encode()).hexdigest()[:8], 16) % (2**31)
        out.append((a, b))
    return out


MINHASH_AB = _minhash_ab(MINHASH_PERMS)


def shingles_col(text: Column, k: int = 2) -> Column:
    """Distinct word-``k``-shingles of lowercased text (array<string>).

    k=2 is built from two shifted array views zipped elementwise — O(n)
    per row.  (A ``transform(sequence, i -> slice(toks, i, k))`` form
    re-evaluates the tokenizer per element inside the lambda — O(n²) —
    measured 8× slower; don't regress to it.)"""
    toks = tokens_col(text)
    n = F.size(toks)
    if k == 2:
        m = F.greatest(n - 1, F.lit(1))
        pairs = F.zip_with(
            F.slice(toks, 1, m),
            F.slice(toks, 2, m),
            lambda x, y: F.concat_ws(" ", x, y),
        )
        grams = F.when(n < 2, F.array(F.concat_ws(" ", toks))).otherwise(pairs)
    else:
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    return F.array_distinct(grams)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content md5; keep the min id as canonical."""
    h = F.md5(F.col(text_col).cast("binary")).alias("text_md5")
    return (
        df.select(h, F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.count("*").cast("int").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
    )


def _h32(s: Column) -> Column:
    """32-bit integer hash of one shingle: first 8 hex chars of md5 —
    the ONE cryptographic hash on the hot path."""
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("bigint")


def shingle_hashes_col(text: Column) -> Column:
    return F.transform(shingles_col(text), _h32)


def minhash_from_shingles(shingles: Column, perms: int = MINHASH_PERMS) -> Column:
    return minhash_from_hashes(F.transform(shingles, _h32), perms)


def minhash_from_hashes(hashes: Column, perms: int = MINHASH_PERMS) -> Column:
    """sig_j = min over shingle hashes h of (a_j·h + b_j) mod P —
    integer-only permutations over a precomputed hash array."""
    return F.array(
        *[
            F.array_min(
                F.transform(hashes, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P))
            )
            for a, b in MINHASH_AB[:perms]
        ]
    )


def minhash_signature(text: Column, perms: int = MINHASH_PERMS) -> Column:
    """MinHash signature (array<bigint>) straight from text."""
    return minhash_from_hashes(shingle_hashes_col(text), perms)


def with_minhash(df: DataFrame, text_col: str = "text", out_col: str = "minhash") -> DataFrame:
    """Adds the signature via a STAGED plan: the shingle-hash array is
    materialized in its own projection so the 8 permutation mins share
    one evaluation (CollapseProject keeps the boundary because the
    array is non-cheap and multiply-referenced).  Single-expression
    inlining re-evaluates it 8× — measured 32 s vs 4 s at sf0.1."""
    return (
        df.withColumn("_mh_hs", shingle_hashes_col(F.col(text_col)))
        .withColumn(out_col, minhash_from_hashes(F.col("_mh_hs")))
        .drop("_mh_hs")
    )


def lsh_buckets(sig: Column, band_size: int = LSH_BAND_SIZE, perms: int = MINHASH_PERMS) -> Column:
    """Band the signature: bucket_b = md5(b '|' sig[b*w] '|' ... )."""
    buckets = []
    for b in range(perms // band_size):
        parts = [F.lit(str(b))] + [
            F.element_at(sig, b * band_size + i + 1).cast("string")
            for i in range(band_size)
        ]
        buckets.append(F.md5(F.concat_ws("|", *parts).cast("binary")))
    return F.array(*buckets)


def prepare_dedup_corpus(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sh, minhash) — the shingle set and signature computed ONCE
    and persisted, so the LSH self-join and the Jaccard verification
    join read a materialized narrow projection instead of re-running
    tokenize+shingle+hash per plan branch (2-4× on the full pipeline).
    At cluster scale this is a checkpointed/bucketed intermediate
    table; in-memory persist is the local twin."""
    prep = (
        df.select(F.col(id_col), shingles_col(F.col(text_col)).alias("sh"))
        .withColumn("_mh_hs", F.transform(F.col("sh"), _h32))
        .withColumn("minhash", minhash_from_hashes(F.col("_mh_hs")))
        # distinct 32-bit shingle hashes: Jaccard verification intersects
        # these instead of the string shingles (int set-intersection is
        # several-fold cheaper than string; measured 5.7 s → see
        # jaccard_pairs).  Both engines intersect the SAME hash lists, so
        # parity is preserved by construction even under hash collisions.
        .withColumn("hs", F.array_distinct("_mh_hs"))
        .drop("_mh_hs")
    )
    return _persist_scoped(prep)


#: the most recent persisted prep — unpersisted when the next one is
#: created, so repeated query invocations in one long-lived session
#: (e.g. the bench loop) hold at most ONE cached corpus, not an
#: unbounded accumulation.  Callers needing explicit lifetime control
#: can .unpersist() the returned DataFrame themselves.
_LAST_PREP: list = []


def _persist_scoped(df: DataFrame) -> DataFrame:
    while _LAST_PREP:
        try:
            _LAST_PREP.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    out = df.persist()
    _LAST_PREP.append(out)
    return out


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prepared: DataFrame | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH bucket.

    Plan shape: project signature → explode buckets → self-equi-join on
    bucket (one shuffle each side) → distinct.  The join key is the
    bucket hash, so co-occurrence — not document count — bounds the
    output; degenerate mega-buckets should be capped upstream by raising
    perms/band_size."""
    sig = (
        prepared
        if prepared is not None
        else with_minhash(df.select(id_col, text_col), text_col)
    )
    exploded = sig.select(
        F.col(id_col), F.explode(lsh_buckets(F.col("minhash"))).alias("bucket")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, "bucket")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
    prepared: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard over candidate pairs, computed on the distinct
    32-bit shingle-HASH sets rather than the string shingles — integer
    set-intersection is several-fold cheaper and ships ~4× fewer bytes
    through the pair join (measured 5.7 s → 1.9 s for 176k candidates at
    sf0.1).  The DuckDB oracle intersects the identical hash lists, so
    results stay bit-for-bit comparable even if two shingles ever
    collide.  Broadcast-joined docs when the doc side is small; at
    scale, sort-merge on id."""
    docs = (
        prepared.select(id_col, "hs")
        if prepared is not None
        else df.select(
            F.col(id_col),
            F.array_distinct(
                F.transform(shingles_col(F.col(text_col)), _h32)
            ).alias("hs"),
        )
    )
    j = (
        pairs.join(docs.withColumnsRenamed({id_col: "id_a", "hs": "hs_a"}), "id_a")
        .join(docs.withColumnsRenamed({id_col: "id_b", "hs": "hs_b"}), "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("hs_a") + F.size("hs_b") - F.col("inter")),
                4,
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return j.where(F.col("jaccard") >= threshold) if threshold else j


def connected_components(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 20,
) -> DataFrame:
    """Near-dup cluster resolution: label every vertex with the MIN id
    reachable through the pair graph (cluster_id), plus
    ``is_canonical`` — the keep-one-per-cluster decision of a dedup
    pipeline.  Isolated docs form singleton clusters.

    Algorithm: iterative min-label propagation —
    ``label_v ← min(label_v, min over neighbors u of label_u)`` until a
    fixpoint; iterations = graph diameter (near-dup components are
    shallow: a handful of hops).  Each round is one equi-join + one
    map-side-combinable min aggregation; labels are persisted per round
    and the previous round unpersisted, so the plan stays constant-size
    (no lineage blow-up).

    Convergence is detected inside the round's ONE action: the step join
    emits a ``chg`` flag (new label strictly smaller than old), and
    ``count_if(chg)`` both materializes the round's persisted labels and
    returns the changed count — no separate old-vs-new join and no
    second action.  (A SparkContext accumulator would be the textbook
    alternative, but in PySpark an accumulator can only be bumped from
    Python-side task code — a row-at-a-time foreach/UDF in the hot
    path — whereas the flag aggregate is JVM map-side-combined and
    costs one boolean column.)

    Deterministic: min() is order-insensitive, so the fixpoint is unique
    regardless of execution order — the DuckDB recursive-CTE oracle
    reaches the identical labeling.
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).persist()
    labels.count()
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh, labels["id"] == neigh["dst"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
                (F.coalesce("nmin", "label") < F.col("label")).alias("chg"),
            )
            .persist()
        )
        # single action: materializes the persisted round AND returns
        # the convergence signal
        changed = new_labels.agg(F.count_if("chg")).first()[0]
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iters} iters")
    return labels.select(
        F.col("id").alias(id_col),
        F.col("label").alias("cluster_id"),
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash: bit b = sign of Σ_tokens (bit_b(md5(token)) ? 1 : -1).

    Uses the first 16 bits of each token md5 via base-16 conv — all JVM.
    """
    toks = tokens_col(text)
    h16 = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 4), 16, 10).cast("int")
    )
    bits = []
    for b in range(16):
        votes = F.aggregate(
            h16,
            F.lit(0),
            lambda acc, v: acc
            + F.when(F.shiftright(v, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bits.append(F.when(votes > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out.cast("int")


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-duplicate pairs: hamming(sketch_a, sketch_b) ≤
    ``max_hamming``, candidates via the banded-half equi-join.

    Pigeonhole makes this EXACT (recall 1.0), not probabilistic: two
    16-bit sketches differing in ≤ d bits must agree exactly on at least
    one of ``n_bands`` 4-bit bands whenever ``d < n_bands`` — so the
    (band, band_value) equi-join loses nothing for d ≤ 3 at 4 bands.
    Candidates carry ids only through the join + dedup (the
    cosine_near_dup lesson); sketches are equi-joined back for the
    ``bit_count(xor)`` verification.  One narrow sketch map, one bucket
    shuffle, no all-pairs anywhere.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"banded hamming join is exact only for max_hamming < n_bands "
            f"(got {max_hamming} ≥ {n_bands})"
        )
    width = 16 // n_bands
    mask = (1 << width) - 1
    s = df.select(F.col(id_col).alias("id"), simhash16(F.col(text_col)).alias("sh"))
    bands = s.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sh", width * b).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bv"),
    )
    cand = (
        bands.select(F.col("id").alias("id_a"), "band", "bv")
        .join(bands.select(F.col("id").alias("id_b"), "band", "bv"), ["band", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sk = s
    pairs = cand.join(
        sk.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a"
    ).join(sk.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
