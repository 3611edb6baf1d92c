"""Deduplication suite for training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup —
each designed shuffle-minimal for the 100 TB case:

* exact:   one shuffle on the content hash (map-side partial agg).
* minhash: signatures are a narrow map stage (md5-based permutations —
  engine-portable, unlike xxhash); LSH banding turns the quadratic
  candidate problem into a bucket-equi-join (shuffle on bucket id, skew
  bounded by band width).
* jaccard: exact verification ONLY over LSH candidate pairs, never
  all-pairs.
* simhash: narrow map to a 16-bit sketch; near-dup = equal sketch or
  hamming ≤ d by multi-probe over banded halves.
* embedding: cosine over LSH-sign buckets (see similarity.py).

All hashing is md5 (lowercase hex) so the DuckDB oracle can reproduce
signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arion_spark.functions.text import tokens_col

MINHASH_PERMS = 8
LSH_BAND_SIZE = 2  # → MINHASH_PERMS / LSH_BAND_SIZE bands


def shingles_col(text: Column, k: int = 2) -> Column:
    """Distinct word-``k``-shingles of lowercased text (array<string>)."""
    toks = tokens_col(text)
    n = F.size(toks)
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


def minhash_signature(text: Column, perms: int = MINHASH_PERMS) -> Column:
    """MinHash signature: sig_j = min over shingles of md5(j ':' shingle).

    md5-as-permutation keeps it engine-portable; at scale, swap the
    constant ``perms`` up — still one narrow projection."""
    sh = shingles_col(text)
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s).cast("binary")))
            )
            for j in range(perms)
        ]
    )


def with_minhash(df: DataFrame, text_col: str = "text", out_col: str = "minhash") -> DataFrame:
    return df.withColumn(out_col, minhash_signature(F.col(text_col)))


def lsh_buckets(sig: Column, band_size: int = LSH_BAND_SIZE, perms: int = MINHASH_PERMS) -> Column:
    """Band the signature: bucket_b = md5(b '|' sig[b*w] .. sig[b*w+w-1])."""
    buckets = []
    for b in range(perms // band_size):
        parts = [F.lit(f"{b}|")] + [
            F.element_at(sig, b * band_size + i + 1) for i in range(band_size)
        ]
        buckets.append(F.md5(F.concat(*parts).cast("binary")))
    return F.array(*buckets)


def lsh_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH bucket.

    Plan shape: project signature → explode buckets → self-equi-join on
    bucket (one shuffle each side) → distinct.  The join key is the
    bucket hash, so co-occurrence — not document count — bounds the
    output; degenerate mega-buckets should be capped upstream by raising
    perms/band_size."""
    sig = with_minhash(df.select(id_col, text_col), text_col)
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
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (broadcast-joined docs
    when the doc side is small; at scale, sort-merge on id)."""
    docs = df.select(
        F.col(id_col), shingles_col(F.col(text_col)).alias("sh")
    )
    j = (
        pairs.join(docs.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(docs.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                4,
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return j.where(F.col("jaccard") >= threshold) if threshold else j


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
