"""Skew handling: salted join/agg equal their plain forms on skewed input.

The measured side (plain vs salted vs AQE wall times on a hot-key table)
lives in tools/bench_skew.py; these tests pin the CORRECTNESS side — a
salted plan must be row-for-row invisible."""

import pytest
from pyspark.sql import functions as F

from arion_spark.operators.skewjoin import salted_join
from arion_spark.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def skewed(spark):
    # hot_fraction_mod=2 → ~half of all rows on the 2 hot conversations
    df = generate_transcripts(spark, 20_000, hot_fraction_mod=2).cache()
    df.count()
    yield df
    df.unpersist()


def test_generator_plants_hot_conversations(skewed):
    top = (
        skewed.groupBy("conv_id").count().orderBy(F.desc("count")).limit(2)
    ).collect()
    n = skewed.count()
    assert all(r["conv_id"].startswith("conv-hot-") for r in top)
    assert sum(r["count"] for r in top) > 0.4 * n


def test_salted_join_equals_plain_join(spark, skewed):
    dim = skewed.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("conv_turns")
    )
    cols = ["conv_id", "turn_idx", "conv_turns"]
    plain = set(
        map(tuple, skewed.join(dim, "conv_id").select(*cols).collect())
    )
    salted = salted_join(skewed, dim, "conv_id", buckets=8).select(*cols)
    assert set(map(tuple, salted.collect())) == plain
    assert len(plain) == skewed.count()


def test_targeted_salted_join_equals_plain_join(spark, skewed):
    """Targeted mode: only hot keys salted/replicated; cold keys keep
    salt 0 — still row-identical to the plain join."""
    dim = skewed.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("conv_turns")
    )
    cols = ["conv_id", "turn_idx", "conv_turns"]
    plain = set(
        map(tuple, skewed.join(dim, "conv_id").select(*cols).collect())
    )
    salted = salted_join(
        skewed, dim, "conv_id", buckets=8,
        hot_keys=["conv-hot-0", "conv-hot-1"],
    ).select(*cols)
    assert set(map(tuple, salted.collect())) == plain


def test_salted_join_spreads_hot_key(spark, skewed):
    """The physical join key includes the salt: the hot conv's rows hash
    to many distinct (key, salt) shuffle buckets."""
    dim = skewed.select("conv_id").distinct()
    j = salted_join(
        skewed.where(F.col("conv_id") == "conv-hot-0"), dim, "conv_id",
        buckets=8,
    )
    # recompute the salt the operator used: every bucket is populated
    n_buckets = (
        j.withColumn("s", F.pmod(F.xxhash64("turn_idx"), F.lit(8)))
        .select("s").distinct().count()
    )
    assert n_buckets == 8


def test_salted_agg_equals_plain_agg(spark, skewed):
    plain = {
        r["conv_id"]: (r["c"], r["s"], r["m"])
        for r in skewed.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.length("text")).alias("s"),
            F.max(F.length("text")).alias("m"),
        )
        .collect()
    }
    partial = (
        skewed.withColumn("_salt", F.pmod(F.xxhash64("turn_idx"), F.lit(8)))
        .groupBy("conv_id", "_salt")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.length("text")).alias("s"),
            F.max(F.length("text")).alias("m"),
        )
    )
    salted = {
        r["conv_id"]: (r["c"], r["s"], r["m"])
        for r in partial.groupBy("conv_id")
        .agg(
            F.sum("c").alias("c"), F.sum("s").alias("s"), F.max("m").alias("m")
        )
        .collect()
    }
    assert salted == plain
