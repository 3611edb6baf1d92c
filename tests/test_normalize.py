"""Normalization grid tests — the transposition of the reference's
12-class gravity × 3-regime resize grid (reference:
tests/functional/test.py:417-841) plus pre-filter/sharpen/watermark,
all checked against the pure-Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arion_spark import oracle
from arion_spark.operators import normalize as op_norm

GRAVITIES = ["center", "n", "s", "e", "w", "ne", "nw", "se", "sw"]
# crop-only / shrink / enlarge regimes: input lengths around target 10
REGIME_TEXTS = {
    "crop": "abcdefghijklmnopqrst",  # 20 chars > 10
    "exact": "abcdefghij",  # == 10
    "enlarge": "abcd",  # 4 < 10
}


def _run_norm(spark, text: str, params: dict) -> str:
    df = spark.createDataFrame([(text,)], "text string")
    return op_norm.apply(df, params).head().normalized_text


@pytest.mark.parametrize("gravity", GRAVITIES)
@pytest.mark.parametrize("regime", list(REGIME_TEXTS))
def test_fill_gravity_grid(spark, gravity, regime):
    text = REGIME_TEXTS[regime]
    params = {"type": "fill", "width": 10, "gravity": gravity}
    want = oracle.normalize_full(text, width=10, type_="fill", gravity=gravity)
    got = _run_norm(spark, text, params)
    assert got == want
    assert len(got) == 10


@pytest.mark.parametrize("regime", list(REGIME_TEXTS))
def test_square_center_crop(spark, regime):
    text = REGIME_TEXTS[regime]
    # height is ignored for square (reference: tests/functional/test.py:988-1017)
    got = _run_norm(spark, text, {"type": "square", "width": 8, "height": 3})
    want = oracle.normalize_full(text, width=8, height=3, type_="square")
    assert got == want
    assert len(got) == 8


def test_width_height_budget_interaction(spark):
    # height acts as max for width-type (reference: computeSizeWidth)
    text = "abcdefghijklmnop"
    got = _run_norm(spark, text, {"type": "width", "width": 12, "height": 6})
    assert got == oracle.normalize_full(text, width=12, height=6, type_="width")
    assert len(got) == 6


def test_height_type_dual(spark):
    text = "abcdefghijklmnop"
    got = _run_norm(spark, text, {"type": "height", "height": 9})
    assert got == oracle.normalize_full(text, height=9, type_="height")
    assert len(got) == 9


def test_pre_filter_collapses_whitespace(spark):
    text = "  a   b\t\tc  d   "
    got = _run_norm(spark, text, {"type": "width", "width": 7, "pre_filter": True})
    assert got == oracle.normalize_full(text, width=7, type_="width", pre_filter=True)
    assert got == "a b c d"


def test_sharpen_uppercases_leading(spark):
    text = "hello world, how are you"
    params = {"type": "width", "width": 24, "sharpen_amount": 200, "sharpen_radius": 3.0}
    got = _run_norm(spark, text, params)
    want = oracle.normalize_full(
        text, width=24, type_="width", sharpen_amount=200, sharpen_radius=3.0
    )
    assert got == want
    assert got.startswith("HELLO")


def test_watermark_standard(spark):
    text = "abcdefghijklmnopqrstuvwxyz"
    params = {
        "type": "width",
        "width": 26,
        "watermark_text": "#*",
        "watermark_amount": 0.25,
    }
    got = _run_norm(spark, text, params)
    want = oracle.normalize_full(
        text, width=26, type_="width",
        watermark_mark="#*", watermark_amount=0.25,
    )
    assert got == want
    assert got[0] == "#" and got[4] == "*"  # period 4, cycling mark


def test_watermark_adaptive(spark):
    text = "abc def!! 123 ??"
    params = {
        "type": "width",
        "width": 16,
        "watermark_text": "@",
        "watermark_type": "adaptive",
        "watermark_min": 0.1,
        "watermark_max": 0.5,
    }
    got = _run_norm(spark, text, params)
    want = oracle.normalize_full(
        text, width=16, type_="width",
        watermark_mark="@", watermark_type="adaptive",
        watermark_min=0.1, watermark_max=0.5,
    )
    assert got == want


def test_unicode_text(spark):
    # mirrors the reference's non-ASCII IPTC TODO (test.py:1073-1074)
    text = "Splitsko-dalmatinska županija"
    got = _run_norm(spark, text, {"type": "fill", "width": 12, "gravity": "e"})
    assert got == oracle.normalize_full(text, width=12, type_="fill", gravity="e")


def test_chain_order_pre_filter_before_geometry(spark):
    text = "  x    y  z   padding padding"
    params = {"type": "fill", "width": 5, "gravity": "w", "pre_filter": True}
    got = _run_norm(spark, text, params)
    assert got == oracle.normalize_full(
        text, width=5, type_="fill", gravity="w", pre_filter=True
    )
    assert got == "x y z"


def test_watermark_non_ascii_batch_matches_oracle(spark):
    """The utf-32 vectorized path (non-ASCII batches / non-ASCII marks)
    must agree with the pure-Python oracle — this was per-row Python
    until round 4."""
    from pyspark.sql import functions as F

    from arion_spark import oracle
    from arion_spark.operators import normalize as op_norm

    texts = [
        "héllo wörld this is mixed",
        "日本語のテキストです 全部マルチバイト",
        "plain ascii text stays on the fast path",
        "ünïcödé 123 αβγδε ΑΒΓ",
        "",
    ]
    for mark, wm_type, amount, mn, mx in [
        ("※", "standard", 0.25, 0.0, 0.0),
        ("#*", "standard", 0.2, 0.0, 0.0),   # ascii mark, mixed batch
        ("★☆", "adaptive", 0.0, 0.1, 0.5),
        ("@", "adaptive", 0.0, 0.2, 0.8),
    ]:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, text string"
        )
        wm = op_norm.watermark_udf(mark, wm_type, amount, mn, mx)
        got = {
            r.i: r.out
            for r in df.select("i", wm(F.col("text")).alias("out")).collect()
        }
        for i, t in enumerate(texts):
            want = oracle.watermark_text_op(t, mark, wm_type, amount, mn, mx)
            assert got[i] == want, (i, t, mark, wm_type)
