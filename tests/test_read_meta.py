"""read_meta extraction tests (reference metadata assertions:
tests/functional/test.py:1053-1090)."""

from __future__ import annotations

from arion_spark import oracle
from arion_spark.operators import read_meta


def _extract(spark, text, tool=None):
    df = spark.createDataFrame([(text, tool)], "text string, tool string")
    return read_meta.extract(df).head()


def test_keywords_comma_split_and_trim(spark):
    r = _extract(spark, "caption here, alpha,  beta , gamma,,  ")
    assert list(r.keywords) == ["caption here", "alpha", "beta", "gamma"]
    assert r.caption == "caption here"


def test_release_flags_case_insensitive(spark):
    r = _extract(spark, "shot ok, MODEL RELEASED (MR) yes")
    assert r.model_released is True and r.property_released is False
    r2 = _extract(spark, "Property Released (PR)")
    assert r2.property_released is True and r2.model_released is False


def test_token_and_char_counts(spark):
    r = _extract(spark, "  a b   c ")
    assert r.n_tokens == 3 and r.n_chars == 10
    r0 = _extract(spark, "")
    assert r0.n_tokens == 0 and r0.n_chars == 0


def test_tool_extraction(spark):
    assert _extract(spark, "x", "search").has_tool is True
    assert _extract(spark, "x", None).has_tool is False


def test_matches_python_oracle(spark, fixture_rows):
    df = spark.createDataFrame(
        [(r["text"], r["tool"]) for r in fixture_rows], "text string, tool string"
    )
    got = {r.text: r for r in read_meta.extract(df).collect()}
    for r in fixture_rows:
        want = oracle.read_meta(r["text"], r["tool"])
        g = got[r["text"]]
        assert list(g.keywords) == want["keywords"]
        assert g.model_released == want["model_released"]
        assert g.property_released == want["property_released"]
        assert g.n_tokens == want["n_tokens"]
        assert g.caption == want["caption"]
