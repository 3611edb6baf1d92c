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


def test_named_scalar_fields(spark):
    """readIptc named-scalar surface (reference:
    src/models/read_meta.cpp:146-222) via [key: value] markers."""
    r = _extract(
        spark,
        "hello [copyright: (c) 2024 X] [city: Split] "
        "[province_state: Splitsko-dalmatinska] [country_name: Croatia] "
        "[country_code: HR] [special_instructions: hold for release]",
    )
    assert r.copyright == "(c) 2024 X"
    assert r.city == "Split"
    assert r.province_state == "Splitsko-dalmatinska"
    assert r.country_name == "Croatia"
    assert r.country_code == "HR"
    assert r.special_instructions == "hold for release"
    # absent markers → NULL scalars (absent-IPTC-key behavior)
    r2 = _extract(spark, "no markers at all")
    for f in ("copyright", "city", "province_state", "country_name",
              "country_code", "special_instructions"):
        assert r2[f] is None, f


def test_named_repeatable_fields(spark):
    r = _extract(
        spark,
        "[byline: Ada Lovelace] text [subject: 01005000] "
        "[byline: Grace Hopper] [subject: 15073001]",
    )
    assert list(r.byline) == ["Ada Lovelace", "Grace Hopper"]
    assert list(r.subject) == ["01005000", "15073001"]
    assert list(_extract(spark, "none").byline) == []


def test_write_meta_skip_wins_over_extraction(spark):
    """extract(skip=...) leaves an injected column untouched —
    overrideMeta-before-ops semantics (src/arion.cpp:737-739)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("[city: Split]", None)], "text string, tool string"
    ).withColumn("city", F.lit("OVERRIDDEN"))
    out = read_meta.extract(df, skip=frozenset({"city"})).head()
    assert out.city == "OVERRIDDEN"


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
