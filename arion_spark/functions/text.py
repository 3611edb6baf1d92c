"""Text analysis for training-data pipelines: tokenization, quality
scoring, language-ID heuristic, document fingerprinting.

All pure JVM column expressions — at 100 TB these are map-only stages
fused into the parquet scan (verify: ``.explain`` shows one
WholeStageCodegen over the FileScan with ReadSchema pruned to the used
columns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "que", "de"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "les", "des", "est"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of lowercased text; empty → []."""
    t = F.lower(F.trim(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword count: word-piece regex split (letters runs, digit
    runs, single punctuation — the classic pre-tokenizer shape)."""
    pieces = F.regexp_extract_all(
        F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
    )
    return F.size(pieces).cast("int")


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality-scoring features (length / punctuation /
    stopword ratios).  Combine downstream into filters."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return {
        "n_chars": n_chars.cast("int"),
        "n_tokens": n_tok.cast("int"),
        "alpha_ratio": F.round(alpha / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 4),
        "mean_token_len": F.round(
            (F.length(F.regexp_replace(text, r"\s+", ""))) / F.greatest(n_tok, F.lit(1)), 4
        ),
    }


def lang_id_col(text: Column) -> Column:
    """Stopword-marker language heuristic: argmax of per-language marker
    hit counts; ties and zero-hit rows → 'unk'.  Deterministic and
    SQL-expressible (mirrored in the DuckDB oracle)."""
    toks = tokens_col(text)
    scores = [
        (lang, F.size(F.filter(toks, lambda x: x.isin(*marks))))
        for lang, marks in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("unk")
    # first language (in sorted order) achieving the max, if max > 0
    for lang, s in reversed(scores):
        pred = F.when(s == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("unk"))


def rolling_doc_fingerprint(text: Column, window: int = 4) -> Column:
    """Document fingerprint: md5 over the document's word-``window``-gram
    min-sketch (a rolling-hash analog that is order-sensitive yet
    truncation-robust): md5(min over i of md5(gram_i) || length-bucket).

    4-grams are built from four shifted array views zipped pairwise —
    O(n) per row (``zip_with`` pads the shorter side with nulls, which
    ``concat_ws`` skips, reproducing the short-document edge cases of
    the naive ``slice(toks, i, 4)`` form without its O(n²) per-element
    re-tokenization)."""
    assert window == 4, "linear gram construction is specialized to window=4"
    toks = tokens_col(text)
    n = F.size(toks)
    m = F.greatest(n - window + 1, F.lit(1))
    p = [F.slice(toks, i + 1, m) for i in range(window)]
    z12 = F.zip_with(p[0], p[1], lambda x, y: F.concat_ws(" ", x, y))
    z34 = F.zip_with(p[2], p[3], lambda x, y: F.concat_ws(" ", x, y))
    joined = F.zip_with(z12, z34, lambda x, y: F.concat_ws(" ", x, y))
    grams_txt = F.when(n == 0, F.array(F.lit(""))).otherwise(joined)
    grams = F.transform(grams_txt, lambda g: F.md5(g.cast("binary")))
    return F.md5(
        F.concat(F.array_min(grams), (F.floor(n / 16)).cast("string")).cast("binary")
    )
