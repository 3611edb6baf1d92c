"""Vectorized utf-32 watermark experiment — MEASURED NEGATIVE RESULT.

This tool carries the full utf-32 variant of the watermark UDF (uint32
codepoint view, one-pass overlay, unique-codepoint isalnum lookup) that
was built for the non-ASCII fallback and REJECTED on 2026-08-18:

    len~80   n=100k  adaptive: u32 11.40s  per-row 1.15s  (0.10x)
    len~80   n=100k  standard: u32  0.81s  per-row 0.55s  (0.68x)
    len~1.2k n=20k   adaptive: u32 29.38s  per-row 2.77s  (0.09x)
    len~1.2k n=20k   standard: u32  1.68s  per-row 1.03s  (0.61x)
    len~6k   n=5k    adaptive: u32 20.59s  per-row 3.73s  (0.18x)
    len~6k   n=5k    standard: u32  0.52s  per-row 1.55s  (2.98x)

CPython str slicing / str.isalnum are already C-speed per row; the u32
path pays utf-32 encode + np.unique + searchsorted over 4-byte
codepoints.  Only standard-type at ~6k chars wins (3x) — too narrow.
The engine keeps the per-row non-ASCII fallback
(operators/normalize.py watermark_udf).

Usage: python tools/bench_watermark_u32.py   # re-measures, prints rows
"""

from __future__ import annotations

import sys
import time

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, ".")
from arion_spark import oracle  # noqa: E402


# -- the rejected u32-vectorized variant, verbatim --------------------------

def watermark_udf_u32(
    mark: str,
    wm_type: str,
    amount: float,
    min_amount: float,
    max_amount: float,
):
    """Arrow-vectorized watermark overlay — the one sub-transform that is
    data-dependent per character position (reference adaptive blend:
    src/models/resize.cpp:880-896) and so runs in a pandas UDF.

    Body is vectorized (bit-for-bit equal to
    ``oracle.watermark_text_op``, enforced by property tests):

    * ``standard`` + all-ASCII batch (the common case): ONE numpy pass —
      the whole Arrow batch is joined, overlay positions for every row
      are computed as one fancy-index assignment over a uint8 view, and
      rows are re-sliced from the decoded result.  Measured 2.4× over
      the previous per-character ``Series.map`` body at period 10
      (utf-32 variants were tried and are *slower* — the 4-byte
      round-trip costs more than it saves; see BASELINE.md).
    * ``adaptive`` + all-ASCII batch: brightness for every row is one
      ``np.cumsum`` over an alnum lookup-table view of the joined
      buffer (for ASCII, ``str.isalnum`` ≡ ``[0-9A-Za-z]``), the blend →
      period map runs once per *unique* brightness via ``math.log10``
      (numpy's log10 can differ from libm by 1 ULP, which could flip
      ``floor(1/blend + 0.5)`` at a period boundary — the per-unique
      loop keeps bit parity with the oracle at negligible cost), and
      rows are rendered through the same single-pass batch renderer
      bucketed by period.
    * non-ASCII batches (or non-ASCII marks): the SAME one-pass overlay
      over a utf-32-le uint32 codepoint view — codepoint indexing equals
      Python string indexing, so semantics match the ASCII path and the
      oracle exactly.  (For ASCII-dominant data the uint8 path stays:
      utf-32's 4-byte round-trip measured slower there — BASELINE.md;
      but for mixed batches the vectorized utf-32 pass replaces what was
      per-row Python, the last per-row loop in the engine.)
    """
    import math

    import numpy as np

    m_len = len(mark)
    try:
        _mark_b: np.ndarray | None = np.frombuffer(
            mark.encode("ascii"), dtype=np.uint8
        )
    except UnicodeEncodeError:
        _mark_b = None
    _mark_u32 = np.frombuffer(mark.encode("utf-32-le"), dtype=np.uint32)

    def _overlay(a, mark_arr, lens, starts, period):
        """Fancy-index mark overlay at positions 0, T, 2T… of every row,
        in one assignment over the concatenated codepoint/byte array."""
        counts = (lens + period - 1) // period
        row_of = np.repeat(np.arange(len(lens)), counts)
        k_in_row = np.arange(int(counts.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        idx = starts[row_of] + k_in_row * period
        a[idx] = mark_arr[k_in_row % len(mark_arr)]

    def _lens_starts(texts):
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        return lens, starts

    def _render_batch_ascii(texts: list[str], buf: bytes, period: int) -> list[str]:
        lens, starts = _lens_starts(texts)
        a = np.frombuffer(buf, dtype=np.uint8).copy()
        _overlay(a, _mark_b, lens, starts, period)
        out = a.tobytes().decode("ascii")
        return [out[s : s + n] for s, n in zip(starts, lens)]

    def _render_batch_u32(texts: list[str], arr, period: int) -> list[str]:
        """utf-32 twin of the ASCII renderer (arr: uint32 codepoints of
        the concatenated texts, modified in place)."""
        lens, starts = _lens_starts(texts)
        _overlay(arr, _mark_u32, lens, starts, period)
        out = arr.tobytes().decode("utf-32-le")
        return [out[s : s + n] for s, n in zip(starts, lens)]

    def _u32_view(texts: list[str]):
        return np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        ).copy()

    # ASCII alnum lookup: for code points < 128, str.isalnum is exactly
    # [0-9A-Za-z] — the uint8 view makes brightness a cumsum difference
    _ALNUM = np.zeros(256, dtype=np.int64)
    for _lo, _hi in ((48, 58), (65, 91), (97, 123)):
        _ALNUM[_lo:_hi] = 1

    def _blend_of(brightness: float) -> float:
        return (max_amount - min_amount) * math.log10(
            1 + 9 * brightness
        ) + min_amount

    def _adaptive_core(texts, a, is_alnum, render_fn) -> list[str]:
        """Shared adaptive pipeline over any codepoint/byte array ``a``:
        cumsum brightness → per-unique-brightness blend → period bucket →
        batch render per period."""
        lens, starts = _lens_starts(texts)
        csum = np.concatenate([[0], np.cumsum(is_alnum)])
        brightness = (csum[starts + lens] - csum[starts]) / lens
        ub, inv = np.unique(brightness, return_inverse=True)
        blend = np.array([_blend_of(b) for b in ub], dtype=np.float64)[inv]
        todo = blend > 0
        out = list(texts)
        if not todo.any():
            return out
        periods = np.ones_like(lens)
        periods[todo] = np.maximum(
            1, np.floor(1.0 / blend[todo] + 0.5)
        ).astype(np.int64)
        for period in np.unique(periods[todo]):
            rows = np.nonzero(todo & (periods == period))[0]
            sub = [texts[i] for i in rows]
            subarr = np.concatenate(
                [a[starts[i] : starts[i] + lens[i]] for i in rows]
            )
            for i, r in zip(rows, render_fn(sub, subarr, int(period))):
                out[i] = r
        return out

    def _render_batch_adaptive_ascii(texts: list[str], buf: bytes) -> list[str]:
        a = np.frombuffer(buf, dtype=np.uint8)
        return _adaptive_core(
            texts,
            a,
            _ALNUM[a],
            lambda sub, arr, p: _render_batch_ascii(sub, arr.tobytes(), p),
        )

    def _render_batch_adaptive_u32(texts: list[str]) -> list[str]:
        a = _u32_view(texts)
        # per-codepoint isalnum via a unique-codepoint lookup — the set of
        # distinct codepoints in a batch is tiny next to the batch itself
        ucp = np.unique(a)
        alnum = np.fromiter(
            (chr(int(c)).isalnum() for c in ucp), dtype=np.int64, count=len(ucp)
        )
        is_alnum = alnum[np.searchsorted(ucp, a)]
        return _adaptive_core(texts, a, is_alnum, _render_batch_u32)

    @F.pandas_udf(T.StringType())
    def _wm(s: pd.Series) -> pd.Series:
        vals = s.tolist()
        texts = [t for t in vals if t]

        def reassemble(rendered_list):
            rendered = iter(rendered_list)
            return pd.Series(
                [next(rendered) if t else t for t in vals], index=s.index
            )

        if wm_type == "adaptive":
            if not texts:
                return s
            if _mark_b is not None:
                big = "".join(texts)
                buf = big.encode("utf-8")
                if len(buf) == len(big):  # all-ASCII batch → uint8 pass
                    return reassemble(_render_batch_adaptive_ascii(texts, buf))
            return reassemble(_render_batch_adaptive_u32(texts))
        if amount <= 0:
            return s
        period = max(1, math.floor(1.0 / amount + 0.5))
        if not texts:
            return s
        if _mark_b is not None:
            big = "".join(texts)
            buf = big.encode("utf-8")
            if len(buf) == len(big):  # all-ASCII batch → single uint8 pass
                return reassemble(_render_batch_ascii(texts, buf, period))
        return reassemble(_render_batch_u32(texts, _u32_view(texts), period))

    return _wm




def main():
    for chars_mult, n in ((1, 100_000), (20, 20_000), (100, 5_000)):
        texts = [
            f"h\u00e9llo w\u00f6rld row {i} "
            + "\u65e5\u672c\u8a9e\u30c6\u30ad\u30b9\u30c8 \u03b1\u03b2\u03b3 test " * (3 * chars_mult)
            for i in range(n)
        ]
        s = pd.Series(texts)
        for wm_type, args in (("adaptive", (0.0, 0.1, 0.5)),
                              ("standard", (0.25, 0.0, 0.0))):
            f = watermark_udf_u32("\u203b", wm_type, *args).func
            t = time.time(); out_new = f(s); dt_new = time.time() - t
            t = time.time()
            out_old = s.map(
                lambda x: oracle.watermark_text_op(x, "\u203b", wm_type, *args)
            )
            dt_old = time.time() - t
            assert list(out_new) == list(out_old)
            print(
                f"len~{20 + 60 * chars_mult} n={n} {wm_type}: "
                f"u32 {dt_new:.2f}s per-row {dt_old:.2f}s "
                f"u32_speedup {dt_old / dt_new:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
