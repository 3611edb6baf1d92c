"""Pure-Python semantics oracle (no Spark).

Defines — as executable documentation — the exact per-turn semantics of
every operator, transposed from the reference's image domain to the
transcript text domain.  The Spark implementations in
``arion_spark.operators`` must match these functions bit-for-bit; tests
enforce it (the analog of the reference's golden-MD5 test,
reference: tests/functional/test.py:1165-1180, made robust because text,
unlike libjpeg decode, is deterministic).

Domain transposition (SURVEY.md §2.3):
  image width×height  →  text length budget
  crop offset          →  substring offset
  9-way gravity        →  head / center / tail positioning
  gaussian pre-filter  →  whitespace collapse
  unsharp sharpen      →  deterministic leading-emphasis (uppercase)
  watermark blend      →  periodic marker-character overlay
  pixel-buffer MD5     →  md5(text) + ordered rolling conversation fold
"""

from __future__ import annotations

import hashlib
import math

#: Resource governor: max output "pixels" (width × max(height,1)).
#: Reference: src/models/resize.hpp:49-54 (ARION_RESIZE_MAX_PIXELS = 1e8).
MAX_PIXELS = 100_000_000

#: Default lossy-encode quality (sink option; invalid values silently keep
#: the default).  Reference: src/models/resize.cpp:65, :444-448.
DEFAULT_QUALITY = 92

#: Gravity aliases → horizontal position {left, center, right}.
#: Reference enumerates 9 gravities with short aliases
#: (src/models/resize.hpp:70-80, src/models/resize.cpp:348-368); in the 1-D
#: text domain the 3×3 grid collapses onto 3 offsets.
GRAVITY_POS = {
    "c": "center", "center": "center",
    "n": "center", "north": "center",
    "s": "center", "south": "center",
    "w": "left", "west": "left",
    "nw": "left", "northwest": "left",
    "sw": "left", "southwest": "left",
    "e": "right", "east": "right",
    "ne": "right", "northeast": "right",
    "se": "right", "southeast": "right",
}

#: Normalization strategies (interpolation analog; the reference's
#: misspelled ``lanczon4`` is preserved for spec fidelity,
#: reference: src/models/resize.cpp:202-216).  Each of the 6 modes maps
#: to a genuinely different boundary-rendering policy — the text-domain
#: analog of the resampling kernel: how content at the crop/pad boundary
#: is treated when the length changes.
#:
#: ===============  =========================  ==========================
#: mode             truncation (per cut side)  padding fill
#: ===============  =========================  ==========================
#: area (default)   hard cut                   spaces        (plain — the
#:                                             reference's INTER_AREA
#:                                             default, resize.cpp:66)
#: nearest          hard cut                   nearest edge char
#:                                             replicated  (NN replicate)
#: linear           outermost char → '.'       spaces
#: linear_exact     outermost char → '.'       '_' (visible-exact pad)
#: cubic            3 outermost chars → '...'  spaces
#: lanczon4         3 outermost chars → '...'  edge char replicated
#:                                             (widest kernel: both)
#: ===============  =========================  ==========================
INTERPOLATIONS = {"nearest", "linear", "cubic", "area", "lanczon4", "linear_exact"}

#: ellipsis dots replacing the outermost chars of each *cut* side
INTERP_TRUNC_DOTS = {
    "area": 0, "nearest": 0, "linear": 1, "linear_exact": 1,
    "cubic": 3, "lanczon4": 3,
}
#: padding policy: "space" | "edge" (replicate nearest edge char) | "_"
INTERP_PAD = {
    "area": "space", "linear": "space", "cubic": "space",
    "nearest": "edge", "lanczon4": "edge", "linear_exact": "_",
}

RESIZE_TYPES = {"width", "height", "square", "fill"}
WATERMARK_TYPES = {"standard", "adaptive"}
FINGERPRINT_TYPES = {"md5"}


def _round_half_up(x: float) -> int:
    """C++ ``round`` for the non-negative offsets used here."""
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# normalize (resize analog)
# ---------------------------------------------------------------------------

def pre_filter_text(text: str) -> str:
    """Anti-alias analog: collapse whitespace runs to single spaces + strip.

    Reference: gaussian pre-filter before downscale, src/models/resize.cpp:685-694.
    """
    return " ".join(text.split())


def _crop_pad(text: str, target: int, pos: str, interp: str = "area") -> str:
    """Extract exactly ``target`` chars positioned by ``pos``; pad on the
    side opposite the gravity when shorter.  ``interp`` selects the
    boundary-rendering policy (see INTERP_TRUNC_DOTS / INTERP_PAD —
    the resampling-kernel analog, reference: src/models/resize.cpp:202-216).

    Offset formula is the 1-D transposition of the reference's 9-way crop
    table (src/models/resize.cpp:561-598): left→0, center→round((n-t)/2),
    right→n-t.
    """
    n = len(text)
    d = INTERP_TRUNC_DOTS[interp]
    pad_mode = INTERP_PAD[interp]
    if n >= target:
        if pos == "left":
            off = 0
        elif pos == "right":
            off = n - target
        else:
            off = _round_half_up((n - target) / 2.0)
        core = text[off : off + target]
        # ellipsis on each side that actually cut content
        left_dots = min(d, target) if off > 0 else 0
        right_dots = min(d, target - left_dots) if (n - target - off) > 0 else 0
        return (
            "." * left_dots
            + core[left_dots : target - right_dots]
            + "." * right_dots
        )
    pad = target - n
    if pad_mode == "edge":
        lc = text[0] if text else " "
        rc = text[-1] if text else " "
    elif pad_mode == "_":
        lc = rc = "_"
    else:
        lc = rc = " "
    if pos == "left":
        return text + rc * pad
    if pos == "right":
        return lc * pad + text
    left = pad // 2
    return lc * left + text + rc * (pad - left)


def normalize_geometry(
    text: str,
    width: int | None,
    height: int | None,
    type_: str,
    gravity: str = "center",
    interp: str = "area",
) -> str:
    """The four resize algorithms transposed to text length budgets.

    * ``width``: head-keep fit to ``width`` chars, capped by ``height``
      when provided (reference: height acts as max, computeSizeWidth,
      src/models/resize.cpp:495-513); pads right when shorter (enlarge
      regime).
    * ``height``: the dual (src/models/resize.cpp:517-534).
    * ``square``: center-extract then fit to exactly ``width`` — the
      ``height`` param is ignored (proved by the reference's own test,
      tests/functional/test.py:988-1017).
    * ``fill``: exactly ``width`` chars positioned by 9-way gravity
      (src/models/resize.cpp:538-606).
    """
    if type_ == "width":
        target = width if height is None else min(width, height)
        return _crop_pad(text, target, "left", interp)
    if type_ == "height":
        target = height if width is None else min(height, width)
        return _crop_pad(text, target, "left", interp)
    if type_ == "square":
        return _crop_pad(text, width, "center", interp)
    if type_ == "fill":
        return _crop_pad(text, width, GRAVITY_POS[gravity.lower()], interp)
    raise ValueError(f"unknown resize type: {type_}")


def sharpen_text(text: str, amount: float, radius: float) -> str:
    """Unsharp-mask analog: uppercase the leading ``round(amount/100·radius)``
    characters.  Validation mirrors the reference: amount ≤ 1000,
    0 < radius < 10 (src/models/resize.cpp:452-464, :700-712).
    """
    if amount <= 0:
        return text
    k = min(len(text), _round_half_up(amount / 100.0 * radius))
    return text[:k].upper() + text[k:]


def watermark_text_op(
    text: str,
    mark: str,
    wm_type: str = "standard",
    amount: float = 0.0,
    min_amount: float = 0.0,
    max_amount: float = 0.0,
) -> str:
    """Watermark analog: overlay ``mark`` characters at a fixed period.

    * ``standard``: constant blend → period T = max(1, round(1/amount)),
      tiled modulo like the reference's repeating overlay
      (src/models/resize.cpp:855-869, :898-908).
    * ``adaptive``: per-row blend from "brightness" = alnum fraction:
      ``blend = (max-min)·log10(1+9·brightness)+min``
      (src/models/resize.cpp:880-896).
    """
    if not mark or not text:
        return text
    if wm_type == "adaptive":
        n_alnum = sum(ch.isalnum() for ch in text)
        brightness = n_alnum / len(text)
        blend = (max_amount - min_amount) * math.log10(1 + 9 * brightness) + min_amount
    else:
        blend = amount
    if blend <= 0:
        return text
    period = max(1, _round_half_up(1.0 / blend))
    out = list(text)
    for p in range(0, len(out), period):
        out[p] = mark[(p // period) % len(mark)]
    return "".join(out)


def normalize_full(
    text: str,
    width: int | None = None,
    height: int | None = None,
    type_: str = "width",
    gravity: str = "center",
    interp: str = "area",
    pre_filter: bool = False,
    sharpen_amount: float = 0.0,
    sharpen_radius: float = 0.0,
    watermark_mark: str | None = None,
    watermark_type: str = "standard",
    watermark_amount: float = 0.0,
    watermark_min: float = 0.0,
    watermark_max: float = 0.0,
) -> str:
    """Full normalize chain in the reference's run order:
    pre-filter → geometry → sharpen → watermark
    (reference run order: src/models/resize.cpp:610-829).
    """
    if pre_filter:
        text = pre_filter_text(text)
    text = normalize_geometry(text, width, height, type_, gravity, interp)
    text = sharpen_text(text, sharpen_amount, sharpen_radius)
    if watermark_mark:
        text = watermark_text_op(
            text, watermark_mark, watermark_type,
            watermark_amount, watermark_min, watermark_max,
        )
    return text


# ---------------------------------------------------------------------------
# read_meta
# ---------------------------------------------------------------------------

def read_meta(text: str, tool: str | None) -> dict:
    """Per-turn metadata extraction (reference: src/models/read_meta.cpp).

    * keywords: comma-split + trim, empties dropped (:172-183)
    * caption: text before the first comma, trimmed (scalar-field analog)
    * release flags: case-insensitive substring search (:200-220)
    """
    low = text.lower()
    keywords = [k.strip() for k in text.split(",")]
    keywords = [k for k in keywords if k]
    return {
        "caption": text.split(",", 1)[0].strip(),
        "keywords": keywords,
        "model_released": "model released (mr)" in low,
        "property_released": "property released (pr)" in low,
        "n_chars": len(text),
        "n_tokens": len(text.split()),
        "has_tool": tool is not None,
    }


# ---------------------------------------------------------------------------
# fingerprint
# ---------------------------------------------------------------------------

def turn_md5(text: str) -> str:
    """MD5 of the canonical (decoded) text — mirrors the reference hashing
    decoded pixels, not file bytes (src/models/fingerprint.cpp:130-150)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def conv_fingerprint(texts_in_turn_order: list[str]) -> str:
    """Rolling conversation fingerprint: ordered fold
    ``fp_i = md5(fp_{i-1} || md5(text_i))``, ``fp_{-1} = ''``.

    The ordered-fold-over-canonical-order semantics is the transposition of
    the reference's EXIF-orientation canonicalization + sequential chain
    (src/arion.cpp:325-405, :777-811) to turn_idx order.
    """
    acc = ""
    for t in texts_in_turn_order:
        acc = hashlib.md5((acc + turn_md5(t)).encode("ascii")).hexdigest()
    return acc
