"""The full 26-entry metadata field table (S7/O1 breadth).

Transposition of the reference's IPTC field table (reference:
src/arion.cpp:431-484): each entry is ``(arion_name, repeatable)`` in the
reference's declaration order.  ``instructions`` is the documented legacy
alias of ``special_instructions`` (both map to the same IPTC key,
reference: src/arion.cpp:448-450 — the alias appears *after* the primary
name, so when both are supplied the alias wins, mirroring the reference's
last-write-into-IptcData behavior).

Transcript-domain carrier: named fields live as structured
``[key: value]`` markers inside ``text`` (the analog of IPTC fields
embedded in the image file); repeatable fields may appear multiple times.
``read_meta`` surfaces the same named subset the reference's readIptc
surfaces (src/models/read_meta.cpp:146-222); ``write_meta`` can inject or
override ALL fields (src/arion.cpp:409-533).
"""

from __future__ import annotations

#: (name, repeatable) — reference order, src/arion.cpp:431-484.
FIELD_TABLE: tuple[tuple[str, bool], ...] = (
    ("object_name", False),
    ("urgency", False),
    ("subject", True),
    ("category", False),
    ("supplemental_category", True),
    ("keywords", True),
    ("location_name", True),
    ("special_instructions", False),
    ("instructions", False),  # legacy alias, kept per reference (todo-remove note)
    ("date_created", False),
    ("program", False),
    ("program_version", False),
    ("byline", True),
    ("byline_title", True),
    ("city", False),
    ("province_state", False),
    ("country_code", False),
    ("country_name", False),
    ("transmission_reference", False),
    ("headline", False),
    ("credit", False),
    ("source", False),
    ("copyright", False),
    ("contact", True),
    ("caption", False),
    ("writer", True),
)

#: alias → canonical column name
ALIASES = {"instructions": "special_instructions"}

SCALAR_FIELDS: tuple[str, ...] = tuple(
    n for n, rep in FIELD_TABLE if not rep and n not in ALIASES
)
ARRAY_FIELDS: tuple[str, ...] = tuple(n for n, rep in FIELD_TABLE if rep)

#: transcript-domain extension flags (derived booleans the reference's
#: read_meta exposes; writable here for operator-chain tests)
EXTENSION_SCALARS: tuple[str, ...] = ("model_released", "property_released")

WRITABLE_FIELDS: frozenset[str] = frozenset(
    n for n, _ in FIELD_TABLE
) | frozenset(EXTENSION_SCALARS)

#: named fields surfaced by read_meta (reference: src/models/read_meta.cpp:146-222).
#: ``caption``/``keywords`` keep their derived-from-text fallbacks and are
#: handled separately in the operator.
READ_SCALARS: tuple[str, ...] = (
    "copyright",
    "city",
    "province_state",
    "country_name",
    "country_code",
    "special_instructions",
)
READ_ARRAYS: tuple[str, ...] = ("subject", "byline")


def marker_pattern(name: str) -> str:
    r"""Regex extracting ``[name: value]`` markers (group 1 = value)."""
    return r"\[" + name + r":\s*([^\]]*)\]"
