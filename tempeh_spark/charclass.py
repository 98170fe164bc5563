"""Character-class lookup tables for the tokenizer.

Built once at import; BMP classes are O(1) table lookups, astral code points
(>= 0x10000) are handled by range rules. Classes mirror the reference's
predicates (lexerUtils.js:10-223), including its quirks:

* digits: only ``1``-``9`` are legal tag-name chars — ``0`` is excluded
  (lexerUtils.js:44-51, verified: ``<h0>`` lexes as tag ``h`` + attr ``0``);
* tag names accept ``- . : _`` plus the WHATWG PotentialCustomElementName
  unicode ranges (lexerUtils.js:61-120);
* attribute names accept anything except ``= > /``, whitespace and quotes —
  so ``<`` is a legal attribute-name char (lexerUtils.js:204-211);
* unquoted attribute values end at whitespace, quotes, ``<`` or ``>``
  (lexerUtils.js:217-223);
* line breaks are code points 10-13 — ``\\n \\v \\f \\r`` each advance the
  line counter (lexerUtils.js:25);
* whitespace is space or 9-13 (lexerUtils.js:32-33).
"""

from __future__ import annotations

import numpy as np

BMP = 0x10000

LT = 60  # <
GT = 62  # >
SLASH = 47  # /
BACKSLASH = 92
EQUALS = 61
BANG = 33
HYPHEN = 45
SQUOTE = 39
DQUOTE = 34
BACKTICK = 96

# PotentialCustomElementName char ranges (WHATWG custom-elements spec;
# reference lexerUtils.js:67-92). Pairs are inclusive [lo, hi].
_PCEN_RANGES = [
    (0xC0, 0xD6),
    (0xD8, 0xF6),
    (0xF8, 0x37D),
    (0x37F, 0x1FFF),
    (0x200C, 0x200D),
    (0x203F, 0x2040),
    (0x2070, 0x218F),
    (0x2C00, 0x2FEF),
    (0x3001, 0xD7FF),
    (0xF900, 0xFDCF),
    (0xFDF0, 0xFFFD),
    (0x10000, 0xEFFFF),
]


def _build() -> dict[str, np.ndarray]:
    idx = np.arange(BMP, dtype=np.uint32)
    letter = ((idx >= 97) & (idx <= 122)) | ((idx >= 65) & (idx <= 90))
    ws = (idx == 32) | ((idx >= 9) & (idx <= 13))
    digits19 = (idx >= 49) & (idx <= 57)

    pcen = np.zeros(BMP, dtype=bool)
    for lo, hi in _PCEN_RANGES:
        if lo >= BMP:
            continue
        pcen[lo : min(hi, BMP - 1) + 1] = True

    tagname = (
        letter
        | digits19
        | (idx == HYPHEN)
        | (idx == 46)  # .
        | (idx == 58)  # :
        | (idx == 95)  # _
        | pcen
    )
    leading_tag = letter | (idx == 95)

    quote = (idx == SQUOTE) | (idx == DQUOTE)
    attr_name = ~((idx == EQUALS) | (idx == GT) | (idx == SLASH) | ws | quote)
    unquoted_val = ~(ws | quote | (idx == GT) | (idx == LT))

    return {
        "tagname": tagname,
        "leading_tag": leading_tag,
        "ws": ws,
        "attr_name": attr_name,
        "unquoted_val": unquoted_val,
    }


_LUT = _build()
TAGNAME_BMP = _LUT["tagname"]
LEADING_TAG_BMP = _LUT["leading_tag"]
WS_BMP = _LUT["ws"]
ATTR_NAME_BMP = _LUT["attr_name"]
UNQUOTED_VAL_BMP = _LUT["unquoted_val"]

# Astral (>= 0x10000) membership: PCEN allows up to 0xEFFFF for tag names;
# attr names / unquoted values allow all astral chars (their exclusion sets
# are pure ASCII).
ASTRAL_TAGNAME_MAX = 0xEFFFF

VOID_TAGS = frozenset(
    # reference lexerUtils.js:157-172
    "area base br col embed hr img input link meta param source track wbr".split()
)
RAWTEXT_TAGS = frozenset(
    # reference lexerUtils.js:143-148; matching is on the as-lexed,
    # case-sensitive tag name (lexer.js:819) — <SCRIPT> is NOT rawtext.
    "script style textarea title".split()
)

# JS String.prototype.trim strips WhiteSpace ∪ LineTerminator; this set
# differs from Python str.strip() (JS strips U+FEFF, Python does not; Python
# strips 0x1C-0x1F and U+0085, JS does not).
JS_TRIM_CHARS = (
    "\t\n\x0b\x0c\r \xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000\ufeff"
)


def js_trim(s: str) -> str:
    """Equivalent of JS ``String.prototype.trim`` (used for comment and
    doctype values, reference lexer.js:1262, 1416)."""
    return s.strip(JS_TRIM_CHARS)


def class_lookup(units: np.ndarray) -> dict[str, np.ndarray]:
    """Per-document boolean class arrays for every code unit."""
    small = units < BMP
    clipped = np.where(small, units, 0).astype(np.uint32)
    astral = ~small
    tagname = np.where(small, TAGNAME_BMP[clipped], units <= ASTRAL_TAGNAME_MAX)
    return {
        "tagname": tagname,
        "leading_tag": np.where(small, LEADING_TAG_BMP[clipped], False),
        "ws": np.where(small, WS_BMP[clipped], False),
        "attr_name": np.where(small, ATTR_NAME_BMP[clipped], True) | astral,
        "unquoted_val": np.where(small, UNQUOTED_VAL_BMP[clipped], True) | astral,
    }
