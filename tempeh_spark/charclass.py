"""Character classes and tag sets shared by the tokenizer.

Mirrors the reference's predicates (lexerUtils.js:10-223), including its
quirks — digits ``1``-``9`` only (``0`` excluded) in tag names, the WHATWG
PotentialCustomElementName unicode ranges, and the exact JS ``trim`` set.
The tokenizer compiles these into regexes (see tokenizer.py); this module
holds the range tables and tag sets.
"""

from __future__ import annotations

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
