"""Scan-based HTML tokenizer, behavior-identical to the reference lexer.

Architecture: instead of the reference's per-character async state functions
(lexer.js:504-511 trampoline — its main cost), this tokenizer runs on a
Python ``str`` whose chars map 1:1 onto the reference's code units, and
*jumps* between syntactically interesting positions with C-speed
``str.find``/compiled-regex scans. The Python-level loop runs once per
token, not once per character — that is what makes the Arrow-batched Spark
UDF of it fast (the per-char work all happens inside CPython's C string
machinery).

State/transition semantics are a faithful re-derivation of the reference
contract (see SURVEY.md §2 Part A; every quirk is covered by an executed
golden in tests/goldens/):

* text state dispatch (lexer.js:548-694): ``<``+[A-Za-z_] opens a tag,
  ``</``+[A-Za-z_] closes, ``<!-``+``-`` starts a comment, ``<!DOCTYPE`` +
  whitespace (exact case) starts a doctype; buffered text is flushed before
  each transition and at EOF;
* tag names (lexer.js:702-750), attribute names (lexer.js:932-980), quoted
  values with backslash escapes (lexer.js:989-1053), unquoted values
  (lexer.js:1061-1109), boolean attributes (lexer.js:913-921);
* self-closing/void handling: ``/`` must be *immediately* before ``>``
  (lexer.js:795-809), ``/`` elsewhere between attributes is skipped;
* rawtext elements script/style/textarea/title entered on the as-lexed
  (case-sensitive) name, with quote-aware closing-tag suppression
  (lexer.js:1283-1383);
* comments close on ``-->`` with at least 2 buffered chars, value trimmed
  (lexer.js:1217-1271); doctype value reads to ``>`` and is trimmed, token
  reported at the ``<`` (lexer.js:662-687, 1394-1425);
* closing tags skip everything to ``>`` (lexer.js:1117-1206).

Tokens are ``(type, value, line, col)`` tuples. Line/column accounting
matches the reference exactly: code points 10-13 each start a new line and
are themselves reported at column 1 of the new line (lexer.js:397-413).
"""

from __future__ import annotations

import re
from bisect import bisect_left

from tempeh_spark.chardecode import combine_surrogates
from tempeh_spark.charclass import RAWTEXT_TAGS, VOID_TAGS, js_trim

# Token types (same numbering as reference lexer.js:36-49; VOID_TAG_END=6 is
# declared there but never emitted, so it does not exist here).
EOF = 0
ERROR = 1
TEXT = 2
OPEN_NAME = 3
CLOSE_NAME = 4
OPEN_END = 5
SELF_CLOSE_END = 7
ATTR_NAME = 8
ATTR_VALUE = 9
COMMENT = 10
DOCTYPE = 11

# --- compiled character classes (reference lexerUtils.js) ---

WS_CHARS = " \t\n\x0b\x0c\r"  # lexerUtils.js:32-33
_WS_SET = frozenset(WS_CHARS)
_BRK_RX = re.compile("[\n\x0b\x0c\r]")  # lexerUtils.js:25 (codes 10-13)

# PCEN ranges (lexerUtils.js:67-92) + letters + digits 1-9 (0 excluded!) +
# "- . : _" — lexerUtils.js:44-51, 61-120. Built programmatically from the
# same range table the boolean LUTs use.
from tempeh_spark.charclass import _PCEN_RANGES  # noqa: E402

_PCEN_CLASS = "".join(f"{chr(lo)}-{chr(hi)}" for lo, hi in _PCEN_RANGES)
_TAGNAME_CLASS = "A-Za-z1-9\\-.:_" + _PCEN_CLASS
_TAGNAME_END_RX = re.compile(f"[^{_TAGNAME_CLASS}]")
_NOT_TAGNAME_RX = _TAGNAME_END_RX  # alias: match == char is NOT a name char

# One C-level match per attribute: name, optionally '=' + (escape-aware
# quoted | unquoted) value. The quoted alternations implement the backslash
# rule exactly (an escaped quote cannot close); DOTALL so '\\.' crosses
# newlines. An unterminated quoted value matches nothing after '=' — the
# caller detects that case and consumes to EOF like the reference.
_ATTR_FULL_RX = re.compile(
    f"([^=>/'\"{WS_CHARS}]+)"
    f"(?:=("
    f"'(?:[^'\\\\]|\\\\.)*'"
    f"|\"(?:[^\"\\\\]|\\\\.)*\""
    f"|[^'\"<>{WS_CHARS}]+"
    f"))?",
    re.S,
)

_NONWS_RX = re.compile(f"[^{WS_CHARS}]")

# rawtext "interesting" chars: quotes (+ backtick for script), backslash, '<'
_RAW_INT_RX = {
    "script": re.compile(r"['\"`\\<]"),  # lexerUtils.js:131-134
    "style": re.compile(r"['\"\\<]"),  # lexerUtils.js:140-141
    "other": re.compile("<"),  # textarea/title: no quote rules
}


def _is_leading_tag_char(ch: str) -> bool:
    # letter or underscore (lexerUtils.js:41-42)
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z") or ch == "_"


class InvalidCodePointError(Exception):
    """A unit > 0x10FFFF reached a token value: the reference's
    String.fromCodePoint throws RangeError('Invalid code point N') there,
    aborting the whole parse (lexer.js:590 et al. + stream abort)."""

    def __init__(self, unit: int):
        super().__init__(f"Invalid code point {unit}")
        self.unit = unit


class _Doc:
    """Per-document scan state shared by the sub-lexers."""

    __slots__ = (
        "s", "n", "breaks", "eof_l", "eof_c", "surr", "oversized", "_ov_keys", "_bi"
    )

    def __init__(self, s: str, has_surrogates: bool, oversized: dict[int, int] | None = None):
        self.s = s
        self.n = len(s)
        self.surr = has_surrogates
        self.oversized = oversized
        self._ov_keys = sorted(oversized) if oversized else None
        self.breaks = [m.start() for m in _BRK_RX.finditer(s)]
        self._bi = 0  # advancing cursor: == bisect_left(breaks, last queried i)
        nb = len(self.breaks)
        self.eof_l = nb + 1
        if self.n == 0:
            self.eof_c = 0
        elif nb:
            self.eof_c = self.n - 1 - self.breaks[-1]
        else:
            self.eof_c = self.n

    def pos(self, i: int) -> tuple[int, int]:
        if i >= self.n:
            return self.eof_l, self.eof_c
        # token positions are queried in near-monotonic order (small
        # pushback only), so an advancing cursor replaces a bisect per
        # call: amortized O(1), identical value (nb == bisect_left). A
        # pathological far jump (>32 breaks either way) falls back to one
        # bisect_left so the worst case stays O(log n) per call, not O(n).
        breaks = self.breaks
        nb = self._bi
        total = len(breaks)
        budget = 32
        while nb < total and breaks[nb] < i:
            nb += 1
            budget -= 1
            if not budget:
                nb = bisect_left(breaks, i)
                break
        else:
            while nb > 0 and breaks[nb - 1] >= i:
                nb -= 1
                budget -= 1
                if not budget:
                    nb = bisect_left(breaks, i)
                    break
        self._bi = nb
        if self.s[i] in "\n\x0b\x0c\r":
            # a line-break char reports at column 1 of the line it starts
            return nb + 2, 1
        last = breaks[nb - 1] if nb else -1
        return nb + 1, i - last

    def val(self, a: int, b: int) -> str:
        if self._ov_keys is not None:
            i = bisect_left(self._ov_keys, a)
            if i < len(self._ov_keys) and self._ov_keys[i] < b:
                raise InvalidCodePointError(self.oversized[self._ov_keys[i]])
        v = self.s[a:b]
        if self.surr:
            return combine_surrogates(v)
        return v


def _bs_parity(s: str, j: int, floor: int) -> bool:
    """True if the char at j is escaped: odd run of backslashes ending at j-1.

    The run cannot extend past ``floor`` (the opening delimiter's position)."""
    k = j - 1
    cnt = 0
    while k > floor and s[k] == "\\":
        cnt += 1
        k -= 1
    return (cnt & 1) == 1


def tokenize(
    text: str,
    ignore_self_closing: bool = False,
    has_surrogates: bool = False,
    oversized: dict[int, int] | None = None,
    terminal_error: str | None = None,
) -> list:
    """Tokenize a per-unit document string. Returns [(type, value, l, c)].

    ``terminal_error`` set means the byte stream ended with a decode error
    (invalid UTF-8 lead byte): the stream terminator is an ERROR token, not
    EOF — and the text state does NOT flush buffered text for it (the
    EOF-only flush, lexer.js:585-594).

    Raises InvalidCodePointError when a >0x10FFFF unit reaches a token value
    (reference parity; see _Doc.val)."""
    d = _Doc(text, has_surrogates, oversized)
    s = text
    n = d.n
    tokens: list = []
    emit = tokens.append

    def eof() -> None:
        if terminal_error is not None:
            emit((ERROR, terminal_error, d.eof_l, d.eof_c))
        else:
            emit((EOF, None, d.eof_l, d.eof_c))

    i = 0  # we are in "text" state at loop top
    while True:
        # ---- text state: scan for a transition-triggering '<' ----
        ts = i
        j = ts
        transition = 0  # 1=open 2=close 3=comment 4=doctype
        p = -1
        while True:
            j = s.find("<", j)
            if j < 0:
                j = n
                break
            if j + 1 < n and _is_leading_tag_char(s[j + 1]):
                transition, p = 1, j + 1
                break
            if j + 2 < n and s[j + 1] == "/" and _is_leading_tag_char(s[j + 2]):
                transition, p = 2, j + 2
                break
            if s[j + 1 : j + 2] == "!":
                if s[j + 2 : j + 4] == "--":
                    transition, p = 3, j + 4
                    break
                if (
                    j + 9 < n
                    and s[j + 1 : j + 9] == "!DOCTYPE"
                    and s[j + 9] in _WS_SET
                ):
                    transition, p = 4, j + 10
                    break
            j += 1  # this '<' is plain text; keep scanning

        if transition == 0 and terminal_error is not None:
            # decode-error terminator: buffered text is NOT flushed
            eof()
            return tokens
        tl, tc = d.pos(ts)
        emit((TEXT, d.val(ts, j), tl, tc))
        if transition == 0:
            eof()
            return tokens

        if transition == 1:
            i = _lex_open_tag(d, tokens, p, ignore_self_closing)
            if i < 0:
                eof()
                return tokens
        elif transition == 2:
            i = _lex_close_tag(d, tokens, p)
            if i < 0:
                eof()
                return tokens
        elif transition == 3:
            # comment: '-->' closes only with >=2 buffered chars (so the
            # earliest closing '>' is at p+2; '<!-->' does not close)
            g = s.find("-->", p)
            if g < 0:
                eof()
                return tokens
            cl, cc = d.pos(p)
            emit((COMMENT, js_trim(d.val(p, g)), cl, cc))
            i = g + 3
        else:
            # doctype: value to next '>'; token reported at the '<'
            g = s.find(">", p)
            if g < 0:
                eof()
                return tokens
            dl, dc = d.pos(j)
            emit((DOCTYPE, js_trim(d.val(p, g)), dl, dc))
            i = g + 1


def _lex_open_tag(d: _Doc, tokens: list, k: int, ignore_self_closing: bool) -> int:
    """Opening tag starting at first name char k. Returns resume position for
    the text state, or -1 for EOF."""
    s = d.s
    n = d.n
    emit = tokens.append

    m_end = _TAGNAME_END_RX.search(s, k)
    if m_end is None:
        # EOF while reading the name: no OPENING_TAGNAME is emitted
        # (reference readOpeningTagName returns the terminator instead).
        return -1
    m = m_end.start()
    name = d.val(k, m)
    nl, nc = d.pos(k)
    emit((OPEN_NAME, name, nl, nc))
    is_void = name in VOID_TAGS

    p = m
    prev_slash = False  # was the previously pulled char '/'
    while True:
        if p >= n:
            return -1
        ch = s[p]
        if ch in _WS_SET:
            mm = _NONWS_RX.search(s, p)
            if mm is None:
                return -1
            p = mm.start()
            prev_slash = False  # last pulled char was whitespace
            continue
        if ch == ">":
            gl, gc = d.pos(p)
            if is_void or (not ignore_self_closing and prev_slash):
                emit((SELF_CLOSE_END, None, gl, gc))
                return p + 1
            emit((OPEN_END, None, gl, gc))
            if name in RAWTEXT_TAGS:
                return _lex_rawtext(d, tokens, p + 1, name)
            return p + 1
        if ch in "=/'\"":
            # illegal attr-name chars that aren't '>' are skipped
            prev_slash = ch == "/"
            p += 1
            continue
        # start of an attribute name
        q = _lex_attribute(d, tokens, p)
        if q < 0:
            return -1
        prev_slash = False  # reference sets prev to the attr's first char
        p = q


def _lex_attribute(d: _Doc, tokens: list, p: int) -> int:
    """Attribute starting at name char p. Emits name (+value). Returns the
    position the opening-tag loop resumes at, or -1 for EOF."""
    s = d.s
    n = d.n
    emit = tokens.append

    m = _ATTR_FULL_RX.match(s, p)
    q = m.end(1)
    has_value = m.lastindex == 2
    if m.end() == n and not has_value:
        # name chars run to EOF: the terminator is returned instead of an
        # ATTRIBUTE_NAME token (readOpeningTagAttributeName, lexer.js:947-955)
        return -1
    al, ac = d.pos(p)
    emit((ATTR_NAME, d.val(p, q), al, ac))

    if has_value:
        a, b = m.start(2), m.end(2)
        vch = s[a]
        vl, vc = d.pos(a)
        if vch == "'" or vch == '"':
            emit((ATTR_VALUE, _unescape_quoted(d, a + 1, b - 1), vl, vc))
            return b  # after the closing quote (which never re-triggers)
        if b >= n:
            return -1  # EOF mid-unquoted-value: value token never emitted
        emit((ATTR_VALUE, d.val(a, b), vl, vc))
        return b

    # no value matched: boolean attribute, '=' + non-value char, or an
    # unterminated quoted value (reference consumes it to EOF)
    if s[q] == "=":
        r = q + 1
        if r >= n:
            return -1  # EOF where the value would start
        if s[r] == "'" or s[r] == '"':
            return -1  # unterminated quoted value: swallowed to EOF
    return q  # terminator (or the '=') is re-processed by the tag loop


def _unescape_quoted(d: _Doc, a: int, b: int) -> str:
    """Apply the reference's backslash rule inside quoted attribute values:
    an unescaped ``\\`` is dropped and makes the next char literal
    (lexer.js:1030-1051). ``\\x`` -> ``x``, ``\\\\`` -> ``\\``."""
    v = d.s[a:b]
    if "\\" in v:
        out: list[str] = []
        push = out.append
        escaped = False
        for ch in v:
            if ch == "\\" and not escaped:
                escaped = True
            else:
                push(ch)
                escaped = False
        v = "".join(out)
    if d.surr:
        return combine_surrogates(v)
    return v


def _lex_close_tag(d: _Doc, tokens: list, k: int) -> int:
    """Closing tag: name starts at k; junk up to '>' is discarded
    (lexer.js:1117-1206). Returns resume position or -1 for EOF."""
    s = d.s
    m_end = _TAGNAME_END_RX.search(s, k)
    if m_end is None:
        return -1
    m = m_end.start()
    nl, nc = d.pos(k)
    tokens.append((CLOSE_NAME, d.val(k, m), nl, nc))
    g = s.find(">", m)
    if g < 0:
        return -1
    return g + 1


def _lex_rawtext(d: _Doc, tokens: list, start: int, tag: str) -> int:
    """Raw content of script/style/textarea/title until ``</tag`` followed by
    a non-tag-name char, with quote-aware suppression for script (' " `) and
    style (' ") — lexer.js:1283-1383. Returns resume position or -1 (EOF)."""
    s = d.s
    n = d.n
    closing = "</" + tag
    L = len(closing)
    rx = _RAW_INT_RX.get(tag, _RAW_INT_RX["other"])

    pos = start
    quote: str | None = None
    while True:
        m = rx.search(s, pos)
        if m is None:
            return -1  # EOF: raw content dropped (no text token)
        j = m.start()
        ch = s[j]
        if quote is not None:
            if ch == quote and not _bs_parity(s, j, start - 1):
                quote = None
            pos = j + 1
            continue
        if ch != "<":
            # quote chars open a quote region; a backslash outside quotes is
            # plain content (the escape flag only exists inside quotes,
            # lexer.js:1333-1345)
            if ch != "\\":
                quote = ch
            pos = j + 1
            continue
        # '<' outside quotes: closing pattern needs a non-tag-name char after
        if (
            s.startswith(closing, j)
            and j + L < n
            and _NOT_TAGNAME_RX.match(s, j + L) is not None
        ):
            tl, tc = d.pos(start)
            tokens.append((TEXT, d.val(start, j), tl, tc))
            xl, xc = d.pos(j + L)
            tokens.append((CLOSE_NAME, tag, xl, xc - L))
            g = s.find(">", j + L)
            if g < 0:
                return -1
            return g + 1
        pos = j + 1
