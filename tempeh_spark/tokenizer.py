"""Scan-based HTML tokenizer, behavior-identical to the reference lexer.

Architecture: instead of the reference's per-character async state functions
(lexer.js:504-511 trampoline — its main cost), this tokenizer works on the
whole document as a NumPy ``uint32`` code-unit array and *jumps* between
syntactically interesting positions (``<``, ``>``, quotes, backslashes) found
with vectorized scans. The Python-level loop runs once per token, not once
per character, which is what makes an Arrow-batched Spark UDF of it fast.

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

import numpy as np

from tempeh_spark.chardecode import units_to_str
from tempeh_spark.charclass import (
    BACKSLASH,
    BACKTICK,
    DQUOTE,
    GT,
    LT,
    RAWTEXT_TAGS,
    SLASH,
    SQUOTE,
    VOID_TAGS,
    js_trim,
    class_lookup,
)

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

_DOCTYPE_UNITS = np.frombuffer("<!DOCTYPE".encode("utf-32-le"), dtype="<u4").astype(np.uint32)


def _positions(units: np.ndarray, code: int) -> np.ndarray:
    return np.flatnonzero(units == code)


class _Doc:
    """Per-document precomputed scan structures."""

    __slots__ = (
        "units",
        "n",
        "l_arr",
        "c_arr",
        "eof_l",
        "eof_c",
        "cls",
        "lt",
        "gt",
        "_raw_interesting",
        "_pos_cache",
    )

    def __init__(self, units: np.ndarray):
        self.units = units
        n = self.n = int(units.size)
        if n:
            brk = (units >= 10) & (units <= 13)
            cb = np.cumsum(brk, dtype=np.int64)
            self.l_arr = 1 + cb
            idx = np.arange(n, dtype=np.int64)
            last_brk = np.maximum.accumulate(np.where(brk, idx, np.int64(-1)))
            self.c_arr = np.where(brk, np.int64(1), idx - last_brk)
            self.eof_l = int(1 + cb[-1])
            self.eof_c = int(n - 1 - last_brk[-1])
        else:
            self.l_arr = np.empty(0, dtype=np.int64)
            self.c_arr = np.empty(0, dtype=np.int64)
            self.eof_l = 1
            self.eof_c = 0
        self.cls = class_lookup(units) if n else None
        self.lt = _positions(units, LT)
        self.gt = _positions(units, GT)
        self._raw_interesting: dict[str, np.ndarray] = {}
        self._pos_cache: dict[int, np.ndarray] = {}

    def pos(self, i: int) -> tuple[int, int]:
        if i >= self.n:
            return self.eof_l, self.eof_c
        return int(self.l_arr[i]), int(self.c_arr[i])

    def next_lt(self, i: int) -> int:
        j = np.searchsorted(self.lt, i)
        return int(self.lt[j]) if j < self.lt.size else self.n

    def next_gt(self, i: int) -> int:
        j = np.searchsorted(self.gt, i)
        return int(self.gt[j]) if j < self.gt.size else self.n

    def run_end(self, i: int, cls_name: str) -> int:
        """First index >= i where class ``cls_name`` is False (or n)."""
        arr = self.cls[cls_name]
        n = self.n
        j = i
        # short-run fast path: names/values are usually tiny
        limit = min(i + 32, n)
        while j < limit:
            if not arr[j]:
                return j
            j += 1
        # doubling windows keep worst-case linear for long runs
        win = 256
        while j < n:
            end = min(j + win, n)
            chunk = arr[j:end]
            if not chunk.all():
                return j + int(np.argmin(chunk))
            j = end
            win *= 4
        return n

    def positions_of(self, code: int) -> np.ndarray:
        cached = self._pos_cache.get(code)
        if cached is None:
            cached = _positions(self.units, code)
            self._pos_cache[code] = cached
        return cached

    def raw_interesting(self, kind: str) -> np.ndarray:
        """Sorted positions of chars relevant to rawtext scanning."""
        cached = self._raw_interesting.get(kind)
        if cached is not None:
            return cached
        u = self.units
        if kind == "script":
            mask = (u == SQUOTE) | (u == DQUOTE) | (u == BACKTICK) | (u == BACKSLASH) | (u == LT)
        elif kind == "style":
            mask = (u == SQUOTE) | (u == DQUOTE) | (u == BACKSLASH) | (u == LT)
        else:  # textarea/title: no quote rules (lexer.js:1346-1349)
            mask = u == LT
        out = np.flatnonzero(mask)
        self._raw_interesting[kind] = out
        return out


def _trailing_backslash_parity(units: np.ndarray, j: int, floor: int) -> bool:
    """True if the char at j is escaped: odd run of backslashes in (floor, j)."""
    k = j - 1
    cnt = 0
    while k >= floor and int(units[k]) == BACKSLASH:
        cnt += 1
        k -= 1
    return (cnt & 1) == 1


def tokenize(units: np.ndarray, ignore_self_closing: bool = False) -> list:
    """Tokenize a code-unit array. Returns a list of (type, value, l, c)."""
    d = _Doc(units)
    n = d.n
    u = units
    tokens: list = []
    emit = tokens.append

    def vstr(a: int, b: int) -> str:
        return units_to_str(u[a:b])

    def eof() -> None:
        emit((EOF, None, d.eof_l, d.eof_c))

    i = 0  # current scan position; we are in "text" state at loop top
    while True:
        # ---- text state: scan for a transition-triggering '<' ----
        ts = i
        j = ts
        transition = None  # (kind, payload)
        while True:
            j = d.next_lt(j)
            if j >= n:
                break
            c1 = u[j + 1] if j + 1 < n else 0
            if j + 1 < n and d.cls["leading_tag"][j + 1]:
                transition = ("open", j + 1)
                break
            if c1 == SLASH and j + 2 < n and d.cls["leading_tag"][j + 2]:
                transition = ("close", j + 2)
                break
            if c1 == 33:  # '!'
                if j + 3 < n and u[j + 2] == 45 and u[j + 3] == 45:
                    transition = ("comment", j + 4)
                    break
                if (
                    j + 9 < n
                    and bool(np.array_equal(u[j : j + 9], _DOCTYPE_UNITS))
                    and d.cls["ws"][j + 9]
                ):
                    transition = ("doctype", j + 10)
                    break
            j += 1  # this '<' is plain text; keep scanning

        if transition is None:
            # EOF in text state: flush buffered text, then EOF
            tl, tc = d.pos(ts)
            emit((TEXT, vstr(ts, n), tl, tc))
            eof()
            return tokens

        kind, p = transition
        tl, tc = d.pos(ts)
        emit((TEXT, vstr(ts, j), tl, tc))

        if kind == "open":
            i = _lex_open_tag(d, tokens, p, ignore_self_closing)
            if i < 0:
                eof()
                return tokens
        elif kind == "close":
            i = _lex_close_tag(d, tokens, p)
            if i < 0:
                eof()
                return tokens
        elif kind == "comment":
            # scan for '-->': '>' at g with at least 2 buffered chars '--'
            s = p
            g = max(s + 2, s)
            found = -1
            while True:
                g = d.next_gt(g)
                if g >= n:
                    break
                if g - s >= 2 and u[g - 1] == 45 and u[g - 2] == 45:
                    found = g
                    break
                g += 1
            if found < 0:
                eof()
                return tokens
            cl, cc = d.pos(s)
            emit((COMMENT, js_trim(vstr(s, found - 2)), cl, cc))
            i = found + 1
        else:  # doctype
            # declaration value: chars from p to next '>'; token reported at
            # the '<' of '<!DOCTYPE' (lexer.js:677-685)
            s = p
            g = d.next_gt(s)
            if g >= n:
                eof()
                return tokens
            dl, dc = d.pos(j)
            emit((DOCTYPE, js_trim(vstr(s, g)), dl, dc))
            i = g + 1


def _lex_open_tag(d: _Doc, tokens: list, k: int, ignore_self_closing: bool) -> int:
    """Opening tag starting at first name char k. Returns resume position for
    the text state, or -1 for EOF."""
    u = d.units
    n = d.n
    emit = tokens.append

    m = d.run_end(k, "tagname")
    nl, nc = d.pos(k)
    if m >= n:
        # EOF while reading the name: no OPENING_TAGNAME is emitted
        # (reference readOpeningTagName returns the terminator instead).
        return -1
    name = units_to_str(u[k:m])
    emit((OPEN_NAME, name, nl, nc))
    is_void = name in VOID_TAGS

    p = m
    prev = -1  # last pulled code unit (whitespace included)
    while True:
        if p >= n:
            return -1
        ch = int(u[p])
        if not d.cls["ws"][p]:
            if ch == GT:
                gl, gc = d.pos(p)
                if is_void or (not ignore_self_closing and prev == SLASH):
                    emit((SELF_CLOSE_END, None, gl, gc))
                    return p + 1
                emit((OPEN_END, None, gl, gc))
                if name in RAWTEXT_TAGS:
                    return _lex_rawtext(d, tokens, p + 1, name)
                return p + 1
            if d.cls["attr_name"][p]:
                q = _lex_attribute(d, tokens, p)
                if q < 0:
                    return -1
                prev = ch  # reference sets prev to the attr's FIRST char
                p = q
                continue
            # '=', '/', quote chars between attributes: skipped
        prev = ch
        p += 1


def _lex_attribute(d: _Doc, tokens: list, p: int) -> int:
    """Attribute starting at name char p. Emits name (+value). Returns the
    position the opening-tag loop resumes at, or -1 for EOF."""
    u = d.units
    n = d.n
    emit = tokens.append

    q = d.run_end(p, "attr_name")
    al, ac = d.pos(p)
    if q >= n:
        return -1  # EOF mid-name: no token (terminator returned instead)
    emit((ATTR_NAME, units_to_str(u[p:q]), al, ac))

    if int(u[q]) != 61:  # not '=': boolean attribute, unread terminator
        return q

    r = q + 1
    if r >= n:
        return -1  # EOF where the value should start
    vch = int(u[r])
    if vch == SQUOTE or vch == DQUOTE:
        # quoted value: startLine/Col = the opening quote (lexer.js:1022-1027)
        vl, vc = d.pos(r)
        qpos = d.positions_of(vch)
        qi = int(np.searchsorted(qpos, r + 1))
        close = -1
        while qi < qpos.size:
            jj = int(qpos[qi])
            if not _trailing_backslash_parity(u, jj, r):
                close = jj
                break
            qi += 1
        if close < 0:
            return -1  # unterminated quoted value: EOF
        emit((ATTR_VALUE, _unescape_quoted(u, r + 1, close), vl, vc))
        return close  # closing quote is re-pulled by the tag loop and skipped
    if d.cls["unquoted_val"][r]:
        s = d.run_end(r, "unquoted_val")
        vl, vc = d.pos(r)
        if s >= n:
            return -1  # EOF mid-value: value token never emitted
        emit((ATTR_VALUE, units_to_str(u[r:s]), vl, vc))
        return s
    # '>' / whitespace / '<' right after '=': no value, char is re-processed
    return r


def _unescape_quoted(u: np.ndarray, a: int, b: int) -> str:
    """Apply the reference's backslash rule inside quoted attribute values:
    an unescaped ``\\`` is dropped and makes the next char literal
    (lexer.js:1030-1051). ``\\x`` -> ``x``, ``\\\\`` -> ``\\``."""
    seg = u[a:b]
    bs = np.flatnonzero(seg == BACKSLASH)
    if bs.size == 0:
        return units_to_str(seg)
    keep = np.ones(seg.size, dtype=bool)
    escaped = False
    for idx in range(seg.size):
        cu = int(seg[idx])
        if cu == BACKSLASH and not escaped:
            keep[idx] = False
            escaped = True
        else:
            escaped = False
    return units_to_str(seg[keep])


def _lex_close_tag(d: _Doc, tokens: list, k: int) -> int:
    """Closing tag: name starts at k; junk up to '>' is discarded
    (lexer.js:1117-1206). Returns resume position or -1 for EOF."""
    u = d.units
    n = d.n
    m = d.run_end(k, "tagname")
    if m >= n:
        return -1
    nl, nc = d.pos(k)
    tokens.append((CLOSE_NAME, units_to_str(u[k:m]), nl, nc))
    g = d.next_gt(m)
    if g >= n:
        return -1
    return g + 1


def _lex_rawtext(d: _Doc, tokens: list, s: int, tag: str) -> int:
    """Raw content of script/style/textarea/title until ``</tag`` followed by
    a non-tag-name char, with quote-aware suppression for script (' " `) and
    style (' ") — lexer.js:1283-1383. Returns resume position or -1 (EOF)."""
    u = d.units
    n = d.n
    L = 2 + len(tag)  # length of '</' + tag in code units (tag is ASCII here)
    tag_units = np.frombuffer(f"</{tag}".encode("utf-32-le"), dtype="<u4").astype(np.uint32)

    cand = d.raw_interesting(tag if tag in ("script", "style") else "other")
    ci = int(np.searchsorted(cand, s))
    quote = -1  # open quote code unit, or -1

    while ci < cand.size:
        j = int(cand[ci])
        cu = int(u[j])
        if quote >= 0:
            if cu == quote and not _trailing_backslash_parity(u, j, s - 1):
                quote = -1
            ci += 1
            continue
        if cu != LT:
            # quote chars open a quote region; a backslash outside quotes is
            # plain content (the escape flag only exists inside quotes,
            # lexer.js:1333-1345)
            if cu != BACKSLASH:
                quote = cu
            ci += 1
            continue
        # '<' outside quotes: check for the closing pattern at j
        if (
            j + L < n
            and bool(np.array_equal(u[j : j + L], tag_units))
            and not d.cls["tagname"][j + L]
        ):
            tl, tc = d.pos(s)
            tokens.append((TEXT, units_to_str(u[s:j]), tl, tc))
            xl, xc = d.pos(j + L)
            tokens.append((CLOSE_NAME, tag, xl, xc - L))
            g = d.next_gt(j + L)
            if g >= n:
                return -1
            return g + 1
        ci += 1
    return -1  # EOF: raw content dropped (no text token)
