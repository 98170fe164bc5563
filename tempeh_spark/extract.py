"""Extraction layer: document-order text, DOM-path spans, main content.

``extract_all`` performs ONE iterative pre-order walk over the canonical
node tree and produces every derived output the engine exposes:

* ``text`` — concatenation of every ``textContent`` in document order. This
  is the byte-identical-per-url invariant versus the reference parser (the
  reference's only notion of "extracted text" is the text nodes its tree
  holds; see SURVEY.md §1.3).
* ``spans`` — one record per text node: XPath-style ``dom_path`` (sibling
  indices count same-tag element siblings), start line/column, text.
* ``main_text`` — deterministic boilerplate-stripped main content:
  text under script/style/template/head/noscript/iframe/svg (and comments)
  is dropped, block-level boundaries emit newlines, whitespace inside a
  block is collapsed; blocks whose link density exceeds 0.8 (text dominated
  by <a>) are dropped. Tag-depth/text-density heuristics, not ML — stable
  bytes for a given input, which is what a 10^12-document dedup/training
  pipeline needs.
* ``metrics`` — node/tag/attr/depth counters used for per-partition
  tokenizer-state metrics in the pipeline layer.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Tags whose subtree never contributes to main content.
NON_CONTENT_TAGS = frozenset(
    "script style template noscript iframe svg head title textarea".split()
)

# HTML block-level boundaries (public HTML spec knowledge).
BLOCK_TAGS = frozenset(
    (
        "address article aside blockquote body canvas dd div dl dt fieldset figcaption "
        "figure footer form h1 h2 h3 h4 h5 h6 header hr html li main nav ol p pre "
        "section table tfoot thead tbody tr td th ul video br"
    ).split()
)

MAX_LINK_DENSITY = 0.8
_MAX_PATH_CHARS = 8192


@dataclass
class Extraction:
    text: str
    spans: list  # (dom_path, l, c, text)
    main_text: str
    n_nodes: int
    n_elements: int
    n_text_nodes: int
    n_comments: int
    n_attrs: int
    max_depth: int
    title: str = ""  # first <title> element's text, whitespace-collapsed


# HTML5 "ASCII whitespace" (spec §2.3.1) — deliberately NOT Python
# str.split(): Python's whitespace set includes \x0B plus Unicode spaces
# and varies with the interpreter's Unicode tables, which both breaks
# cross-engine oracle parity (RE2/Java classes don't match it) and makes
# main_text bytes Python-version-dependent. The explicit class matches
# textops.WS, the engine-common class every twinned regex uses.
_WS_CHARS = " \t\n\f\r"
_WS_RUN_RX = re.compile(f"[{_WS_CHARS}]+")


def _collapse_ws(s: str) -> str:
    return _WS_RUN_RX.sub(" ", s).strip(_WS_CHARS)


def extract_all(nodes: list | None) -> Extraction:
    if not nodes:
        return Extraction("", [], "", 0, 0, 0, 0, 0, 0)

    text_parts: list[str] = []
    spans: list = []
    n_nodes = n_elements = n_text = n_comments = n_attrs = 0
    max_depth = 0
    title = ""

    def subtree_text(el: dict) -> str:
        parts: list[str] = []
        st = list(reversed(el.get("children", [])))
        while st:
            x = st.pop()
            if "textContent" in x:
                parts.append(x["textContent"])
            st.extend(reversed(x.get("children", [])))
        return _collapse_ws("".join(parts))

    # main-content block accumulation
    blocks: list[str] = []
    cur_block_parts: list[str] = []
    cur_block_link_parts: list[str] = []

    def flush_block() -> None:
        if not cur_block_parts:
            return
        joined = _collapse_ws("".join(cur_block_parts))
        if joined:
            linked = _collapse_ws("".join(cur_block_link_parts))
            density = (len(linked) / len(joined)) if joined else 0.0
            if density <= MAX_LINK_DENSITY:
                blocks.append(joined)
        cur_block_parts.clear()
        cur_block_link_parts.clear()

    # dom paths as lazily-materialized chains: [parent_chain, segment, cache].
    # A path string is only built when a text node needs it (single join,
    # cached on the text's parent) — never incremental concatenation, which
    # is O(depth^2) copying on a 10^5-deep broken page. Paths beyond
    # _MAX_PATH_CHARS keep only their tail (bounds span output size for
    # pathological nesting; the tail is the useful part).
    def materialize(chain) -> str:
        if chain is None:
            return ""
        if chain[2] is not None:
            return chain[2]
        segs = []
        c = chain
        while c is not None and c[2] is None:
            segs.append(c[1])
            c = c[0]
        base = c[2] if c is not None else ""
        segs.reverse()
        full = f"{base}/{'/'.join(segs)}"
        if len(full) > _MAX_PATH_CHARS:
            full = "…" + full[-_MAX_PATH_CHARS:]
        chain[2] = full
        return full

    # explicit stack of (node, chain, depth, in_noncontent, in_link)
    # processed in document order; sentinel entries handle block flushes on
    # element exit.
    root_counters: dict[str, int] = {}
    items = []
    for nd in nodes:
        chain = None
        if "tagName" in nd:
            t = nd["tagName"]
            root_counters[t] = root_counters.get(t, 0) + 1
            chain = [None, f"{t}[{root_counters[t]}]", None]
        items.append((nd, chain, 1, False, False))
    stack: list = list(reversed(items))
    while stack:
        item = stack.pop()
        if item is None:  # block-exit sentinel
            flush_block()
            continue
        nd, chain, depth, noncontent, in_link = item
        n_nodes += 1
        if depth > max_depth:
            max_depth = depth

        if "tagName" in nd:
            n_elements += 1
            tag = nd["tagName"]
            attrs = nd.get("attributes")
            if attrs:
                n_attrs += len(attrs)
            lower = tag.lower()
            if not title and lower == "title":
                title = subtree_text(nd)  # titles are tiny; direct mini-walk
            child_noncontent = noncontent or lower in NON_CONTENT_TAGS
            child_in_link = in_link or lower == "a"
            is_block = lower in BLOCK_TAGS
            if is_block and not child_noncontent:
                flush_block()
            children = nd.get("children")
            if children:
                if is_block and not child_noncontent:
                    stack.append(None)  # flush on exit
                counters: dict[str, int] = {}
                prepared = []
                for ch in children:
                    ch_chain = chain
                    if "tagName" in ch:
                        t = ch["tagName"]
                        counters[t] = counters.get(t, 0) + 1
                        ch_chain = [chain, f"{t}[{counters[t]}]", None]
                    prepared.append((ch, ch_chain, depth + 1, child_noncontent, child_in_link))
                stack.extend(reversed(prepared))
            elif is_block and not child_noncontent:
                flush_block()
        elif "textContent" in nd:
            n_text += 1
            t = nd["textContent"]
            text_parts.append(t)
            spans.append((materialize(chain) or "/", nd["l"], nd["c"], t))
            if not noncontent:
                cur_block_parts.append(t)
                if in_link:
                    cur_block_link_parts.append(t)
        elif "comment" in nd:
            n_comments += 1
        # doctype: counted in n_nodes only

    flush_block()

    return Extraction(
        text="".join(text_parts),
        spans=spans,
        main_text="\n".join(blocks),
        n_nodes=n_nodes,
        n_elements=n_elements,
        n_text_nodes=n_text,
        n_comments=n_comments,
        n_attrs=n_attrs,
        max_depth=max_depth,
        title=title,
    )

