"""Golden differential tests: every output byte-identical to the reference.

Goldens were captured by *executing* the reference parser (tools/goldens/)
over the 16 fixture files, ~70 edge-case strings, and binary encoding probes
across the option matrix — 155 cases. Each test asserts my tree equals the
reference tree exactly (which implies byte-identical canonical JSON and
byte-identical extracted text).
"""

from __future__ import annotations

import base64
import json
from pathlib import Path

import pytest

HERE = Path(__file__).resolve().parent
GOLDENS = json.loads((HERE / "goldens" / "goldens.json").read_text())
FIXDIR = HERE / "fixtures"


def _options(case: dict):
    from tempeh_spark.options import ParserOptions

    o = case.get("options") or {"tagNameCasing": "lower", "ignoreSelfClosingSyntax": False}
    return ParserOptions(
        tag_name_casing=o["tagNameCasing"],
        ignore_self_closing_syntax=o["ignoreSelfClosingSyntax"],
    )


def _run(case: dict):
    from tempeh_spark.parser import parse_bytes, parse_string

    opts = _options(case)
    if case["kind"] == "file":
        return parse_bytes((FIXDIR / case["fixture"]).read_bytes(), opts)
    if case["kind"] == "string":
        return parse_string(case["html"], opts)
    return parse_bytes(base64.b64decode(case["bytes_b64"]), opts)


def _golden_text(nodes: list) -> str:
    """Document-order concatenation of textContent — the per-url invariant."""
    parts: list[str] = []
    stack = list(reversed(nodes))
    while stack:
        nd = stack.pop()
        if "textContent" in nd:
            parts.append(nd["textContent"])
        stack.extend(reversed(nd.get("children", [])))
    return "".join(parts)


@pytest.mark.parametrize("case_id", sorted(GOLDENS.keys()))
def test_golden(case_id: str) -> None:
    case = GOLDENS[case_id]
    golden = case["result"]
    mine = _run(case)

    if "error" in golden:
        assert mine.error is not None, f"expected error, got nodes={mine.nodes!r}"
        if golden.get("crash"):
            return  # reference crashed internally; any error row is correct
        # strip the temp-file path the reference embeds in file-source errors
        g_head, _, g_pos = golden["error"].rpartition(" at ")
        m_head, _, m_pos = mine.error.rpartition(" at ")
        assert g_head == m_head
        assert g_pos.split(":")[-2:] == m_pos.split(":")[-2:]
        return

    assert mine.error is None, mine.error
    assert mine.nodes == golden["nodes"]
    # extracted text equals the reference tree's document-order text
    assert mine.text == _golden_text(golden["nodes"])


def test_nodes_json_stable() -> None:
    """Canonical JSON round-trips the golden tree byte-for-byte."""
    case = GOLDENS["file:simpleComponent.tmph.html:lower"]
    mine = _run(case)
    expected = json.dumps(case["result"]["nodes"], ensure_ascii=False, separators=(",", ":"))
    assert mine.nodes_json() == expected
