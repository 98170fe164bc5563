"""PDF text extraction: pure-kernel roundtrips, hostile inputs, the
Spark mapInPandas path, and the gate contract."""

from __future__ import annotations

import pytest

from tempeh_spark.pdfops import (
    build_simple_pdf,
    extract_pdf_text_bytes,
)

ROUNDTRIP_CASES = [
    "hello world",
    "multi\nline\ntext here",
    "escapes: (parens) and \\ backslash \\( mixed",
    "",
    "tabs\tand\rcarriage",
    "unicode: café 中文 \U0001f600",
    "trailing newline\n",
    "\n\nleading blank lines",
    "ET BT Tj T* ' \" sneaky operator keywords inside the text",
    "deep ((((nested)))) parens (unbalanced ( too",
    "x" * 5000 + "\n" + "y" * 5000,
]


@pytest.mark.parametrize("text", ROUNDTRIP_CASES)
def test_pdf_roundtrip(text):
    out, n_streams = extract_pdf_text_bytes(build_simple_pdf(text))
    assert out == text
    assert n_streams == 1


def test_pdf_rejects_non_pdf():
    with pytest.raises(ValueError, match="missing %PDF header"):
        extract_pdf_text_bytes(b"<html>not a pdf</html>")


def test_pdf_uncompressed_stream_hex_and_tj_array():
    raw = (
        b"%PDF-1.4\n1 0 obj << /Length 39 >>\nstream\n"
        b"BT [(ab) -120 (cd)] TJ T* <4142> Tj ET\nendstream\nendobj\n"
    )
    assert extract_pdf_text_bytes(raw) == ("abcd\nAB", 1)


def test_pdf_octal_escape_and_comment():
    raw = (
        b"%PDF-1.4\n1 0 obj << /Length 47 >>\nstream\n"
        b"BT % a comment ) with junk\n(\\101\\102\\103) Tj ET\nendstream\nendobj\n"
    )
    assert extract_pdf_text_bytes(raw)[0] == "ABC"


def test_pdf_truncated_flate_is_skipped_not_fatal():
    good = build_simple_pdf("hello")
    # corrupt the flate bytes: extraction yields no text but must not raise
    broken = good.replace(b"stream\n", b"stream\n\x00\x00", 1)
    text, n = extract_pdf_text_bytes(broken)
    assert text == "" and n == 0


def test_pdf_spark_path_and_error_channel(spark):
    from pyspark.sql import functions as F

    from tempeh_spark.pdfops import build_pdf_column, extract_pdf_text

    docs = spark.createDataFrame(
        [(1, "alpha\nbeta"), (2, ""), (3, "γράμματα (el)")],
        "doc_id long, text string",
    )
    pdfs = build_pdf_column(docs)
    out = {r["doc_id"]: r for r in extract_pdf_text(pdfs).collect()}
    assert out[1]["text"] == "alpha\nbeta" and out[1]["error"] is None
    assert out[2]["text"] == ""
    assert out[3]["text"] == "γράμματα (el)"

    hostile = spark.createDataFrame(
        [(10, None), (11, bytearray(b"not a pdf at all"))],
        "doc_id long, pdf binary",
    )
    rows = {r["doc_id"]: r for r in extract_pdf_text(hostile).collect()}
    assert rows[10]["error"] == "null pdf"
    assert "missing %PDF header" in rows[11]["error"]

    # the plan must be Arrow-batched Python, not row-at-a-time
    plan = extract_pdf_text(pdfs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=600))
    def test_pdf_roundtrip_property(text):
        # lone surrogates can't round-trip through UTF-8; the writer
        # contract is "any str that UTF-8-encodes"
        try:
            text.encode("utf-8")
        except UnicodeEncodeError:
            return
        assert extract_pdf_text_bytes(build_simple_pdf(text))[0] == text

except ImportError:  # pragma: no cover
    pass
