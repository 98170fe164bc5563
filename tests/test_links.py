"""Outlink/anchor extraction (links.py): tree walk, hostile inputs."""

from __future__ import annotations

from tempeh_spark.links import walk_links
from tempeh_spark.options import ParserOptions
from tempeh_spark.parser import parse_bytes


def links_of(html: bytes):
    res = parse_bytes(html)
    assert res.error is None, res.error
    return walk_links(res.nodes or [])


def test_doc_order_and_nested_anchor_text():
    out = links_of(
        b'<div><a href="/1">one <b>bold <i>deep</i></b></a>'
        b'<p><a href="/2">two</a></p></div>'
    )
    assert [(i, h, a) for i, h, a, _, _ in out] == [
        (0, "/1", "one bold deep"),
        (1, "/2", "two"),
    ]


def test_href_less_anchor_skipped_boolean_href_empty():
    out = links_of(b'<a name=x>target</a><a href>bare</a><a href="">quoted-empty</a>')
    assert [(h, a) for _, h, a, _, _ in out] == [("", "bare"), ("", "quoted-empty")]


def test_unquoted_and_case_insensitive_attr_name():
    out = links_of(b"<a HREF=/u/5>u</a>")
    assert out[0][1] == "/u/5" and out[0][2] == "u"


def test_upper_casing_option_still_finds_links():
    res = parse_bytes(
        b'<a href="/x">t</a>', ParserOptions(tag_name_casing="upper")
    )
    assert res.error is None
    out = walk_links(res.nodes or [])
    assert len(out) == 1 and out[0][1] == "/x"


def test_deep_nesting_iterative():
    # 50k-deep div chain around the link: the walk must not recurse
    html = b"<div>" * 50_000 + b'<a href="/deep">d</a>'
    out = links_of(html)
    assert len(out) == 1 and out[0][1] == "/deep"


def test_extract_links_spark_error_channel(spark):
    from tempeh_spark.links import extract_links

    df = spark.createDataFrame(
        [
            (1, bytearray(b'<p><a href="/ok">ok</a></p>')),
            (2, None),
            (3, bytearray(b"<div>\x80bad")),
        ],
        "doc_id long, html binary",
    )
    rows = sorted(extract_links(df).collect(), key=lambda r: r.doc_id)
    assert rows[0].href == "/ok" and rows[0].error is None
    assert rows[1].error == "null html" and rows[1].href is None
    assert "Invalid UTF-8" in rows[2].error


def test_lone_surrogate_in_links_is_sanitized_not_fatal(spark):
    """A malformed UTF-16 doc with an unpaired surrogate in anchor text /
    href must produce sanitized rows, never an Arrow UnicodeEncodeError
    that aborts the whole batch (chardecode documents lone surrogates as
    reachable; udf._sanitize is the established handling)."""
    from tempeh_spark.links import extract_links

    # UTF-16-LE with BOM; 0xD800 is an unpaired high surrogate code unit
    body = '<a href="/x'.encode("utf-16-le") + b"\x00\xd8" + '">t'.encode(
        "utf-16-le"
    ) + b"\x00\xd8" + "</a>".encode("utf-16-le")
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xfe" + body))], "doc_id long, html binary"
    )
    rows = extract_links(df).collect()
    assert len(rows) == 1
    r = rows[0]
    # the row came through; the surrogate was replaced, not propagated
    assert r.error is None and r.href.startswith("/x")
    assert "\ud800" not in (r.href or "") and "\ud800" not in (r.anchor or "")
