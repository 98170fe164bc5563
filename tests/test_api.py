"""API-facade tests: reference usage patterns translate 1:1."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

HERE = Path(__file__).resolve().parent
GOLDENS = json.loads((HERE / "goldens" / "goldens.json").read_text())


def test_parse_file_to_array_matches_reference_golden():
    from tempeh_spark import HTMLParser

    parser = HTMLParser()
    nodes = parser.parse_file(HERE / "fixtures" / "simpleComponent.tmph.html").to_array()
    assert nodes == GOLDENS["file:simpleComponent.tmph.html:lower"]["result"]["nodes"]


def test_camelcase_compat():
    from tempeh_spark import HTMLParser

    parser = HTMLParser(tagNameCasing="preserve", ignoreSelfClosingSyntax=True)
    handle = parser.parseString("<Div/>x</Div>")
    nodes = handle.toArray()
    # ignoreSelfClosingSyntax: <Div/> stays open, x is its child
    assert nodes[0]["tagName"] == "Div"
    assert nodes[0]["children"][0]["textContent"] == "x"


def test_iteration_and_error():
    from tempeh_spark import HTMLParser

    handle = HTMLParser().parse_string("<p>a</p><p>b</p>")
    assert [n["tagName"] for n in handle] == ["p", "p"]

    bad = HTMLParser().parse_bytes(b"\x80")
    assert bad.error is not None
    with pytest.raises(ValueError, match="Invalid UTF-8 leading byte"):
        bad.to_array()


def test_parse_dataframe(spark):
    from tempeh_spark import HTMLParser

    df = spark.createDataFrame([("u", b"<p>hi</p>")], "url string, html binary")
    out = HTMLParser().parse_dataframe(df).select("parsed.text").first()
    assert out[0] == "hi"
