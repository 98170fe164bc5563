"""WARC connector (warc.py): roundtrip, record framing, hostile inputs."""

from __future__ import annotations

import datetime

from tempeh_spark.warc import build_record, parse_records, parse_warc

TS = datetime.datetime(2024, 1, 1, 0, 0, 0)


def rec(url="http://a/x", ts=TS, html=b"<p>hi</p>"):
    return build_record(url, ts, html)


def test_roundtrip_single_record():
    rows = parse_records(rec(html=b"<div>x</div>"))
    assert len(rows) == 1
    url, ts, html, off, err = rows[0]
    assert err is None and url == "http://a/x" and ts == TS and html == b"<div>x</div>"
    assert off == 0


def test_multi_record_and_offsets():
    blob = rec(url="http://a/1") + rec(url="http://a/2") + rec(url="http://a/3")
    rows = parse_records(blob)
    assert [r[0] for r in rows] == ["http://a/1", "http://a/2", "http://a/3"]
    assert rows[0][3] == 0 and rows[1][3] > 0 and rows[2][3] > rows[1][3]


def test_payload_containing_warc_magic_does_not_desync():
    # Content-Length framing, not payload scanning: html containing the
    # literal record magic must stay inside its record
    evil = b"<pre>WARC/1.0\r\nWARC-Type: response\r\n\r\n</pre>"
    blob = rec(url="http://a/evil", html=evil) + rec(url="http://a/next")
    rows = parse_records(blob)
    assert len(rows) == 2
    assert rows[0][2] == evil and rows[0][4] is None
    assert rows[1][0] == "http://a/next"


def test_non_ascii_url_roundtrips_utf8():
    # WARC 1.1 headers are UTF-8; read(build(x)) must preserve non-ASCII URLs
    url = "http://example.com/café/日本語?q=ü"
    rows = parse_records(rec(url=url))
    assert len(rows) == 1
    assert rows[0][4] is None and rows[0][0] == url


def test_invalid_utf8_header_byte_degrades_value_not_framing():
    # a raw 0xE9 (latin-1 'é') in a header value is not valid UTF-8: the
    # value gets U+FFFD but framing (raw-byte Content-Length) is untouched
    r = rec(url="http://a/x").replace(b"http://a/x", b"http://a/caf\xe9x")
    rows = parse_records(r)
    assert len(rows) == 1 and rows[0][4] is None
    assert rows[0][0] == "http://a/caf�x"
    assert rows[0][2] == b"<p>hi</p>"


def test_truncated_body_is_error_row():
    full = rec(html=b"0123456789")
    rows = parse_records(full[:-16])  # cut into the body
    assert len(rows) == 1 and rows[0][4] == "record body truncated"


def test_missing_content_length_recovers_to_next_record():
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://a/bad\r\n\r\n"
    )
    rows = parse_records(bad + rec(url="http://a/good"))
    assert rows[0][4] == "missing/invalid Content-Length"
    good = [r for r in rows if r[4] is None]
    assert len(good) == 1 and good[0][0] == "http://a/good"


def test_non_response_records_skipped_silently():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    rows = parse_records(info + rec(url="http://a/x"))
    assert len(rows) == 1 and rows[0][0] == "http://a/x"


def test_garbage_blob_is_one_error_row():
    rows = parse_records(b"\x00\xffnot a warc at all")
    assert len(rows) == 1 and rows[0][4] == "no WARC/1.0 record found"


def test_invalid_warc_date_is_error_row():
    r = rec(url="http://a/x").replace(
        b"WARC-Date: 2024-01-01T00:00:00Z", b"WARC-Date: not-a-date-xxxxxxx"
    )
    rows = parse_records(r)
    assert len(rows) == 1 and rows[0][4] == "invalid WARC-Date"


def test_parse_warc_null_blob_and_spark_path(spark):
    from tempeh_spark.warc import build_warc

    pages = spark.createDataFrame(
        [
            (0, "http://a/1", TS, bytearray(b"<p>one</p>")),
            (0, "http://a/2", TS, bytearray(b"<p>two</p>")),
            (1, "http://b/1", TS, bytearray(b"<p>three</p>")),
        ],
        "file_id long, url string, warc_ts timestamp, html binary",
    )
    files = build_warc(pages)
    assert files.count() == 2
    out = parse_warc(files).collect()
    assert sorted(r.url for r in out) == ["http://a/1", "http://a/2", "http://b/1"]
    assert all(r.error is None for r in out)
    nul = spark.createDataFrame([(None,)], "warc binary")
    errs = parse_warc(nul).collect()
    assert len(errs) == 1 and errs[0].error == "null warc blob"


def test_negative_content_length_terminates_with_error_row():
    # a negative length must not move the scan backward (confirmed hang
    # pre-fix); the scan recovers at the next record
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://a/bad\r\nContent-Length: -170\r\n\r\n"
    )
    rows = parse_records(bad + rec(url="http://a/good"))
    assert any(r[4] == "negative Content-Length" for r in rows)
    assert any(r[0] == "http://a/good" and r[4] is None for r in rows)


def test_subsecond_timestamp_roundtrips_warc11_fractional():
    ts = datetime.datetime(2024, 5, 1, 12, 30, 45, 123456)
    rows = parse_records(rec(ts=ts))
    assert rows[0][4] is None and rows[0][1] == ts


def test_build_warc_drops_unframeable_null_rows(spark):
    from tempeh_spark.warc import build_warc

    pages = spark.createDataFrame(
        [
            (0, "http://a/1", TS, bytearray(b"<p>ok</p>")),
            (0, None, TS, bytearray(b"<p>no url</p>")),
            (0, "http://a/3", None, bytearray(b"<p>no ts</p>")),
            (0, "http://a/4", TS, None),
        ],
        "file_id long, url string, warc_ts timestamp, html binary",
    )
    out = parse_warc(build_warc(pages)).collect()
    assert [r.url for r in out] == ["http://a/1"]
    assert out[0].error is None
