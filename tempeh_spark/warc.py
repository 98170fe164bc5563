"""WARC source connector: the wire format a Common-Crawl-style corpus
actually arrives in.

A crawl delivers multi-record WARC files — each file a concatenation of
``WARC/1.0`` response records (WARC headers, blank line, an HTTP response
block whose body is the page bytes, ``\\r\\n\\r\\n`` trailer). The 10^12-row
Iceberg pages table is produced by READING those files; this module is that
ingestion edge:

* ``parse_warc(df)`` — ``mapInPandas`` over a ``warc: binary`` column
  (one row = one WARC file / file chunk) exploding each blob into its
  records: ``(url, warc_ts, html, n_records always-null-padded, error)``.
  Arrow-batched like the HTML kernel (udf.py); a malformed record becomes
  an error ROW (the remaining records of the blob still parse — per-record
  error channel, never a job abort). Record boundaries come from declared
  ``Content-Length``, never from scanning the payload, so HTML containing
  the literal bytes ``WARC/1.0`` cannot desynchronize the reader.
* ``build_warc(df)`` — the inverse (``applyInPandas`` per file group,
  records ordered by url): test/gate scaffolding and a sink demo. The
  roundtrip gate (``warc_roundtrip``) pins read(build(x)) == x
  value-for-value, the same oracle pattern as pdf_extract.

Scale shape: one WARC file is one input row, so a 1000-executor read is
just the parquet/Iceberg scan of the blob table + one ArrowEvalPython-class
stage — no shuffle; downstream bucketing happens in pipeline.py as usual.
Reference n/a (the reference parses HTML strings only; ingestion framing is
part of the beyond-reference pipeline surface).
"""

from __future__ import annotations

import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("rec_offset", LongType()),
        StructField("error", StringType()),
    ]
)

WARC_FILE_SCHEMA = StructType(
    [
        StructField("file_id", LongType()),
        StructField("warc", BinaryType()),
        StructField("n_records", LongType()),
    ]
)

_CRLF = b"\r\n"


def build_record(url: str, ts: datetime.datetime, html: bytes) -> bytes:
    """One WARC/1.0 response record wrapping an HTTP 200 response.

    Sub-second timestamps use the WARC 1.1 fractional form
    (``...ss.ffffffZ``) so ``read(build(x)) == x`` holds at the parquet/
    Spark microsecond resolution, not just at whole seconds."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if ts.microsecond else "%Y-%m-%dT%H:%M:%SZ"
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"WARC-Date: " + ts.strftime(fmt).encode() + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
    )
    return headers + http + b"\r\n\r\n"


def parse_records(blob: bytes) -> list[tuple]:
    """All records of one WARC blob -> (url, ts, html, offset, error) rows.

    Strict on structure, resilient per record: a record whose headers or
    lengths are broken yields ONE error row and the scan resumes at the
    next ``WARC/1.0`` magic after the break point."""
    out = []
    pos = 0
    n = len(blob)
    while True:
        start = blob.find(b"WARC/1.0\r\n", pos)
        if start < 0:
            break
        hdr_end = blob.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            out.append((None, None, None, start, "truncated WARC header block"))
            break
        headers: dict[str, str] = {}
        ok = True
        for line in blob[start + 10 : hdr_end].split(_CRLF):
            k, sep, v = line.partition(b":")
            if not sep:
                out.append((None, None, None, start, "malformed WARC header line"))
                ok = False
                break
            # WARC 1.1 §5 header values are UTF-8; decode with replacement so
            # a stray byte degrades one header, never the record framing
            # (framing is Content-Length-based, computed on raw bytes above).
            headers[
                k.strip().decode("utf-8", errors="replace").lower()
            ] = v.strip().decode("utf-8", errors="replace")
        if not ok:
            pos = hdr_end + 4
            continue
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            out.append((None, None, None, start, "missing/invalid Content-Length"))
            pos = hdr_end + 4
            continue
        if clen < 0:
            # a negative length would move the scan position BACKWARD and
            # re-discover this record forever (confirmed hang pre-r4)
            out.append((None, None, None, start, "negative Content-Length"))
            pos = hdr_end + 4
            continue
        body = blob[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # skip the \r\n\r\n record trailer
        if len(body) < clen:
            out.append((None, None, None, start, "record body truncated"))
            break
        url = headers.get("warc-target-uri")
        ts = None
        if "warc-date" in headers:
            raw_ts = headers["warc-date"]
            fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in raw_ts else "%Y-%m-%dT%H:%M:%SZ"
            try:
                ts = datetime.datetime.strptime(raw_ts, fmt)
            except ValueError:
                out.append((url, None, None, start, "invalid WARC-Date"))
                continue
        if headers.get("warc-type") != "response":
            continue  # warcinfo/request/metadata records are skipped, not errors
        http_end = body.find(b"\r\n\r\n")
        if http_end < 0:
            out.append((url, ts, None, start, "HTTP block without header terminator"))
            continue
        out.append((url, ts, body[http_end + 4 :], start, None))
    if not out and n:
        out.append((None, None, None, 0, "no WARC/1.0 record found"))
    return out


def parse_warc(df: DataFrame, warc_col: str = "warc") -> DataFrame:
    """Explode WARC file blobs into page rows (see module docstring)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[warc_col]:
                if blob is None:
                    rows.append((None, None, None, 0, "null warc blob"))
                    continue
                rows.extend(parse_records(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "rec_offset", "error"]
            )

    return df.select(F.col(warc_col)).mapInPandas(gen, RECORD_SCHEMA)


def build_warc(
    df: DataFrame,
    file_col: str = "file_id",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """Group pages into multi-record WARC file blobs (records url-ordered
    within a file so the blob bytes are deterministic). Rows with a NULL
    url/ts/html cannot be framed as records and are dropped here — route
    error rows elsewhere before sinking (they used to crash the whole
    applyInPandas task)."""

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=[url_col, ts_col, html_col])
        if pdf.empty:
            return pd.DataFrame({"file_id": [], "warc": [], "n_records": []})
        pdf = pdf.sort_values(url_col, kind="mergesort")
        blob = b"".join(
            build_record(u, t.to_pydatetime() if hasattr(t, "to_pydatetime") else t, bytes(h))
            for u, t, h in zip(pdf[url_col], pdf[ts_col], pdf[html_col])
        )
        return pd.DataFrame(
            {
                "file_id": [int(pdf[file_col].iloc[0])],
                "warc": [blob],
                "n_records": [len(pdf)],
            }
        )

    return df.groupBy(file_col).applyInPandas(assemble, WARC_FILE_SCHEMA)
