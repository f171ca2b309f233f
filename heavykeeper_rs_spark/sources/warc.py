"""WARC source — Common-Crawl's native archive format as a DataFrame.

The north-star input is "an Iceberg table of Common-Crawl-style web
pages (url, warc_ts, html, text, lang)"; the raw material those tables
are curated FROM is WARC: concatenated WARC/1.0 records, each a block
of CRLF header lines (WARC-Type, WARC-Target-URI, WARC-Date,
Content-Length) + CRLF CRLF + a Content-Length-sized payload + CRLF
CRLF. Common Crawl ships ``.warc.gz`` where every record is its own
gzip member, so a plain multi-member gzip decompress recovers the
stream without any index.

``read_warc`` turns a directory of ``.warc``/``.warc.gz`` files into
(url, warc_ts, html, text) rows:

- file-level parallelism via Spark's ``binaryFile`` source (Common
  Crawl segments are ~1 GB × thousands of files — the natural split;
  cap ``spark.sql.files.maxPartitionBytes`` has no effect on
  binaryFile, so partition count == file count);
- record parsing in ``mapInArrow``: the header scan is bounded
  per-record work, payload slicing is zero-copy off the decompressed
  buffer;
- only ``response`` records yield rows (request/metadata/warcinfo are
  skipped, as a curation job would);
- the HTTP response envelope is stripped: ``html`` is the entity body
  only;
- ``text`` is extracted with the repo's canonical byte-exact
  ``<html><body>…</body></html>`` unwrap when the body matches it
  (the synthetic-corpus invariant), else a whitespace-normalizing tag
  strip (best-effort for wild pages).

``write_warc_file`` is the deterministic fixture producer (per-member
gzip, exactly the Common-Crawl layout).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
    ]
)

_WRAP_PRE = b"<html><body>"
_WRAP_POST = b"</body></html>"


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (Common Crawl's
    one-member-per-record layout) — or pass plain bytes through.

    A truncated/corrupt member (torn final write in a crawler) stops
    the decode there and returns what was recovered: at archive scale
    a damaged tail must cost its own records, never the task."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    out = bytearray()
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        try:
            out.extend(d.decompress(blob[pos:]))
            out.extend(d.flush())
        except zlib.error:
            break
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def _strip_http(payload: bytes) -> bytes:
    """Drop the HTTP response envelope of a WARC response record,
    returning the entity body (Common Crawl stores the full HTTP
    message as the record payload)."""
    if payload[:5] in (b"HTTP/", b"http/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def extract_text(html: bytes) -> str:
    """Byte-exact unwrap for the repo's canonical html wrapper, else a
    best-effort tag strip with whitespace normalization."""
    if html.startswith(_WRAP_PRE) and html.endswith(_WRAP_POST):
        return html[len(_WRAP_PRE) : -len(_WRAP_POST)].decode("utf-8", "replace")
    import re

    s = html.decode("utf-8", "replace")
    s = re.sub(r"(?is)<(script|style)[^>]*>.*?</\1>", " ", s)
    s = re.sub(r"(?s)<[^>]+>", " ", s)
    return " ".join(s.split())


def parse_warc_records(blob: bytes) -> Iterator[dict]:
    """Yield {url, warc_ts, payload} for each response record in a
    (possibly multi-member-gzip) WARC byte stream."""
    data = _gunzip_members(blob)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        first = None
        for line in data[pos:hdr_end].split(b"\r\n"):
            if first is None:
                first = line
                continue
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
        if first is None or not first.startswith(b"WARC/"):
            break  # not a WARC stream / corrupt from here on
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if n - body_start < length:
            # torn tail: the stream ends inside this record's payload.
            # Content-Length is authoritative — a short slice would be
            # silently corrupt html/text flowing into dedup/top-K, so
            # the damaged record is dropped (read_exact semantics).
            break
        payload = data[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") == "response":
            yield {
                "url": headers.get("warc-target-uri"),
                "warc_ts": headers.get("warc-date"),
                "payload": payload,
            }


def _iter_member_bytes(blob: bytes) -> Iterator[bytes]:
    """Yield each gzip member's decompressed bytes one at a time —
    Common Crawl stores one record per member, so peak memory per
    archive stays ~(compressed file + one record) instead of the whole
    decompressed segment. Plain (uncompressed) streams yield the
    buffer whole. A torn member ends the iteration."""
    if blob[:2] != b"\x1f\x8b":
        yield blob
        return
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(blob[pos:]) + d.flush()
        except zlib.error:
            return
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        yield chunk
        pos += consumed


def read_warc(
    spark: SparkSession, path: str, glob: str = "*.warc*", batch_records: int = 512
) -> DataFrame:
    """(url, warc_ts, html, text) — one row per WARC response record
    across every matching archive file. Records are decoded member-by-
    member and emitted in ``batch_records``-sized Arrow batches, so a
    multi-GB segment never materializes decompressed-whole plus a full
    row copy in one task (the compressed blob itself is held by the
    binaryFile source; cap concurrent tasks for very large segments)."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from datetime import datetime, timezone

        def emit(urls, tss, htmls, texts):
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, type=pa.string()),
                    pa.array(tss, type=pa.timestamp("us")),
                    pa.array(htmls, type=pa.binary()),
                    pa.array(texts, type=pa.string()),
                ],
                names=["url", "warc_ts", "html", "text"],
            )

        for batch in batches:
            col = batch.column(0)
            for i in range(len(col)):
                blob = col[i].as_py()
                if not blob:
                    continue
                urls: list = []
                tss: list = []
                htmls: list = []
                texts: list = []
                for member in _iter_member_bytes(blob):
                    for rec in parse_warc_records(member):
                        body = _strip_http(rec["payload"])
                        urls.append(rec["url"])
                        ts = None
                        if rec["warc_ts"]:
                            try:
                                ts = datetime.fromisoformat(
                                    rec["warc_ts"].replace("Z", "+00:00")
                                ).astimezone(timezone.utc).replace(tzinfo=None)
                            except ValueError:
                                ts = None
                        tss.append(ts)
                        htmls.append(body)
                        texts.append(extract_text(body))
                        if len(urls) >= batch_records:
                            yield emit(urls, tss, htmls, texts)
                            urls, tss, htmls, texts = [], [], [], []
                if urls:
                    yield emit(urls, tss, htmls, texts)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )
    return files.mapInArrow(kernel, WARC_SCHEMA)


def write_warc_file(
    records: list[tuple[str, str, bytes]], path: str, gzip_members: bool = True
) -> None:
    """Fixture producer: (url, iso_ts, html_body) triples as WARC/1.0
    response records with an HTTP envelope, one gzip member per record
    when ``gzip_members`` (the Common-Crawl layout)."""
    import gzip as _gzip

    out = bytearray()
    for url, ts, body in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: " + url.encode() + b"\r\n"
            + b"WARC-Date: " + ts.encode() + b"\r\n"
            + b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        )
        rec = hdr + http + b"\r\n\r\n"
        out.extend(_gzip.compress(rec, mtime=0) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(bytes(out))
