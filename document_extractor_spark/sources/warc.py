"""WARC ingest source — Common Crawl's native archive format → pages rows.

The north star names a "Common-Crawl-style" corpus; Common Crawl ships
WARC (ISO 28500): concatenated records, each a ``WARC/1.0`` header block
(``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``, ``Content-Length``)
plus a body — for ``response`` records an HTTP response (status line +
headers + payload). Crawl WARCs are gzipped PER RECORD (each record its
own gzip member), exactly so archives can be split at member boundaries.

Spark shape: ``binaryFile`` scan → ``mapInPandas`` running a streaming
record parser. The parser iterates records without materializing the
archive (one record in memory at a time — Content-Length-framed, no
regex over the whole file), so executor memory is bounded by the largest
RECORD, not the WARC. Parallelism is per-file (Common Crawl segments are
~1 GB × 64k files per crawl — far more files than executors); on a real
cluster the same reader runs over ``s3a://commoncrawl/...`` paths
unchanged. Downstream is the ordinary narrow extract plan.

Pure-stdlib parsing (zlib multi-member inflate); no warcio dependency.
"""

from __future__ import annotations

import io
import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pages import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"
_MAX_HEADER = 64 * 1024          # sanity cap on a header block
_GZIP_MAGIC = b"\x1f\x8b"


_INFLATE_CHUNK = 1 << 20         # feed the inflater 1 MiB at a time


def _inflate_members(data: bytes):
    """Yield decompressed gzip members of a per-record-gzipped WARC.
    zlib with wbits=47 stops at each member boundary. The inflater is
    fed bounded slices from a moving offset — feeding it the whole
    remaining buffer per member would copy O(archive) bytes per RECORD
    (quadratic: a 1 GB segment with 50k records would memcpy ~25 TB);
    this way every byte is copied once, and memory holds one member
    plus one slice."""
    view = memoryview(data)
    pos, n = 0, len(data)
    while n - pos >= 2 and bytes(view[pos:pos + 2]) == _GZIP_MAGIC:
        d = zlib.decompressobj(47)
        out = bytearray()
        while not d.eof and pos < n:
            fed = bytes(view[pos:pos + _INFLATE_CHUNK])
            pos += len(fed)
            out += d.decompress(fed)
        out += d.flush()
        # bytes past the member boundary belong to the next member
        pos -= len(d.unused_data)
        yield bytes(out)


def _parse_header_block(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n")[1:]:          # [0] = WARC/1.0
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1", "replace")
    return headers


def _iter_warc_records(stream: io.BufferedIOBase):
    """Yield (warc_headers, body_bytes) from a plain (uncompressed)
    WARC byte stream — Content-Length framing, never regex/split over
    the whole archive."""
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return                                  # desynced → stop, no raise
        header = bytearray(line)
        while True:
            line = stream.readline()
            if not line or line in (b"\r\n", b"\n"):
                break
            header += line
            if len(header) > _MAX_HEADER:
                return
        h = _parse_header_block(bytes(header))
        try:
            length = int(h.get("content-length", "0"))
        except ValueError:
            return
        body = stream.read(length)
        yield h, body


def _dechunk(payload: bytes) -> bytes:
    """Reassemble a ``Transfer-Encoding: chunked`` body: hex-size line,
    CRLF, that many bytes, CRLF, repeated until a 0-size chunk. Crawl
    captures store the wire bytes, so chunk framing survives into the
    WARC. Best-effort: on malformed framing, return what was assembled
    so far (truncated beats chunk-size lines interleaved in the html)."""
    out = bytearray()
    pos, n = 0, len(payload)
    while pos < n:
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            break
        token = payload[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(token, 16)
        except ValueError:
            return payload if not out else bytes(out)
        if size == 0:
            break
        start = eol + 2
        out += payload[start:start + size]
        pos = start + size + 2                     # skip trailing CRLF
    return bytes(out)


def _http_payload(body: bytes) -> bytes:
    """Strip the HTTP response envelope of a ``response`` record body,
    undoing the two wire encodings real Common Crawl captures carry:
    ``Transfer-Encoding: chunked`` (hex-framed) and ``Content-Encoding:
    gzip/deflate`` (compressed payload bytes). Without these, chunked
    records yield html interleaved with hex size lines and compressed
    records yield binary garbage. Best-effort throughout — a malformed
    encoding degrades to the raw bytes, never raises."""
    idx = body.find(_CRLF2)
    if body[:5] != b"HTTP/" or not (0 <= idx < _MAX_HEADER):
        return body
    head = body[:idx].lower()
    payload = body[idx + len(_CRLF2):]
    headers = {}
    for line in head.split(b"\r\n")[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip()] = v.strip()
    if b"chunked" in headers.get(b"transfer-encoding", b""):
        payload = _dechunk(payload)
    enc = headers.get(b"content-encoding", b"")
    try:
        if enc in (b"gzip", b"x-gzip"):
            payload = zlib.decompress(payload, 47)
        elif enc == b"deflate":
            try:
                payload = zlib.decompress(payload)
            except zlib.error:                     # raw-deflate servers
                payload = zlib.decompress(payload, -15)
    except zlib.error:
        pass                                       # keep raw bytes
    return payload


def _warc_ts(h: dict):
    raw = h.get("warc-date")
    if not raw:
        return None
    try:
        return datetime.strptime(raw, "%Y-%m-%dT%H:%M:%SZ") \
            .replace(tzinfo=timezone.utc)
    except ValueError:
        return None


def iter_warc_pages(data: bytes):
    """(url, warc_ts, payload) for every ``response`` record of one WARC
    file's bytes — transparently handles per-record-gzip and plain."""
    if data[:2] == _GZIP_MAGIC:
        records = (
            rec
            for member in _inflate_members(data)
            for rec in _iter_warc_records(io.BytesIO(member))
        )
    else:
        records = _iter_warc_records(io.BytesIO(data))
    for h, body in records:
        if h.get("warc-type") != "response":
            continue
        url = h.get("warc-target-uri")
        if not url:
            continue
        yield url, _warc_ts(h), _http_payload(body)


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → the standard pages frame (url, warc_ts, html, text,
    lang) + ``warc_day`` derived from each record's WARC-Date, ready for
    ``extract_pages`` / the Iceberg-style writer.

    ``binaryFile`` gives one row per archive; the parser streams records
    inside the Arrow batch. Column pruning still applies upstream of the
    UDF (only ``content`` is read), and downstream stays the narrow
    zero-shuffle extract plan."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(PAGES_SCHEMA.fields)
        + [T.StructField("warc_day", T.StringType())]
    )

    cols = [f.name for f in out_schema.fields]
    max_rows, max_bytes = 1024, 64 << 20

    def parse(batches):
        # Yield in bounded slices: one segment decompresses to several
        # GB of payloads, so accumulating every record of the archive
        # into a single DataFrame before yielding would hold the whole
        # decompressed crawl segment in executor memory — the bound
        # must stay "largest record", not "largest WARC".
        rows, nbytes = [], 0
        for pdf in batches:
            for data in pdf["content"]:
                for url, ts, payload in iter_warc_pages(bytes(data)):
                    rows.append({
                        "url": url, "warc_ts": ts, "html": payload,
                        "text": None, "lang": None,
                        "warc_day": ts.strftime("%Y-%m-%d") if ts else None,
                    })
                    nbytes += len(payload)
                    if len(rows) >= max_rows or nbytes >= max_bytes:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, nbytes = [], 0
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("content")
        .mapInPandas(parse, out_schema)
    )


def build_warc(records, per_record_gzip: bool = True) -> bytes:
    """Test/fixture writer: (url, iso_ts, payload_bytes) → WARC bytes in
    the Common Crawl shape (response records wrapped in an HTTP/1.1 200
    envelope, one gzip member per record when ``per_record_gzip``)."""
    out = bytearray()
    for url, iso_ts, payload in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(payload)).encode()
                + b"\r\n\r\n" + payload)
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + iso_ts.encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"\r\n"
        )
        rec = hdr + http + b"\r\n\r\n"
        if per_record_gzip:
            gz = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += gz.compress(rec) + gz.flush()
        else:
            out += rec
    return bytes(out)


def warc_to_pages_table(spark: SparkSession, warc_path: str,
                        out_path: str) -> None:
    """Ingest WARC archives into the Iceberg-style pages layout — the
    front door from a raw crawl to everything else in this engine."""
    df = read_warc_pages(spark, warc_path)
    (df.filter(F.col("warc_day").isNotNull())
       .write.mode("overwrite").partitionBy("warc_day").parquet(out_path))


# ---------------------------------------------------------------------------
# WET (extracted-text conversion) sibling — Common Crawl ships three
# parallel archives per segment: WARC (responses), WAT (metadata), WET
# (plain-text conversions). WET reuses the WARC container verbatim; the
# records are ``WARC-Type: conversion`` with a text/plain body that IS
# the extracted text (no HTTP envelope). Ingesting WET is how a
# training-data pipeline bootstraps from Common Crawl's own extraction
# before (or instead of) re-extracting raw HTML.
# ---------------------------------------------------------------------------


def iter_wet_docs(data: bytes):
    """(url, warc_ts, text) for every ``conversion`` record of one WET
    file's bytes — per-record-gzip and plain both handled; non-UTF-8
    bytes are replaced, never raised (hostile archives are data)."""
    if data[:2] == _GZIP_MAGIC:
        records = (
            rec
            for member in _inflate_members(data)
            for rec in _iter_warc_records(io.BytesIO(member))
        )
    else:
        records = _iter_warc_records(io.BytesIO(data))
    for h, body in records:
        if h.get("warc-type") != "conversion":
            continue
        url = h.get("warc-target-uri")
        if not url:
            continue
        yield url, _warc_ts(h), body.decode("utf-8", "replace")


def read_wet_docs(spark: SparkSession, path: str) -> DataFrame:
    """WET files → ``(url, warc_ts, text, warc_day)`` — the text-only
    corpus table that feeds the dedup/curation tiers directly (no
    extraction pass needed). Same scale shape as ``read_warc_pages``:
    ``binaryFile`` row per archive, streaming Content-Length-framed
    parser inside ``mapInPandas``, memory bounded by the largest
    RECORD, bounded-slice yields."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("warc_day", T.StringType()),
    ])
    cols = [f.name for f in out_schema.fields]
    max_rows, max_bytes = 1024, 64 << 20

    def parse(batches):
        rows, nbytes = [], 0
        for pdf in batches:
            for data in pdf["content"]:
                for url, ts, text in iter_wet_docs(bytes(data)):
                    rows.append({
                        "url": url, "warc_ts": ts, "text": text,
                        "warc_day": ts.strftime("%Y-%m-%d") if ts else None,
                    })
                    nbytes += len(text)
                    if len(rows) >= max_rows or nbytes >= max_bytes:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, nbytes = [], 0
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(path)
        .select("content")
        .mapInPandas(parse, out_schema)
    )


def build_wet(records, per_record_gzip: bool = True,
              with_warcinfo: bool = True) -> bytes:
    """Test/fixture writer: (url, iso_ts, text_str) → WET bytes in the
    Common Crawl shape (``conversion`` records, text/plain bodies, one
    gzip member per record when ``per_record_gzip``; a leading
    ``warcinfo`` record like real WET files so type filtering is
    exercised)."""
    raw = []
    if with_warcinfo:
        info = b"software: document-extractor-spark fixture\r\n"
        raw.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: " + str(len(info)).encode() + b"\r\n"
            b"\r\n" + info + b"\r\n\r\n")
    for url, iso_ts, text in records:
        body = text.encode("utf-8")
        raw.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + iso_ts.encode() + b"\r\n"
            b"Content-Type: text/plain\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"\r\n" + body + b"\r\n\r\n")
    out = bytearray()
    for rec in raw:
        if per_record_gzip:
            gz = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += gz.compress(rec) + gz.flush()
        else:
            out += rec
    return bytes(out)


# ---------------------------------------------------------------------------
# WAT (metadata) sibling — the third member of the Common Crawl triple
# (WARC responses / WAT metadata / WET text). WAT records are
# ``WARC-Type: metadata`` whose body is a JSON envelope describing the
# corresponding response: HTML head metadata, outlink list, HTTP
# headers. Ingesting WAT is how a pipeline gets titles + link graphs
# WITHOUT touching the raw payload archive — at Common Crawl scale the
# WAT files are ~1/5 the bytes of the WARCs.
# ---------------------------------------------------------------------------

_WAT_META_PATH = ("$.Envelope.Payload-Metadata.HTTP-Response-Metadata"
                  ".HTML-Metadata")


def iter_wat_records(data: bytes):
    """(url, warc_ts, json_str) for every ``metadata`` record of one
    WAT file's bytes — record framing only; the JSON stays a string so
    all field extraction happens JVM-side downstream."""
    if data[:2] == _GZIP_MAGIC:
        records = (
            rec
            for member in _inflate_members(data)
            for rec in _iter_warc_records(io.BytesIO(member))
        )
    else:
        records = _iter_warc_records(io.BytesIO(data))
    for h, body in records:
        if h.get("warc-type") != "metadata":
            continue
        url = h.get("warc-target-uri")
        if not url:
            continue
        yield url, _warc_ts(h), body.decode("utf-8", "replace")


def read_wat_meta(spark: SparkSession, path: str) -> DataFrame:
    """WAT files → ``(url, warc_ts, warc_day, title, link_urls)`` —
    page-head metadata and the outlink list straight from the crawl's
    own metadata archive. The Python kernel does record FRAMING only
    (Content-Length walk, one record in memory); every JSON field
    extraction is JVM-side (``get_json_object`` + PERMISSIVE
    ``from_json`` on the links array — malformed envelopes yield NULL
    fields, never task failures)."""
    import pandas as pd
    from pyspark.sql import types as T

    raw_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("wat_json", T.StringType()),
        T.StructField("warc_day", T.StringType()),
    ])
    cols = [f.name for f in raw_schema.fields]
    max_rows, max_bytes = 1024, 64 << 20

    def parse(batches):
        rows, nbytes = [], 0
        for pdf in batches:
            for data in pdf["content"]:
                for url, ts, js in iter_wat_records(bytes(data)):
                    rows.append({
                        "url": url, "warc_ts": ts, "wat_json": js,
                        "warc_day": ts.strftime("%Y-%m-%d") if ts else None,
                    })
                    nbytes += len(js)
                    if len(rows) >= max_rows or nbytes >= max_bytes:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, nbytes = [], 0
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wat*")
        .load(path)
        .select("content")
        .mapInPandas(parse, raw_schema)
    )
    links_json = F.get_json_object(
        "wat_json", _WAT_META_PATH + ".Links")
    links = F.from_json(links_json, "array<struct<url:string>>")
    return raw.select(
        "url", "warc_ts", "warc_day",
        F.get_json_object("wat_json", _WAT_META_PATH + ".Head.Title")
        .alias("title"),
        F.filter(
            F.transform(F.coalesce(links, F.array()), lambda x: x["url"]),
            lambda u: u.isNotNull(),
        ).alias("link_urls"),
    )


def build_wat(records, per_record_gzip: bool = True) -> bytes:
    """Test/fixture writer: (url, iso_ts, title, link_urls) → WAT bytes
    in the Common Crawl shape (``metadata`` records, JSON envelope with
    Head.Title and the Links array)."""
    import json

    out = bytearray()
    for url, iso_ts, title, link_urls in records:
        env = {"Envelope": {"Payload-Metadata": {
            "HTTP-Response-Metadata": {"HTML-Metadata": {
                "Head": {"Title": title},
                "Links": [{"path": "A@/href", "url": u}
                          for u in link_urls],
            }}}}}
        body = json.dumps(env, ensure_ascii=False).encode("utf-8")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: metadata\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + iso_ts.encode() + b"\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"\r\n" + body + b"\r\n\r\n")
        if per_record_gzip:
            gz = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += gz.compress(rec) + gz.flush()
        else:
            out += rec
    return bytes(out)
