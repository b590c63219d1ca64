"""Payload sniffing — content-type and charset detection from leading
bytes, the first gate of a crawl-ingest pipeline. HTTP Content-Type
headers lie constantly at web scale (servers label PDFs text/html,
gzip as octet-stream), so ingest routes on the bytes themselves: magic
numbers for binary formats, BOMs for UTF-16/UTF-8, a root-tag probe
for HTML, UTF-8 validity for bare text. The reference app hard-assumes
its input is a PDF (pdf_processor.py:66-110); this operator is the
step that would make that assumption safe on crawl data, routing each
payload to the right extractor (html/pdf/media) or dropping it.

Spark-first: every rule is a JVM predicate on the binary column —
``startswith`` against byte literals for magic numbers, ``is_valid_utf8``
gating one decode for the HTML root-tag regexp — one CASE chain inside
whole-stage codegen, no Python anywhere. First match wins, most
specific first (a BOM'd HTML file is text/html with the BOM's charset,
a PNG is image/png no matter what bytes follow).

Outputs: ``sniffed_type`` (MIME string; 'empty' for zero-length, NULL
for NULL payloads) and ``sniffed_charset`` (utf-8 / utf-16le / utf-16be
for textual types, NULL for binary formats and undecodable payloads).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (magic bytes, MIME type) — binary formats, most specific first.
MAGIC = [
    (b"%PDF-", "application/pdf"),
    (b"\x1f\x8b", "application/gzip"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
    # audio/video containers — crawls carry podcasts and clips; the
    # multimodal operators (operators/multimodal.py) want them routed,
    # not extracted as text
    (b"OggS", "application/ogg"),
    (b"\x1aE\xdf\xa3", "video/x-matroska"),  # EBML (mkv/webm)
    (b"fLaC", "audio/flac"),
    (b"ID3", "audio/mpeg"),
    (b"\xff\xfb", "audio/mpeg"),  # bare MP3 frame sync (MPEG1 L3)
    (b"\xff\xf3", "audio/mpeg"),
    (b"\xff\xf2", "audio/mpeg"),
]

_HTML_ROOT = r"(?is)^\s*(<!doctype\s+html|<html)"


def _starts(payload: Column, magic: bytes) -> Column:
    return F.startswith(payload, F.lit(magic))


def sniff_content_type(df: DataFrame,
                       payload_col: str = "html") -> DataFrame:
    """Append ``sniffed_type`` and ``sniffed_charset`` (see module
    docstring for the rule table). Never raises on any byte string."""
    p = F.col(payload_col)

    charset = (
        F.when(p.isNull(), F.lit(None).cast("string"))
        .when(_starts(p, b"\xef\xbb\xbf"), F.lit("utf-8"))
        .when(_starts(p, b"\xff\xfe"), F.lit("utf-16le"))
        .when(_starts(p, b"\xfe\xff"), F.lit("utf-16be"))
        .when(F.is_valid_utf8(p), F.lit("utf-8"))
    )
    # decodable text (plain UTF-8 or BOM-stripped UTF-8) for the HTML
    # root-tag probe; UTF-16 payloads are classified by BOM alone (no
    # JVM-side UTF-16 validity primitive — documented limit: UTF-16
    # HTML sniffs as text/plain + utf-16 charset).
    text = F.when(
        _starts(p, b"\xef\xbb\xbf") & F.is_valid_utf8(p),
        F.decode(F.substring(p, 4, F.octet_length(p) - 3), "UTF-8"),
    ).when(F.is_valid_utf8(p), F.decode(p, "UTF-8"))

    typ = F.when(p.isNull(), F.lit(None).cast("string"))
    typ = typ.when(F.octet_length(p) == 0, F.lit("empty"))
    for magic, mime in MAGIC:
        typ = typ.when(_starts(p, magic), F.lit(mime))
    # offset-anchored containers (magic not at byte 0): RIFF type at
    # offset 8, ISO-BMFF 'ftyp' at offset 4
    riff = _starts(p, b"RIFF")
    typ = typ.when(
        riff & (F.substring(p, 9, 4) == F.lit(b"WAVE")), F.lit("audio/wav"))
    typ = typ.when(
        riff & (F.substring(p, 9, 4) == F.lit(b"AVI ")),
        F.lit("video/x-msvideo"))
    typ = typ.when(
        F.substring(p, 5, 4) == F.lit(b"ftyp"), F.lit("video/mp4"))
    typ = (
        typ.when(text.rlike(_HTML_ROOT), F.lit("text/html"))
        .when(charset.isNotNull(), F.lit("text/plain"))
        .otherwise(F.lit("application/octet-stream"))
    )
    # binary formats carry no charset
    binary_mimes = {m for _, m in MAGIC} | {
        "application/octet-stream", "empty", "audio/wav",
        "video/x-msvideo", "video/mp4"}
    return df.withColumns({
        "sniffed_type": typ,
        "sniffed_charset": F.when(
            typ.isin(*sorted(binary_mimes)), F.lit(None).cast("string")
        ).otherwise(charset),
    })
