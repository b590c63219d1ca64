"""Content-type / charset sniffing (operators/sniff.py)."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.sniff import sniff_content_type
from document_extractor_spark.plans import assert_no_python


def _sniff(spark, payloads):
    rows = [(i, bytearray(p) if p is not None else None)
            for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "id bigint, html binary")
    return {r["id"]: (r["sniffed_type"], r["sniffed_charset"])
            for r in sniff_content_type(df).collect()}


def test_magic_numbers(spark):
    got = _sniff(spark, [
        b"%PDF-1.7\nxref",                       # 0
        b"\x1f\x8b\x08\x00junk",                 # 1
        b"\x89PNG\r\n\x1a\nIHDR",                # 2
        b"\xff\xd8\xff\xe0JFIF",                 # 3
        b"GIF89a\x01\x00",                       # 4
        b"PK\x03\x04word/",                      # 5
    ])
    assert got[0] == ("application/pdf", None)
    assert got[1] == ("application/gzip", None)
    assert got[2] == ("image/png", None)
    assert got[3] == ("image/jpeg", None)
    assert got[4] == ("image/gif", None)
    assert got[5] == ("application/zip", None)


def test_text_html_and_boms(spark):
    got = _sniff(spark, [
        b"<!DOCTYPE html><html></html>",          # 0
        b"  \n<HTML lang='en'>",                  # 1 leading ws + case
        b"\xef\xbb\xbf<!doctype html>",           # 2 BOM'd HTML
        b"plain old text",                        # 3
        b"\xef\xbb\xbfBOM'd text",                # 4
        b"\xff\xfeh\x00i\x00",                    # 5 UTF-16LE
        b"\xfe\xff\x00h\x00i",                    # 6 UTF-16BE
        b"\x00\x01\x02\xfe\xff garbage",          # 7 binary junk
        b"",                                      # 8 empty
        None,                                     # 9 NULL
        b"<htm not html",                         # 10 near-miss root tag
    ])
    assert got[0] == ("text/html", "utf-8")
    assert got[1] == ("text/html", "utf-8")
    assert got[2] == ("text/html", "utf-8")
    assert got[3] == ("text/plain", "utf-8")
    assert got[4] == ("text/plain", "utf-8")
    assert got[5] == ("text/plain", "utf-16le")
    assert got[6] == ("text/plain", "utf-16be")
    assert got[7] == ("application/octet-stream", None)
    assert got[8] == ("empty", None)
    assert got[9] == (None, None)
    assert got[10] == ("text/plain", "utf-8")


def test_magic_beats_text(spark):
    # a PDF whose bytes happen to be valid UTF-8 is still a PDF
    got = _sniff(spark, [b"%PDF-1.4 hello"])
    assert got[0] == ("application/pdf", None)


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))],
                               "id bigint, html binary")
    assert_no_python(sniff_content_type(df))


def test_audio_video_containers(spark):
    got = _sniff(spark, [
        b"OggS\x00\x02vorbis",                    # 0
        b"\x1aE\xdf\xa3\x01webm",                 # 1
        b"fLaCstreaminfo",                        # 2
        b"ID3\x04\x00tag",                        # 3
        b"\xff\xfbmp3frame",                      # 4
        b"RIFF\x24\x00\x00\x00WAVEfmt ",          # 5
        b"RIFF\x24\x00\x00\x00AVI LIST",          # 6
        b"\x00\x00\x00\x20ftypisom",              # 7: mp4, ftyp at +4
        b"RIFF\x90\x00\x00\x00XXXX",              # 8: unknown RIFF type
    ])
    assert got[0] == ("application/ogg", None)
    assert got[1] == ("video/x-matroska", None)
    assert got[2] == ("audio/flac", None)
    assert got[3] == ("audio/mpeg", None)
    assert got[4] == ("audio/mpeg", None)
    assert got[5] == ("audio/wav", None)
    assert got[6] == ("video/x-msvideo", None)
    assert got[7] == ("video/mp4", None)
    assert got[8] == ("application/octet-stream", None)
