"""Unicode NFC normalization (operators/textnorm.py). All non-ASCII is
written as explicit escapes — an editor or VCS normalizing this source
file must not change what the tests assert."""

import unicodedata

from pyspark.sql import functions as F

from document_extractor_spark.operators.textnorm import normalize_text
from document_extractor_spark.plans import assert_vectorized_python_only

DECOMPOSED = "Cafe\u0301 du re\u0301sume\u0301"
COMPOSED = "Caf\u00e9 du r\u00e9sum\u00e9"


def test_nfc_composes_and_passes_through(spark):
    rows = [(1, DECOMPOSED), (2, "plain ascii"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["text"]
           for r in normalize_text(df, "text").collect()}
    assert got[1] == COMPOSED == unicodedata.normalize("NFC", DECOMPOSED)
    assert "\u0301" not in got[1]
    assert got[2] == "plain ascii"   # ASCII fast path: identity
    assert got[3] is None
    assert got[4] == ""


def test_nfc_idempotent_and_dedup_use_case(spark):
    """The point of the operator: byte-different spellings of the same
    text hash equal after normalization."""
    df = spark.createDataFrame(
        [(1, "caf\u00e9"), (2, "cafe\u0301")], "doc_id bigint, text string")
    out = normalize_text(df, "text", out_col="norm")
    hashes = [r["h"] for r in
              out.orderBy("doc_id").select(F.md5("norm").alias("h")).collect()]
    assert hashes[0] == hashes[1]
    twice = normalize_text(out, "norm", out_col="norm2")
    assert twice.where(F.col("norm") != F.col("norm2")).count() == 0


def test_nfc_plan_is_arrow_batched(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    assert_vectorized_python_only(normalize_text(df, "text"))


def test_dehyphenate_rules(spark):
    from document_extractor_spark.operators.textnorm import dehyphenate

    df = spark.createDataFrame(
        [
            (0, "exam-\nple of a wrapped word"),   # soft wrap: join bare
            (1, "Wall-\nStreet before a capital"),  # keep hyphen, drop break
            (2, "state-of-the-art untouched"),      # lexical hyphens stay
            (3, "café-\néclair joins accented lowercase"),
            (4, "plain\nnewline without hyphen stays"),
            (5, None),
            (6, "trailing-\n"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["text"]
           for r in dehyphenate(df).collect()}
    assert got[0] == "example of a wrapped word"
    assert got[1] == "Wall-Street before a capital"
    assert got[2] == "state-of-the-art untouched"
    assert got[3] == "cafééclair joins accented lowercase"
    assert got[4] == "plain\nnewline without hyphen stays"
    assert got[5] is None
    assert got[6] == "trailing-"


def test_dehyphenate_pure_jvm(spark):
    from document_extractor_spark.operators.textnorm import dehyphenate
    from document_extractor_spark.plans import assert_no_python

    df = spark.createDataFrame([(1, "a-\nb")], "doc_id bigint, text string")
    assert_no_python(dehyphenate(df))


def test_normalize_web_text_rules(spark):
    from document_extractor_spark.operators.textnorm import (
        normalize_web_text)

    rows = [
        (0, "a\r\nb\rc"),                      # CRLF + lone CR -> LF
        (1, "\u201chi\u201d \u2018lo\u2019"),  # curly quotes
        (2, "one\u00a0two\u2009three"),          # NBSP/thin join
        (3, "em\u2014dash en\u2013dash"),
        (4, "dots\u2026 here"),
        (5, "ze\u200bro\ufeffwidth"),
        (6, "bel\x07l co\x01ntrol"),
        (7, "  spaced    out\t\ttabs  "),
        (8, "a\n\n\n\n\nb"),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["text"]
           for r in normalize_web_text(df).collect()}
    assert got[0] == "a\nb\nc"
    assert got[1] == '"hi" ' + "'lo'"
    assert got[2] == "one two three"
    assert got[3] == "em-dash en-dash"
    assert got[4] == "dots... here"
    assert got[5] == "zerowidth"
    assert got[6] == "bell control"
    assert got[7] == "spaced out tabs"
    assert got[8] == "a\n\nb"
    assert got[9] is None
    # idempotent: cleaning clean text is the identity
    again = normalize_web_text(
        spark.createDataFrame([(k, v) for k, v in got.items()
                               if v is not None],
                              "doc_id bigint, text string"))
    assert {r["doc_id"]: r["text"] for r in again.collect()} == {
        k: v for k, v in got.items() if v is not None}


def test_normalize_web_text_plan_jvm(spark):
    from document_extractor_spark.operators.textnorm import (
        normalize_web_text)
    from document_extractor_spark.plans import assert_no_python

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    assert_no_python(normalize_web_text(df))
