"""Mojibake repair (operators/mojibake.py). All non-ASCII is written as
explicit escapes so editor/VCS normalization can't change what the
tests assert."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.mojibake import (
    corrupt_utf8_as_cp1252, fix_mojibake)
from document_extractor_spark.plans import assert_no_python

# "café — ‘naïve’ €9" in clean UTF-8 (escapes: the asserted bytes must
# not depend on this source file's own encoding) ...
CLEAN = "caf\u00e9 \u2014 \u2018na\u00efve\u2019 \u20ac9"
# ... and after its UTF-8 bytes are mis-read as cp1252 (python twin:
# CLEAN.encode('utf-8').decode('cp1252')).
MANGLED = CLEAN.encode("utf-8").decode("cp1252")


def _one(df, col="text"):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_repairs_classic_double_encoding(spark):
    df = spark.createDataFrame([(1, MANGLED)], "doc_id bigint, text string")
    row = _one(fix_mojibake(df, "text"))
    assert row["text"] == CLEAN
    assert row["mojibake_fixed"] is True


def test_leaves_clean_and_null_text_alone(spark):
    rows = [
        (1, "plain ascii"),
        (2, CLEAN),            # genuine Unicode: é after non-continuation
        (3, None),
        (4, ""),
        (5, "caf\u00e9"),  # genuine Latin-1-range text, not mojibake
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in fix_mojibake(df, "text").collect()}
    for i, (_, original) in zip(sorted(got), rows):
        assert got[i]["text"] == original
        assert got[i]["mojibake_fixed"] is False


def test_forward_then_repair_is_byte_identical(spark):
    """The operator's contract: repair is the exact inverse of the
    UTF-8-as-cp1252 accident, including cp1252 punctuation (’ “ ” €),
    C1-control fallthrough bytes, and 4-byte (non-BMP) sequences."""
    samples = [
        CLEAN,
        "\U0001f600 emoji + \u00df + \u4e2d\u6587",
        "controls \x81\x8d survive",  # undefined-in-cp1252 bytes
        "ascii only stays ascii",
        "",
    ]
    df = spark.createDataFrame(
        list(enumerate(samples)), "doc_id bigint, text string")
    out = fix_mojibake(
        corrupt_utf8_as_cp1252(df, "text", out_col="mangled"),
        "mangled", out_col="repaired")
    bad = out.where(
        F.col("repaired") != F.col("text")).select("doc_id").collect()
    assert bad == []
    # every non-ASCII sample must have been flagged as repaired
    flags = {r["doc_id"]: r["mojibake_fixed"] for r in out.collect()}
    assert flags[0] and flags[1] and flags[2]
    assert not flags[3] and not flags[4]


def test_single_pass_repairs_one_layer(spark):
    df = spark.createDataFrame([(1, CLEAN)], "doc_id bigint, text string")
    twice = corrupt_utf8_as_cp1252(
        corrupt_utf8_as_cp1252(df, "text", out_col="m1"), "m1", out_col="m2")
    once = _one(fix_mojibake(twice, "m2", out_col="r1"))
    assert once["r1"] == once["m1"] != CLEAN
    again = _one(fix_mojibake(
        fix_mojibake(twice, "m2", out_col="r1"), "r1", out_col="r2"))
    assert again["r2"] == CLEAN


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    assert_no_python(fix_mojibake(df, "text"))
    assert_no_python(corrupt_utf8_as_cp1252(df, "text"))
