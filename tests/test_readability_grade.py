"""Flesch-Kincaid readability (operators/textstats.py)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.textstats import readability_grade
from document_extractor_spark.plans import assert_no_python


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return readability_grade(df).head()


def test_counts_and_known_scores(spark):
    # hand-counted: 7 whitespace tokens, 2 terminator runs
    r = _one(spark, "The cat sat. The dog barked loudly!")
    assert r["n_words"] == 7
    assert r["n_sentences"] == 2
    # vowel groups: e,a,a,e,o,a,e,ou,y -> "The(1) cat(1) sat(1) The(1)
    # dog(1) barked(2: a,e) loudly(2: ou,y)" = 9
    assert r["n_syllables"] == 9
    wps, spw = 7 / 2, 9 / 7
    assert r["fk_grade"] == pytest.approx(
        round(0.39 * wps + 11.8 * spw - 15.59, 4), abs=1e-9)
    assert r["reading_ease"] == pytest.approx(
        round(206.835 - 1.015 * wps - 84.6 * spw, 4), abs=1e-9)


def test_monotone_in_complexity(spark):
    """More syllables per word and longer sentences → higher grade,
    lower ease — the property curation gates rely on."""
    simple = _one(spark, "The cat sat. It was fat. We saw it.")
    complex_ = _one(spark, (
        "Notwithstanding considerable epistemological controversies, "
        "institutional heterogeneity fundamentally characterizes "
        "contemporary organizational administration."))
    assert complex_["fk_grade"] > simple["fk_grade"]
    assert complex_["reading_ease"] < simple["reading_ease"]


def test_degenerate_inputs(spark):
    rows = [(1, ""), (2, "   "), (3, "no terminator here"), (4, "!!!"),
            (5, "xz 123")]  # no vowels (y counts as one)
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in readability_grade(df).collect()}
    for i in (1, 2):
        assert got[i]["n_words"] == 0
        assert got[i]["fk_grade"] is None and got[i]["reading_ease"] is None
    assert got[3]["n_sentences"] == 1          # floored at 1
    assert got[4]["n_sentences"] == 1 and got[4]["n_words"] == 1
    assert got[5]["n_syllables"] == 0          # documented approximation
    assert got[5]["fk_grade"] is not None


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "x.")], "doc_id bigint, text string")
    assert_no_python(readability_grade(df))
