"""Paragraph-level language segmentation (operators/langseg.py)."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.langseg import segment_languages
from document_extractor_spark.plans import assert_vectorized_python_only

EN = "the cat and the dog is in that house with it for this day"
DE = "der hund und die katze ist nicht mit von auf für im garten"
FR = "le chien et la chatte est dans pour une des que qui avec sur"


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in segment_languages(df).collect()}


def test_majority_and_mixed_flag(spark):
    got = _run(spark, [
        (1, f"{EN}\n{EN}\n{DE}"),        # 2 en + 1 de
        (2, f"{FR}\n{FR}\n{FR}"),        # pure fr
    ])
    r1 = got[1]
    assert (r1["main_lang"], r1["n_paras"], r1["n_major_paras"]) == ("en", 3, 2)
    assert r1["major_ppm"] == 666666 and r1["is_mixed"] is True
    r2 = got[2]
    assert (r2["main_lang"], r2["major_ppm"], r2["is_mixed"]) == \
        ("fr", 1000000, False)


def test_tie_breaks_on_lang_asc_and_is_deterministic(spark):
    rows = [(1, f"{EN}\n{DE}")]
    got = _run(spark, rows)
    assert got[1]["main_lang"] == "de"       # 1-1 tie → lang ASC
    assert got[1]["major_ppm"] == 500000 and got[1]["is_mixed"] is True
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    again = {r["doc_id"]: r for r in
             segment_languages(df.repartition(7)).collect()}
    assert tuple(again[1]) == tuple(got[1])  # partitioning-invariant


def test_blank_paragraphs_and_empty_docs(spark):
    got = _run(spark, [
        (1, f"\n\n  {EN}  \n\n\n{EN}\n  \n"),   # padding + blank blocks
        (2, ""), (3, None), (4, "   \n  \n "),
    ])
    assert got[1]["n_paras"] == 2 and got[1]["is_mixed"] is False
    for absent in (2, 3, 4):
        assert absent not in got                 # no paragraphs → no row


def test_plan_is_arrow_batched_only(spark):
    df = spark.createDataFrame([(1, EN)], "doc_id bigint, text string")
    assert_vectorized_python_only(segment_languages(df))
