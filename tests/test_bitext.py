"""Bitext candidate mining (operators/bitext.py)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.bitext import bitext_candidates
from document_extractor_spark.plans import assert_no_python


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "url string, lang string, n_tokens bigint")


def _alts(spark, pairs):
    return spark.createDataFrame(pairs, "url string, href string")


def test_declared_pairs_lang_and_ratio_rules(spark):
    docs = _docs(spark, [
        ("e/1", "en", 100), ("d/1", "de", 120),    # kept (ratio 1.2)
        ("e/2", "en", 100), ("d/2", "de", 201),    # ratio > 2 → dropped
        ("e/3", "en", 100), ("d/3", "de", 200),    # exactly 2.0 → kept
        ("e/4", "en", 100), ("x/4", "en", 100),    # same lang → dropped
        ("e/5", "en", 100), ("d/5", "de", 0),      # zero length → dropped
    ])
    alts = _alts(spark, [("e/1", "d/1"), ("e/1", "d/1"),   # dup collapses
                         ("e/2", "d/2"), ("e/3", "d/3"),
                         ("e/4", "x/4"), ("e/5", "d/5"),
                         ("e/1", "ghost/url"),             # missing end
                         ("e/1", "e/1")])                  # self
    got = sorted((r["src_url"], r["dst_url"])
                 for r in bitext_candidates(docs, alts).collect())
    assert got == [("e/1", "d/1"), ("e/3", "d/3")]
    row = bitext_candidates(docs, alts).where(
        F.col("src_url") == "e/1").collect()[0]
    assert (row["src_lang"], row["dst_lang"],
            row["src_tokens"], row["dst_tokens"]) == ("en", "de", 100, 120)


def test_ratio_guard(spark):
    docs = _docs(spark, [("a", "en", 1)])
    with pytest.raises(ValueError, match="max_ratio_pct"):
        bitext_candidates(docs, _alts(spark, [("a", "b")]),
                          max_ratio_pct=50)


def test_plan_jvm_only(spark):
    docs = _docs(spark, [("a", "en", 1), ("b", "de", 1)])
    assert_no_python(bitext_candidates(docs, _alts(spark, [("a", "b")])))
