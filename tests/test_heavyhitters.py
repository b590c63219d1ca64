"""Heavy hitters (operators/heavyhitters.py) — MG candidate pass +
exact verify, checked against the exact groupBy answer."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.functions.text import exploded_tokens
from document_extractor_spark.operators.heavyhitters import frequent_tokens
from document_extractor_spark.plans import assert_vectorized_python_only


def _docs(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    ).repartition(parts)


def _exact(spark, df, ppm):
    toks = exploded_tokens(df, "doc_id", "text")
    n = toks.count()
    rows = (toks.groupBy("tok").count()
            .where(F.col("count") * 1_000_000 >= ppm * n).collect())
    return {(r["tok"], r["count"], r["count"] * 1_000_000 // n)
            for r in rows}


def test_matches_exact_answer_on_skewed_corpus(spark):
    # 'the' dominates, a deep tail of unique tokens stresses the sketch:
    # capacity for 50_000 ppm is 20 counters but each partition sees
    # hundreds of distinct tokens.
    texts = [
        " ".join(["the"] * 30 + ["and"] * 10 + [f"tail{i}x{j}"
                                                for j in range(40)])
        for i in range(50)
    ]
    df = _docs(spark, texts)
    got = {(r["token"], r["cnt"], r["freq_ppm"])
           for r in frequent_tokens(df, min_freq_ppm=50_000).collect()}
    assert got == _exact(spark, df, 50_000)
    assert any(t == "the" for t, _, _ in got)
    assert all(not t.startswith("tail") for t, _, _ in got)


def test_partition_invariance(spark):
    texts = ["alpha beta beta gamma gamma gamma"] * 9 + ["delta " * 5]
    out = {
        p: sorted(map(tuple, frequent_tokens(
            _docs(spark, texts, parts=p), min_freq_ppm=100_000).collect()))
        for p in (1, 7)
    }
    assert out[1] == out[7] and out[1]


def test_capacity_and_candidate_guards(spark):
    df = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="survivor guarantee"):
        frequent_tokens(df, min_freq_ppm=1000, capacity=10)
    with pytest.raises(ValueError, match="max_candidates"):
        frequent_tokens(df, min_freq_ppm=1, max_candidates=100)
    with pytest.raises(ValueError, match="min_freq_ppm"):
        frequent_tokens(df, min_freq_ppm=0)


def test_empty_and_null_corpus(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id bigint, text string")
    assert frequent_tokens(df, min_freq_ppm=1000).collect() == []


def test_plan_is_arrow_vectorized_only(spark):
    df = _docs(spark, ["x y z"] * 4)
    assert_vectorized_python_only(frequent_tokens(df, min_freq_ppm=10_000))
