"""All-pairs tf-idf cosine mining — identity pairs, pruning rules,
prefix-filter banding, and the narrow-exchange scale shape."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.invindex import tfidf_cosine_pairs


def _pairs(df, **kw):
    return {(r["doc_a"], r["doc_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(df, **kw).collect()}


def test_identical_docs_cosine_one(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana cherry apple"),
         (2, "apple banana cherry apple"),
         (3, "totally unrelated words here banana")],
        "doc_id int, text string",
    )
    got = _pairs(docs, threshold=0.5)
    assert (1, 2) in got
    assert got[(1, 2)] >= 0.999999
    # d3 shares only 'banana' with d1/d2 — far below threshold
    assert (1, 3) not in got and (2, 3) not in got


def test_df_one_terms_cannot_pair(spark):
    """Every term unique to one doc -> no candidate pairs at all."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id int, text string")
    assert _pairs(docs, threshold=0.0) == {}


def test_max_df_bands_hot_terms(spark):
    """A term above the df cap is dropped by the prefix filter: docs
    that agree ONLY on the hot term produce no pair.  (A term in EVERY
    doc needs no cap — its idf is 0 and its weight prunes to nothing.)"""
    docs = spark.createDataFrame(
        [(1, "the alpha"), (2, "the beta"), (3, "the gamma"),
         (4, "solo delta")],
        "doc_id int, text string",
    )
    assert _pairs(docs, threshold=0.0, max_df=2) == {}
    # without the cap, 'the' (df=3 < N=4, idf > 0) pairs docs 1-3
    uncapped = _pairs(docs, threshold=0.0, max_df=10)
    assert (1, 2) in uncapped and (1, 3) in uncapped and (2, 3) in uncapped
    # idf-zero pruning: a term in all docs never creates a pair
    alldocs = spark.createDataFrame(
        [(1, "the alpha"), (2, "the beta")], "doc_id int, text string")
    assert _pairs(alldocs, threshold=0.0, max_df=10) == {}


def test_case_fold_and_counts(spark):
    """Tokenizer is the lowercased token_counts twin; repeated tokens
    raise tf sublinearly, so scaled copies still align perfectly."""
    docs = spark.createDataFrame(
        [(1, "Apple BANANA"), (2, "apple banana"), (3, "apple cherry")],
        "doc_id int, text string",
    )
    got = _pairs(docs, threshold=0.9)
    assert (1, 2) in got and got[(1, 2)] >= 0.999999


def test_plan_no_python_narrow_exchanges(spark):
    from document_extractor_spark.plans import assert_no_python, physical_plan

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id int, text string")
    out = tfidf_cosine_pairs(docs, threshold=0.1)
    assert_no_python(out)
    for line in physical_plan(out).splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
