"""Multinomial Naive Bayes classifier — separable classes, tie
semantics, hostile inputs, and the narrow-exchange scale shape."""

from document_extractor_spark.operators.nb import (
    naive_bayes_predict,
    nb_confusion,
)


def _pred(df, **kw):
    return {r["doc_id"]: r["predicted"]
            for r in naive_bayes_predict(df, **kw).collect()}


def test_separable_classes_and_anomaly(spark):
    rows = [(i, "aa bb aa cc", "A") for i in range(5)]
    rows += [(10 + i, "xx yy xx zz", "B") for i in range(5)]
    # doc 99 declares B but speaks A's vocabulary -> off-diagonal
    rows.append((99, "aa bb cc aa", "B"))
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    got = _pred(docs)
    assert all(got[i] == "A" for i in range(5))
    assert all(got[10 + i] == "B" for i in range(5))
    assert got[99] == "A"
    conf = {(r["lang"], r["predicted"]): r["n_docs"]
            for r in nb_confusion(docs).collect()}
    assert conf[("A", "A")] == 5
    assert conf[("B", "B")] == 5
    assert conf[("B", "A")] == 1


def test_exact_tie_breaks_to_smallest_label(spark):
    """Perfectly symmetric corpus: every class score is the identical
    integer, so every doc predicts the lexicographically first label."""
    docs = spark.createDataFrame(
        [(1, "same words here", "en"), (2, "same words here", "de")],
        "doc_id int, text string, lang string",
    )
    got = _pred(docs)
    assert got[1] == "de" and got[2] == "de"


def test_empty_doc_predicts_prior(spark):
    """A token-free document scores prior-only: the majority class
    wins (its negative log prior is smallest)."""
    rows = [(i, "aa bb", "A") for i in range(3)] + [(10, "xx yy", "B"),
                                                    (11, "", "B")]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    assert _pred(docs)[11] == "A"


def test_null_label_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb", "A"), (2, "aa bb", "A"), (3, "aa bb", None)],
        "doc_id int, text string, lang string",
    )
    got = _pred(docs)
    assert 3 not in got and len(got) == 2


def test_empty_model_returns_empty_not_crash(spark):
    """Every labeled doc token-free -> no model; an empty typed result,
    not an AnalysisException from an empty-array explode."""
    docs = spark.createDataFrame(
        [(1, "   ", "A"), (2, "", "B")],
        "doc_id int, text string, lang string")
    out = naive_bayes_predict(docs)
    assert out.collect() == []
    assert out.columns == ["doc_id", "lang", "predicted"]


def test_plan_no_python_narrow_exchanges(spark):
    from document_extractor_spark.plans import assert_no_python, physical_plan

    docs = spark.createDataFrame(
        [(1, "a b", "A"), (2, "c d", "B")],
        "doc_id int, text string, lang string")
    out = naive_bayes_predict(docs)
    assert_no_python(out)
    for line in physical_plan(out).splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
