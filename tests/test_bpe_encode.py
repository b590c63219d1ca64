"""BPE encode (operators/bpe.py::bpe_apply_merges) — greedy-overlap
semantics, train→encode roundtrip against a pure-Python reference,
rule validation, and the no-Python / no-join plan claim."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.bpe import (
    bpe_apply_merges, bpe_learn_merges)
from document_extractor_spark.plans import assert_no_python, physical_plan


def _merges(spark, rules):
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(rules)],
        "merge_rank int, s1 string, s2 string")


def _py_encode(text, rules):
    out = []
    for word in text.lower().split():
        syms = list(word)
        for a, b in rules:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out.extend(syms)
    return out


def test_encode_greedy_overlap_semantics(spark):
    """[a,a,a] under (a,a) → [aa,a]; [a,b,a,b] under (a,b) → [ab,ab] —
    the consecutive-pair case a single-separator replace gets wrong."""
    df = spark.createDataFrame(
        [(1, "aaa abab"), (2, "aab ab x")], "doc_id int, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_subwords"], r["encoded"])
           for r in bpe_apply_merges(
               df, _merges(spark, [("a", "a"), ("a", "b")])).collect()}
    assert got[1] == (2, 4, "aa a ab ab")
    assert got[2] == (3, 4, "aa b ab x")


def test_encode_matches_python_reference(spark):
    rules = [("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"),
             ("e", "r"), ("o", "n")]
    texts = ["The thin thing there", "running ringing on the river",
             "", "one Toner   thesis"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string")
    got = {r["doc_id"]: r["encoded"]
           for r in bpe_apply_merges(df, _merges(spark, rules)).collect()}
    for i, t in enumerate(texts):
        assert got[i] == " ".join(_py_encode(t, rules)), t


def test_train_then_encode_roundtrip(spark):
    """Chaining the TRAIN side into the ENCODE side: rules learned from
    a planted corpus segment it back to fully-fused symbols."""
    df = spark.createDataFrame(
        [(i, "aaab aaab ab") for i in range(20)], "doc_id int, text string")
    learned = bpe_learn_merges(df, 5)
    got = bpe_apply_merges(df, learned).collect()[0]
    # merges (a,a),(a,b),(aa,ab) fuse aaab -> aaab, ab -> ab entirely
    assert (got["n_words"], got["n_subwords"]) == (3, 3)
    assert got["encoded"] == "aaab aaab ab"


def test_encode_guards(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id int, text string")
    with pytest.raises(ValueError, match="invalid merge rule"):
        bpe_apply_merges(df, _merges(spark, [("", "b")]))
    with pytest.raises(ValueError, match="invalid merge rule"):
        bpe_apply_merges(df, _merges(spark, [("a\x1f", "b")]))
    # a token containing the separator byte is excluded, not corrupted
    df2 = spark.createDataFrame(
        [(1, "ok a\x1fb ok")], "doc_id int, text string")
    r = bpe_apply_merges(df2, _merges(spark, [("o", "k")])).collect()[0]
    assert (r["n_words"], r["encoded"]) == (2, "ok ok")


def test_encode_plan_no_python_no_join(spark):
    """The merge table is inlined metadata: the corpus pass must be a
    single projection — no Python boundary, no join, no exchange."""
    df = spark.createDataFrame([(1, "ab")], "doc_id int, text string")
    out = bpe_apply_merges(df, _merges(spark, [("a", "b")]))
    assert_no_python(out)
    plan = physical_plan(out)
    assert "Join" not in plan and "Exchange" not in plan
