"""Passage chunking (operators/chunking.py)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.chunking import chunk_passages
from document_extractor_spark.plans import assert_no_python, physical_plan


def _chunks(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    out = {}
    for r in chunk_passages(df, **kw).collect():
        out.setdefault(r["doc_id"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["chunk_id"])
    return out


def test_windows_overlap_and_tail(spark):
    text = " ".join(f"t{i}" for i in range(10))      # 10 tokens
    got = _chunks(spark, [text], chunk_tokens=4, overlap=1)[0]
    # stride 3 → starts 0,3,6,9
    assert [r["chunk_id"] for r in got] == [0, 1, 2, 3]
    assert got[0]["chunk_text"] == "t0 t1 t2 t3"
    assert got[1]["chunk_text"] == "t3 t4 t5 t6"      # 1-token overlap
    assert got[2]["chunk_text"] == "t6 t7 t8 t9"
    assert got[3]["chunk_text"] == "t9"               # short tail
    assert [r["n_tokens"] for r in got] == [4, 4, 4, 1]
    # every token covered
    covered = {t for r in got for t in r["chunk_text"].split()}
    assert covered == {f"t{i}" for i in range(10)}


def test_whitespace_normalization_and_empty_docs(spark):
    got = _chunks(spark, ["  a \n\n b\tc  ", "", "   ", None],
                  chunk_tokens=2, overlap=0)
    assert [r["chunk_text"] for r in got[0]] == ["a b", "c"]
    assert set(got) == {0}                            # empties emit no rows


def test_guards(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_passages(df, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_passages(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="clash"):
        chunk_passages(df.withColumn("chunk_id", F.lit(1)))


def test_plan_no_python_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    out = chunk_passages(df)
    assert_no_python(out)
    assert "Exchange" not in physical_plan(out)       # narrow end to end
