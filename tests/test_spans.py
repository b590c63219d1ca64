"""ExactSubstr duplicate-span detection / removal (operators/spans.py)."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.spans import (
    drop_duplicate_spans,
    duplicate_spans,
)

SHARED = " ".join(f"s{j}" for j in range(10))


def _doc(i, with_shared=True):
    pre = " ".join(f"d{i}w{j}" for j in range(10))
    post = " ".join(f"d{i}x{j}" for j in range(10))
    return f"{pre} {SHARED} {post}" if with_shared else f"{pre} {post}"


def test_duplicate_spans_basic_and_winner(spark):
    """Docs sharing a 10-token run report the maximal merged span
    [10, 20) on every copy EXCEPT the smallest (id, start); a doc
    without the run reports nothing."""
    df = spark.createDataFrame(
        [(1, _doc(1)), (2, _doc(2)), (3, _doc(3, False)), (4, _doc(4))],
        "doc_id bigint, text string")
    got = sorted((r.doc_id, r.span_start, r.span_end)
                 for r in duplicate_spans(df, min_tokens=8).collect())
    assert got == [(2, 10, 20), (4, 10, 20)]


def test_duplicate_spans_below_threshold(spark):
    """A shared run shorter than min_tokens is below the detection
    floor — no window fits inside it."""
    short = " ".join(f"s{j}" for j in range(7))
    df = spark.createDataFrame(
        [(1, f"a1 b1 {short} c1"), (2, f"a2 b2 {short} c2")],
        "doc_id bigint, text string")
    assert duplicate_spans(df, min_tokens=8).collect() == []


def test_duplicate_spans_intra_doc_repetition(spark):
    """A run repeated INSIDE one document keeps only its first
    occurrence: the second copy is reported even with no other doc."""
    df = spark.createDataFrame(
        [(1, f"{SHARED} u0 u1 u2 {SHARED}")],
        "doc_id bigint, text string")
    got = [(r.span_start, r.span_end)
           for r in duplicate_spans(df, min_tokens=8).collect()]
    assert got == [(13, 23)]


def test_duplicate_spans_disjoint_runs_stay_separate_islands(spark):
    """Two shared runs separated by doc-unique tokens produce two
    spans, not one merged one (windows crossing the gap are unique)."""
    other = " ".join(f"u{j}" for j in range(10))
    df = spark.createDataFrame(
        [(1, f"{SHARED} gap1a gap1b {other}"),
         (2, f"{SHARED} gap2a gap2b {other}")],
        "doc_id bigint, text string")
    got = sorted((r.doc_id, r.span_start, r.span_end)
                 for r in duplicate_spans(df, min_tokens=8).collect())
    # doc 2 loses both runs: [0,10) and [12,22)
    assert got == [(2, 0, 10), (2, 12, 22)]


def test_drop_duplicate_spans_rewrite_and_idempotence(spark):
    """Non-first copies lose exactly the span tokens; winners and
    clean docs come back byte-identical; a second pass is a no-op
    (the run survives only in the winner)."""
    df = spark.createDataFrame(
        [(1, _doc(1)), (2, _doc(2)), (3, _doc(3, False))],
        "doc_id bigint, text string")
    out = {r.doc_id: r.text
           for r in drop_duplicate_spans(df, min_tokens=8).collect()}
    assert out[1] == _doc(1)
    assert out[2] == _doc(2, False)
    assert out[3] == _doc(3, False)
    again = drop_duplicate_spans(
        spark.createDataFrame([(k, v) for k, v in out.items()],
                              "doc_id bigint, text string"),
        min_tokens=8)
    assert {r.doc_id: r.text for r in again.collect()} == out


def test_duplicate_spans_narrow_decision_path(spark):
    """Token text must never ride a hash-keyed exchange: the duplicate
    decision runs on (id, start, h) rows only."""
    from document_extractor_spark.plans import physical_plan

    df = spark.createDataFrame([(1, _doc(1))], "doc_id bigint, text string")
    plan = physical_plan(duplicate_spans(df))
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line and "_toks" not in line, line


def test_duplicate_spans_hostile_inputs(spark):
    """NULL text, empty text, and single-token docs survive (no rows,
    no task failure)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one"), (4, "   ")],
        "doc_id bigint, text string")
    assert duplicate_spans(df).collect() == []
    out = {r.doc_id: r.text for r in drop_duplicate_spans(df).collect()}
    assert out == {1: None, 2: "", 3: "one", 4: ""}
