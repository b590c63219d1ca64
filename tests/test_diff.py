"""Snapshot diff (operators/diff.py)."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.diff import snapshot_diff
from document_extractor_spark.plans import assert_no_python


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("a", "same"), ("b", "v1"), ("c", "gone"), ("n1", None),
         ("n2", None)],
        "url string, text string")
    new = spark.createDataFrame(
        [("a", "same"), ("b", "v2"), ("d", "fresh"), ("n1", None),
         ("n2", "now has text")],
        "url string, text string")
    got = {r["url"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {
        "a": "unchanged",
        "b": "changed",
        "c": "removed",
        "d": "added",
        "n1": "unchanged",   # NULL text both sides: null-safe equal
        "n2": "changed",     # NULL -> text
    }
    assert_no_python(snapshot_diff(old, new))


def test_snapshot_diff_payload_not_shuffled(spark):
    """The compare runs over (key, fingerprint) projections — the text
    column must not appear in any exchange."""
    from document_extractor_spark.plans import physical_plan

    old = spark.createDataFrame([("a", "x" * 10)], "url string, text string")
    new = spark.createDataFrame([("a", "y" * 10)], "url string, text string")
    plan = physical_plan(snapshot_diff(old, new))
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
