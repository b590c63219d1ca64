"""Revisit scheduling (operators/frontier.py)."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.frontier import (
    FREQ_SECONDS, revisit_schedule)
from document_extractor_spark.plans import assert_no_python

NOW = 1_780_000_000  # fixed — the operator never reads a wall clock

SCHEMA = "loc string, lastmod string, changefreq string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["loc"]: r for r in
            revisit_schedule(df, now_epoch=NOW, **kw).collect()}


def test_protocol_interval_table(spark):
    rows = [(f, "2026-01-01", f) for f in FREQ_SECONDS]
    got = _run(spark, rows)
    for f, sec in FREQ_SECONDS.items():
        assert got[f]["interval_sec"] == sec
    assert got["always"]["interval_sec"] == 3600   # clamped to hourly


def test_never_and_default_and_unknown(spark):
    got = _run(spark, [
        ("a", "2026-01-01", "never"),
        ("b", "2026-01-01", None),        # absent → default weekly
        ("c", "2026-01-01", "sometimes"), # unrecognized → default
    ])
    assert got["a"]["interval_sec"] is None
    assert got["a"]["next_fetch_epoch"] is None
    assert got["a"]["fetch_due"] is False
    assert got["b"]["interval_sec"] == 604800
    assert got["c"]["interval_sec"] == 604800


def test_due_verdicts_and_epoch_arithmetic(spark):
    got = _run(spark, [
        ("past", "2026-01-01", "daily"),     # long past → due
        ("future", "2026-06-30", "yearly"),  # next fetch in 2027 → not due
        ("unknown", None, "daily"),          # never observed → due now
        ("bad", "not-a-date", "daily"),      # malformed → NULL, due
    ])
    # 2026-01-01T00:00Z = 1767225600; +86400 → well before NOW
    assert got["past"]["next_fetch_epoch"] == 1767225600 + 86400
    assert got["past"]["fetch_due"] is True
    assert got["future"]["fetch_due"] is False
    for loc in ("unknown", "bad"):
        assert got[loc]["next_fetch_epoch"] is None
        assert got[loc]["fetch_due"] is True


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("l", "2026-01-01", "daily")], SCHEMA)
    assert_no_python(revisit_schedule(df, now_epoch=NOW))
