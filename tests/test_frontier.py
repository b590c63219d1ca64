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


# --- politeness scheduling ---------------------------------------------------

from document_extractor_spark.operators.frontier import politeness_schedule


def _sched(spark, urls, delays):
    plan = spark.createDataFrame([(u,) for u in urls], "url string")
    d = spark.createDataFrame(delays, "host string, delay_ms bigint")
    return {r["url"]: r for r in politeness_schedule(plan, d).collect()}


def test_slots_serialize_per_host_and_default_delay(spark):
    got = _sched(
        spark,
        ["https://a.org/1", "https://a.org/2", "https://a.org/3",
         "https://b.org/x", "https://nodelay.org/y"],
        [("a.org", 1000), ("b.org", 50)])
    # a.org lane: url-ordered slots 0, 1000, 2000; drain 3000
    assert [got[f"https://a.org/{i}"]["slot_ms"] for i in (1, 2, 3)] \
        == [0, 1000, 2000]
    assert got["https://a.org/1"]["host_drain_ms"] == 3000
    assert got["https://b.org/x"]["slot_ms"] == 0
    assert got["https://b.org/x"]["host_drain_ms"] == 50
    # missing host → default 250
    assert got["https://nodelay.org/y"]["delay_ms"] == 250
    assert got["https://nodelay.org/y"]["host_drain_ms"] == 250


def test_ported_host_and_unparseable(spark):
    got = _sched(spark, ["https://a.org:8080/p", "junk"],
                 [("a.org", 100)])
    assert got["https://a.org:8080/p"]["host"] == "a.org"   # port stripped
    assert got["https://a.org:8080/p"]["delay_ms"] == 100
    assert got["junk"]["host"] is None                      # NULL lane


def test_politeness_plan_jvm_only(spark):
    from document_extractor_spark.plans import assert_no_python
    plan = spark.createDataFrame([("https://a.org/1",)], "url string")
    d = spark.createDataFrame([("a.org", 10)], "host string, delay_ms bigint")
    assert_no_python(politeness_schedule(plan, d))
