"""Revisit scheduling (operators/frontier.py)."""

import pytest
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


# ---------------------------------------------------------------------------
# change_rate_estimates (Cho & Garcia-Molina)
# ---------------------------------------------------------------------------


def test_change_rate_counts_and_estimator(spark):
    import math

    from document_extractor_spark.operators.frontier import (
        change_rate_estimates)

    rows = [
        # u1: 4 captures, digests a a b b → 1 change over 3 pairs,
        # span 300s
        ("u1", 1000, "a"), ("u1", 1100, "a"),
        ("u1", 1200, "b"), ("u1", 1300, "b"),
        # u2: 3 captures, never changes → rate exactly 0, revisit NULL
        ("u2", 50, "x"), ("u2", 150, "x"), ("u2", 250, "x"),
        # u3: single capture → nothing observable
        ("u3", 10, "z"),
        # u4: changes EVERY gap (2 pairs, 2 changes)
        ("u4", 0, "p"), ("u4", 60, "q"), ("u4", 120, "r"),
    ]
    df = spark.createDataFrame(
        rows, "url string, ts_epoch bigint, digest string")
    got = {r["url"]: r for r in change_rate_estimates(df).collect()}

    r1 = got["u1"]
    assert (r1["n_captures"], r1["n_changed"], r1["span_sec"]) == (4, 1, 300)
    want = round(-math.log((3 - 1 + 0.5) / (3 + 0.5)), 9)
    assert abs(r1["change_rate"] - want) < 1e-12
    # expected seconds per change: (300/3) / r
    assert r1["revisit_interval_sec"] == int((300 / 3) / want)

    r2 = got["u2"]
    assert r2["n_changed"] == 0 and r2["change_rate"] == 0.0
    assert r2["revisit_interval_sec"] is None

    r3 = got["u3"]
    assert r3["n_captures"] == 1 and r3["change_rate"] is None
    assert r3["revisit_interval_sec"] is None

    r4 = got["u4"]
    assert (r4["n_changed"], r4["span_sec"]) == (2, 120)
    want4 = round(-math.log(0.5 / 2.5), 9)
    assert abs(r4["change_rate"] - want4) < 1e-12


def test_change_rate_null_digest_semantics(spark):
    """NULL digests are data: NULL vs NULL is no change, NULL vs a
    digest is a change — null-safe comparison, and a url whose FIRST
    capture has a NULL digest must not count a phantom pair."""
    from document_extractor_spark.operators.frontier import (
        change_rate_estimates)

    rows = [
        ("n1", 0, None), ("n1", 10, None),          # no change
        ("n2", 0, None), ("n2", 10, "a"),           # change
        ("n3", 0, "a"), ("n3", 10, None), ("n3", 20, "a"),  # 2 changes
    ]
    df = spark.createDataFrame(
        rows, "url string, ts_epoch bigint, digest string")
    got = {r["url"]: r["n_changed"]
           for r in change_rate_estimates(df).collect()}
    assert got == {"n1": 0, "n2": 1, "n3": 2}


def test_change_rate_plan_is_jvm_only(spark):
    from document_extractor_spark.operators.frontier import (
        change_rate_estimates)
    from document_extractor_spark.plans import assert_no_python

    df = spark.createDataFrame(
        [("u", 0, "d")], "url string, ts_epoch bigint, digest string")
    assert_no_python(change_rate_estimates(df))


def test_apportion_sums_exactly_and_matches_python(spark):
    from document_extractor_spark.operators.frontier import (
        apportion_budget)

    rows = [(f"h{i:02d}", (i * 37) % 101) for i in range(40)]
    budget = 1000
    got = {r["host"]: r["quota"]
           for r in apportion_budget(
               spark.createDataFrame(rows, "host string, score bigint"),
               budget).collect()}
    total = sum(s for _, s in rows)
    base = {h: s * budget // total for h, s in rows}
    rem = {h: s * budget % total for h, s in rows}
    leftover = budget - sum(base.values())
    extras = set(
        h for h, _ in sorted(rows, key=lambda p: (-rem[p[0]], p[0]))
        [:leftover])
    want = {h: base[h] + (1 if h in extras else 0) for h, _ in rows}
    assert got == want
    assert sum(got.values()) == budget


def test_apportion_edge_cases(spark):
    from document_extractor_spark.operators.frontier import (
        apportion_budget)

    df = spark.createDataFrame(
        [("a", 0), ("b", 0)], "host string, score bigint")
    # zero budget over zero scores is fine; nonzero budget is not
    assert {r["quota"] for r in apportion_budget(df, 0).collect()} == {0}
    with pytest.raises(ValueError, match="all scores are zero"):
        apportion_budget(df, 10)
    with pytest.raises(ValueError, match="non-negative"):
        apportion_budget(spark.createDataFrame(
            [("a", -1)], "host string, score bigint"), 10)
    with pytest.raises(ValueError, match="budget"):
        apportion_budget(df, -1)


def test_apportion_plan_no_global_window(spark):
    """The top-leftover selection must be a TakeOrdered heap, not a
    single-partition global window."""
    from document_extractor_spark.operators.frontier import (
        apportion_budget)
    from document_extractor_spark.plans import physical_plan

    df = spark.createDataFrame(
        [(f"h{i}", i + 1) for i in range(10)], "host string, score bigint")
    out = apportion_budget(df, 57)
    plan = physical_plan(out)
    assert "TakeOrdered" in plan
    assert "Window" not in plan
    assert sum(r["quota"] for r in out.collect()) == 57


def test_sitemap_coverage_counts(spark):
    from document_extractor_spark.operators.frontier import (
        sitemap_coverage)

    declared = spark.createDataFrame(
        [("https://a.example.org/1",),
         ("https://a.example.org/2",),
         ("https://a.example.org/2",),          # duplicate declaration
         ("https://A.example.org/3",),          # host case-folds to a.
         ("https://b.example.org/1",),
         (None,)],
        "loc string")
    crawled = spark.createDataFrame(
        [("https://a.example.org/1",),
         ("https://a.example.org/1",),          # re-fetch: still one url
         ("https://b.example.org/1",),
         ("https://b.example.org/extra",)],     # crawled-only: ignored
        "url string")
    got = {r["host"]: (r["n_declared"], r["n_crawled_of_declared"],
                       r["coverage_ppm"])
           for r in sitemap_coverage(declared, crawled).collect()}
    assert got == {
        "a.example.org": (3, 1, 333333),
        "b.example.org": (1, 1, 1000000),
    }


def test_sitemap_coverage_plan_jvm_only(spark):
    from document_extractor_spark.operators.frontier import (
        sitemap_coverage)
    from document_extractor_spark.plans import assert_no_python

    d = spark.createDataFrame([("https://a/x",)], "loc string")
    c = spark.createDataFrame([("https://a/x",)], "url string")
    assert_no_python(sitemap_coverage(d, c))
