"""As-of join semantics (operators/asof.py) — backward-inclusive,
struct-carried payload, DuckDB-ASOF-equivalent."""

import pytest

from document_extractor_spark.operators.asof import asof_join
from document_extractor_spark.plans import assert_no_python


def _sides(spark):
    left = spark.createDataFrame(
        [("a", 5, 1), ("a", 10, 2), ("a", 15, 3), ("a", 60, 4),
         ("b", 100, 5), ("c", 7, 6)],
        "host string, crawl_ts bigint, doc_id bigint")
    right = spark.createDataFrame(
        [("a", 10, 1, "p0"), ("a", 50, 2, None), ("a", 55, 3, "p2"),
         ("b", 1, 9, "q0")],
        "host string, snap_ts bigint, tier bigint, note string")
    return left, right


def test_asof_join_semantics(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="host",
                    left_ts="crawl_ts", right_ts="snap_ts")
    assert out.columns == ["host", "crawl_ts", "doc_id", "tier", "note"]
    got = {r["doc_id"]: (r["tier"], r["note"]) for r in out.collect()}
    assert got == {
        1: (None, None),   # crawl before first snapshot → no match
        2: (1, "p0"),      # tie: snapshot AT crawl time is visible
        3: (1, "p0"),
        4: (3, "p2"),      # latest of several eligible snapshots
        5: (9, "q0"),
        6: (None, None),   # key with no snapshots at all
    }
    assert out.count() == left.count()


def test_asof_join_null_payload_field_not_skipped(spark):
    """A matched snapshot whose payload FIELD is NULL must surface that
    NULL — a per-column last(ignorenulls) would wrongly resurrect the
    previous snapshot's value."""
    left, right = _sides(spark)
    out = asof_join(left, right.where("snap_ts <= 50"), on="host",
                    left_ts="crawl_ts", right_ts="snap_ts")
    got = {r["doc_id"]: (r["tier"], r["note"]) for r in out.collect()}
    assert got[4] == (2, None)


def test_asof_join_rejects_colliding_payload(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="doc_id"):
        asof_join(left, right.withColumnRenamed("tier", "doc_id"),
                  on="host", left_ts="crawl_ts", right_ts="snap_ts")


def test_asof_join_stays_jvm_side(spark):
    left, right = _sides(spark)
    assert_no_python(asof_join(left, right, on="host",
                               left_ts="crawl_ts", right_ts="snap_ts"))


def test_asof_join_matches_duckdb_native(spark):
    """Engine-vs-engine on a randomized-but-seeded instance: the window
    implementation must agree with DuckDB's native ASOF LEFT JOIN."""
    import random

    import duckdb

    rng = random.Random(42)
    lrows = [(f"k{rng.randrange(6)}", rng.randrange(100), i)
             for i in range(200)]
    # as-of is only well-defined for unique (key, ts) on the right:
    # sample snapshot times without replacement per key
    rrows = [(f"k{k}", t, k * 100 + t, f"v{k}-{t}")
             for k in range(6)
             for t in rng.sample(range(100), 7)]
    left = spark.createDataFrame(
        lrows, "host string, crawl_ts bigint, doc_id bigint")
    right = spark.createDataFrame(
        rrows, "host string, snap_ts bigint, tier bigint, note string")
    out = asof_join(left, right, on="host",
                    left_ts="crawl_ts", right_ts="snap_ts")
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l(host VARCHAR, crawl_ts BIGINT, doc_id BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.execute("CREATE TABLE r(host VARCHAR, snap_ts BIGINT, tier BIGINT,"
                " note VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", rrows)
    want = sorted(tuple(r) for r in con.execute("""
        SELECT l.host, l.crawl_ts, l.doc_id, r.tier, r.note
        FROM l ASOF LEFT JOIN r
          ON l.host = r.host AND l.crawl_ts >= r.snap_ts
    """).fetchall())
    assert len(got) == 200
    assert got == want


def test_asof_join_null_key_and_null_ts_right_rows_match_nothing(spark):
    """SQL semantics, matching the DuckDB oracle: NULL-key or NULL-ts
    snapshot rows never match; a NULL-key LEFT row still returns,
    payload NULL-filled."""
    left = spark.createDataFrame(
        [("a", 5, 1), (None, 7, 2)],
        "host string, crawl_ts bigint, doc_id bigint")
    right = spark.createDataFrame(
        [("a", None, 9, "nullts"), (None, 1, 8, "nullkey")],
        "host string, snap_ts bigint, tier bigint, note string")
    out = asof_join(left, right, on="host",
                    left_ts="crawl_ts", right_ts="snap_ts")
    got = {r["doc_id"]: (r["tier"], r["note"]) for r in out.collect()}
    assert got == {1: (None, None), 2: (None, None)}


def test_asof_join_plans_single_window_no_join(spark):
    """Shape check: the as-of join is union + window carry-forward —
    no join node (a naive range join here would be a nested loop)."""
    from document_extractor_spark.plans import physical_plan

    left, right = _sides(spark)
    plan = physical_plan(asof_join(left, right, on="host",
                                   left_ts="crawl_ts",
                                   right_ts="snap_ts"))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Window" in plan, plan
    assert "Join" not in plan.replace("Window", ""), plan


def test_asof_join_reserved_names_raise(spark):
    """Inputs carrying the synthesized working columns (_ts/_is_right/_r)
    fail fast with a clear ValueError instead of a downstream
    ambiguous-reference AnalysisException."""
    import pytest
    from document_extractor_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("h", 1, 0)], "host string, ts bigint, _ts int")
    right = spark.createDataFrame(
        [("h", 1, "x")], "host string, rts bigint, tier string")
    with pytest.raises(ValueError, match="_ts"):
        asof_join(left, right, on="host", left_ts="ts", right_ts="rts")

    left2 = spark.createDataFrame([("h", 1)], "host string, ts bigint")
    right2 = spark.createDataFrame(
        [("h", 1, "x")], "host string, rts bigint, _r string")
    with pytest.raises(ValueError, match="_r"):
        asof_join(left2, right2, on="host", left_ts="ts", right_ts="rts")
