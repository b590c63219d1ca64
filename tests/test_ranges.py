"""Range (interval) join semantics (operators/ranges.py) — grid-bucket
equi-join, half-open intervals, bucket-width invariance."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.ranges import range_join
from document_extractor_spark.plans import assert_no_python


def _sides(spark):
    left = spark.createDataFrame(
        [(0, 1), (10, 2), (24, 3), (25, 4), (40, 5), (99, 6)],
        "ts bigint, doc_id bigint")
    right = spark.createDataFrame(
        [(10, 25, "a"),    # half-open: 24 in, 25 out, 10 in
         (20, 60, "b"),    # overlaps a
         (30, 30, "c"),    # empty: matches nothing
         (95, 200, "d")],  # spans many buckets
        "lo bigint, hi bigint, tag string")
    return left, right


EXPECTED = {(10, "a"), (24, "a"), (24, "b"), (25, "b"), (40, "b"),
            (99, "d")}


@pytest.mark.parametrize("width", [1, 7, 25, 1000])
def test_range_join_semantics_invariant_under_bucket_width(spark, width):
    """Result is pure set semantics — the bucket width is a physical
    knob that must never change the answer (or duplicate pairs)."""
    left, right = _sides(spark)
    out = range_join(left, right, left_point="ts", right_lo="lo",
                     right_hi="hi", bucket_width=width)
    rows = [(r["ts"], r["tag"]) for r in out.collect()]
    assert len(rows) == len(set(rows)), "duplicate matched pairs"
    assert set(rows) == EXPECTED


def test_range_join_keyed(spark):
    left = spark.createDataFrame(
        [("h1", 5, 1), ("h2", 5, 2)], "host string, ts bigint, doc_id bigint")
    right = spark.createDataFrame(
        [("h1", 0, 10, "x"), ("h2", 6, 10, "y")],
        "host string, lo bigint, hi bigint, tag string")
    out = range_join(left, right, left_point="ts", right_lo="lo",
                     right_hi="hi", bucket_width=4, key="host")
    assert [(r["host"], r["doc_id"], r["tag"])
            for r in out.collect()] == [("h1", 1, "x")]


def test_range_join_validation(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="positive"):
        range_join(left, right, "ts", "lo", "hi", bucket_width=0)
    with pytest.raises(ValueError, match="collide"):
        range_join(left, right.withColumnRenamed("tag", "doc_id"),
                   "ts", "lo", "hi", bucket_width=10)


def test_range_join_stays_jvm_side(spark):
    left, right = _sides(spark)
    assert_no_python(range_join(left, right, "ts", "lo", "hi",
                                bucket_width=10))


def test_range_join_matches_duckdb(spark):
    """Engine-vs-engine on a seeded random instance, keyed and with
    hostile spans (empty, unit-length, giant)."""
    import random

    import duckdb

    rng = random.Random(7)
    lrows = [(f"k{rng.randrange(4)}", rng.randrange(200), i)
             for i in range(300)]
    rrows = []
    for i in range(60):
        lo = rng.randrange(200)
        rrows.append((f"k{rng.randrange(4)}", lo,
                      lo + rng.choice([0, 1, 3, 17, 150]), i))
    left = spark.createDataFrame(lrows, "host string, ts bigint, doc_id bigint")
    right = spark.createDataFrame(rrows, "host string, lo bigint, hi bigint, rid bigint")
    out = range_join(left, right, left_point="ts", right_lo="lo",
                     right_hi="hi", bucket_width=13, key="host")
    got = sorted((r["doc_id"], r["rid"]) for r in out.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l(host VARCHAR, ts BIGINT, doc_id BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.execute("CREATE TABLE r(host VARCHAR, lo BIGINT, hi BIGINT, rid BIGINT)")
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", rrows)
    want = sorted(tuple(r) for r in con.execute(
        "SELECT l.doc_id, r.rid FROM l JOIN r ON l.host = r.host"
        " AND l.ts >= r.lo AND l.ts < r.hi").fetchall())
    assert got == want


def test_range_join_reserved_names_rejected(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="_cell"):
        range_join(left.withColumn("_cell", left.ts), right,
                   "ts", "lo", "hi", bucket_width=10)


def test_range_join_giant_interval_fails_loudly(spark):
    """A mis-encoded open-ended interval must raise a bounded-cells
    error, not ask sequence() for billions of array elements."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    left, right = _sides(spark)
    bad = right.union(
        right.limit(1).select("lo", "hi", "tag")
        .withColumn("hi", F.lit(2 ** 40).cast("bigint"))
        .select("lo", "hi", "tag"))
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="exceeds"):
        range_join(left, bad, "ts", "lo", "hi", bucket_width=1).collect()


def test_range_join_plans_hash_join_not_nested_loop(spark):
    """The operator's whole point: the physical plan must be a hash
    equi-join on the cell key with the range predicate as a residual,
    never a BroadcastNestedLoopJoin / CartesianProduct."""
    from document_extractor_spark.plans import physical_plan

    left, right = _sides(spark)
    plan = physical_plan(range_join(left, right, "ts", "lo", "hi",
                                    bucket_width=10))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan
