"""KMV distinct-count sketch (operators/sketch.py) — exactness below k,
estimator accuracy, partitioning invariance (the mergeability claim)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.sketch import kmv_distinct
from document_extractor_spark.plans import assert_vectorized_python_only


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", None), ("b", 1)],
        "key string, v bigint")
    got = {r["key"]: (r["n_kept"], r["est_distinct"])
           for r in kmv_distinct(df, "key", "v", k=16).collect()}
    # NULLs ignored like count(DISTINCT v)
    assert got == {"a": (7, 7), "b": (1, 1)}


def test_kmv_estimate_within_tolerance(spark):
    """5000 true distinct at k=128: the (k-1)/frac estimator's relative
    error should be well inside 3/sqrt(k) ~ 27%."""
    df = spark.range(20000).select(
        F.lit("g").alias("key"), (F.col("id") % 5000).alias("v"))
    r = kmv_distinct(df, "key", "v", k=128).collect()[0]
    assert r["n_kept"] == 128
    assert abs(r["est_distinct"] - 5000) / 5000 < 0.27


def test_kmv_partitioning_invariance(spark):
    """The semilattice claim: 1-partition and 16-partition runs (and a
    shuffled row order) produce byte-identical sketches."""
    base = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("key"),
        (F.col("id") % 997).alias("v"))
    outs = []
    for df in (base.coalesce(1), base.repartition(16),
               base.orderBy(F.desc("v")).repartition(5, "v")):
        outs.append(sorted(
            tuple(r) for r in kmv_distinct(df, "key", "v", k=32).collect()))
    assert outs[0] == outs[1] == outs[2]


def test_kmv_validation_and_plan(spark):
    df = spark.createDataFrame([("a", 1)], "key string, v bigint")
    with pytest.raises(ValueError, match="at least 2"):
        kmv_distinct(df, "key", "v", k=1)
    # the only Python in the plan is the vectorized partial-sketch pass
    assert_vectorized_python_only(kmv_distinct(df, "key", "v", k=8))


def test_kmv_null_key_is_a_group(spark):
    """NULL keys group together (SQL GROUP BY semantics), not dropped."""
    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("a", 3)], "key string, v bigint")
    got = {r["key"]: r["est_distinct"]
           for r in kmv_distinct(df, "key", "v", k=8).collect()}
    assert got == {None: 2, "a": 1}
