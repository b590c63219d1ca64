"""HDR log-bucket quantile sketch (operators/sketch.py::hdr_quantiles)
— bounded relative error vs exact percentiles, small-value exactness,
mergeability/partitioning invariance, validation, and plan checks."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.sketch import hdr_quantiles
from document_extractor_spark.plans import assert_no_python


def test_small_values_are_exact(spark):
    """Values below 2^(sub_bits+1) land in singleton buckets, so the
    lower-rank quantile is the exact order statistic."""
    vals = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "key string, v bigint")
    r = hdr_quantiles(df, "key", "v", quantiles=(0.5, 1.0)).collect()[0]
    # rank ceil(0.5*10)=5 -> 5th smallest = 4; q1000 -> max = 9
    assert (r["n_values"], r["q500"], r["q1000"]) == (10, 4, 9)


def test_relative_error_bound(spark):
    """sub_bits=5 → every estimate within 2^-5 ~ 3.2% below the exact
    order statistic (bucket floors round DOWN, never up)."""
    vals = [(i * 37) % 100000 for i in range(5000)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "key string, v bigint")
    got = hdr_quantiles(df, "key", "v",
                        quantiles=(0.5, 0.95, 0.99)).collect()[0]
    sv = sorted(vals)
    import math
    for q, col in ((0.5, "q500"), (0.95, "q950"), (0.99, "q990")):
        exact = sv[math.ceil(q * len(sv)) - 1]
        assert got[col] <= exact, (q, got[col], exact)
        assert got[col] >= exact * (1 - 2 ** -5) - 1, (q, got[col], exact)


def test_partitioning_invariance(spark):
    base = spark.range(4000).select(
        (F.col("id") % 3).cast("string").alias("key"),
        ((F.col("id") * 7919) % 65536).alias("v"))
    outs = []
    for df in (base.coalesce(1), base.repartition(16),
               base.orderBy(F.desc("v")).repartition(5, "v")):
        outs.append(sorted(
            tuple(r) for r in hdr_quantiles(df, "key", "v").collect()))
    assert outs[0] == outs[1] == outs[2]


def test_negatives_and_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("g", -5), ("g", None), ("g", 3), ("g", 1)],
        "key string, v bigint")
    r = hdr_quantiles(df, "key", "v", quantiles=(1.0,)).collect()[0]
    assert (r["n_values"], r["q1000"]) == (2, 3)


def test_validation_and_plan(spark):
    df = spark.createDataFrame([("g", 1)], "key string, v bigint")
    with pytest.raises(ValueError, match="sub_bits"):
        hdr_quantiles(df, "key", "v", sub_bits=0)
    with pytest.raises(ValueError, match="quantiles"):
        hdr_quantiles(df, "key", "v", quantiles=(0.0,))
    assert_no_python(hdr_quantiles(df, "key", "v"))
