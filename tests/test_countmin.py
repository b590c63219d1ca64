"""Count-Min sketch (operators/countmin.py): one-sided error guarantee,
mergeability, partitioning-invariance, hostile inputs."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.countmin import (
    count_min_build,
    count_min_estimate,
)

DEPTH, WIDTH = 3, 8


def _vals(spark, values, parts=1):
    return spark.createDataFrame(
        [(v,) for v in values], "v string").repartition(parts)


def test_one_sided_guarantee_and_row_mass(spark):
    values = (["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 7
              + list("abcdefghij"))
    df = _vals(spark, values, parts=4)
    sketch = count_min_build(df, "v", depth=DEPTH, width=WIDTH)
    # every row of the sketch holds the full multiset mass
    masses = {r["row"]: r["m"] for r in
              sketch.groupBy("row").agg(F.sum("cnt").alias("m")).collect()}
    assert masses == {i: len(values) for i in range(DEPTH)}
    keys = _vals(spark, sorted(set(values)) + ["absent"], parts=1)
    est = {r["key"]: r["est"] for r in count_min_estimate(
        sketch, keys, "v", depth=DEPTH, width=WIDTH).collect()}
    from collections import Counter
    exact = Counter(values)
    for k, e in est.items():
        assert e >= exact.get(k, 0), (k, e, exact.get(k, 0))
        # epsilon bound: est <= exact + N (trivially) and, for the
        # dominant key, collisions can add at most the rest of the mass
        assert e <= exact.get(k, 0) + (len(values) - exact.get(k, 0))


def test_merge_and_partitioning_invariance(spark):
    values = [f"k{i % 13}" for i in range(200)]
    whole = count_min_build(_vals(spark, values, parts=7), "v",
                            depth=DEPTH, width=WIDTH)
    half_a = count_min_build(_vals(spark, values[:90], parts=2), "v",
                             depth=DEPTH, width=WIDTH)
    half_b = count_min_build(_vals(spark, values[90:], parts=5), "v",
                             depth=DEPTH, width=WIDTH)
    merged = (half_a.unionByName(half_b).groupBy("row", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    w = {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert w == m


def test_nulls_ignored_and_bad_params(spark):
    df = spark.createDataFrame([("x",), (None,), ("x",)], "v string")
    sketch = count_min_build(df, "v", depth=2, width=4)
    total = sketch.groupBy("row").agg(F.sum("cnt").alias("m")).collect()
    assert all(r["m"] == 2 for r in total)
    with pytest.raises(ValueError):
        count_min_build(df, "v", depth=0, width=4)
    with pytest.raises(ValueError):
        count_min_build(df, "v", depth=2, width=1)
