"""KMV set algebra (operators/sketch.py::kmv_overlap) — exactness
below k, estimator accuracy, partitioning invariance, and agreement
with a pure-Python recompute of the documented sketch algebra."""

import hashlib

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.sketch import kmv_overlap
from document_extractor_spark.plans import assert_vectorized_python_only


def _py_overlap(va, vb, k):
    ha = sorted(hashlib.md5(str(v).encode()).hexdigest() for v in set(va))
    hb = sorted(hashlib.md5(str(v).encode()).hexdigest() for v in set(vb))
    sa, sb = set(ha[:k]), set(hb[:k])
    ku = sorted(sa | sb)[:k]
    n_union, n_both = len(ku), sum(1 for h in ku if h in sa and h in sb)

    def est(s):
        s = sorted(s)
        if len(s) < k:
            return len(s)
        return int((k - 1) / (int(s[-1][:12], 16) / 16 ** 12))

    e_u = est(ku)
    return (n_union, n_both, est(sa), est(sb), e_u,
            n_both * e_u // n_union if n_union else 0,
            1000 * n_both // n_union if n_union else 0)


def _df(spark, vals, parts=4):
    return spark.createDataFrame(
        [(v,) for v in vals], "url string").repartition(parts)


def test_overlap_exact_below_k(spark):
    a = [f"u{i}" for i in range(30)]
    b = [f"u{i}" for i in range(20, 50)]
    row = kmv_overlap(_df(spark, a * 2), _df(spark, b), "url", k=64) \
        .collect()[0]
    assert (row["n_union"], row["n_both"]) == (50, 10)
    assert (row["est_a"], row["est_b"]) == (30, 30)
    assert row["est_union"] == 50
    assert row["est_intersection"] == 10
    assert row["jaccard_milli"] == 200


def test_overlap_matches_python_recompute(spark):
    va = [f"url-{i}" for i in range(800)]
    vb = [f"url-{i}" for i in range(400, 1400)]
    row = kmv_overlap(_df(spark, va), _df(spark, vb), "url", k=64) \
        .collect()[0]
    assert tuple(row) == _py_overlap(va, vb, 64)


def test_overlap_estimator_accuracy(spark):
    """true |A∩B|=400, |A∪B|=1400, J=0.286: k=256 keeps relative error
    on the Jaccard estimate inside ~3/sqrt(k) ≈ 19%."""
    va = [f"url-{i}" for i in range(800)]
    vb = [f"url-{i}" for i in range(400, 1400)]
    row = kmv_overlap(_df(spark, va), _df(spark, vb), "url", k=256) \
        .collect()[0]
    assert abs(row["jaccard_milli"] - 286) / 286 < 0.19
    assert abs(row["est_intersection"] - 400) / 400 < 0.30
    assert abs(row["est_union"] - 1400) / 1400 < 0.20


def test_overlap_partitioning_invariance(spark):
    va = [f"a{i}" for i in range(500)]
    vb = [f"a{i}" for i in range(250, 700)]
    rows = [
        tuple(kmv_overlap(_df(spark, va, p), _df(spark, vb, 9 - p),
                          "url", k=32).collect()[0])
        for p in (1, 4, 8)
    ]
    assert rows[0] == rows[1] == rows[2]


def test_overlap_empty_and_disjoint(spark):
    empty = _df(spark, [])
    some = _df(spark, ["x", "y"])
    r0 = kmv_overlap(empty, empty, "url", k=8).collect()[0]
    assert tuple(r0) == (0, 0, 0, 0, 0, 0, 0)
    r1 = kmv_overlap(some, _df(spark, ["z"]), "url", k=8).collect()[0]
    assert (r1["n_union"], r1["n_both"], r1["jaccard_milli"]) == (3, 0, 0)
    assert r1["est_intersection"] == 0


def test_overlap_validation_and_plan(spark):
    df = _df(spark, ["x"])
    with pytest.raises(ValueError, match="at least 2"):
        kmv_overlap(df, df, "url", k=1)
    assert_vectorized_python_only(kmv_overlap(df, df, "url", k=8))
