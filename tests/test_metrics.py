"""Exact ROC-AUC (operators/metrics.py) vs sklearn-free references."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.metrics import roc_auc
from document_extractor_spark.plans import assert_no_python


def _auc(spark, pairs, parts=4):
    df = spark.createDataFrame(pairs, "score double, label int") \
        .repartition(parts)
    return roc_auc(df).collect()[0]


def _brute(pairs):
    pos = [s for s, l in pairs if l == 1 and s is not None]
    neg = [s for s, l in pairs if l == 0 and s is not None]
    won2 = sum(2 if p > n else (1 if p == n else 0)
               for p in pos for n in neg)
    return won2 / (2 * len(pos) * len(neg))


def test_perfect_random_and_inverted(spark):
    perfect = [(float(s), 1 if s >= 5 else 0) for s in range(10)]
    assert _auc(spark, perfect)["auc"] == 1.0
    inverted = [(float(s), 0 if s >= 5 else 1) for s in range(10)]
    assert _auc(spark, inverted)["auc"] == 0.0
    # all scores tied → every pair is a half-win → 0.5 exactly
    tied = [(1.0, i % 2) for i in range(20)]
    assert _auc(spark, tied)["auc"] == 0.5


def test_matches_brute_force_with_ties(spark):
    pairs = [(float((i * 7) % 5), 1 if (i * 13) % 3 == 0 else 0)
             for i in range(60)]
    got = _auc(spark, pairs)
    assert got["auc"] == _brute(pairs)
    assert got["n_pos"] == sum(1 for _, l in pairs if l == 1)
    # partition invariance
    assert _auc(spark, pairs, parts=1) == got


def test_null_rows_excluded_and_degenerate_null_auc(spark):
    pairs = [(1.0, 1), (0.0, 0), (None, 1), (5.0, None)]
    got = _auc(spark, pairs)
    assert (got["n_pos"], got["n_neg"], got["auc"]) == (1, 1, 1.0)
    only_pos = [(1.0, 1), (2.0, 1)]
    assert _auc(spark, only_pos)["auc"] is None


def test_plan_jvm_only(spark):
    df = spark.createDataFrame([(1.0, 1)], "score double, label int")
    assert_no_python(roc_auc(df))


# --- calibration buckets -------------------------------------------------------

import pytest

from document_extractor_spark.operators.metrics import calibration_buckets


def test_calibration_bucket_edges_clamp_and_rates(spark):
    rows = [(0.05, 0), (0.05, 1), (0.95, 1), (0.95, 1),
            (1.7, 1),            # above hi → clamps into top bucket
            (-0.3, 0),           # below lo → clamps into bottom bucket
            (None, 1), (0.5, None)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bucket"]: r for r in calibration_buckets(df).collect()}
    assert (got[0]["n"], got[0]["n_pos"]) == (3, 1)      # two 0.05 + clamp
    assert got[0]["pos_ppm"] == 1_000_000 // 3
    assert (got[9]["n"], got[9]["n_pos"], got[9]["pos_ppm"]) == (
        3, 3, 1_000_000)
    assert set(got) == {0, 9}                            # empty bins absent


def test_calibration_guards_and_plan(spark):
    from document_extractor_spark.plans import assert_no_python
    df = spark.createDataFrame([(0.5, 1)], "score double, label int")
    with pytest.raises(ValueError, match="n_buckets"):
        calibration_buckets(df, n_buckets=0)
    with pytest.raises(ValueError, match="range"):
        calibration_buckets(df, lo=1.0, hi=1.0)
    assert_no_python(calibration_buckets(df))


def test_wilson_lower_bound_ranking_fix(spark):
    """2/2 must NOT outrank 180/200 — the whole point of the bound."""
    from document_extractor_spark.operators.metrics import wilson_lower_bound

    rows = ([("tiny", True)] * 2
            + [("big", True)] * 180 + [("big", False)] * 20
            + [("nulls", True), ("nulls", None)])
    df = spark.createDataFrame(rows, "host string, good boolean")
    got = {r["group"]: r for r in
           wilson_lower_bound(df, "host", "good").collect()}
    assert got["tiny"]["n"] == 2 and got["tiny"]["n_pos"] == 2
    assert got["big"]["wilson_lb"] > got["tiny"]["wilson_lb"]
    # NULL verdicts excluded, not counted as failures
    assert got["nulls"]["n"] == 1 and got["nulls"]["n_pos"] == 1
    # closed form for tiny: p=1, n=2
    import math
    z = 1.959963984540054
    n, p = 2.0, 1.0
    lb = (p + z * z / (2 * n)
          - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) \
        / (1 + z * z / n)
    assert abs(got["tiny"]["wilson_lb"] - round(lb, 6)) < 1e-12


def test_classification_prf_exact_and_degenerate(spark):
    from document_extractor_spark.operators.metrics import classification_prf

    rows = [(True, True)] * 3 + [(True, False)] * 1 + [(False, True)] * 2 \
        + [(False, False)] * 4 + [(None, True), (True, None)]
    df = spark.createDataFrame(rows, "pred boolean, gold boolean")
    r = classification_prf(df, "pred", "gold").collect()[0]
    assert (r["n"], r["tp"], r["fp"], r["fn"]) == (10, 3, 1, 2)
    assert r["precision_ppm"] == 750000
    assert r["recall_ppm"] == 600000
    assert r["f1_ppm"] == (2 * 3 * 1000000) // (2 * 3 + 1 + 2)
    # degenerate: nothing predicted positive → -1 sentinel, not NULL
    neg = spark.createDataFrame([(False, False)], "pred boolean, gold boolean")
    r2 = classification_prf(neg, "pred", "gold").collect()[0]
    assert (r2["precision_ppm"], r2["recall_ppm"], r2["f1_ppm"]) == (-1, -1, -1)


# ---------------------------------------------------------------------------
# ndcg_at_k
# ---------------------------------------------------------------------------


def _ndcg_rows(spark, rows):
    return spark.createDataFrame(
        rows, "query_id int, doc_id string, score double, relevance int")


def test_ndcg_hand_computed(spark):
    """q1: ranking puts rel=1 first, rel=3 second, rel=0 third —
    DCG = 1/log2(2) + 7/log2(3) + 0; IDCG = 7/log2(2) + 1/log2(3)."""
    import math

    from document_extractor_spark.operators.metrics import ndcg_at_k

    rows = [(1, "a", 0.9, 1), (1, "b", 0.8, 3), (1, "c", 0.7, 0)]
    got = ndcg_at_k(_ndcg_rows(spark, rows), k=10).collect()[0]
    dcg = round(1 / math.log2(2) * 1e9) + round(7 / math.log2(3) * 1e9)
    idcg = round(7 / math.log2(2) * 1e9) + round(1 / math.log2(3) * 1e9)
    assert got["dcg_nano"] == dcg
    assert got["idcg_nano"] == idcg
    assert got["ndcg"] == round(dcg / idcg, 6)


def test_ndcg_perfect_ranking_is_one_and_k_cuts(spark):
    from document_extractor_spark.operators.metrics import ndcg_at_k

    rows = [(1, "a", 0.9, 3), (1, "b", 0.8, 2), (1, "c", 0.7, 1),
            (1, "d", 0.6, 0)]
    assert ndcg_at_k(_ndcg_rows(spark, rows), k=10) \
        .collect()[0]["ndcg"] == 1.0
    # k=1: only the top doc counts on both sides — still perfect
    assert ndcg_at_k(_ndcg_rows(spark, rows), k=1) \
        .collect()[0]["ndcg"] == 1.0
    # reversed scores at k=1: top-ranked doc has rel 0 → ndcg 0
    rev = [(1, "a", 0.9, 0), (1, "b", 0.8, 3)]
    assert ndcg_at_k(_ndcg_rows(spark, rev), k=1) \
        .collect()[0]["ndcg"] == 0.0


def test_ndcg_zero_relevance_is_null_and_tie_break(spark):
    import pytest as _pytest

    from document_extractor_spark.operators.metrics import ndcg_at_k

    rows = [(1, "a", 0.9, 0), (1, "b", 0.8, 0)]
    assert ndcg_at_k(_ndcg_rows(spark, rows)).collect()[0]["ndcg"] is None
    # score tie: doc ASC wins the rank — 'a' (rel 3) ranks first
    tie = [(2, "b", 0.5, 0), (2, "a", 0.5, 3)]
    assert ndcg_at_k(_ndcg_rows(spark, tie)).collect()[0]["ndcg"] == 1.0
    with _pytest.raises(ValueError, match="k must"):
        ndcg_at_k(_ndcg_rows(spark, rows), k=0)
