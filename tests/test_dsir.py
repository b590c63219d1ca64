"""DSIR importance-resampling selection (operators/dsir.py): planted
target-domain recovery, numpy ground-truth parity for the estimator,
determinism under repartitioning, no-evidence rows, and the
no-per-row-Python plan invariant."""

import math

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.dsir import (
    NANO,
    dsir_scores,
    dsir_select,
)
from document_extractor_spark.plans import assert_vectorized_python_only

# Two vocabularies with zero overlap: "sports" target vs "finance" noise.
_SPORT = "goal match striker keeper league cup pitch referee corner penalty"
_FIN = "bond yield equity margin ledger audit broker dividend hedge coupon"


def _corpus(spark):
    rows = []
    for i in range(30):
        v = _SPORT if i < 10 else _FIN
        words = v.split()
        text = " ".join(words[(i + j) % len(words)] for j in range(40))
        rows.append((i, text))
    rows.append((98, ""))        # no features
    rows.append((99, "   "))     # whitespace only
    return spark.createDataFrame(rows, "doc_id long, text string")


def _target(spark):
    words = _SPORT.split()
    rows = [(1000 + i, " ".join(words[(2 * i + j) % len(words)]
                                for j in range(25))) for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_select_recovers_target_domain(spark):
    docs, tgt = _corpus(spark), _target(spark)
    sel = dsir_select(docs, tgt, k=10, n_buckets=512)
    got = {r.doc_id for r in sel.collect()}
    assert got == set(range(10)), got  # exactly the sports docs


def test_dsir_scores_match_numpy_ground_truth(spark):
    """Recompute λ and one document's score in pure Python from the same
    md5 bucketing — the estimator itself, not just its determinism."""
    import hashlib
    from collections import Counter

    docs, tgt = _corpus(spark), _target(spark)
    B = 512

    def feats(text):
        tk = [t for t in text.strip().lower().split() if t]
        fs = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        return [
            int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B for f in fs
        ]

    raw_rows = {r.doc_id: r.text for r in docs.collect()}
    raw = Counter()
    per_doc = {}
    for i, text in raw_rows.items():
        bs = Counter(feats(text))
        per_doc[i] = bs
        raw.update(bs)
    tcnt = Counter()
    for r in tgt.collect():
        tcnt.update(feats(r.text))
    R, T = sum(raw.values()), sum(tcnt.values())
    lam = {
        b: round(
            math.log(
                ((tcnt.get(b, 0) + 1) * (R + B)) / ((rb + 1) * (T + B))
            ) * NANO
        )
        for b, rb in raw.items()
    }
    expect = {
        i: sum(n * lam[b] for b, n in bs.items())
        for i, bs in per_doc.items() if bs
    }
    got = {
        r.doc_id: r.log_w_nano
        for r in dsir_scores(docs, tgt, n_buckets=B).collect()
        if r.log_w_nano is not None
    }
    assert got == expect


def test_dsir_no_evidence_rows_score_null_and_sort_last(spark):
    docs, tgt = _corpus(spark), _target(spark)
    s = {r.doc_id: r for r in dsir_scores(docs, tgt, n_buckets=512).collect()}
    assert s[98].n_features == 0 and s[98].log_w_nano is None
    assert s[99].n_features == 0 and s[99].log_w_nano is None
    sel = dsir_select(docs, tgt, k=32, n_buckets=512)
    picked = [r.doc_id for r in sel.collect()]
    assert set(picked[-2:]) == {98, 99}  # unscored rows come last
    # and a k that fits inside the scored rows never admits them
    sel30 = {r.doc_id for r in dsir_select(docs, tgt, k=30,
                                           n_buckets=512).collect()}
    assert not sel30 & {98, 99}


def test_dsir_deterministic_under_repartitioning(spark):
    docs, tgt = _corpus(spark), _target(spark)
    a = dsir_select(docs, tgt, k=12, n_buckets=512).collect()
    b = dsir_select(docs.repartition(7), tgt.repartition(3), k=12,
                    n_buckets=512).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dsir_rejects_bad_k(spark):
    docs, tgt = _corpus(spark), _target(spark)
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(docs, tgt, k=0)


def test_dsir_plan_is_jvm_only(spark):
    docs, tgt = _corpus(spark), _target(spark)
    df = dsir_scores(docs, tgt, n_buckets=128)
    assert_vectorized_python_only(df)
    # narrow aggregation feeds the score join: no text column below any
    # exchange in the scoring plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
