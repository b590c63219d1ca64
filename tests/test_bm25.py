"""Okapi BM25 top-k (operators/bm25.py)."""

import math

import pytest

from document_extractor_spark.operators.bm25 import bm25_topk


def _docs(spark):
    rows = [
        (1, "spark joins data with data frames"),
        (2, "data data data everywhere in this much longer document"
            " about data processing at scale"),
        (3, "joins and shuffles"),
        (4, "nothing relevant here at all"),
        (5, "DATA Joins"),  # uppercase must match via lowercasing
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_ranking_matches_closed_form(spark):
    got = bm25_topk(_docs(spark), ["data", "joins"], k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert 4 not in ids  # no hit terms → not a candidate
    # numpy-free closed form: recompute BM25 in plain python
    texts = {1: "spark joins data with data frames",
             2: "data data data everywhere in this much longer document"
                " about data processing at scale",
             3: "joins and shuffles",
             5: "data joins"}
    alldl = {1: 6, 2: 14, 3: 3, 4: 5, 5: 2}
    n, avgdl = 5, sum(alldl.values()) / 5
    df = {"data": 3, "joins": 3}
    exp = {}
    for d, t in texts.items():
        toks = t.lower().split()
        s = 0.0
        for q in ("data", "joins"):
            tf = toks.count(q)
            if not tf:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf / (tf + 1.2 * (0.25 + 0.75 * alldl[d] / avgdl))
        exp[d] = round(s * 1000)
    got_scores = {r["doc_id"]: r["score_milli"] for r in got}
    assert got_scores == exp
    # rank: highest score first, doc_id tiebreak
    assert ids == sorted(exp, key=lambda d: (-exp[d], d))


def test_k_limits_and_empty_terms(spark):
    assert len(bm25_topk(_docs(spark), ["data"], k=2).collect()) == 2
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), [], k=3)
