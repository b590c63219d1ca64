"""Product-quantization ANN (operators/similarity.py PQ tier)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.similarity import (
    brute_force_topk, pq_encode, pq_topk, pq_train)
from document_extractor_spark.plans import assert_vectorized_python_only

DIM, M, K = 16, 4, 8


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    rows = [(i, [float(x) for x in rng.standard_normal(DIM)])
            for i in range(200)]
    v3 = rows[3][1]
    rows.append((500, [2.0 * x for x in v3]))   # cosine exactly 1 to vec 3
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _q(emb):
    return [float(x) for x in
            emb.filter(F.col("vec_id") == 3).head()["embedding"]]


def test_pq_topk_exact_when_shortlist_covers_corpus(spark, emb):
    """With shortlist ≥ corpus the exact rerank sees everything, so PQ
    must EQUAL brute force row-for-row — ids, cosines, order."""
    books = pq_train(emb, dim=DIM, m=M, k=K, sample_rows=256)
    enc = pq_encode(emb, books)
    got = pq_topk(enc, books, _q(emb), k=5, shortlist=256).collect()
    exact = brute_force_topk(emb, _q(emb), k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]


def test_pq_shortlist_recall(spark, emb):
    books = pq_train(emb, dim=DIM, m=M, k=K, sample_rows=256)
    enc = pq_encode(emb, books)
    q = _q(emb)
    exact = [r.vec_id for r in brute_force_topk(emb, q, k=5).collect()]
    approx = [r.vec_id for r in
              pq_topk(enc, books, q, k=5, shortlist=32).collect()]
    assert 3 in approx and 500 in approx     # planted identicals found
    assert len(set(exact) & set(approx)) >= 3


def test_pq_encode_shape_and_nulls(spark):
    rows = [(1, [0.5] * DIM), (2, None), (3, [0.0] * DIM)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = [[[0.1] * (DIM // M)] * K] * M   # degenerate but valid books
    got = {r["vec_id"]: r["pq_code"] for r in pq_encode(df, books).collect()}
    assert got[2] is None
    assert len(got[1]) == M and all(0 <= c < K for c in got[1])
    assert len(got[3]) == M                  # zero vector still encodes


def test_pq_train_partitioning_invariant(spark, emb):
    a = pq_train(emb, dim=DIM, m=M, k=K, sample_rows=64)
    b = pq_train(emb.repartition(7), dim=DIM, m=M, k=K, sample_rows=64)
    assert a == b


def test_pq_train_validates_dims(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, dim=DIM, m=5)


def test_pq_plan_is_arrow_batched_encode_plus_jvm_adc(spark, emb):
    books = pq_train(emb, dim=DIM, m=M, k=K, sample_rows=64)
    out = pq_topk(pq_encode(emb, books), books, _q(emb), k=5)
    # the only Python in the whole plan is the Arrow-batched encoder;
    # ADC scoring and both top-k stages are JVM
    assert_vectorized_python_only(out)
