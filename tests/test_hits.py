"""HITS hubs/authorities — closed-form bipartite fixed point, numpy
cross-check on an asymmetric weighted graph, early exit, null edges."""

from document_extractor_spark.operators.links import hits


def _numpy_hits(edges, iters):
    """Reference HITS with L1 normalization (dense numpy)."""
    import numpy as np

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    ix = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[ix[s], ix[d]] += w
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iters):
        a = W.T @ h
        a = a / a.sum() if a.sum() > 0 else a
        h = W @ a
        h = h / h.sum() if h.sum() > 0 else h
    return {x: (h[ix[x]], a[ix[x]]) for x in nodes}


def test_bipartite_closed_form_and_early_exit(spark):
    rows = [(f"hub{i}", f"auth{j}", 1) for i in range(5) for j in range(3)]
    df = spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links bigint")
    stats = {}
    got = {r["host"]: (r["hub"], r["authority"])
           for r in hits(df, iterations=10, stats=stats).collect()}
    for i in range(5):
        hub, auth = got[f"hub{i}"]
        assert abs(hub - 0.2) < 1e-12 and auth == 0.0
    for j in range(3):
        hub, auth = got[f"auth{j}"]
        assert hub == 0.0 and abs(auth - 1.0 / 3) < 1e-12
    # fixed point reached in round 1; round 2 sees delta ~ulp and exits
    assert stats["iterations"] == 2


def test_hits_matches_numpy_asymmetric(spark):
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
             ("c", "a", 1), ("b", "d", 5)]
    df = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links bigint")
    got = {r["host"]: (r["hub"], r["authority"])
           for r in hits(df, iterations=12, tol=0).collect()}
    want = _numpy_hits(edges, 12)
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h][0] - want[h][0]) < 1e-9, (h, got[h], want[h])
        assert abs(got[h][1] - want[h][1]) < 1e-9, (h, got[h], want[h])
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-9
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-9


def test_null_edges_excluded_and_empty_graph(spark):
    df = spark.createDataFrame(
        [("a", None, 1), (None, "b", 1), ("a", "b", 1)],
        "src_host string, dst_host string, n_links bigint")
    got = {r["host"]: r for r in hits(df, iterations=3).collect()}
    assert set(got) == {"a", "b"}
    empty = df.where("src_host = 'zzz'")
    assert hits(empty, iterations=3).collect() == []


def test_hits_plan_no_python(spark):
    from document_extractor_spark.plans import assert_no_python

    df = spark.createDataFrame(
        [("a", "b", 1)], "src_host string, dst_host string, n_links bigint")
    assert_no_python(hits(df, iterations=1, tol=0))
