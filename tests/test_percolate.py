"""Percolation (operators/percolate.py) — AND semantics, case folding,
duplicate terms, empty rules, and the broadcast/no-payload-shuffle
plan claims."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.percolate import percolate
from document_extractor_spark.plans import assert_no_python, physical_plan


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, terms array<string>")


def test_and_semantics_and_case_folding(spark):
    docs = spark.createDataFrame(
        [(1, "Solar panels and wind POWER"),
         (2, "solar flares"),
         (3, "wind power forecasts"),
         (4, "")],
        "doc_id int, text string")
    rules = _rules(spark, [
        ("q_solar_power", ["Solar", "power"]),
        ("q_wind", ["wind"]),
        ("q_absent", ["solar", "unicorns"]),
        ("q_empty", []),
    ])
    got = sorted((r["doc_id"], r["query_id"])
                 for r in percolate(docs, rules).collect())
    assert got == [(1, "q_solar_power"), (1, "q_wind"), (3, "q_wind")]


def test_duplicate_terms_in_rule_and_doc(spark):
    """Repeated terms on either side must not break containment
    counting (both sides are distinct-ed)."""
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta")], "doc_id int, text string")
    rules = _rules(spark, [("q", ["alpha", "alpha", "beta"])])
    assert [(r["doc_id"], r["query_id"])
            for r in percolate(docs, rules).collect()] == [(1, "q")]


def test_matches_python_bruteforce(spark):
    import itertools

    vocab = ["ant", "bee", "cat", "dog", "elk"]
    texts = [" ".join(c) for c in itertools.combinations(vocab, 3)]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string")
    rules = _rules(spark, [
        (f"r{i}", list(c))
        for i, c in enumerate(itertools.combinations(vocab, 2))])
    got = sorted((r["doc_id"], r["query_id"])
                 for r in percolate(docs, rules).collect())
    want = sorted(
        (i, f"r{j}")
        for i, t in enumerate(texts)
        for j, c in enumerate(itertools.combinations(vocab, 2))
        if set(c) <= set(t.split()))
    assert got == want


def test_plan_broadcast_rules_no_text_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    rules = _rules(spark, [("q", ["a"])])
    out = percolate(docs, rules)
    assert_no_python(out)
    plan = physical_plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # no exchange in the plan may carry the raw text column
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            assert "text" not in line, line
