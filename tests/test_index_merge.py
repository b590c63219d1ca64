"""Incremental inverted-index maintenance — merge ≡ rebuild, band
crossings at the merge boundary, over-band df carry, plan shape."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.invindex import (
    index_state_from_docs,
    index_state_merge,
    served_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _state_rows(df):
    cols = df.columns
    key = "posting_ids" if "posting_ids" in cols else "postings"
    return {r["term"]: (r["df"], r[key]) for r in df.collect()}


def test_merge_equals_rebuild(spark):
    old = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta"),
                        (3, "alpha delta")])
    new = _docs(spark, [(4, "alpha gamma"), (5, "epsilon beta gamma")])
    merged = index_state_merge(index_state_from_docs(old), new)
    rebuilt = index_state_from_docs(old.unionByName(new))
    assert _state_rows(merged) == _state_rows(rebuilt)


def test_min_df_crossing_materializes_list(spark):
    """'delta' has df=1 in the old corpus (below the served band);
    after the merge it crosses min_df and its FULL list — including
    the pre-merge doc — must serve."""
    old = _docs(spark, [(1, "common delta"), (2, "common")])
    new = _docs(spark, [(3, "common delta")])
    merged = index_state_merge(index_state_from_docs(old), new)
    got = _state_rows(served_index(merged, min_df=2, max_df=10))
    assert got["delta"] == (2, "1,3")
    assert got["common"] == (3, "1,2,3")


def test_max_df_crossing_drops_list_and_df_keeps_counting(spark):
    old = _docs(spark, [(i, "hot cold") for i in range(2)])
    new = _docs(spark, [(10 + i, "hot") for i in range(3)])
    merged = index_state_merge(index_state_from_docs(old, max_df=3), new,
                               max_df=3)
    got = _state_rows(merged)
    assert got["hot"] == (5, None)          # crossed the cap at merge
    assert got["cold"] == (2, [0, 1])
    # a second delta keeps counting df on the narrow row
    merged2 = index_state_merge(merged, _docs(spark, [(20, "hot")]),
                                max_df=3)
    assert _state_rows(merged2)["hot"] == (6, None)
    assert "hot" not in _state_rows(served_index(merged2, 2, 3))


def test_delta_only_and_state_only_terms(spark):
    old = _docs(spark, [(1, "oldword shared")])
    new = _docs(spark, [(2, "newword shared")])
    got = _state_rows(index_state_merge(index_state_from_docs(old), new))
    assert got["oldword"] == (1, [1])
    assert got["newword"] == (1, [2])
    assert got["shared"] == (2, [1, 2])


def test_postings_sort_is_numeric(spark):
    """Doc ids 9 and 10 must merge as 9,10 — not string order 10,9."""
    old = _docs(spark, [(9, "zz")])
    new = _docs(spark, [(10, "zz")])
    got = _state_rows(index_state_merge(index_state_from_docs(old), new))
    assert got["zz"] == (2, [9, 10])
    served = _state_rows(served_index(
        index_state_merge(index_state_from_docs(old), new), 2, 10))
    assert served["zz"] == (2, "9,10")


def test_string_ids_merge_natively(spark):
    """Non-numeric ids survive the state round-trip: posting_ids keeps
    the id column's native type, so nothing is lost to a cast."""
    old = spark.createDataFrame([("u-a", "zz yy")], "doc_id string, text string")
    new = spark.createDataFrame([("u-b", "zz")], "doc_id string, text string")
    merged = index_state_merge(index_state_from_docs(old), new)
    got = _state_rows(merged)
    assert got["zz"] == (2, ["u-a", "u-b"])
    assert got["yy"] == (1, ["u-a"])
    assert _state_rows(served_index(merged, 2, 10))["zz"] == (2, "u-a,u-b")


def test_merge_is_associative_and_empty_identity(spark):
    """State-fold algebra: ((A+B)+C) == (A+(B∪C as one delta)) == full
    rebuild, and an empty delta is the identity — the properties that
    make per-snapshot incremental ingest order-insensitive."""
    a = _docs(spark, [(1, "x y"), (2, "x z")])
    b = _docs(spark, [(3, "x y w")])
    c = _docs(spark, [(4, "w z q")])
    two_step = index_state_merge(
        index_state_merge(index_state_from_docs(a), b), c)
    one_step = index_state_merge(index_state_from_docs(a), b.unionByName(c))
    rebuilt = index_state_from_docs(a.unionByName(b).unionByName(c))
    assert _state_rows(two_step) == _state_rows(rebuilt)
    assert _state_rows(one_step) == _state_rows(rebuilt)
    empty = _docs(spark, []).where(F.lit(False))
    ident = index_state_merge(index_state_from_docs(a), empty)
    assert _state_rows(ident) == _state_rows(index_state_from_docs(a))


def test_state_partitioning_invariance(spark):
    """The served index is a pure function of the corpus, not of how
    the state or delta frames are partitioned."""
    old = _docs(spark, [(i, f"t{i % 3} shared") for i in range(6)])
    new = _docs(spark, [(10 + i, f"t{i % 3} shared") for i in range(6)])
    base = _state_rows(served_index(
        index_state_merge(index_state_from_docs(old), new), 2, 100))
    repart = _state_rows(served_index(
        index_state_merge(index_state_from_docs(old.repartition(7)),
                          new.repartition(5)), 2, 100))
    assert base == repart


def test_plan_no_python_narrow_exchanges(spark):
    from document_extractor_spark.plans import assert_no_python, physical_plan

    old = _docs(spark, [(1, "a b")])
    new = _docs(spark, [(2, "a c")])
    out = served_index(index_state_merge(index_state_from_docs(old), new))
    assert_no_python(out)
    for line in physical_plan(out).splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
