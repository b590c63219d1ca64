

def test_doc_top_terms_ranking(spark):
    """tf desc, then rarer term (df asc), then term asc; k bounds."""
    from document_extractor_spark.operators.textstats import doc_top_terms

    df = spark.createDataFrame(
        [(1, "apple apple banana cherry"),
         (2, "banana banana cherry cherry date"),
         (3, "Apple APPLE zebra")],   # case folds before counting
        "doc_id bigint, text string")
    rows = doc_top_terms(df, k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"])
           for r in rows}
    # doc 1: apple tf=2 wins; banana vs cherry tie tf=1 → df tie (both
    # in docs 1,2) → 'banana' < 'cherry'
    assert got[(1, 1)] == ("apple", 2, 2)
    assert got[(1, 2)] == ("banana", 1, 2)
    # doc 2: banana/cherry tie tf=2, same df → lexicographic
    assert got[(2, 1)] == ("banana", 2, 2)
    assert got[(2, 2)] == ("cherry", 2, 2)
    # doc 3: apple tf=2 (case folded); zebra df=1 rarer but tf=1 loses
    assert got[(3, 1)] == ("apple", 2, 2)
    assert got[(3, 2)] == ("zebra", 1, 1)
    assert len(rows) == 6
