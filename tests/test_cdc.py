"""Content-defined chunking (operators/cdc.py)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.cdc import cdc_chunks, chunk_overlap
from document_extractor_spark.plans import assert_no_python

TEXT = ("the quick brown fox jumps over the lazy dog while the crawler "
        "fetches another page and the extractor strips its boilerplate "
        "into clean article text for the training corpus downstream") * 3


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gap_free_cover_and_determinism(spark):
    chunks = cdc_chunks(_df(spark, [(1, TEXT)])).orderBy("start").collect()
    assert chunks[0]["start"] == 1
    assert chunks[-1]["end"] == len(TEXT)
    for prev, cur in zip(chunks, chunks[1:]):
        assert cur["start"] == prev["end"] + 1  # contiguous, no gaps
    # deterministic under different partitioning
    again = cdc_chunks(_df(spark, [(1, TEXT)]).repartition(7)) \
        .orderBy("start").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in chunks]


def test_resynchronization_after_prefix_edit(spark):
    # divisor 16 → ~16-char chunks, plenty of boundaries in 546 chars
    orig = cdc_chunks(_df(spark, [(1, TEXT)]), divisor=16)
    edited = cdc_chunks(_df(spark, [(1, "PREFIX EDIT " + TEXT)]),
                        divisor=16)
    row = chunk_overlap(orig, edited).collect()[0]
    assert row["n_a"] >= 8  # chunking actually happened
    # the point of CDC: chunks after the first boundary keep their
    # identity despite every offset shifting by 12
    assert row["n_shared"] >= row["n_a"] - 2
    assert row["shared_ppm"] >= 700000


def test_short_null_empty_and_params(spark):
    rows = [(1, "tiny"), (2, None), (3, ""), (4, "x" * 15)]
    got = cdc_chunks(_df(spark, rows)).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0]["end"] == 4
    assert 2 not in by_id and 3 not in by_id
    assert len(by_id[4]) == 1  # shorter than w → single chunk
    with pytest.raises(ValueError):
        cdc_chunks(_df(spark, rows), w=1)
    with pytest.raises(ValueError):
        cdc_chunks(_df(spark, rows), divisor=1)


def test_plan_stays_jvm(spark):
    assert_no_python(cdc_chunks(_df(spark, [(1, TEXT)])))


def test_dup_candidates_pairing_and_df_cap(spark):
    from document_extractor_spark.operators.cdc import cdc_dup_candidates

    base = TEXT
    df = _df(spark, [
        (1, base),
        (2, "PREFIX EDIT " + base),        # partial copy of 1
        (3, "completely different content about something else entirely "
            "with no shared phrasing at all in any of its sentences"),
    ])
    chunks = cdc_chunks(df, divisor=16)
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"]
             for r in cdc_dup_candidates(chunks).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)
    # a template chunk present in EVERY doc must not create pairs when
    # the df cap excludes it
    tmpl = " SHARED FOOTER TEMPLATE CHUNK TEXT HERE"
    df2 = _df(spark, [(i, f"unique text number {i} " * 8 + tmpl)
                      for i in range(1, 6)])
    c2 = cdc_chunks(df2, divisor=16)
    capped = cdc_dup_candidates(c2, min_shared=1, max_chunk_df=2).collect()
    uncapped = cdc_dup_candidates(c2, min_shared=1,
                                  max_chunk_df=1000).collect()
    assert len(capped) < len(uncapped) or len(uncapped) == 0
    import pytest
    with pytest.raises(ValueError):
        cdc_dup_candidates(c2, min_shared=0)
