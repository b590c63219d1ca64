"""BPE merge-rule training (operators/bpe.py)."""

import pytest

from document_extractor_spark.operators.bpe import bpe_learn_merges


def test_bpe_learns_hand_computed_sequence(spark):
    """Sennrich Algorithm 1 by hand on {aaab: 2, ab: 1}:
      r1: (a,a)=4 beats (a,b)=3 → 'aa'   [aaab→(aa,a,b)]
      r2: (a,b)=3 beats (aa,a)=2 → 'ab'  [aaab→(aa,ab), ab→(ab)]
      r3: (aa,ab)=2 → 'aaab'
      r4: no pairs remain → early stop."""
    docs = spark.createDataFrame(
        [(1, "aaab aaab ab")], "doc_id int, text string")
    stats = {}
    got = [(r["merge_rank"], r["s1"], r["s2"], r["pair_count"])
           for r in bpe_learn_merges(docs, 10, stats=stats)
           .orderBy("merge_rank").collect()]
    assert got == [(1, "a", "a", 4), (2, "a", "b", 3),
                   (3, "aa", "ab", 2)]
    assert stats["merges"] == 3


def test_bpe_tie_breaks_lexicographically(spark):
    """(b,c) and (x,y) both occur twice; (b,c) wins the tie."""
    docs = spark.createDataFrame(
        [(1, "xy bc"), (2, "bc xy")], "doc_id int, text string")
    top = bpe_learn_merges(docs, 1).collect()[0]
    assert (top["s1"], top["s2"]) == ("b", "c")


def test_bpe_overlapping_runs_merge_greedily(spark):
    """'aaaa' ×1: round 1 counts (a,a)=3 (overlapping adjacencies, per
    the reference get_stats), the merge applies left-to-right greedily
    → (aa, aa); round 2 learns (aa, aa)=1."""
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id int, text string")
    got = [(r["s1"], r["s2"], r["pair_count"]) for r in
           bpe_learn_merges(docs, 2).orderBy("merge_rank").collect()]
    assert got == [("a", "a", 3), ("aa", "aa", 1)]


def test_bpe_case_fold_and_guards(spark):
    docs = spark.createDataFrame([(1, "AB ab")], "doc_id int, text string")
    top = bpe_learn_merges(docs, 1).collect()[0]
    assert (top["s1"], top["s2"], top["pair_count"]) == ("a", "b", 2)
    with pytest.raises(ValueError, match="n_merges"):
        bpe_learn_merges(docs, 0)
    empty = spark.createDataFrame([(1, None)], "doc_id int, text string")
    assert bpe_learn_merges(empty, 3).count() == 0
