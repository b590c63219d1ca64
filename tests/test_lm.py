"""Bigram-LM perplexity scoring + CCNet buckets — closed-form math,
hostile inputs, bucket semantics, and the narrow-exchange scale shape."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.lm import (
    bigram_lm_scores,
    perplexity_bucket_assignments,
    perplexity_buckets,
)


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_bigram_lm_closed_form(spark):
    # corpus: c(a,b)=3, c(b,a)=1, ctx(a)=3, ctx(b)=1, V={a,b}=2
    # p(a,b) = 4/5 -> nano 223143551 ; p(b,a) = 2/3 -> nano 405465108
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x"), (4, ""), (5, None)],
        "doc_id int, text string",
    )
    out = _by_id(bigram_lm_scores(docs))
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_nll_nano"] == 2 * 223143551 + 405465108
    assert out[1]["avg_nll"] == pytest.approx(0.283917)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["sum_nll_nano"] == 223143551
    assert out[2]["avg_nll"] == pytest.approx(0.223144)
    # <2 tokens: zero bigrams, NULL scores, but the row is present
    for i in (3, 4, 5):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["sum_nll_nano"] is None
        assert out[i]["avg_nll"] is None


def test_bigram_lm_case_and_whitespace(spark):
    """Tokenization is the lowercased token_counts twin: case folds,
    runs of whitespace collapse."""
    docs = spark.createDataFrame(
        [(1, "A  b\ta B"), (2, "a b a b")], "doc_id int, text string")
    out = _by_id(bigram_lm_scores(docs))
    assert out[1]["sum_nll_nano"] == out[2]["sum_nll_nano"]


def test_perplexity_buckets_value_semantics(spark):
    """Equal scores share a bucket (value cutoffs, not rank): six
    identical docs all land in bucket 1."""
    docs = spark.createDataFrame(
        [(i, "a b c", "en") for i in range(6)],
        "doc_id int, text string, lang string",
    )
    rows = perplexity_buckets(docs).collect()
    assert len(rows) == 1
    assert rows[0]["bucket"] == 1 and rows[0]["n_docs"] == 6
    assert rows[0]["min_avg_nll"] == rows[0]["max_avg_nll"]


def test_perplexity_buckets_split_and_langs(spark):
    """Distinct scores split ~n/3 per bucket, independently per lang;
    docs with no bigrams are excluded."""
    rows = []
    for i in range(9):
        # increasingly repetitive docs -> strictly varying likelihoods
        rows.append((i, " ".join(f"w{j % (i + 2)}" for j in range(12)), "en"))
    rows.append((100, "solo", "de"))        # no bigrams -> excluded
    rows.append((101, "x y x y", "de"))
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = perplexity_buckets(docs)
    agg = {(r["lang"], r["bucket"]): r["n_docs"] for r in out.collect()}
    assert sum(n for (lang, _), n in agg.items() if lang == "en") == 9
    assert agg[("de", 1)] == 1
    assert ("de", 2) not in agg and ("de", 3) not in agg
    en = [(b, n) for (lang, b), n in agg.items() if lang == "en"]
    assert sorted(en) == [(1, 3), (2, 3), (3, 3)]


def test_bucket_assignments_consistent_with_report(spark):
    """The doc-level assignment aggregates to exactly the bucket
    report, and every scored doc gets exactly one bucket."""
    rows = [(i, " ".join(f"w{j % (i % 5 + 2)}" for j in range(10)), "en")
            for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    asg = perplexity_bucket_assignments(docs)
    assert asg.count() == 12
    assert asg.select("doc_id").distinct().count() == 12
    from_asg = {(r["lang"], r["bucket"]): r["n"]
                for r in asg.groupBy("lang", "bucket")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    report = {(r["lang"], r["bucket"]): r["n_docs"]
              for r in perplexity_buckets(docs).collect()}
    assert from_asg == report


def test_perplexity_buckets_sample_seam(spark):
    """sample_frac fits cutoffs on the md5 sample but still buckets
    every scored document."""
    rows = [(i, " ".join(f"w{j % (i % 7 + 2)}" for j in range(12)), "en")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = perplexity_buckets(docs, sample_frac=0.5)
    assert out.agg(F.sum("n_docs")).first()[0] == 40


def test_bucket_null_for_unsampled_or_null_lang(spark):
    """A language whose every doc misses the cutoff-fit sample, and
    NULL-lang docs, get bucket NULL explicitly — never dropped, never
    defaulted to the tail."""
    from document_extractor_spark.operators.lm import (
        perplexity_bucket_assignments,
    )
    from document_extractor_spark.operators.curation import (
        mix_threshold_hex,
    )

    # find a doc id whose md5('ppl1'||id) lands ABOVE a 0.5 threshold
    # (deterministic): probe a few
    import hashlib
    thr = mix_threshold_hex(0.5)
    unsampled = next(
        i for i in range(100, 200)
        if hashlib.md5(f"ppl1{i}".encode()).hexdigest()[:8] >= thr)
    rows = [(i, "a b c d e", "en") for i in range(6)]
    rows.append((unsampled, "a b c d e", "rare"))   # only 'rare' doc
    rows.append((999, "a b c d e", None))           # NULL lang
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    asg = {r["doc_id"]: r for r in perplexity_bucket_assignments(
        docs, sample_frac=0.5).collect()}
    assert len(asg) == 8                      # nothing silently dropped
    assert asg[unsampled]["bucket"] is None   # lang absent from sample
    assert asg[999]["bucket"] is None         # NULL lang: no cohort
    # 'en' has a cuts row iff ANY en doc made the sample; then every
    # en doc must be bucketed (cutoffs broadcast to the whole cohort)
    en_sampled = any(
        hashlib.md5(f"ppl1{i}".encode()).hexdigest()[:8] < thr
        for i in range(6))
    assert all((asg[i]["bucket"] is not None) == en_sampled
               for i in range(6))


def test_perplexity_buckets_guards(spark):
    docs = spark.createDataFrame([(1, "a b", "en")],
                                 "doc_id int, text string, lang string")
    with pytest.raises(ValueError):
        perplexity_buckets(docs, n_buckets=1)
    with pytest.raises(ValueError):
        perplexity_buckets(docs, sample_frac=0.0)


def test_lm_plan_no_python_and_narrow_exchanges(spark):
    """Pure JVM, and document text never rides an exchange — the
    shuffles carry only (id, w1, w2) token pairs / counts."""
    from document_extractor_spark.plans import assert_no_python, physical_plan

    docs = spark.createDataFrame(
        [(1, "a b c d e f", "en")], "doc_id int, text string, lang string")
    out = bigram_lm_scores(docs)
    assert_no_python(out)
    for line in physical_plan(out).splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
    out2 = perplexity_buckets(docs)
    assert_no_python(out2)
    for line in physical_plan(out2).splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


# ---------------------------------------------------------------------------
# Kneser-Ney
# ---------------------------------------------------------------------------


def test_kn_bigram_closed_form(spark):
    """Hand-computed interpolated KN on a 2-type corpus:
    c(a,b)=3, c(b,a)=1; ctx a: (c_ctx 3, N1+ 1); ctx b: (1, 1);
    cont a: N1+ 1, cont b: N1+ 1; N1+(··)=2.
      P(b|a) = (3-.75)/3 + (.75·1/3)·(1/2) = 0.875
      P(a|b) = (1-.75)/1 + (.75·1/1)·(1/2) = 0.625
    """
    import math

    from document_extractor_spark.operators.lm import kn_bigram_lm_scores

    nano_ab = round(-math.log(0.875) * 1e9)
    nano_ba = round(-math.log(0.625) * 1e9)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x"), (4, ""), (5, None)],
        "doc_id int, text string",
    )
    out = _by_id(kn_bigram_lm_scores(docs))
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_nll_nano"] == 2 * nano_ab + nano_ba
    assert out[2]["sum_nll_nano"] == nano_ab
    assert out[2]["avg_nll"] == pytest.approx(
        round(nano_ab / 1e9, 6), abs=1e-9)
    for i in (3, 4, 5):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["sum_nll_nano"] is None


def test_kn_favors_diverse_continuations(spark):
    """The defining KN property: a word seen after MANY distinct
    contexts gets more continuation mass than an equally-frequent word
    welded to one context. 'york' occurs 4× but only ever after 'new';
    'the' occurs 4× after 4 different contexts — in a fresh bigram
    (context 'q' has both continuations once), P(the|q) > P(york|q)."""
    from document_extractor_spark.operators.lm import kn_bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "new york new york new york new york"),
         (2, "a the b the c the d the"),
         (3, "q the q york")],
        "doc_id int, text string",
    )
    # isolate the two bigrams via single-bigram probe docs instead of
    # reaching into the model table: same context q, same c_bg=1 — only
    # the continuation counts differ; lower nll == higher probability
    probe = spark.createDataFrame(
        [(101, "q the"), (102, "q york")], "doc_id int, text string")
    out = _by_id(kn_bigram_lm_scores(docs.unionByName(probe)))
    assert out[101]["sum_nll_nano"] < out[102]["sum_nll_nano"]


def test_kn_discount_guard(spark):
    from document_extractor_spark.operators.lm import kn_bigram_lm_scores

    docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="discount"):
        kn_bigram_lm_scores(docs, discount=1.0)
