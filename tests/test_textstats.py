

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


# --- script profile ---------------------------------------------------------

from document_extractor_spark.operators.textstats import (SCRIPTS,
                                                          script_profile)


def _sp(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in script_profile(df).collect()}


def test_script_profile_counts_and_dominant(spark):
    got = _sp(spark, [
        (1, "привет мир abc"),        # 9 cyrillic > 3 latin
        (2, "hello мир"),             # 5 latin > 3 cyrillic
        (3, "中文中文中 ab"),          # 5 han > 2 latin
        (4, "12345 ... !!"),          # no profiled letters
        (5, None),
        (6, "αβγ한한ひカद"),           # greek 3 > hangul 2 > 1+1+1
    ])
    assert (got[1]["dominant_script"], got[1]["script_chars"],
            got[1]["letter_chars"]) == ("cyrillic", 9, 12)
    assert got[1]["dominant_ppm"] == 9 * 1_000_000 // 12
    assert got[2]["dominant_script"] == "latin"
    assert got[3]["dominant_script"] == "han"
    assert got[4]["dominant_script"] is None
    assert (got[4]["script_chars"], got[4]["letter_chars"],
            got[4]["dominant_ppm"]) == (0, 0, 0)
    assert got[5]["dominant_script"] is None
    assert got[6]["dominant_script"] == "greek"
    assert got[6]["letter_chars"] == 8


def test_script_profile_tie_breaks_name_asc(spark):
    # 2 cyrillic vs 2 latin: 'cyrillic' < 'latin' wins the tie
    got = _sp(spark, [(1, "ab дд")])
    assert got[1]["dominant_script"] == "cyrillic"
    assert got[1]["script_chars"] == 2


def test_script_profile_plan_is_jvm_only(spark):
    from document_extractor_spark.plans import assert_no_python
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    assert_no_python(script_profile(df))
    assert len(SCRIPTS) == 9


# --- title/content overlap ---------------------------------------------------

from document_extractor_spark.operators.textstats import (
    title_content_overlap)


def test_title_overlap_cases(spark):
    rows = [
        (1, "Big News Today", "today the big news broke"),   # full overlap
        (2, "Weird Trick Doctors Hate", "an article about gardening"),
        (3, None, "some body"),                              # no title
        (4, "", "some body"),                                # empty title
        (5, "Hello hello WORLD", "hello planet"),            # dedup + case
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, title string, text string")
    got = {r["doc_id"]: r for r in title_content_overlap(df).collect()}
    assert (got[1]["n_title_tokens"], got[1]["n_overlap"],
            got[1]["overlap_ppm"]) == (3, 3, 1_000_000)
    assert got[2]["overlap_ppm"] == 0                        # disjoint ≠ NULL
    assert got[3]["overlap_ppm"] is None
    assert got[4]["overlap_ppm"] is None
    assert (got[5]["n_title_tokens"], got[5]["n_overlap"]) == (2, 1)
    assert got[5]["overlap_ppm"] == 500_000


def test_title_overlap_plan_no_shuffle(spark):
    from document_extractor_spark.plans import assert_no_python, physical_plan
    df = spark.createDataFrame([(1, "t", "b")],
                               "doc_id bigint, title string, text string")
    out = title_content_overlap(df)
    assert_no_python(out)
    assert "Exchange" not in physical_plan(out)


def test_char_entropy_closed_forms(spark):
    import math

    from document_extractor_spark.operators.textstats import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaa"),          # degenerate: H = 0
            (2, "abab"),          # uniform over 2: H = ln 2
            (3, "abcd"),          # uniform over 4: H = ln 4
            (4, ""),              # no distribution → no row
            (5, None),            # NULL → no row
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["entropy_micro"] == 0
    assert got[1]["n_distinct_chars"] == 1 and got[1]["n_chars"] == 4
    assert got[2]["entropy_micro"] == round(math.log(2) * 1e6)
    assert got[3]["entropy_micro"] == round(math.log(4) * 1e6)


def test_char_entropy_cap_and_ordering_signal(spark):
    import pytest

    from document_extractor_spark.operators.textstats import char_entropy

    prose = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, prose), (2, "zzzzzzzzzzzzzzzzzzzzzz" * 3),
         (3, "qwe8 zx0v 1m,p 9jk2 47tu b5ry")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["entropy_micro"]
           for r in char_entropy(df).collect()}
    # padding << prose < near-uniform mash: the two-sided signal
    assert got[2] < got[1] < got[3]
    capped = char_entropy(df, max_chars=10)
    assert all(r["n_chars"] == 10 for r in capped.collect())
    with pytest.raises(ValueError):
        char_entropy(df, max_chars=0)


def test_zipf_diagnostics_exact_zipf_corpus(spark):
    import math

    from document_extractor_spark.operators.textstats import zipf_diagnostics

    # plant an exact Zipf-1 rank-frequency table: freq(r) = 120 / r
    # for ranks 1..8 → slope of ln f on ln r is exactly -1
    words = []
    for r in range(1, 9):
        words += [f"w{r:02d}"] * (120 // r)
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id bigint, text string")
    row = zipf_diagnostics(df).collect()[0]
    assert row["n_types"] == 8
    assert row["n_tokens"] == sum(120 // r for r in range(1, 9))
    # 120/r is integer-truncated, so the fit is near -1, not exactly
    assert abs(row["zipf_slope_milli"] + 1000) <= 60
    # closed-form replica of the fixed-point pipeline
    pts = []
    freqs = sorted((120 // r for r in range(1, 9)), reverse=True)
    for i, f_ in enumerate(freqs, 1):
        pts.append((round(math.log(i) * 1000), round(math.log(f_) * 1000)))
    k = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    exp = round((k * sxy - sx * sy) / (k * sxx - sx * sx) * 1000)
    assert row["zipf_slope_milli"] == exp


def test_zipf_degenerate_single_type(spark):
    from document_extractor_spark.operators.textstats import zipf_diagnostics

    df = spark.createDataFrame(
        [(1, "only only only")], "doc_id bigint, text string")
    row = zipf_diagnostics(df).collect()[0]
    # one point: denominator 0 → slope sentinel 0
    assert row["n_types"] == 1 and row["zipf_slope_milli"] == 0


def test_vocab_coverage_closed_form(spark):
    from document_extractor_spark.operators.textstats import vocab_coverage

    # 10 'a', 2 'b', 1 'c', 1 'd' → N=14, types=4, N1=2, N2=1
    df = spark.createDataFrame(
        [(1, " ".join(["a"] * 10 + ["b", "b", "c", "d"]))],
        "doc_id bigint, text string")
    r = vocab_coverage(df, top_k=2).collect()[0]
    assert (r["n_tokens"], r["n_types"]) == (14, 4)
    assert (r["n_singletons"], r["n_doubletons"]) == (2, 1)
    assert r["unseen_mass_ppm"] == (2 * 1000000) // 14
    assert r["topk_coverage_ppm"] == (12 * 1000000) // 14


def test_token_kl_divergence(spark):
    import math

    from document_extractor_spark.operators.textstats import (
        token_kl_divergence)

    df = spark.createDataFrame(
        [(1, "a", "x x x y"), (2, "b", "x y y y"),
         (3, "c", "irrelevant group")],
        "doc_id bigint, source string, text string")
    row = token_kl_divergence(df, "source", base_group="a",
                              target_group="b").collect()[0]
    assert row["n_types"] == 2
    assert row["n_base_tokens"] == 4 and row["n_target_tokens"] == 4
    # closed form with add-1 smoothing over union vocab (V=2):
    kl = 0.0
    for ca, cb in ((3, 1), (1, 3)):  # x, y
        p = (cb + 1) / 6.0
        q = (ca + 1) / 6.0
        kl += round(p * math.log(p / q) * 1e12)
    assert row["kl_micro"] == max(kl, 0) // 1000000
    # identical slices → zero divergence
    same = token_kl_divergence(df, "source", base_group="a",
                               target_group="a").collect()[0]
    assert same["kl_micro"] == 0


def test_pmi_collocations_closed_form(spark):
    import math

    from document_extractor_spark.operators.textstats import (
        pmi_collocations)

    # "new york" always adjacent; "the", "cat" frequent but independent
    text = " ".join(["new york"] * 6 + ["the cat"] * 6
                    + ["the dog sat"] * 6)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = {r["bigram"]: r for r in
           pmi_collocations(df, min_count=5, top_k=10).collect()}
    assert "new york" in got
    # closed form for 'new york': cx=cy=6, cxy=6
    toks = text.split()
    n = len(toks)
    nb = n - 1
    exp = round(math.log((6 / nb) / ((6 / n) * (6 / n))) * 1000)
    assert got["new york"]["pmi_milli"] == exp
    # a collocation outranks an independent co-occurrence
    if "the cat" in got:
        assert got["new york"]["pmi_milli"] > got["the cat"]["pmi_milli"]
    # min_count suppresses rare pairs: nothing below 5
    assert all(r["n_xy"] >= 5 for r in got.values())


# ---------------------------------------------------------------------------
# compression_ratio
# ---------------------------------------------------------------------------


def test_compression_ratio_exact_sizes_and_ppm(spark):
    import zlib

    from document_extractor_spark.operators.textstats import (
        compression_ratio)

    texts = {1: "ab" * 500, 2: "the quick brown fox jumps over it",
             3: "", 4: None}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id int, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for i in (1, 2):
        raw = texts[i].encode()
        assert got[i]["n_bytes"] == len(raw)
        assert got[i]["n_compressed"] == len(zlib.compress(raw, 6))
        assert got[i]["ratio_ppm"] == \
            len(zlib.compress(raw, 6)) * 1000000 // len(raw)
    # template text compresses an order of magnitude below prose
    assert got[1]["ratio_ppm"] < 100000 < got[2]["ratio_ppm"]
    assert got[3]["ratio_ppm"] is None and got[4]["ratio_ppm"] is None


def test_compression_ratio_separates_template_from_random(spark):
    import hashlib

    from document_extractor_spark.operators.textstats import (
        compression_ratio)

    rand = " ".join(hashlib.md5(str(i).encode()).hexdigest()
                    for i in range(64))
    df = spark.createDataFrame(
        [(1, "boilerplate row " * 200), (2, rand)],
        "doc_id int, text string")
    got = {r["doc_id"]: r["ratio_ppm"]
           for r in compression_ratio(df).collect()}
    assert got[1] < 150000
    assert got[2] > 500000
