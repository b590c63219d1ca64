"""Curation operators — decontamination, PII redaction, deterministic
source-weighted sampling (operators/curation.py)."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.curation import (
    PII_RULES,
    decontaminate,
    mix_threshold_hex,
    redact_pii,
    sample_mix,
)
from document_extractor_spark.plans import assert_no_python


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BENCH_SENT = ("the quick brown fox jumps over the lazy dog while "
              "seven wizards brew strong potions at midnight exactly")


def test_decontaminate_drops_benchmark_overlap(spark):
    """A doc containing a benchmark 13-gram drops; clean docs survive;
    short docs (<13 tokens) only match via their whole-text gram."""
    docs = _docs(spark, [
        (1, "totally clean document with many unique words "
            "that never appear in any benchmark at all ok"),
        (2, "prefix words then " + BENCH_SENT + " and a suffix"),
        (3, "another clean one with its own vocabulary entirely "
            "separate from evaluation data for sure yes indeed"),
    ])
    bench = spark.createDataFrame([(BENCH_SENT,)], "text string")
    kept = sorted(r.doc_id for r in decontaminate(docs, bench).collect())
    assert kept == [1, 3]
    assert_no_python(decontaminate(docs, bench))


def test_decontaminate_punctuation_normalized(spark):
    """GPT-3-style normalization: a contaminated doc whose benchmark
    sentence differs only by punctuation and case must still drop —
    punctuation is discarded before 13-gram matching."""
    perturbed = ("The quick, brown fox -- jumps over the lazy dog; while "
                 "seven wizards brew strong potions (at midnight) Exactly!")
    docs = _docs(spark, [
        (1, "clean text with its own distinct vocabulary nothing shared "
            "with any benchmark sentence here at all now"),
        (2, "some prefix " + perturbed + " trailing words"),
    ])
    bench = spark.createDataFrame([(BENCH_SENT,)], "text string")
    kept = sorted(r.doc_id for r in decontaminate(docs, bench).collect())
    assert kept == [1]


def test_decontaminate_no_false_positive_below_n(spark):
    """Sharing only a 12-token run with the benchmark is NOT
    contamination under the 13-gram rule."""
    toks = BENCH_SENT.split()
    twelve = " ".join(toks[:12])
    docs = _docs(spark, [(1, "lead in words " + twelve + " broken tail")])
    bench = spark.createDataFrame([(BENCH_SENT,)], "text string")
    assert [r.doc_id for r in decontaminate(docs, bench).collect()] == [1]


def test_redact_pii_rules_and_counts(spark):
    txt = ("write to jo.doe+x@mail.example.org or call +1 (415) 555-0100; "
           "ssn 123-45-6789 server 192.168.0.12 ok")
    out = redact_pii(_docs(spark, [(1, txt)])).head()
    assert "<EMAIL>" in out.redacted and "@" not in out.redacted
    assert "<SSN>" in out.redacted and "123-45-6789" not in out.redacted
    assert "<IP>" in out.redacted and "192.168.0.12" not in out.redacted
    assert "<PHONE>" in out.redacted and "555-0100" not in out.redacted
    # staged counting: the SSN counts once (as SSN, not again as phone)
    assert (out.n_email, out.n_ssn, out.n_ip, out.n_phone) == (1, 1, 1, 1)
    assert_no_python(redact_pii(_docs(spark, [(1, txt)])))


def test_redact_pii_digit_runs_survive(spark):
    """Long digit runs are NOT phones: the NANP branch's leading
    (?:\\(\\d{3}\\)|\\b\\d{3}) anchor means no match can start inside a
    digit run, and the trailing \\b rejects 10-digit spans embedded in
    longer runs — ISBNs, order ids, and epoch-millis timestamps survive
    verbatim while real phone shapes still redact."""
    keep = [
        (1, "isbn 9780306406157 in stock"),          # 13-digit ISBN
        (2, "order id 1234567890123456 shipped"),    # 16-digit order id
        (3, "ts 20260817123456 logged"),             # 14-digit timestamp
        (4, "epoch 1755397200000 ms"),               # 13-digit epoch ms
    ]
    out = {r.doc_id: r for r in redact_pii(_docs(spark, keep)).collect()}
    for i, txt in keep:
        assert out[i].redacted == txt, out[i].redacted
        assert out[i].n_phone == 0
    redacts = [
        (1, "call 555-867-5309 now"),
        (2, "tel (415) 555-2671 ext 9"),
        (3, "intl +44 20 7946 0958 line"),
    ]
    out = {r.doc_id: r for r in redact_pii(_docs(spark, redacts)).collect()}
    for i, _ in redacts:
        assert out[i].n_phone == 1 and "<PHONE>" in out[i].redacted


def test_redact_pii_clean_text_untouched(spark):
    txt = "nothing sensitive here just words and the number 42"
    out = redact_pii(_docs(spark, [(1, txt)])).head()
    assert out.redacted == txt
    assert (out.n_email, out.n_ssn, out.n_ip, out.n_phone) == (0, 0, 0, 0)


def test_mix_threshold_hex_bounds():
    assert mix_threshold_hex(0.0) == "00000000"
    assert mix_threshold_hex(1.0) == "g"      # every md5 prefix < 'g'
    assert mix_threshold_hex(0.5) == "80000000"


def test_sample_mix_deterministic_and_weighted(spark):
    rows = [(i, f"src{i % 2}", "t") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    w = {"src0": 0.25, "src1": 1.0}
    got1 = sorted(r.doc_id for r in sample_mix(df, w).collect())
    got2 = sorted(r.doc_id for r in sample_mix(df, w).collect())
    assert got1 == got2                       # pure function of (seed, key)
    by_src = {r["source"]: r["n"] for r in sample_mix(df, w)
              .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["src1"] == 2000             # weight 1.0 keeps everything
    assert 380 <= by_src["src0"] <= 620       # ~25% of 2000, md5-uniform
    # absent source = weight 0
    w2 = {"src1": 1.0}
    assert sample_mix(df, w2).filter(F.col("source") == "src0").count() == 0
    assert_no_python(sample_mix(df, w))


def test_pii_rules_are_re2_safe():
    """Oracle parity precondition: patterns must stay in the Java∩RE2
    subset — no lookahead/lookbehind/backrefs."""
    for _name, pat, _rep in PII_RULES:
        assert "(?=" not in pat and "(?!" not in pat
        assert "(?<" not in pat and "\\1" not in pat


def test_curation_query_plans_scale_shape(spark):
    """The contract plans carry the 100-TB shape: decontamination joins
    BROADCAST the benchmark grams and the contaminated-id set (never a
    sort-merge shuffle of the corpus); sample_mix is a zero-exchange
    filter whose scan prunes text; pii_redaction is a zero-exchange
    narrow map. No Python anywhere."""
    import __spark_entry__ as entry_mod
    from document_extractor_spark.plans import (
        physical_plan,
        scan_read_schema,
    )

    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.001"
    p = physical_plan(qs["decontam_kept"](spark, sf))
    assert p.count("BroadcastHashJoin") == 2 and "SortMergeJoin" not in p
    sm = qs["sample_mix"](spark, sf)
    assert "Exchange" not in physical_plan(sm)
    assert "text" not in scan_read_schema(sm)
    assert "Exchange" not in physical_plan(qs["pii_redaction"](spark, sf))
    for name in ("decontam_kept", "sample_mix", "pii_redaction"):
        assert_no_python(qs[name](spark, sf))


def test_curation_hostile_inputs_bounded(spark):
    """Hostile-input totality for the curation chain: megabyte digit
    runs (regex stress), dotted-quad floods, unicode, empty text, and a
    100k-token doc through 13-gram shingling — one batch, no task
    failure, bounded wall."""
    import time

    big_digits = "9" * 1_000_000
    ip_flood = " ".join("1.2.3.4" for _ in range(20_000))
    huge_doc = " ".join(f"w{i}" for i in range(100_000))
    rows = [
        (1, big_digits),
        (2, ip_flood),
        (3, "héllo wörld ünïcode ™ ☃ ‮ reversed?"),
        (4, ""),
        (5, huge_doc),
    ]
    docs = _docs(spark, rows)
    t0 = time.monotonic()
    red = redact_pii(docs).collect()
    assert len(red) == 5
    by_id = {r.doc_id: r for r in red}
    assert by_id[2].n_ip == 20_000
    assert by_id[4].redacted == ""
    bench = spark.createDataFrame([("w50 w51 w52 w53 w54 w55 w56 w57 "
                                    "w58 w59 w60 w61 w62",)], "text string")
    kept = decontaminate(docs, bench).count()
    assert kept == 4                      # only the 100k-token doc drops
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"hostile curation batch took {elapsed:.1f}s"


def test_sample_mix_table_matches_dict_variant(spark):
    """The broadcast-join weights-table variant must select EXACTLY the
    same rows as the CASE-compiled dict variant (same md5 thresholds),
    and its plan must broadcast the weights side."""
    from document_extractor_spark.operators.curation import sample_mix_table
    from document_extractor_spark.plans import physical_plan

    rows = [(i, f"src{i % 4}", "t") for i in range(2000)]
    df = spark.createDataFrame(rows,
                               "doc_id bigint, source string, text string")
    w = {"src0": 0.25, "src1": 1.0, "src2": 0.0}
    wdf = spark.createDataFrame(list(w.items()), "source string, weight double")
    got_dict = sorted(r.doc_id for r in sample_mix(df, w).collect())
    got_tbl = sorted(r.doc_id
                     for r in sample_mix_table(df, wdf).collect())
    assert got_tbl == got_dict
    plan = physical_plan(sample_mix_table(df, wdf))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_redact_pii_leaves_ordinary_numbers_alone(spark):
    """False-positive guard (review finding): number lists, decimal
    constants, and year ranges are NOT phones — a permissive separator
    class would delete legitimate numeric training text."""
    txts = [
        (1, "scores 10 20 30 40 in the table"),
        (2, "pi 3.14159 2.71828 constants"),
        (3, "years 1999 2000 2001 2002"),
        (4, "call (415) 555-0100 or +44 20 7946 0958 today"),
    ]
    out = {r.doc_id: r for r in redact_pii(_docs(spark, txts)).collect()}
    for i in (1, 2, 3):
        assert out[i].n_phone == 0 and "<PHONE>" not in out[i].redacted, \
            out[i].redacted
    assert out[4].n_phone == 2


def test_sample_mix_table_clamps_bad_weights(spark):
    """A negative weight must keep NOTHING (parity with the dict
    variant's clamp), not wrap through conv() into keep-everything."""
    from document_extractor_spark.operators.curation import sample_mix_table

    df = spark.createDataFrame([(i, "srcN", "t") for i in range(500)],
                               "doc_id bigint, source string, text string")
    wdf = spark.createDataFrame([("srcN", -0.5)], "source string, weight double")
    assert sample_mix_table(df, wdf).count() == 0


def test_c4_quality_filter_line_and_page_rules(spark):
    """Every C4 rule on a hand-built page: short / no-terminal /
    javascript lines drop; the page verdict needs >=5 sentences, no
    lorem ipsum, no curly brace."""
    from document_extractor_spark.operators.textstats import (
        c4_quality_filter,
    )

    good = "This is a perfectly ordinary sentence about nothing much."
    rows = [
        # 5 good sentences -> kept page
        (1, "\n".join([good] * 5)),
        # line rules: only the good line survives; page fails the
        # 5-sentence floor
        (2, good + "\nshort one.\nno terminal punct here\n"
            "please enable javascript now."),
        # lorem ipsum nukes the page even with enough sentences
        (3, "\n".join([good] * 5) + "\nlorem ipsum dolor sit amet."),
        # curly brace nukes the page
        (4, "\n".join([good] * 5) + "\nweird { code } block."),
        # empty and NULL text: well-defined dropped pages, never NULL
        (5, ""),
        (6, None),
    ]
    out = {r["doc_id"]: r for r in
           c4_quality_filter(_docs(spark, rows)).collect()}
    assert out[1]["keep"] and out[1]["n_lines_kept"] == 5
    assert out[1]["n_sentences"] == 5
    assert not out[2]["keep"]
    assert out[2]["n_lines_kept"] == 1
    assert out[2]["clean_text"] == good
    assert not out[3]["keep"] and not out[4]["keep"]
    assert not out[5]["keep"] and out[5]["clean_text"] == ""
    assert out[6]["keep"] is False and out[6]["n_lines_kept"] == 0


def test_c4_quality_filter_plan_staged_and_jvm(spark):
    """The filtered-lines array is a staged projection (HOF
    re-evaluation trap) and the whole chain stays JVM-side."""
    from document_extractor_spark.operators.textstats import (
        c4_quality_filter,
    )

    df = c4_quality_filter(_docs(spark, [(1, "A b c.\nshort.")]))
    assert_no_python(df)


def test_url_filter_reasons_and_blocklist(spark):
    """Each drop rule fires on its own planted URL; deep subdomains of
    a blocked registered domain are caught; clean URLs keep with a
    NULL reason."""
    from document_extractor_spark.operators.curation import url_filter

    rows = [
        (1, "ftp://files.example.com/a"),
        (2, "https://a.example.com/" + "x" * 3000),
        (3, "https://img.example.com/pic.PNG?w=100"),
        (4, "https://t.example.com/q?" + "&".join(f"k{i}=1" for i in range(12))),
        (5, "https://deep.sub.badsite.com/page"),
        (6, "https://good.example.org/article.html"),
        (7, "not a url at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    bl = spark.createDataFrame([("badsite.com",)], "domain string")
    out = {r["doc_id"]: r for r in url_filter(df, bl).collect()}
    assert out[1]["url_reason"] == "bad_scheme"
    assert out[2]["url_reason"] == "too_long"
    # extension rule anchors to the PATH, tolerating the query string
    assert out[3]["url_reason"] == "binary_extension"
    assert out[4]["url_reason"] == "query_spam"
    assert out[5]["url_reason"] == "blocked_domain"
    assert out[6]["url_keep"] and out[6]["url_reason"] is None
    assert out[6]["host"] == "good.example.org"
    assert out[7]["url_reason"] == "bad_scheme" and not out[7]["url_keep"]


def test_url_filter_no_blocklist_stays_narrow(spark):
    """Without a blocklist the plan is a pure narrow projection (no
    join, no Python) and blocked_domain never fires."""
    from document_extractor_spark.operators.curation import url_filter
    from document_extractor_spark.plans import physical_plan

    df = spark.createDataFrame(
        [(1, "https://spam.badsite0.com/x")], "doc_id bigint, url string")
    out = url_filter(df)
    assert out.collect()[0]["url_keep"]
    plan = physical_plan(out)
    assert "Join" not in plan and "Exchange" not in plan
    assert_no_python(out)


def test_shuffle_shards_deterministic_under_repartition(spark):
    """The export shuffle is a pure function of (seed, key): the same
    frame repartitioned arbitrarily yields byte-identical (shard,
    shard_pos) assignments — the property orderBy(rand()) lacks."""
    from document_extractor_spark.operators.curation import shuffle_shards

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in shuffle_shards(df, n_shards=8).collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in shuffle_shards(df.repartition(7), n_shards=8).collect()}
    assert a == b
    assert_no_python(shuffle_shards(df, n_shards=8))


def test_shuffle_shards_contiguous_and_balanced(spark):
    """Shards cover [0, n); in-shard positions are a contiguous
    0..k-1 run; md5 uniformity keeps shard sizes within a loose band;
    a different seed produces a different permutation."""
    from document_extractor_spark.operators.curation import shuffle_shards

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    rows = shuffle_shards(df, n_shards=8).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) == set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
        assert 150 <= len(positions) <= 350      # ~250 expected
    other = shuffle_shards(df, n_shards=8, seed="shuf2").collect()
    assert {r["doc_id"]: r["shard"] for r in rows} != \
        {r["doc_id"]: r["shard"] for r in other}


def test_pack_sequences_placement_arithmetic(spark):
    """Hand-checked packing: per-shard running offsets, sequence
    indices, boundary crossing, and the zero-token point doc."""
    from document_extractor_spark.operators.curation import pack_sequences

    rows = [  # (doc_id, shard, shard_pos, n_tokens)
        (1, 0, 0, 100), (2, 0, 1, 30), (3, 0, 2, 0), (4, 0, 3, 2),
        (5, 1, 0, 130),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, shard int, shard_pos int, n_tokens bigint")
    out = {r["doc_id"]: r for r in pack_sequences(df, ctx_len=64).collect()}
    assert (out[1]["tok_offset"], out[1]["seq_first"], out[1]["seq_last"],
            out[1]["crosses_boundary"]) == (0, 0, 1, True)
    assert (out[2]["tok_offset"], out[2]["seq_first"], out[2]["seq_last"],
            out[2]["crosses_boundary"]) == (100, 1, 2, True)
    # zero-token doc occupies a point at its offset
    assert (out[3]["tok_offset"], out[3]["seq_first"], out[3]["seq_last"],
            out[3]["crosses_boundary"]) == (130, 2, 2, False)
    assert (out[4]["tok_offset"], out[4]["seq_first"],
            out[4]["crosses_boundary"]) == (130, 2, False)
    # shards pack independently
    assert (out[5]["tok_offset"], out[5]["seq_first"], out[5]["seq_last"],
            out[5]["crosses_boundary"]) == (0, 0, 2, True)
    assert_no_python(pack_sequences(df, ctx_len=64))

def test_url_filter_mixed_case_host_blocked(spark):
    """RFC 3986 hosts are case-insensitive: a mixed-case authority must
    not bypass the (lowercased) domain blocklist, and the emitted host
    column is canonical lowercase."""
    from document_extractor_spark.operators.curation import url_filter

    df = spark.createDataFrame(
        [(1, "https://Ads.BadSite.com/x"),
         (2, "https://GOOD.Example.org/y")],
        "doc_id bigint, url string")
    bl = spark.createDataFrame([("badsite.com",)], "domain string")
    out = {r["doc_id"]: r for r in url_filter(df, bl).collect()}
    assert out[1]["url_reason"] == "blocked_domain"
    assert out[1]["host"] == "ads.badsite.com"
    assert out[2]["url_keep"] and out[2]["host"] == "good.example.org"


def test_canonicalize_urls_rules(spark):
    """Canonical form: case-folded scheme/host, default ports stripped
    (scheme-aware), tracking params dropped, params sorted, fragment
    and userinfo removed, empty path -> '/', garbage -> NULL."""
    from document_extractor_spark.operators.curation import (
        canonicalize_urls,
    )
    from document_extractor_spark.plans import assert_no_python

    rows = [
        (1, "HTTP://WWW.Ex.COM:80/a?z=2&a=1#frag"),
        (2, "https://ex.com:443/p?utm_source=x&utm_campaign=y"),
        (3, "http://ex.com:8080/p"),           # non-default port kept
        (4, "https://user:pw@ex.com/s"),       # userinfo stripped
        (5, "https://ex.com"),                 # empty path -> /
        (6, "not a url at all"),
        (7, "https://ex.com/p?b=2&a=1&gclid=abc&fbclid=z"),
        # mailer-case and valueless tracking spellings still strip;
        # 'ref' is content-bearing (git-ref selectors) and is KEPT
        (8, "https://ex.com/p?UTM_Source=feed&fbclid&ref=v1.2"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    out = canonicalize_urls(df)
    got = {r["doc_id"]: r["canonical_url"] for r in out.collect()}
    assert got[1] == "http://www.ex.com/a?a=1&z=2"
    assert got[2] == "https://ex.com/p"         # all params stripped
    assert got[3] == "http://ex.com:8080/p"
    assert got[4] == "https://ex.com/s"
    assert got[5] == "https://ex.com/"
    assert got[6] is None
    assert got[7] == "https://ex.com/p?a=1&b=2"
    assert got[8] == "https://ex.com/p?ref=v1.2"
    assert_no_python(out)


def test_canonicalize_urls_idempotent_and_dedup(spark):
    """Byte-different spellings of the same resource collapse; the
    canonical form is a fixed point."""
    from document_extractor_spark.operators.curation import (
        canonicalize_urls,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "HTTPS://A.com/x?b=1&a=2"), (2, "https://a.COM:443/x?a=2&b=1#f")],
        "doc_id bigint, url string")
    out = canonicalize_urls(df)
    vals = [r["canonical_url"] for r in out.collect()]
    assert vals[0] == vals[1]
    again = canonicalize_urls(
        out.select(F.col("canonical_url").alias("url")))
    # eqNullSafe: a NULL re-canonicalization must FAIL, not vanish
    # from the inequality filter
    assert again.where(
        ~F.col("url").eqNullSafe(F.col("canonical_url"))).count() == 0


def test_stratified_sample_exact_k_and_determinism(spark):
    """Exactly k per group (whole group when smaller), stable under
    repartition, different seeds draw different samples."""
    from document_extractor_spark.operators.curation import (
        stratified_sample,
    )
    from pyspark.sql import functions as F

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"))
    small = spark.createDataFrame(
        [(1000, "tiny"), (1001, "tiny")], "doc_id bigint, src string")
    df = docs.unionByName(small)
    out = stratified_sample(df, group_col="src", k=10)
    sizes = {r["src"]: r["n"] for r in
             out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"0": 10, "1": 10, "2": 10, "tiny": 2}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(df.repartition(17), "src", 10).collect())
    assert a == b
    c = sorted(r["doc_id"] for r in
               stratified_sample(df, "src", 10, seed="other").collect())
    assert a != c


def test_url_filter_null_url_dropped(spark):
    """A NULL url must not fall through the NULL-propagating WHEN chain
    into the kept default — it is classified bad_scheme with NULL host."""
    from document_extractor_spark.operators.curation import url_filter

    df = spark.createDataFrame(
        [(1, None), (2, "https://ok.example.org/a")],
        "doc_id bigint, url string")
    out = {r["doc_id"]: r for r in url_filter(df).collect()}
    assert out[1]["url_reason"] == "bad_scheme" and not out[1]["url_keep"]
    assert out[1]["host"] is None
    assert out[2]["url_keep"]


def test_url_filter_public_suffix_etld1(spark):
    """With a suffix table, the registered domain is longest-suffix+1:
    blocklisting badsite.co.uk catches ads.badsite.co.uk, while
    good.co.uk (a DIFFERENT registered domain under the same public
    suffix) survives — the exact case the 2-label fallback cannot
    express (it reduces both hosts to co.uk)."""
    from document_extractor_spark.operators.curation import url_filter

    rows = [
        (1, "https://ads.badsite.co.uk/page"),
        (2, "https://good.co.uk/page"),
        (3, "https://badsite.co.uk/page"),          # apex itself
        (4, "https://deep.a.b.badsite.co.uk/p"),    # deep subdomain
        (5, "https://other.example.com/p"),         # plain-suffix host kept
        (6, "https://badsite.com/p"),               # fallback 2-label rule
        (7, "https://co.uk/p"),                     # host == suffix: no reg
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    bl = spark.createDataFrame(
        [("badsite.co.uk",), ("badsite.com",)], "domain string")
    sfx = spark.createDataFrame(
        [("com",), ("org",), ("co.uk",), ("uk",)], "suffix string")
    out = {r["doc_id"]: r
           for r in url_filter(df, bl, suffixes=sfx).collect()}
    assert out[1]["url_reason"] == "blocked_domain"
    assert out[3]["url_reason"] == "blocked_domain"
    assert out[4]["url_reason"] == "blocked_domain"
    assert out[2]["url_keep"] and out[2]["url_reason"] is None
    assert out[5]["url_keep"]
    assert out[6]["url_reason"] == "blocked_domain"
    assert out[7]["url_keep"]  # no registered domain -> nothing to block
    # blocklisting a PURE SUFFIX is malformed and must block NOTHING:
    # the apex host's registered domain is NULL (its own longest suffix
    # match is itself), and every *.co.uk host resolves to its own
    # eTLD+1 — consistent semantics, no apex-only blocking
    bl2 = spark.createDataFrame([("co.uk",)], "domain string")
    out2 = {r["doc_id"]: r
            for r in url_filter(df, bl2, suffixes=sfx).collect()}
    assert all(out2[i]["url_reason"] != "blocked_domain" for i in out2)


def test_url_filter_suffix_table_does_not_change_verdict_columns(spark):
    """The suffix seam is annotation-internal: output schema and the
    non-blocklist verdicts are identical with and without it."""
    from document_extractor_spark.operators.curation import url_filter

    df = spark.createDataFrame(
        [(1, "ftp://x.example.com/a"), (2, "https://ok.example.org/a")],
        "doc_id bigint, url string")
    sfx = spark.createDataFrame([("com",), ("org",)], "suffix string")
    base = url_filter(df)
    with_sfx = url_filter(df, suffixes=sfx)
    assert base.columns == with_sfx.columns
    assert sorted(map(tuple, base.collect())) == \
        sorted(map(tuple, with_sfx.collect()))


def test_shuffle_shards_volume_guard_raises(spark):
    """Sizing n_shards too small for the corpus must fail loudly (each
    shard sorts in ONE task), not silently build a giant
    single-partition sort."""
    import pytest
    from document_extractor_spark.operators.curation import shuffle_shards

    df = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    with pytest.raises(Exception, match="max_rows_per_shard"):
        shuffle_shards(df, n_shards=2, max_rows_per_shard=10).collect()
    # comfortably sized: same corpus passes
    ok = shuffle_shards(df, n_shards=2, max_rows_per_shard=64).collect()
    assert len(ok) == 64 and all(r["shard_pos"] is not None for r in ok)


def test_pack_sequences_volume_guard_raises(spark):
    """pack_sequences enforces the same per-shard row cap as
    shuffle_shards — the running-sum window is single-task per shard."""
    import pytest
    from document_extractor_spark.operators.curation import (
        pack_sequences, shuffle_shards,
    )

    df = shuffle_shards(
        spark.range(0, 64).withColumnRenamed("id", "doc_id"), n_shards=2
    ).withColumn("n_tokens", F.lit(10))
    with pytest.raises(Exception, match="max_rows_per_shard"):
        pack_sequences(df, max_rows_per_shard=10).collect()
    ok = pack_sequences(df, max_rows_per_shard=64).collect()
    assert len(ok) == 64 and all(r["tok_offset"] is not None for r in ok)


def test_canonicalize_urls_percent_encoding(spark):
    """RFC 3986 §6.2.2: unreserved triplets decode (%7e→~, %2e→., %61→a),
    reserved ones stay but uppercase (%2f→%2F), an encoded tracking key
    (utm%5Fsource) is still stripped, a dangling '%' passes through,
    and the result is idempotent — encoded and plain spellings of the
    same resource collapse to one canonical string."""
    from document_extractor_spark.operators.curation import (
        canonicalize_urls,
    )

    rows = [
        (1, "https://ex.com/%7euser/a%2Fb%2e?b=1&utm%5Fsource=x&A=%61"),
        (2, "https://ex.com/~user/a%2Fb.?A=a&b=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    out = {r.doc_id: r.canonical_url
           for r in canonicalize_urls(df).collect()}
    assert out[1] == out[2] == "https://ex.com/~user/a%2Fb.?A=a&b=1"
    again = canonicalize_urls(
        spark.createDataFrame([(1, out[1])], "doc_id bigint, url string"))
    assert again.collect()[0]["canonical_url"] == out[1]


def test_host_quality_filter_verdicts(spark):
    """A host over the failing-fraction threshold drops ALL its docs
    (even passing ones); small hosts and NULL hosts keep by default;
    NULL verdicts count as failures."""
    from document_extractor_spark.operators.curation import (
        host_quality_filter,
    )

    rows = [
        # badhost: 3 docs, 2 fail -> frac 0.667 > 0.5 -> drop all
        (1, "https://bad.example.com/a", False),
        (2, "https://bad.example.com/b", False),
        (3, "https://bad.example.com/c", True),
        # goodhost: 2 docs, 0 fail
        (4, "https://good.example.org/a", True),
        (5, "https://good.example.org/b", True),
        # singleton host: below min_docs, failing doc still kept
        (6, "https://solo.example.net/x", False),
        # NULL url -> no host -> kept by default
        (7, None, False),
        # NULL verdict counts as failing: 2 docs, 1 unknown -> frac 0.5
        (8, "https://mixed.example.io/a", None),
        (9, "https://mixed.example.io/b", True),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, url string, passes_gopher boolean")
    out = {r.doc_id: r for r in host_quality_filter(df).collect()}
    assert all(not out[i]["host_keep"] for i in (1, 2, 3))
    assert all(out[i]["host_keep"] for i in (4, 5, 6, 7, 8, 9))
    assert abs(out[1]["host_fail_frac"] - 2 / 3) < 1e-12
    assert out[7]["host_fail_frac"] is None
    assert abs(out[8]["host_fail_frac"] - 0.5) < 1e-12


def test_host_quality_filter_narrow_verdict_path(spark):
    """The host aggregation sees only (host, bool) — no exchange on the
    verdict path carries document text."""
    from document_extractor_spark.operators.curation import (
        host_quality_filter,
    )
    from document_extractor_spark.plans import physical_plan

    df = spark.createDataFrame(
        [(1, "https://h.example.com/a", True, "x" * 10)],
        "doc_id bigint, url string, passes_gopher boolean, text string")
    plan = physical_plan(host_quality_filter(df))
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning(_host" in line:
            assert "text" not in line, line


def test_cap_per_host_quota_and_quality(spark):
    """At most k docs survive per host; the highest-quality docs are the
    survivors; a NULL-url row is kept (answers to url_filter, not the
    quota)."""
    from document_extractor_spark.operators.curation import cap_per_host

    rows = ([(i, f"https://big.example.org/{i}", float(i)) for i in range(6)]
            + [(10, "https://small.example.org/x", 1.0),
               (11, None, 9.9)])
    df = spark.createDataFrame(rows, "doc_id bigint, url string, q double")
    out = cap_per_host(df, k=2, quality_col="q")
    kept = {r.doc_id for r in out.filter("host_cap_keep").collect()}
    # big host: top-2 by quality = docs 4, 5; small host + NULL url kept
    assert kept == {4, 5, 10, 11}
    ranks = {r.doc_id: r.host_rank for r in out.collect()}
    assert ranks[5] == 1 and ranks[4] == 2 and ranks[11] is None


def test_cap_per_host_md5_tie_break_deterministic(spark):
    """Equal quality → survivor chosen by md5(key), invariant under
    input partitioning."""
    from document_extractor_spark.operators.curation import cap_per_host

    rows = [(i, "https://h.example.org/d", 1.0) for i in range(20)]
    df1 = spark.createDataFrame(rows, "doc_id bigint, url string, q double")
    df8 = df1.repartition(8)
    k1 = sorted(r.doc_id for r in
                cap_per_host(df1, k=3, quality_col="q")
                .filter("host_cap_keep").collect())
    k8 = sorted(r.doc_id for r in
                cap_per_host(df8, k=3, quality_col="q")
                .filter("host_cap_keep").collect())
    assert k1 == k8 and len(k1) == 3


def test_cap_per_host_no_python_and_narrow_window(spark):
    """Plan hygiene: no Python in the plan, and no exchange below the
    rank window carries the payload column."""
    from document_extractor_spark.operators.curation import cap_per_host

    df = spark.createDataFrame(
        [(1, "https://h.example.org/a", "PAYLOAD" * 100)],
        "doc_id bigint, url string, text string")
    out = cap_per_host(df, k=1)
    assert_no_python(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window's input exchange must not carry `text`
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(_host[^\n]*", plan):
        assert "text" not in m.group(0)


# --- Efraimidis-Spirakis weighted sampling ----------------------------------

import hashlib
import math

from document_extractor_spark.operators.curation import weighted_sample


def _es_expected(pairs, k, seed="es1"):
    """Pure-python recompute of the operator's exact formula."""
    keyed = []
    for key, w in pairs:
        if w is None or w <= 0:
            continue
        h = hashlib.md5((seed + str(key)).encode()).hexdigest()[:15]
        u = (int(h, 16) + 1) / 2.0 ** 60
        keyed.append((math.log(u) / float(w), key))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return {key for _, key in keyed[:k]}


def _es_df(spark, pairs, parts=4):
    return spark.createDataFrame(
        [(key, w, f"payload {key}") for key, w in pairs],
        "doc_id bigint, w double, text string").repartition(parts)


def test_weighted_sample_matches_exact_formula(spark):
    pairs = [(i, float(1 + (i * 37) % 100)) for i in range(200)]
    df = _es_df(spark, pairs)
    got = {r["doc_id"] for r in weighted_sample(df, 25, "w").collect()}
    assert got == _es_expected(pairs, 25)


def test_weighted_sample_partition_invariant_and_weight_rules(spark):
    pairs = ([(i, 5.0) for i in range(30)]
             + [(100, 0.0), (101, -3.0), (102, None)])
    out = {p: {r["doc_id"] for r in weighted_sample(
        _es_df(spark, pairs, parts=p), 10, "w").collect()}
        for p in (1, 8)}
    assert out[1] == out[8]
    assert not out[1] & {100, 101, 102}          # P=0 mass never drawn
    # k beyond eligible rows returns every eligible row
    allrows = weighted_sample(_es_df(spark, pairs), 1000, "w")
    assert {r["doc_id"] for r in allrows.collect()} == set(range(30))


def test_weighted_sample_is_weight_proportional(spark):
    # 20 heavy (w=200) vs 200 light (w=1): heavy mass = 4000/4200 ≈ 95%,
    # so a 40-draw sample must be mostly heavy ids across any seed.
    pairs = [(i, 200.0) for i in range(20)] + \
            [(1000 + i, 1.0) for i in range(200)]
    df = _es_df(spark, pairs)
    heavy = sum(
        1 for r in weighted_sample(df, 40, "w", seed="s2").collect()
        if r["doc_id"] < 1000)
    assert heavy >= 15      # all 20 heavy are near-certain picks


def test_weighted_sample_guards_and_plan(spark):
    import pytest as _pt
    from document_extractor_spark.plans import physical_plan
    df = _es_df(spark, [(1, 1.0)])
    with _pt.raises(ValueError, match="positive"):
        weighted_sample(df, 0, "w")
    with _pt.raises(ValueError, match="clash"):
        weighted_sample(df.withColumn("_es_w", F.lit(1)), 1, "w")
    plan = physical_plan(weighted_sample(df, 3, "w"))
    assert "TakeOrderedAndProject" in plan      # top-k, not a full sort


# --- deterministic split assignment -------------------------------------------

from document_extractor_spark.operators.curation import (assign_splits,
                                                         mix_threshold_hex)


def test_assign_splits_matches_hash_formula_and_is_stable(spark):
    import hashlib
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id bigint")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["doc_id"]: r["split"]
           for r in assign_splits(df, splits).collect()}

    def expected(i):
        h = hashlib.md5(f"split1{i}".encode()).hexdigest()[:8]
        if h < mix_threshold_hex(0.8):
            return "train"
        if h < mix_threshold_hex(0.9):
            return "val"
        if h < mix_threshold_hex(1.0):
            return "test"
        return None

    assert got == {i: expected(i) for i in range(500)}
    # proportions roughly honored
    from collections import Counter
    c = Counter(got.values())
    assert c["train"] > 350 and c["val"] > 20 and c["test"] > 20
    # repartition-stable
    got2 = {r["doc_id"]: r["split"] for r in assign_splits(
        df.repartition(7), splits).collect()}
    assert got2 == got


def test_assign_splits_holdout_residue_and_guards(spark):
    import pytest as _pt
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id bigint")
    got = [r["split"] for r in assign_splits(
        df, {"train": 0.5}).collect()]
    assert any(s is None for s in got)          # residue unselected
    assert any(s == "train" for s in got)
    with _pt.raises(ValueError, match="sum past 1"):
        assign_splits(df, {"a": 0.9, "b": 0.2})
    with _pt.raises(ValueError, match="non-empty"):
        assign_splits(df, {})
    with _pt.raises(ValueError, match="negative"):
        assign_splits(df, {"a": -0.1})


def test_assign_splits_plan_no_shuffle(spark):
    from document_extractor_spark.plans import assert_no_python, physical_plan
    df = spark.createDataFrame([(1,)], "doc_id bigint")
    out = assign_splits(df)
    assert_no_python(out)
    assert "Exchange" not in physical_plan(out)


# ---------------------------------------------------------------------------
# term_blocklist_filter + confusables folding
# ---------------------------------------------------------------------------


def test_term_blocklist_counts_and_threshold(spark):
    from document_extractor_spark.operators.curation import (
        term_blocklist_filter)

    docs = spark.createDataFrame(
        [(1, "clean words only here"),
         (2, "one BADX in caps"),            # tokenizer lowercases
         (3, "badx badx badx repeated"),
         (4, None),
         (5, "")],
        "doc_id int, text string")
    terms = spark.createDataFrame([("badx",), ("BADY",)], "term string")
    got = {r["doc_id"]: r for r in
           term_blocklist_filter(docs, terms).collect()}
    assert (got[1]["n_hits"], got[1]["keep"]) == (0, True)
    assert (got[2]["n_hits"], got[2]["keep"]) == (1, False)
    assert (got[3]["n_hits"], got[3]["keep"]) == (3, False)
    # NULL/empty text: nothing to judge, kept
    assert got[4]["keep"] and got[5]["keep"]
    # density-tolerant variant: one mention survives, three do not
    got2 = {r["doc_id"]: r["keep"] for r in
            term_blocklist_filter(docs, terms, max_hits=1).collect()}
    assert got2[2] is True and got2[3] is False


def test_term_blocklist_confusables_fold(spark):
    """Cyrillic-а obfuscation matches only with fold=True — and folding
    applies to the TERM side too (a blocklist curated with a stray
    homoglyph still works)."""
    from document_extractor_spark.operators.curation import (
        term_blocklist_filter)

    docs = spark.createDataFrame(
        [(1, "try bаdx now"),        # Cyrillic а inside badx
         (2, "try badx now")],       # plain
        "doc_id int, text string")
    terms = spark.createDataFrame([("badx",)], "term string")
    plain = {r["doc_id"]: r["n_hits"] for r in
             term_blocklist_filter(docs, terms).collect()}
    assert plain == {1: 0, 2: 1}
    folded = {r["doc_id"]: r["n_hits"] for r in
              term_blocklist_filter(docs, terms, fold=True).collect()}
    assert folded == {1: 1, 2: 1}
    # homoglyph on the term side
    terms_cyr = spark.createDataFrame([("bаdx",)], "term string")
    folded2 = {r["doc_id"]: r["n_hits"] for r in
               term_blocklist_filter(docs, terms_cyr, fold=True).collect()}
    assert folded2 == {1: 1, 2: 1}


def test_fold_confusables_fullwidth_and_identity(spark):
    import pyspark.sql.functions as SF

    from document_extractor_spark.functions.text import fold_confusables

    df = spark.createDataFrame(
        [("ＦＲＥＥ ｏｆｆｅｒ！",), ("plain ascii",)], "t string")
    got = [r[0] for r in
           df.select(fold_confusables(SF.col("t"))).collect()]
    assert got[0] == "FREE offer!"
    assert got[1] == "plain ascii"


def test_term_blocklist_plan_and_guard(spark):
    import pytest

    from document_extractor_spark.operators.curation import (
        term_blocklist_filter)
    from document_extractor_spark.plans import assert_no_python

    docs = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    terms = spark.createDataFrame([("x",)], "term string")
    assert_no_python(term_blocklist_filter(docs, terms, fold=True))
    with pytest.raises(ValueError, match="max_hits"):
        term_blocklist_filter(docs, terms, max_hits=-1)


# ---------------------------------------------------------------------------
# length_bucket_stats
# ---------------------------------------------------------------------------


def test_length_buckets_exact(spark):
    from document_extractor_spark.operators.curation import (
        length_bucket_stats)

    rows = [
        (0, "one two three"),             # 3 tokens  -> bucket 4 -> min 8
        (1, " ".join(["t"] * 8)),         # 8 tokens  -> bucket 8
        (2, " ".join(["t"] * 9)),         # 9 tokens  -> bucket 16
        (3, " ".join(["t"] * 40)),        # 40 > max  -> clamped to 32
        (4, ""),                          # 0 tokens  -> min bucket
        (5, None),                        # excluded
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["bucket"]: (r["n_docs"], r["sum_tokens"], r["sum_pad"],
                         r["pad_waste_ppm"])
           for r in length_bucket_stats(df, max_len=32,
                                        min_bucket=8).collect()}
    # bucket 8: docs 0 (3 tok, pad 5), 1 (8 tok, pad 0), 4 (0 tok, pad 8)
    assert got[8] == (3, 11, 13, 13 * 1_000_000 // 24)
    assert got[16] == (1, 9, 7, 7 * 1_000_000 // 16)
    assert got[32] == (1, 32, 0, 0)
    assert set(got) == {8, 16, 32}


def test_length_buckets_guards(spark):
    import pytest as _pt

    from document_extractor_spark.operators.curation import (
        length_bucket_stats)

    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with _pt.raises(ValueError, match="powers of two"):
        length_bucket_stats(df, max_len=100)
    with _pt.raises(ValueError, match="min_bucket"):
        length_bucket_stats(df, max_len=16, min_bucket=32)


def test_length_buckets_plan_narrow(spark):
    from document_extractor_spark.operators.curation import (
        length_bucket_stats)
    from document_extractor_spark.plans import assert_no_python, physical_plan

    df = spark.createDataFrame([(0, "x y z")], "doc_id bigint, text string")
    out = length_bucket_stats(df)
    assert_no_python(out)
    for line in physical_plan(out).splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
