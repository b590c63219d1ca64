"""Page-head metadata extraction (operators/pagemeta.py)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.pagemeta import page_metadata
from document_extractor_spark.plans import assert_no_python


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "id bigint, page string")
    return df.select("id", F.encode("page", "UTF-8").alias("html"))


def _by_id(df):
    return {r["id"]: r for r in df.collect()}


def test_title_canonical_og_both_attribute_orders(spark):
    rows = [
        (1, '<html><head><title> T1 </title>'
            '<link rel="canonical" href="https://e.org/a">'
            '<meta property="og:title" content="OT1">'
            '</head><body>x</body></html>'),
        (2, "<html><head><TITLE>T2</TITLE>"          # case-insensitive
            '<link href="https://e.org/b" rel="canonical">'   # href first
            '<meta content="OT2" property="og:title">'        # content first
            "</head></html>"),
        (3, "<html><head><meta property='og:title' content='OT3'>"
            "</head></html>"),                       # single quotes, no title
    ]
    got = _by_id(page_metadata(_pages(spark, rows), og_fields=("title",)))
    assert got[1]["title"] == "T1"                   # trimmed
    assert got[1]["canonical_url"] == "https://e.org/a"
    assert got[1]["og_title"] == "OT1"
    assert got[2]["title"] == "T2"
    assert got[2]["canonical_url"] == "https://e.org/b"
    assert got[2]["og_title"] == "OT2"
    assert got[3]["title"] is None
    assert got[3]["canonical_url"] is None
    assert got[3]["og_title"] == "OT3"


def test_entity_unescape_and_multiline_title(spark):
    rows = [(1, "<head><title>A &amp; B &lt;C&gt; &quot;D&quot; &#39;E&#39;"
                "</title></head>"),
            (2, "<head><title>line1\nline2</title></head>"),
            (3, "<head><title>literal &amp;lt; stays</title></head>")]
    got = _by_id(page_metadata(_pages(spark, rows)))
    assert got[1]["title"] == "A & B <C> \"D\" 'E'"
    assert got[2]["title"] == "line1\nline2"         # (?s) dotall
    assert got[3]["title"] == "literal &lt; stays"   # no double-unescape


def test_hostile_inputs_yield_nulls_not_errors(spark):
    df = spark.createDataFrame(
        [(1, None), (2, b""), (3, bytes([0xC3, 0x28, 0xFF])),  # invalid UTF-8
         (4, b"<head><title></title></head>")],                # empty title
        "id bigint, html binary")
    got = _by_id(page_metadata(df))
    for i in (1, 2, 3, 4):
        assert got[i]["title"] is None
        assert got[i]["canonical_url"] is None


def test_fixture_roundtrip_matches_closed_form(spark, sf_dir):
    """The driver-oracle contract, locally: extract over the planted
    head fixture and compare every field to its closed form."""
    from document_extractor_spark.sources.docpages import (
        doc_id_from_url, pages_with_head_metadata)

    out = page_metadata(pages_with_head_metadata(spark, sf_dir)) \
        .select(doc_id_from_url("url"), "title", "canonical_url",
                "og_title", "og_site_name", "og_image")
    d = F.col("doc_id")
    bad = out.where(
        ~(
            (F.col("canonical_url")
             == F.concat(F.lit("https://example.org/d/"), d.cast("string")))
            & (F.col("og_title")
               == F.concat(F.lit("OG Doc "), d.cast("string")))
            & (F.col("og_site_name")
               == F.concat(F.lit("site"), (d % 7).cast("string")))
            & (F.when(d % 5 == 0, F.col("og_image").isNull())
               .otherwise(F.col("og_image") == F.concat(
                   F.lit("https://img.example.org/"), d.cast("string"),
                   F.lit(".png"))))
            & (F.when(d % 11 == 0, F.col("title").isNull())
               .otherwise(F.col("title").startswith("Doc ")
                          & F.col("title").contains(" & ")))
        ))
    assert bad.count() == 0


def test_plan_is_jvm_only(spark):
    df = _pages(spark, [(1, "<head><title>x</title></head>")])
    assert_no_python(page_metadata(df))


# --- hreflang alternates ---------------------------------------------------

from document_extractor_spark.operators.pagemeta import hreflang_alternates


def _hpages(spark, rows):
    df = spark.createDataFrame(rows, "url string, page string")
    return df.select("url", F.encode("page", "UTF-8").alias("html"))


def test_hreflang_rows_cluster_and_negative_controls(spark):
    rows = [
        ("https://e.org/en/p",
         '<html><head>'
         '<link rel="stylesheet" href="/main.css">'                 # no
         '<link rel="alternate" hreflang="en" href="https://e.org/en/p">'
         '<link href="https://e.org/de/p" hreflang="DE" rel="alternate">'
         '<link rel="alternate" type="application/rss+xml" href="/f.xml">'
         '<link rel="canonical" href="https://e.org/en/p">'         # no
         "</head></html>"),
    ]
    got = sorted(hreflang_alternates(_hpages(spark, rows)).collect(),
                 key=lambda r: r["hreflang"])
    assert [(r["hreflang"], r["href"]) for r in got] == [
        ("de", "https://e.org/de/p"),      # lowercased, href-first order
        ("en", "https://e.org/en/p"),
    ]
    # min(own url, hrefs): de sorts first
    assert all(r["cluster_url"] == "https://e.org/de/p" for r in got)


def test_hreflang_no_alternates_and_binary_yield_no_rows(spark):
    rows = [("https://e.org/a",
             "<html><head><link rel='stylesheet' href='/x.css'>"
             "</head></html>")]
    df = _hpages(spark, rows)
    binary = spark.range(1).select(
        F.lit("https://e.org/bin").alias("url"),
        F.unhex(F.lit("FF00FE00")).alias("html"))
    assert hreflang_alternates(df.unionByName(binary)).collect() == []


def test_hreflang_cluster_is_own_url_when_it_sorts_first(spark):
    rows = [("https://a.org/x",
             '<html><link rel="alternate" hreflang="fr" '
             'href="https://z.org/fr/x"></html>')]
    got = hreflang_alternates(_hpages(spark, rows)).collect()
    assert got[0]["cluster_url"] == "https://a.org/x"


def test_hreflang_clash_guard_and_plan(spark):
    df = _hpages(spark, [("u", "<html></html>")])
    with pytest.raises(ValueError, match="clash"):
        hreflang_alternates(df.withColumn("href", F.lit("x")))
    assert_no_python(hreflang_alternates(df))


# --- meta robots directives --------------------------------------------------

from document_extractor_spark.operators.pagemeta import robots_directives


def test_meta_robots_union_case_order_and_token_bounds(spark):
    rows = [
        (1, '<html><head><meta name="robots" content="noindex, nofollow">'
            "</head></html>"),
        (2, "<html><meta content='NOFOLLOW' name='robots'></html>"),
        (3, '<html><meta name="robots" content="all"></html>'),
        (4, "<html>no meta at all</html>"),
        (5, '<html><meta name="robots" content="noindexing">'
            '<meta name="robots" content="noarchive"></html>'),  # union
        (6, '<html><meta name="keywords" content="noindex"></html>'),
    ]
    got = {r["id"]: r for r in robots_directives(
        _pages(spark, rows)).collect()}
    assert (got[1]["meta_noindex"], got[1]["meta_nofollow"]) == (True, True)
    assert (got[2]["meta_noindex"], got[2]["meta_nofollow"]) == (False, True)
    assert got[3]["meta_noindex"] is False
    assert got[4]["meta_noindex"] is False
    assert got[5]["meta_noindex"] is False      # 'noindexing' ≠ noindex
    assert got[5]["meta_noarchive"] is True     # union across tags
    assert got[6]["meta_noindex"] is False      # wrong meta name


def test_meta_robots_undecodable_is_null_not_allowed(spark):
    binary = spark.range(1).select(
        F.lit(7).alias("id"), F.unhex(F.lit("FF00FE00")).alias("html"))
    got = robots_directives(binary).collect()[0]
    assert got["meta_noindex"] is None


def test_meta_robots_plan_and_guard(spark):
    df = _pages(spark, [(1, "<html></html>")])
    with pytest.raises(ValueError, match="clash"):
        robots_directives(df.withColumn("meta_noindex", F.lit(True)))
    assert_no_python(robots_directives(df))
