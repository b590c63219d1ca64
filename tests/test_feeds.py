"""RSS/Atom feed-item extraction (sources/feeds.py)."""

from pyspark.sql import functions as F

from document_extractor_spark.sources.feeds import feed_items
from document_extractor_spark.plans import assert_no_python

RSS = (
    '<rss version="2.0"><channel><title>Chan</title>'
    "<link>https://chan.example</link>"
    "<item><title><![CDATA[A & B]]></title><link>https://e/1</link>"
    "<guid>g1</guid><pubDate>Mon, 01 Jan 2026</pubDate></item>"
    "<item><title>Plain &amp; escaped</title><link>https://e/2</link></item>"
    "</channel></rss>"
)
ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>'
    '<entry><title>T1</title><link rel="alternate" href="https://a/1"/>'
    "<id>a1</id><published>2026-01-01</published></entry>"
    '<entry><title>T2</title><link href="https://a/2" rel="alternate"/>'
    "<id>a2</id><updated>2026-02-02</updated></entry>"
    "</feed>"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url string, page string")
    return feed_items(
        df.select("url", F.encode("page", "UTF-8").alias("html"))).collect()


def test_rss_items_cdata_and_entities(spark):
    out = sorted(_run(spark, [("u", RSS)]), key=lambda r: r["pos"])
    assert len(out) == 2
    assert out[0]["title"] == "A & B"            # CDATA unwrap, raw &
    assert out[0]["link"] == "https://e/1"
    assert out[0]["item_id"] == "g1"
    assert out[0]["published"] == "Mon, 01 Jan 2026"
    assert out[1]["title"] == "Plain & escaped"  # entity unescape
    assert out[1]["item_id"] is None             # no guid → NULL
    assert out[1]["published"] is None
    # channel-level title/link never leak into item rows
    assert all(r["title"] != "Chan" and r["link"] != "https://chan.example"
               for r in out)


def test_atom_links_both_attr_orders_and_published_fallback(spark):
    out = sorted(_run(spark, [("u", ATOM)]), key=lambda r: r["pos"])
    assert [r["link"] for r in out] == ["https://a/1", "https://a/2"]
    assert [r["item_id"] for r in out] == ["a1", "a2"]
    assert out[0]["published"] == "2026-01-01"
    assert out[1]["published"] == "2026-02-02"   # <updated> fallback


def test_non_feed_and_hostile_payloads_yield_zero_rows(spark):
    df = spark.createDataFrame(
        [("u1", None), ("u2", b""), ("u3", bytes([0xFF, 0xC0])),
         ("u4", b"<html><body>not a feed</body></html>")],
        "url string, html binary")
    assert feed_items(df).count() == 0


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("u", b"<item></item>")],
                               "url string, html binary")
    assert_no_python(feed_items(df))
