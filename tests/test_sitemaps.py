"""Sitemap extraction (sources/sitemaps.py)."""

from pyspark.sql import functions as F

from document_extractor_spark.sources.sitemaps import sitemap_urls
from document_extractor_spark.plans import assert_no_python

URLSET = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc>https://e/a?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod>"
    "<changefreq>daily</changefreq><priority>0.8</priority></url>"
    "<url><loc>https://e/b</loc></url>"          # optional fields absent
    "<url><lastmod>2026-01-01</lastmod></url>"   # no loc → dropped
    "<url><loc>https://e/c</loc><priority>high</priority></url>"
    "</urlset>"
)
INDEX = (
    "<sitemapindex>"
    "<sitemap><loc>https://e/s1.xml</loc><lastmod>2026-02-02</lastmod>"
    "</sitemap></sitemapindex>"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url string, page string")
    return sitemap_urls(
        df.select("url", F.encode("page", "UTF-8").alias("html"))).collect()


def test_urlset_fields_entities_and_loc_requirement(spark):
    out = sorted(_run(spark, [("m", URLSET)]), key=lambda r: r["pos"])
    assert [r["loc"] for r in out] == [
        "https://e/a?x=1&y=2", "https://e/b", "https://e/c"]
    assert out[0]["lastmod"] == "2026-01-01"
    assert out[0]["changefreq"] == "daily"
    assert out[0]["priority"] == 0.8
    assert out[1]["lastmod"] is None and out[1]["priority"] is None
    assert out[2]["priority"] is None            # malformed → NULL
    assert all(r["is_index"] is False for r in out)
    # positions keep the original block order even after the drop
    assert [r["pos"] for r in out] == [0, 1, 3]


def test_sitemap_index_blocks(spark):
    out = _run(spark, [("m", INDEX)])
    assert len(out) == 1
    assert out[0]["loc"] == "https://e/s1.xml"
    assert out[0]["is_index"] is True
    assert out[0]["changefreq"] is None


def test_hostile_payloads_yield_zero_rows(spark):
    df = spark.createDataFrame(
        [("u1", None), ("u2", b""), ("u3", bytes([0xFE, 0xC0])),
         ("u4", b"<html>not a sitemap</html>")],
        "url string, html binary")
    assert sitemap_urls(df).count() == 0


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("u", b"<url><loc>x</loc></url>")],
                               "url string, html binary")
    assert_no_python(sitemap_urls(df))
