"""JSON-LD structured-data extraction (operators/structdata.py)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.structdata import jsonld_records
from document_extractor_spark.plans import assert_no_python


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "id bigint, page string")
    return df.select("id", F.encode("page", "UTF-8").alias("html"))


_ARTICLE = (
    '<script type="application/ld+json">\n'
    '{\n  "@context": "https://schema.org",\n  "@type": "Article",\n'
    '  "name": "Hello & <World>",\n  "datePublished": "2026-03-14",\n'
    '  "author": {"@type": "Person", "name": "Ada"}\n}\n</script>'
)
_CRUMB = (
    "<script async type='application/ld+json'>"
    '{"@type":"BreadcrumbList","name":"Trail"}</script>'
)


def test_two_blocks_positions_and_fields(spark):
    rows = [(1, "<html><head>" + _ARTICLE + "</head><body>"
                "<script>var x=1;</script>" + _CRUMB + "</body></html>")]
    got = sorted(jsonld_records(_pages(spark, rows)).collect(),
                 key=lambda r: r["ld_pos"])
    assert [r["ld_pos"] for r in got] == [0, 1]
    a, b = got
    assert a["ld_type"] == "Article"
    assert a["ld_name"] == "Hello & <World>"      # JSON, not HTML-escaped
    assert a["ld_date_published"] == "2026-03-14"
    assert a["ld_author"] == "Ada"                # nested path
    assert b["ld_type"] == "BreadcrumbList"
    assert b["ld_name"] == "Trail"
    assert b["ld_date_published"] is None         # field absent in block
    assert b["ld_author"] is None


def test_pages_without_blocks_emit_null_row(spark):
    rows = [
        (1, "<html><body><script>var x=1;</script>no ld here</body></html>"),
        (2, "<html>" + _CRUMB + "</html>"),
    ]
    got = {r["id"]: r for r in jsonld_records(_pages(spark, rows)).collect()}
    assert len(got) == 2                          # outer explode keeps page 1
    assert got[1]["ld_pos"] is None and got[1]["ld_type"] is None
    assert got[2]["ld_pos"] == 0 and got[2]["ld_type"] == "BreadcrumbList"


def test_malformed_json_and_binary_payload_yield_nulls(spark):
    malformed = ("<script type='application/ld+json'>{not json"
                 "</script>")
    df = _pages(spark, [(1, "<html>" + malformed + "</html>")])
    binary = spark.range(1).select(
        (F.col("id") + 2).alias("id"),
        F.unhex(F.lit("FF00FE00")).alias("html"))
    got = {r["id"]: r
           for r in jsonld_records(df.unionByName(binary)).collect()}
    assert got[1]["ld_pos"] == 0                  # block seen …
    assert got[1]["ld_type"] is None              # … but unparseable
    assert got[2]["ld_pos"] is None               # non-UTF-8 → NULL row


def test_reserved_and_requested_names_guarded(spark):
    df = _pages(spark, [(1, "<html></html>")])
    with pytest.raises(ValueError, match="clash"):
        jsonld_records(df.withColumn("ld_pos", F.lit(0)))
    with pytest.raises(ValueError, match="clash"):
        jsonld_records(df, fields={"id": "$.name"})


def test_plan_stays_jvm_side(spark):
    assert_no_python(jsonld_records(_pages(spark, [(1, "<html></html>")])))
