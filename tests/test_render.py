"""Rendering operators (H1-H10 analogs) over the content-item array —
JVM-only plans, reference render semantics."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.extract import extract_pages
from document_extractor_spark.operators.render import (
    apply_readability_rewrite,
    legacy_projection,
    readability_stats,
    render_html,
)
from document_extractor_spark.plans import assert_no_python
from document_extractor_spark.sources.generator import fixture_rows
from document_extractor_spark.sources.pages import PAGES_SCHEMA


@pytest.fixture(scope="module")
def extracted(spark):
    pages = spark.createDataFrame(fixture_rows(), schema=PAGES_SCHEMA)
    return extract_pages(pages, with_items=True).cache()


def _one(df, url_suffix):
    return df.filter(F.col("url").endswith(url_suffix)).head()


def test_items_roundtrip_spans(extracted):
    row = _one(extracted, "section_table_reorder")
    items = row["content_items"]
    assert [i["type"] for i in items] == [
        "header", "paragraph", "header", "table", "paragraph", "header",
        "paragraph"]
    # R1 applied: the 'II.' header precedes the table
    assert items[2]["content"].startswith("II.")
    assert items[2]["level"] == 2


ITEMS_DDL = ("url string, content_items array<struct<order:int,type:string,"
             "content:string,html:string,level:int,row_count:int,"
             "column_count:int,converted_from_kv:boolean>>")


def _items_df(spark):
    rows = [("u", [
        (0, "header", "T", None, 1, 0, 0, False),
        (1, "paragraph", "p", None, 0, 0, 0, False),
    ])]
    return spark.createDataFrame(rows, ITEMS_DDL)


def test_render_plans_jvm_only(spark):
    df = _items_df(spark)
    assert_no_python(render_html(df))
    assert_no_python(readability_stats(df))
    assert_no_python(legacy_projection(df))


def test_render_html_flow(spark, extracted):
    html_df = render_html(extracted)
    row = _one(html_df, "plain_article")
    html = row["html"]
    assert html.startswith('<div class="page">')
    assert "<h1>Understanding Distributed Extraction</h1>" in html
    assert "<p>This article explains" in html


def test_render_newline_preservation(extracted):
    html = _one(render_html(extracted), "hard_newlines")["html"]
    assert "line one of the poem stays alone<br/>\n" in html


def test_render_table_container(extracted):
    html = _one(render_html(extracted), "merged_cells")["html"]
    assert '<div class="table-container">' in html
    assert "rowspan='2'" in html  # exact table HTML preserved


def test_render_kv_table(extracted):
    html = _one(render_html(extracted), "kv_blank_line")["html"]
    assert "<thead><tr><th>Name</th><th>Age</th><th>Email</th></tr></thead>" \
        in html


def test_render_escaping(extracted):
    html = _one(render_html(extracted), "html_entities")["html"]
    assert "&lt;angle&gt;" in html
    assert "&amp;" in html


def test_readability_stats(extracted):
    stats = {r["url"].rsplit("/", 1)[1]: r
             for r in readability_stats(extracted).collect()}
    s = stats["section_table_reorder"]
    assert s["n_tables"] == 1
    assert s["n_headers"] == 3
    assert s["n_paragraphs"] == 3
    assert not s["issue_large_table"]


def test_readability_rewrite(extracted):
    html_df = apply_readability_rewrite(render_html(extracted))
    html = _one(html_df, "kv_blank_line")["html"]
    assert '<th class="hdr">' in html
    assert '<table class="readable">' in html


def test_legacy_projection(extracted):
    proj = legacy_projection(extracted)
    row = _one(proj, "section_table_reorder")
    assert len(row["tables"]) == 1
    assert len(row["text_blocks"]) == 6
