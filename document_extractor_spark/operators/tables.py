"""Relational table export — extracted HTML tables as (url, table_idx,
row, col, value) CELL ROWS, the shape analytics actually joins against.
The reference keeps tables as HTML strings inside items
(openai_content_extractor.py:158-200 'table_html'); the item schema
here does too (E4/E5 refinement) — this operator is the last hop that
makes them queryable: schema-on-read over a million crawled pages'
tables without another parser.

Built entirely on the extraction kernel's rendered grid (tab-joined
cells, newline-joined rows — one canonical text form per table), so
cell parity is pinned by the same byte-determinism the roundtrip
oracle enforces. Two staged posexplodes (rows then cells — repo
explode rule) over narrow strings; the page payload never fans out."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import extract_pages


def table_cells(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) → one row per table cell:
    ``(url, table_idx, row, col, value)``; 0-based indices in reading
    order. Pages without tables yield no rows; ragged rows arrive
    already padded to the grid width with empty strings — the E5
    verify/backfill semantics the extraction kernel applies
    (html_extract.py:602), so every table is rectangular here."""
    items = extract_pages(pages, with_items=True)
    tabs = (
        items.withColumn(
            "_tabs",
            F.filter("content_items", lambda it: it["type"] == "table"))
        .select("url", F.posexplode_outer("_tabs")
                .alias("table_idx", "_it"))
        .where(F.col("_it").isNotNull())
    )
    rows = (
        tabs.withColumn("_rows", F.split(F.col("_it.content"), "\n"))
        .select("url", "table_idx",
                F.posexplode_outer("_rows").alias("row", "_r"))
        .where(F.col("_r").isNotNull())
    )
    return (
        rows.withColumn("_cells", F.split(F.col("_r"), "\t"))
        .select("url", "table_idx", "row",
                F.posexplode_outer("_cells").alias("col", "value"))
        .where(F.col("value").isNotNull())
        .select("url", F.col("table_idx").cast("int").alias("table_idx"),
                F.col("row").cast("int").alias("row"),
                F.col("col").cast("int").alias("col"), "value")
    )
