"""Sitemap.xml extraction — the crawl frontier's other seed source
(sitemaps.org protocol): one row per ``<url>`` block with ``loc``,
``lastmod``, ``changefreq``, ``priority``, plus ``<sitemap>`` index
blocks (a sitemap index file points at child sitemaps — the recursive
case a frontier walks). Together with ``feeds.py`` this closes the
discovery loop: robots.txt policy (robots.py) → sitemap/feed seeds →
page fetch → outlink expansion (links.py).

Same Spark-first shape as ``feeds.py``: ``is_valid_utf8``-gated
decode, one ``regexp_extract_all`` over block patterns, staged
``posexplode_outer``, per-field element extracts — all JVM codegen,
zero rows for non-sitemap payloads, NULL for absent optional fields.
``priority`` parses to double via a strict numeric-shape gate
(``try_cast``-style: a malformed priority is NULL, never a task
error); ``is_index`` marks rows that came from ``<sitemap>`` blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.pagemeta import _unescape

_BLOCKS = "(?is)<(?:url|sitemap)[\\s>].*?</(?:url|sitemap)>"
_NUMERIC = "^[0-9]+(\\.[0-9]+)?$"


def _elem(block: Column, tag: str) -> Column:
    return _unescape(F.nullif(
        F.trim(F.regexp_extract(
            block, f"(?is)<{tag}[^>]*>(.*?)</{tag}>", 1)),
        F.lit("")))


def sitemap_urls(df: DataFrame, url_col: str = "url",
                 payload_col: str = "html") -> DataFrame:
    """One row per <url>/<sitemap> block: ``(sitemap_url, pos, loc,
    lastmod, changefreq, priority, is_index)``. Rows without a <loc>
    are dropped (the protocol requires it); the rest of the fields are
    optional → NULL."""
    raw = F.col(payload_col)
    page = F.when(F.is_valid_utf8(raw), F.decode(raw, "UTF-8"))
    staged = df.select(
        F.col(url_col).alias("sitemap_url"),
        F.regexp_extract_all(page, F.lit(_BLOCKS), 0).alias("_blocks"),
    )
    items = staged.select(
        "sitemap_url", F.posexplode_outer("_blocks").alias("pos", "_b"),
    ).where(F.col("_b").isNotNull())
    b = F.col("_b")
    pr = _elem(b, "priority")
    return (
        items.select(
            "sitemap_url",
            F.col("pos").cast("int").alias("pos"),
            _elem(b, "loc").alias("loc"),
            _elem(b, "lastmod").alias("lastmod"),
            _elem(b, "changefreq").alias("changefreq"),
            F.when(pr.rlike(_NUMERIC),
                   pr.cast("double")).alias("priority"),
            F.lower(b).startswith("<sitemap").alias("is_index"),
        )
        .where(F.col("loc").isNotNull())
    )
