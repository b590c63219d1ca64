"""RSS/Atom feed-item extraction — turn syndication XML (the other
document format a web crawl ingests constantly) into one row per item:
``(feed_url, pos, title, link, item_id, published)``. Feeds are the
crawl's freshness signal: item links seed the frontier, published
timestamps drive revisit scheduling, and titles label documents before
any page fetch happens.

Spark-first, all JVM codegen: one ``regexp_extract_all`` slices the
item/entry blocks out of the payload (``is_valid_utf8``-gated decode,
same contract as ``pagemeta``), a STAGED ``explode_outer`` +
``posexplode``-equivalent keeps the repo's HOF/explode rule, and
per-field ``regexp_extract`` pairs handle both dialects:

* RSS 2.0:  ``<item>`` blocks, ``<title>``/``<link>`` element text,
  ``<guid>``, ``<pubDate>``.
* Atom:     ``<entry>`` blocks, ``<title>`` text, ``<link href="…">``
  attribute (either attribute order, via the shared helper),
  ``<id>``, ``<published>`` (falling back to ``<updated>``).

Title text is entity-unescaped with the shared 5-entity chain and
CDATA-unwrapped (``<![CDATA[…]]>`` — feeds love it). Malformed or
non-feed payloads simply produce zero rows for that url; per-field
absence is NULL, never an error — the extraction-totality contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.pagemeta import _attr_value, _unescape

_ITEM_BLOCKS = "(?is)<(?:item|entry)[\\s>].*?</(?:item|entry)>"


def _element_text(block: Column, tag: str) -> Column:
    raw = F.nullif(
        F.trim(F.regexp_extract(
            block, f"(?is)<{tag}[^>]*>(.*?)</{tag}>", 1)),
        F.lit(""))
    # CDATA unwrap first, then entity unescape (CDATA content is raw)
    cdata = F.regexp_extract(raw, r"(?s)^<!\[CDATA\[(.*)\]\]>$", 1)
    return _unescape(F.when(cdata != "", cdata).otherwise(raw))


def feed_items(df: DataFrame, url_col: str = "url",
               payload_col: str = "html") -> DataFrame:
    """One row per feed item. Zero rows for docs with no item/entry
    blocks (non-feed or non-UTF-8 payloads); NULL for missing fields."""
    raw = F.col(payload_col)
    page = F.when(F.is_valid_utf8(raw), F.decode(raw, "UTF-8"))
    staged = df.select(
        F.col(url_col).alias("feed_url"),
        F.regexp_extract_all(page, F.lit(_ITEM_BLOCKS), 0).alias("_blocks"),
    )
    items = staged.select(
        "feed_url", F.posexplode_outer("_blocks").alias("pos", "_b"),
    ).where(F.col("_b").isNotNull())
    b = F.col("_b")
    link = F.coalesce(
        # RSS element text — nullif-guarded so an Atom self-closing
        # <link href=…/> (no element text) falls through to the attr
        _element_text(b, "link"),
        _attr_value(b, "link", "rel", "alternate", "href"),
        _attr_value(b, "link", "type", "text/html", "href"),
        F.nullif(F.regexp_extract(
            b, """(?is)<link[^>]*href=["']([^"']*)["']""", 1), F.lit("")),
    )
    return items.select(
        "feed_url",
        F.col("pos").cast("int").alias("pos"),
        _element_text(b, "title").alias("title"),
        link.alias("link"),
        F.coalesce(_element_text(b, "guid"),
                   _element_text(b, "id")).alias("item_id"),
        F.coalesce(_element_text(b, "pubDate"),
                   _element_text(b, "published"),
                   _element_text(b, "updated")).alias("published"),
    )
