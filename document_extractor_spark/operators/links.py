"""Outlink extraction + host-level link graph — the web-graph side of a
Common-Crawl-scale pipeline (anchor text and host in/out-degree are
standard quality / ranking features; the reference's fixture pages carry
the same ``<a href>`` chrome this operator parses, cf. its nav/header
markup in ``templates`` and the ``<img>`` handling in
``pdf_to_png_converter.py:126-196`` — link extraction is the anchor-tag
twin of S3's image explode).

Spark mapping: entirely JVM-side — ``regexp_extract_all`` over the
decoded page, ``posexplode`` for document-order link indices, CASE-based
URL resolution, ``try_parse_url`` for hosts. No Python anywhere; the
plan is scan → project → generate (narrow). The host graph is one
groupBy on (src_host, dst_host) — a metadata-scale shuffle (hosts, not
pages). At 100 TB the anchor regex runs inside whole-stage codegen over
the scan, and the only shuffled payload is (host, host, 1) rows.

Deliberate simplifications, mirrored exactly in the DuckDB oracle:
- anchors with nested markup are skipped (``[^<]`` body — boilerplate
  chrome links, the bulk of the web graph's edges, are plain text);
- relative hrefs resolve against the site root, not the base path
  (host-granularity graphs only need the authority);
- anchors quoted inside ``<script>``/``<style>`` bodies are NOT
  excluded (a raw-regex scan cannot bound a script-body strip without
  reintroducing the O(n^2) backtracking straggler); at host
  granularity the resulting rare spurious edge is tolerable noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import host_col

# Bounded quantifiers throughout — unbounded classes are the measured
# O(n^2) Java-regex straggler on hostile megabyte runs; this subset is
# Java∩RE2 so the DuckDB oracle runs the identical pattern. (?i):
# legacy pages carry <A HREF=...> — tag and attribute names are
# case-insensitive. HREF is anchored into the ATTRIBUTE section
# ([^>] cannot cross the tag-open '>'), with a required whitespace
# separator before 'href' so body text quoting href=... or attributes
# like data-href cannot fabricate an edge.
A_TAG = r"(?i)<a\s[^>]{0,512}>[^<]{0,2048}</a>"
HREF = r"""(?i)^<a\s(?:[^>]{0,511}\s)?href=['"]([^'"]{1,2048})['"]"""
_SCHEME = r"^[a-zA-Z][a-zA-Z0-9+.-]{0,15}:"


def extract_outlinks(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """pages(url, html BINARY) → one row per ``<a href>`` occurrence:
    ``(url, link_index 1-based document order, href, anchor, resolved,
    dst_host)``. Pure Catalyst, narrow."""
    # cast, not decode(.., 'UTF-8'): Spark 4 decode RAISES on malformed
    # bytes (hostile binary payloads must never fail the task); cast is
    # byte-identical on valid UTF-8 and lenient otherwise
    html_str = F.col(html_col).cast("string")
    # staged projection: keeps the regex out of explode's implicit
    # size()>0 pushdown (it would inline and re-evaluate the match)
    staged = pages.select(
        F.col(url_col),
        F.regexp_extract_all(html_str, F.lit(A_TAG), F.lit(0)).alias("_tags"),
    )
    base_scheme = F.try_parse_url(F.col(url_col), F.lit("PROTOCOL"))
    root = F.concat(base_scheme, F.lit("://"), host_col(F.col(url_col)))
    href = F.regexp_extract("tag", HREF, 1)
    resolved = (
        F.when(href == "", F.lit(None).cast("string"))
        .when(href.rlike(_SCHEME), href)
        .when(href.startswith("//"), F.concat(base_scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(root, href))
        .otherwise(F.concat(root, F.lit("/"), href))
    )
    return (
        staged.select(url_col, F.posexplode("_tags").alias("pos", "tag"))
        .select(
            url_col,
            (F.col("pos") + 1).alias("link_index"),
            href.alias("href"),
            F.regexp_extract("tag", r"(?i)>([^<]{0,2048})</a>", 1)
            .alias("anchor"),
            resolved.alias("resolved"),
        )
        .withColumn("dst_host", host_col(F.col("resolved")))
    )


def host_link_graph(links: DataFrame, url_col: str = "url") -> DataFrame:
    """Outlink rows → host-level edge list ``(src_host, dst_host,
    n_links)``. One shuffle on the (host, host) key — host cardinality,
    not page cardinality; map-side partial aggregation bounds Zipfian
    host skew the same way ``host_stats`` does."""
    src = host_col(F.col(url_col))
    return (
        links.where(F.col("dst_host").isNotNull())
        .groupBy(src.alias("src_host"), F.col("dst_host"))
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
